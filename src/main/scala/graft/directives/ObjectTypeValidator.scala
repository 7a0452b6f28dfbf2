package graft.directives

import graft.model.JobMode

/** Mode-specific object-type validation — the analog of checking
  * EXCLUDE/INCLUDE object paths against the `*_EXPORT_OBJECTS`
  * dictionary views (reference directives.py:589-625, sql.py:19-37).
  * The reference queries the live DB and caches per mode; our catalog
  * is static, so the lookup table is too. Failing fast with the valid
  * list mirrors exceptions.py:4-11.
  */
object ObjectTypeValidator {

  private val common = Set(
    "TABLE", "TABLE_DATA", "INDEX", "CONSTRAINT", "REF_CONSTRAINT",
    "TRIGGER", "VIEW", "COMMENT", "STATISTICS", "GRANT")

  private val byMode: Map[JobMode, Set[String]] = Map(
    JobMode.Full -> (common ++ Set("USER", "ROLE", "TABLESPACE",
      "PROFILE", "DIRECTORY", "SYNONYM", "SEQUENCE", "PROCEDURE",
      "FUNCTION", "PACKAGE")),
    JobMode.Schema -> (common ++ Set("USER", "SYNONYM", "SEQUENCE",
      "PROCEDURE", "FUNCTION", "PACKAGE")),
    JobMode.Table -> common,
    JobMode.Tablespace -> common,
    JobMode.Transportable -> Set("TABLE", "TABLE_DATA", "INDEX",
      "CONSTRAINT", "TRIGGER"))

  def validTypes(mode: JobMode): Set[String] = byMode(mode)

  /** Throws with the sorted valid list on an unknown type. */
  def validate(mode: JobMode, objectType: String): String = {
    val t = objectType.toUpperCase
    val valid = validTypes(mode)
    if (!valid.contains(t))
      throw new graft.model.Exceptions.InvalidObjectType(
        s"Invalid object type '$objectType' for mode ${mode.name}. " +
          s"Valid types: ${valid.toSeq.sorted.mkString(", ")}")
    t
  }

  // ---- live (JDBC-metadata) tier ------------------------------------

  /** Object kinds a vendor-neutral JDBC connection cannot observe:
    * physical/storage concepts with no DatabaseMetaData surface.
    * They stay on the static tier (where the directive layer
    * accepts-and-ignores them anyway); the LIVE tier rejects them for
    * vendors that demonstrably lack the observable kinds. */
  private val Unobservable = Set("TABLESPACE", "PROFILE", "DIRECTORY", "ROLE")

  private val liveCache =
    scala.collection.concurrent.TrieMap.empty[(String, JobMode), Set[String]]

  /** LIVE tier — the JDBC production story, mirroring the reference's
    * dictionary-view validation (directives.py:589-625 queries the
    * live `*_EXPORT_OBJECTS` views and caches per mode): the mode's
    * static lattice is intersected with what the CONNECTED vendor
    * actually exposes, read from `DatabaseMetaData`:
    *
    *  - `getTableTypes` → table-anchored kinds (TABLE and its
    *    dependents), VIEW, SYNONYM/ALIAS, SEQUENCE
    *  - `supportsStoredProcedures` → PROCEDURE / FUNCTION / PACKAGE
    *  - `getSchemas` non-empty → USER (schema ≈ user in the
    *    Oracle/Derby model)
    *
    * Unobservable physical kinds ([[Unobservable]]) are excluded —
    * a live validation should not claim a kind it cannot verify.
    * Cached per (connection URL, mode), the reference's lru_cache
    * shape — and like any lru_cache over live catalog state, stale by
    * design: DDL that adds the database's first procedure or schema
    * is not seen until [[clearLiveCache]] (or a new JVM). Callers
    * that must observe fresh DDL clear between jobs; the job-scoped
    * usage here validates once per submission, where staleness spans
    * one job, not the process lifetime. */
  def validTypesLive(meta: java.sql.DatabaseMetaData,
      mode: JobMode): Set[String] =
    liveCache.getOrElseUpdate((meta.getURL, mode), {
      val tableKinds = scala.collection.mutable.Set.empty[String]
      val rs = meta.getTableTypes
      try while (rs.next()) tableKinds += rs.getString(1).toUpperCase
      finally rs.close()
      val observable = scala.collection.mutable.Set.empty[String]
      if (tableKinds.exists(_.contains("TABLE")))
        observable ++= Set("TABLE", "TABLE_DATA", "INDEX", "CONSTRAINT",
          "REF_CONSTRAINT", "TRIGGER", "STATISTICS", "GRANT", "COMMENT")
      if (tableKinds.exists(_.contains("VIEW"))) observable += "VIEW"
      if (tableKinds.contains("SYNONYM") || tableKinds.contains("ALIAS"))
        observable += "SYNONYM"
      if (tableKinds.contains("SEQUENCE")) observable += "SEQUENCE"
      if (meta.supportsStoredProcedures())
        observable ++= Set("PROCEDURE", "FUNCTION", "PACKAGE")
      val schemas = meta.getSchemas
      try { if (schemas.next()) observable += "USER" }
      finally schemas.close()
      (byMode(mode) -- Unobservable).intersect(observable.toSet)
    })

  /** Drop cached live validations (post-DDL refresh hook). */
  def clearLiveCache(): Unit = liveCache.clear()

  /** [[validate]] against the live tier. */
  def validateLive(meta: java.sql.DatabaseMetaData, mode: JobMode,
      objectType: String): String = {
    val t = objectType.toUpperCase
    val valid = validTypesLive(meta, mode)
    if (!valid.contains(t))
      throw new graft.model.Exceptions.InvalidObjectType(
        s"Invalid object type '$objectType' for mode ${mode.name} on " +
          s"${meta.getURL}. Valid types: ${valid.toSeq.sorted.mkString(", ")}")
    t
  }
}
