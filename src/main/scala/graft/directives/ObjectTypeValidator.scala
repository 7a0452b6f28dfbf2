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
}
