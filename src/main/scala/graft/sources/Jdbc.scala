package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source scaffolding for production deployments (the harness
  * reads parquet; an Oracle-backed deployment reads segments over
  * JDBC the way the reference's server-side engine did natively).
  *
  * Two SURVEY.md §4 behaviors live here:
  *  - snapshot-consistent scan: `AS OF SCN` is injected as a dbtable
  *    subquery (string-level — no Catalyst rule needed, exactly as
  *    analyzed in SURVEY §4);
  *  - parallel scan: PARALLEL degree maps onto numPartitions +
  *    partitionColumn bounds, the JDBC analog of the DP worker pool.
  *
  * Pure option-building is separated from the read so it unit-tests
  * without a database.
  */
object Jdbc {

  /** Snapshot clause injection: `(SELECT * FROM t AS OF SCN n)` /
    * `AS OF TIMESTAMP ...` — Oracle flashback-query syntax. */
  def dbtableFor(
      table: String,
      asOfScn: Option[Long] = None,
      asOfTimestampIso: Option[String] = None): String =
    (asOfScn, asOfTimestampIso) match {
      case (Some(scn), _) =>
        s"(SELECT * FROM $table AS OF SCN $scn)"
      case (None, Some(iso)) =>
        val ts = iso.replace("T", " ").takeWhile(_ != '+').stripSuffix("Z")
        s"(SELECT * FROM $table AS OF TIMESTAMP TO_TIMESTAMP('$ts', 'YYYY-MM-DD HH24:MI:SS.FF'))"
      case _ => table
    }

  /** Full option map for a partitioned snapshot read. `partitionColumn`
    * must be numeric/date; bounds split it into `parallel` ranges.
    * `fetchsize` is the LOB/row streaming knob (the reference's
    * 32 KB RPC ceiling has no analog — JDBC streams). */
  def readOptions(
      url: String,
      table: String,
      parallel: Int = 1,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      asOfScn: Option[Long] = None,
      asOfTimestampIso: Option[String] = None,
      fetchSize: Int = 10000): Map[String, String] = {
    require(parallel >= 1)
    val base = Map(
      "url" -> url,
      "dbtable" -> dbtableFor(table, asOfScn, asOfTimestampIso),
      "fetchsize" -> fetchSize.toString)
    if (parallel > 1) {
      val pc = partitionColumn.getOrElse(throw new IllegalArgumentException(
        "parallel > 1 requires a partitionColumn with bounds"))
      base ++ Map(
        "numPartitions" -> parallel.toString,
        "partitionColumn" -> pc,
        "lowerBound" -> lowerBound.getOrElse(0L).toString,
        "upperBound" -> upperBound.getOrElse(Long.MaxValue).toString)
    } else base
  }

  def read(spark: SparkSession, opts: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(opts).load()

  /** Oracle's DB-timezone probe (database.py:141-174). */
  val OracleDbTimezoneSql = "SELECT DBTIMEZONE FROM DUAL"

  /** Live DB timezone lookup (`get_db_timezone`): run the vendor's
    * timezone query over a JDBC connection and parse the result, which
    * may be a region name ("America/New_York") or a `±HH:MM` offset —
    * both resolved to the zone's CURRENT utc offset, matching the
    * reference's `ZoneInfo(...).utcoffset(now)` collapse. */
  def dbTimezone(conn: java.sql.Connection,
      sql: String = OracleDbTimezoneSql): java.time.ZoneOffset = {
    val st = conn.createStatement()
    val tzData =
      try {
        val rs = st.executeQuery(sql)
        require(rs.next(), s"timezone query returned no rows: $sql")
        rs.getString(1).trim
      } finally st.close()
    try java.time.ZoneId.of(tzData).getRules
      .getOffset(java.time.Instant.now())
    catch {
      case scala.util.control.NonFatal(_) =>
        // bare ±H:MM forms ZoneId rejects (e.g. "+5:30")
        val neg = tzData.startsWith("-")
        val Array(h, m) = tzData.dropWhile(c => c == '+' || c == '-')
          .split(':')
        val secs = (h.trim.toInt * 3600 + m.trim.toInt * 60) *
          (if (neg) -1 else 1)
        java.time.ZoneOffset.ofTotalSeconds(secs)
    }
  }

  /** `to_db_timezone` analog: render an instant in the DB's zone. */
  def toDbTimezone(at: java.time.Instant, conn: java.sql.Connection,
      sql: String = OracleDbTimezoneSql): java.time.OffsetDateTime =
    at.atOffset(dbTimezone(conn, sql))
}
