package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central access to the driver-generated TPC-H-ish testdata tables.
  *
  * In production these reads would target JDBC/object-store sources (the
  * reference streams Oracle segments via DBMS_DATAPUMP; see
  * /root/reference/src/oracledb_datapump/commands.py:41-119); the harness
  * reads the snapshot parquet dirs. All readers go through here so
  * source-level concerns (schema pinning, column pruning, future format
  * swaps) live in one place.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Path of a table's parquet inside a scale-factor dir. */
  def path(sfDir: String, name: String): String = {
    val dir = if (sfDir.endsWith("/")) sfDir.dropRight(1) else sfDir
    s"$dir/$name.parquet"
  }

  /** Read one table. Parquet scans get predicate pushdown + column
    * pruning from Catalyst for free; nothing is cached here so each
    * query plans its own pruned scan.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(path(sfDir, name))
}
