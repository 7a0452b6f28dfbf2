package graft.operators

import graft.Tables
import graft.directives._
import graft.job.DataPumpJob
import graft.model.{JobState, Operation, JobMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries that exercise the Data-Pump-style job engine end-to-end —
  * the export→import round-trip chain the reference's tests build
  * (tests/test_export.py → tests/test_import.py via pytest cache), but
  * with data-level assertions: each query returns the *imported* data,
  * which must hash-match the original table per the DuckDB oracle.
  *
  * Scratch dirs: the returned DataFrames read the import target
  * LAZILY, so the dirs can't be deleted here — [[graft.TempDirs]]
  * registers each one for deletion at JVM exit, keeping bench/verify
  * sweeps /tmp-net-zero.
  */
object JobQueries {

  private def tmpDir(prefix: String): String =
    graft.TempDirs.create(prefix)

  /** EXPORT(lineitem) → dump set → IMPORT with REMAP_SCHEMA main→stage
    * and TABLE_EXISTS_ACTION=REPLACE → read back. Exercises: job
    * naming, %U parallel layout, sidecar, remap, save modes.
    */
  def roundtrip(spark: SparkSession, sf: String): DataFrame = {
    val dump = tmpDir("graft-dump")
    val tgt = tmpDir("graft-import")
    val exp = DataPumpJob(Operation.Export, JobMode.Table,
      sourceDir = sf, targetDir = dump,
      directives = Seq(IncludeTable(Seq("lineitem")), Parallel(4),
        CompressionAlgorithm("HIGH")))
      .run(spark)
    require(exp.state == JobState.Completed, s"export failed: ${exp.errors}")
    val imp = DataPumpJob(Operation.Import, JobMode.Full,
      sourceDir = dump, targetDir = tgt,
      directives = Seq(RemapSchema("main", "stage"),
        TableExistsAction("REPLACE"), Parallel(2), DeleteFiles()))
      .run(spark)
    require(imp.state == JobState.Completed, s"import failed: ${imp.errors}")
    spark.read.parquet(s"$tgt/stage/lineitem")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
  }

  /** TABLE_EXISTS_ACTION=APPEND: two export passes into one target ⇒
    * doubled rows (oracle: lineitem UNION ALL lineitem). */
  def appendSemantics(spark: SparkSession, sf: String): DataFrame = {
    val tgt = tmpDir("graft-append")
    val dirs = Seq(IncludeTable(Seq("nation")), TableExistsAction("APPEND"))
    val job = DataPumpJob(Operation.Export, JobMode.Table,
      sourceDir = sf, targetDir = tgt, directives = dirs)
    require(job.run(spark).state == JobState.Completed)
    require(job.run(spark).state == JobState.Completed)
    spark.read.parquet(s"$tgt/main/nation").orderBy(col("n_nationkey"))
  }

  /** TABLE_EXISTS_ACTION=SKIP (SaveMode.Ignore): second pass is a
    * no-op ⇒ single copy survives. */
  def skipSemantics(spark: SparkSession, sf: String): DataFrame = {
    val tgt = tmpDir("graft-skip")
    val job = DataPumpJob(Operation.Export, JobMode.Table,
      sourceDir = sf, targetDir = tgt,
      directives = Seq(IncludeTable(Seq("nation")), TableExistsAction("SKIP")))
    require(job.run(spark).state == JobState.Completed)
    val second = job.run(spark)
    require(second.objects.forall(_.state == "SKIPPED"),
      s"expected SKIPPED, got ${second.objects}")
    spark.read.parquet(s"$tgt/main/nation").orderBy(col("n_nationkey"))
  }

  /** ESTIMATE_ONLY (directives.py:304-305): move nothing, report
    * size — surfaced as the row-count estimate the planner's stats
    * feed. The oracle is a plain COUNT(*). */
  def estimateOnly(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "lineitem")
      .agg(count(lit(1)).as("n_rows"))

  /** REMAP_SCHEMA as a standalone driver row (SURVEY.md §2.3 "same
    * rows, new table identity"): export region, import it under a
    * remapped schema, and return the rows WITH the new identity read
    * back from the physical layout (`input_file_name`), not a
    * literal — if the remap didn't rewrite the namespace, the
    * schema_name column reads the source schema and the oracle hash
    * fails. */
  def remapSchema(spark: SparkSession, sf: String): DataFrame = {
    val dump = tmpDir("graft-remap-dump")
    val tgt = tmpDir("graft-remap-import")
    val exp = DataPumpJob(Operation.Export, JobMode.Table,
      sourceDir = sf, targetDir = dump,
      directives = Seq(IncludeTable(Seq("region"))))
      .run(spark)
    require(exp.state == JobState.Completed, s"export failed: ${exp.errors}")
    val imp = DataPumpJob(Operation.Import, JobMode.Full,
      sourceDir = dump, targetDir = tgt,
      directives = Seq(RemapSchema("main", "archive")))
      .run(spark)
    require(imp.state == JobState.Completed, s"import failed: ${imp.errors}")
    spark.read.parquet(s"$tgt/archive/region")
      .withColumn("schema_name",
        regexp_extract(input_file_name(), "/([^/]+)/region/", 1))
      .select(col("schema_name"), col("r_regionkey"), col("r_name"))
      .orderBy(col("r_regionkey"))
  }

  /** REMAP_DATA analog (column-level rewrite on the way in —
    * SURVEY.md §2.3 "Column remap"): anonymize customer names keyed by
    * the row identity. */
  def remapData(spark: SparkSession, sf: String): DataFrame =
    Tables.load(spark, sf, "customer")
      .select(col("c_custkey"),
        concat(lit("ANON-"), col("c_custkey").cast("string")).as("c_name"),
        col("c_mktsegment"))
      .orderBy(col("c_custkey"))
}
