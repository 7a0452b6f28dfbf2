package graft.operators

import graft.Tables
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance jobs a 100 TB parquet lake runs continuously:
  * small-file compaction (the OPTIMIZE half) and the multi-dimensional
  * z-order file writer (the clustering half [[ZOrder.zorderLayout]]'s
  * doc promises). Neither has a SQL form — both are file-system
  * effects — so both are spec-verified (MaintenanceSpec) rather than
  * oracle rows, the same treatment as §2.1's job-level movement.
  *
  * The reference's analog is the dump-file set itself: PARALLEL picks
  * the file count at export time (directives.py:161-188 via
  * `%U` templates) and nothing ever revisits the layout. A lake that
  * ingests continuously accretes stragglers (streaming micro-batches,
  * small partitions after a selective transform) and pays for them on
  * EVERY subsequent scan in task-scheduling overhead and footer reads,
  * so the layout pass has to be a first-class operator.
  */
object Maintenance {

  /** Footprint before/after a layout rewrite. `bytesAfter` may differ
    * from `bytesBefore` on identical rows: parquet encodings (RLE,
    * dictionary) compress better over sorted/larger row groups. */
  final case class CompactStats(
      filesBefore: Int, bytesBefore: Long,
      filesAfter: Int, bytesAfter: Long)

  /** Data files directly under `dir` (skips `_SUCCESS`/`.crc`). */
  private def dataFiles(spark: SparkSession,
      dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Small-file compaction: rewrite `inDir` into
    * ceil(totalBytes / targetFileBytes) evenly-sized files at
    * `outDir`.
    *
    * The file count is derived from the MEASURED on-disk byte total —
    * never a row count (row width varies by 100× across tables) and
    * never a fixed constant (the sin that causes the small-file
    * problem in the first place). Round-robin `repartition(n)` is
    * deliberate: it is the only repartitioning that guarantees even
    * output sizes regardless of key skew, and compaction has no key
    * to preserve — a keyed layout rewrite is [[writeZOrderedOrders]]'s
    * job. The cost is one full shuffle of the data being compacted,
    * which is also what bounds it at scale: a production run compacts
    * per partition-directory (each an independent, bounded job), not
    * the whole table at once.
    *
    * Writes to a fresh `outDir` rather than in place: readers of
    * `inDir` are never exposed to a half-written directory, and the
    * caller swaps paths (or retargets its catalog entry) only after
    * this returns — the same publish-after-complete discipline as the
    * dump-set sidecar (`job/Job.scala` WriteMetaData).
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): CompactStats = {
    require(targetFileBytes > 0, s"targetFileBytes: $targetFileBytes")
    val before = dataFiles(spark, inDir)
    require(before.nonEmpty, s"no data files under $inDir")
    val totalBytes = before.map(_._2).sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val after = dataFiles(spark, outDir)
    CompactStats(before.size, totalBytes, after.size, after.map(_._2).sum)
  }

  /** The z-order FILE WRITER: lay `orders` out as `files` parquet
    * files, each covering one contiguous range of the Morton curve
    * over (o_custkey, order day), so every file's footer min/max
    * covers a small rectangle of the key space and scans prune on
    * EITHER predicate column.
    *
    * `repartitionByRange(files, z)` is the sampled-quantile range
    * bucketing [[ZOrder.zorderLayout]]'s doc calls the production
    * writer: cut points come from a reservoir sample of z, so file
    * sizes stay even under ANY key distribution (the fixed-width
    * top-bits zgroup would starve/flood groups on skew), and each
    * output partition is a contiguous z interval by construction.
    * `sortWithinPartitions(z)` then orders rows inside each file so
    * parquet PAGE-level stats prune within the file too — it adds no
    * exchange (the range shuffle already co-located the rows).
    *
    * The scaled dims and curve key (`ck`, `dy`, `z`) ride along into
    * the files: 24 bytes/row buys pruning-diagnosable layout audits
    * (MaintenanceSpec reads them back per-file to assert rectangle
    * geometry) and incremental re-clustering (a later pass can merge
    * adjacent-in-z files without recomputing extents).
    */
  def writeZOrderedOrders(spark: SparkSession, sf: String, outDir: String,
      files: Int = 64): CompactStats = {
    require(files >= 1, s"files: $files")
    ZOrder.zAssigned(Tables.load(spark, sf, "orders"))
      .repartitionByRange(files, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    val after = dataFiles(spark, outDir)
    CompactStats(0, 0L, after.size, after.map(_._2).sum)
  }

  /** Per-file bounding-box audit of a directory written by
    * [[writeZOrderedOrders]] (or any writer that kept `ck`/`dy`):
    * one row per data file with its row count and min/max on both
    * scaled dimensions. This is exactly the information a file-skipping
    * scanner reads from parquet footers, surfaced as a DataFrame so
    * layout quality is measurable instead of asserted. */
  def fileBoxes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("dy")).as("dy_min"), max(col("dy")).as("dy_max"))
}
