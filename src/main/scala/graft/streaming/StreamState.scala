package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Storage-resident streaming state shared by every persistent-index
  * twin ([[LinkStream]]'s record/edge stores, [[DocStream]]'s LSH band
  * index and winnow fingerprint index): per-delivery `batch-N`
  * subtrees of parquet files, plus the recurring COMPACTION pass that
  * keeps a long ingest's probe cost flat.
  */
object StreamState {

  /** Schema-pinned recursive read of a grow-only state dir. Extra
    * physical columns in older files are simply not read (parquet
    * column pruning), so adding a column to a store's schema stays
    * backward-compatible with pre-existing subtrees. */
  private[streaming] def readState(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet").parquet(dir)

  /** State COMPACTION for a grow-only store: each delivery appends a
    * `batch-N` subtree of micro-batch-sized parquet files, so after N
    * deliveries every index probe pays N× file-listing + footer
    * overhead — the same small-file accretion
    * [[graft.operators.Maintenance.compact]] exists for, applied to
    * streaming state. Rewrites the accumulated state into
    * size-targeted files under `batch--compacted-<pass>` (the `--`
    * keeps the name disjoint from any real batch id) and DELETES the
    * consumed subtrees only after the rewrite is fully published, so
    * no row is ever absent. A probe racing the swap can see rows
    * DUPLICATED (old tree + compacted copy); linkage tolerates that
    * outright (`matchedPairs` ends in `.distinct()`), while the
    * dedup/winnow probes count per-(doc, partner) rows, so callers
    * run compaction BETWEEN deliveries (the foreachBatch body is the
    * natural slot — nothing probes while it runs), never concurrently
    * with one.
    *
    * Rows are rewritten verbatim — including any `batch_id` lineage
    * column — so the retry-idempotence filter (`batch_id < current`)
    * survives compaction unchanged. Callers that compact INSIDE a
    * foreachBatch body pass their own subtree name as
    * `excludeSubdir`: a micro-batch retried after compaction already
    * ran (crash between index write and checkpoint commit) would
    * otherwise find its first attempt's rows folded into the
    * compacted copy, re-create `batch-N` on the retry's
    * mode-overwrite, and leave batch N's rows DUPLICATED for every
    * later probe — excluding the current batch's subtree keeps the
    * own-subdir overwrite idempotent through the whole crash window.
    *
    * The next micro-batch keeps appending `batch-N` subtrees beside
    * the compacted file — compaction is a recurring maintenance pass,
    * not a terminal step. Returns (filesBefore, filesAfter) for the
    * receipt. */
  /** TIERED consumption (r18, the LSM/size-tiered posture): with
    * `maxCompactedTrees = 1` (the default — every pre-r18 caller's
    * exact behavior) each pass consumes EVERYTHING, previous
    * compacted output included, so a long ingest rewrites the whole
    * accumulated store once per pass — O(N²) bytes over N deliveries.
    * A caller that compacts once per delivery (the long-ingest
    * compact twins) passes a higher bound: raw `batch-N` subtrees are
    * always consumed (the small-file accretion compaction exists
    * for), but prior `batch--compacted-*` trees are left in place —
    * already size-targeted, nothing to gain from re-copying them —
    * until their COUNT reaches the bound, at which point one pass
    * folds them all (the tier merge), so probe-side file count stays
    * bounded by `maxCompactedTrees + in-flight batches` while total
    * rewrite volume drops from O(N²) to O(N) per ingest. Pure layout
    * policy: visibility rides the stored `batch_id` column and every
    * row is still rewritten verbatim exactly once per fold, so output
    * is bit-identical for any bound (spec-pinned). */
  private[graft] def compactState(spark: SparkSession, dir: String,
      schema: StructType, targetFileBytes: Long = 128L << 20,
      excludeSubdir: Option[String] = None,
      maxCompactedTrees: Int = 1): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a store that has never been written (edge dir before the first
    // delivery lands) has nothing to compact
    if (!fs.exists(p)) return (0, 0)
    def parquetCount(): Int = {
      val it = fs.listFiles(p, true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .count(_.getPath.getName.endsWith(".parquet"))
    }
    val before = parquetCount()
    // snapshot the consumed subtrees FIRST: a micro-batch landing a
    // new batch-N while the rewrite runs is neither read nor deleted —
    // it simply survives into the next compaction pass
    val all = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-") &&
        !excludeSubdir.contains(s.getPath.getName))
      .map(_.getPath)
    val (compactedTrees, rawTrees) =
      all.partition(_.getName.startsWith("batch--compacted-"))
    val consumed =
      if (compactedTrees.size >= maxCompactedTrees) all
      else rawTrees
    if (consumed.isEmpty) return (before, before)
    // read EXACTLY the consumed subtrees (never the whole dir): an
    // excluded own-subtree or a concurrently-landing batch must not
    // be rewritten into the compacted copy while its source survives
    val src = spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet")
      .parquet(consumed.map(_.toString): _*)
    val totalBytes = consumed.map { d =>
      val it = fs.listFiles(d, true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }.sum
    val nOut = math.max(1L,
      (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    // rewrite OUTSIDE the state dir (the recursive read must never
    // race its own output), then rename in under a pass-unique name —
    // a repeated compaction reads the previous pass's subtree like any
    // other consumed batch and never overwrites a tree mid-read
    val pass = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new Path(p.getParent, s"${p.getName}-compacting-$pass")
    src.repartition(nOut).write.mode("overwrite").parquet(tmp.toString)
    // publish-before-delete: the compacted subtree lands complete
    // (rename is atomic per dir) before any consumed subtree goes away.
    // Hadoop FS rename reports some failures as `false` WITHOUT
    // throwing — deleting the consumed subtrees after a silent rename
    // failure would lose the whole compacted slice, so an unpublished
    // rewrite aborts the pass: the tmp tree is deleted here and the
    // state dir is untouched (every consumed batch survives). A crash
    // BETWEEN the failed rename and this delete leaves an inert
    // orphan OUTSIDE the state dir — it matches neither the batch-*
    // glob nor any reader's path, so it wastes bytes until manually
    // swept but can never corrupt a read.
    if (!fs.rename(tmp, new Path(p, s"batch--compacted-$pass"))) {
      scala.util.Try(fs.delete(tmp, true))
      return (before, before)
    }
    consumed.foreach(d => fs.delete(d, true))
    (before, parquetCount())
  }
}
