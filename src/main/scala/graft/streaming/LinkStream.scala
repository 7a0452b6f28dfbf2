package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Dedup, Linkage}

/** q_entity_resolution's STREAMING twin — incremental record linkage
  * at ingest: the clean registry lands as delivery 0, a second
  * system's dirty feed as delivery 1 (the multi-dump import scenario
  * the batch operator's doc describes), and each micro-batch links
  * INCREMENTALLY — within itself, and against the accumulated record
  * index — inside foreachBatch. Matched edges append to an edge
  * store; the final cluster assignment runs once over (all records,
  * all edges) through the SAME `Linkage.resolve` / `clustersFrom`
  * path as the batch twin, so the output and DuckDB oracle are
  * shared row-for-row.
  *
  * Edge completeness under incremental blocking: a pair (x, y) with
  * x delivered no later than y is emitted exactly when y's batch
  * probes — within-batch if they co-arrive, batch-vs-index otherwise
  * — so the union over batches equals the batch twin's one-shot pair
  * set, and connected components is edge-order-insensitive. This is
  * the linkage analog of [[DocStream.nearDupViaStream]]'s grow-only
  * index: per-delivery cost is (batch × index) through one blocking
  * equality join, never a corpus re-scan.
  *
  * The terminal CC pass is deliberately OUTSIDE the stream: cluster
  * ids are global minima, so any per-batch assignment could be
  * invalidated by a later merge (A~B arriving after B was labeled).
  * A production variant that must serve ids mid-stream re-labels
  * affected components per batch from the same edge store — the
  * index/edge mechanics here are exactly that design's state.
  */
object LinkStream {

  private val RecordSchema = StructType(Seq(
    StructField("entity_id", LongType),
    StructField("name", StringType),
    StructField("nat", LongType),
    StructField("bal", LongType),
    StructField("kind", StringType)))

  /** `restart = true` swaps in
    * [[DeliveryHarness.runTwoDeliveriesWithRestart]]: the query STOPS
    * after the registry delivery and a fresh incarnation recovers the
    * dirty feed from the checkpoint — the output must be bit-identical
    * (spec-pinned), proving the linkage state (record index + edge
    * store) lives entirely in storage, not in query memory. */
  def entityResolutionViaStream(spark: SparkSession, sf: String,
      restart: Boolean = false): DataFrame = {
    val (indexDir, edgeDir) = runStream(spark, sf, restart)
    resolveFrom(spark, indexDir, edgeDir)
  }

  /** Run the two-delivery linkage stream and return its storage-
    * resident state dirs `(indexDir, edgeDir)` — package-visible so
    * the compaction receipt (StreamingSpec) can measure and rewrite
    * the state between stream end and terminal resolution. */
  private[graft] def runStream(spark: SparkSession, sf: String,
      restart: Boolean = false): (String, String) = {
    val root = graft.TempDirs.create("graft-linkstream")
    val indexDir = s"$root/index"
    val edgeDir = s"$root/edges"
    // batch 0 probes the index before anything has written it — the
    // empty dir must exist for the schema-pinned read
    val idxPath = new org.apache.hadoop.fs.Path(indexDir)
    idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(idxPath)

    val recs = Linkage.records(spark, sf)
    val run: (SparkSession, String, DataFrame, DataFrame, StructType,
      (DataFrame, Long) => Unit) => Unit =
      if (restart)
        DeliveryHarness.runTwoDeliveriesWithRestart(_, _, _, _, _, _)
      else DeliveryHarness.runTwoDeliveries
    run(spark, root,
      recs.filter(col("kind") === "orig"),
      recs.filter(col("kind") =!= "orig"), RecordSchema,
      { (batch: DataFrame, batchId: Long) =>
        // the batch frame feeds three joins below — pin it or the
        // landing file re-reads per consumer
        val b = batch.persist()
        val idx = spark.read.schema(RecordSchema)
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet").parquet(indexDir)
        // the skew guard's census must cover the full ACCUMULATED
        // record set, not the slice each call happens to hold —
        // otherwise a capped run would purge different blocks than
        // the batch twin (a delivery's two records look innocent
        // even when their block is giant)
        val accumulated = Some(b.unionByName(idx))
        val edges = Linkage.matchedPairs(b, b, accumulated)
          .unionByName(Linkage.matchedPairs(b, idx, accumulated))
        // batchId-keyed overwrite, not append: a retried micro-batch
        // re-writes its own subdirs (the foreachBatch exactly-once
        // contract is ours to provide)
        edges.write.mode("overwrite").parquet(s"$edgeDir/batch-$batchId")
        b.write.mode("overwrite").parquet(s"$indexDir/batch-$batchId")
        b.unpersist()
        ()
      })

    (indexDir, edgeDir)
  }

  private val EdgeSchema = StructType(Seq(
    StructField("doc_a", LongType), StructField("doc_b", LongType)))

  private def readState(spark: SparkSession, dir: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.parquet").parquet(dir)

  /** Terminal cluster assembly over the accumulated state dirs. */
  private[graft] def resolveFrom(spark: SparkSession, indexDir: String,
      edgeDir: String): DataFrame = {
    val allRecs = readState(spark, indexDir, RecordSchema)
    val allEdges = readState(spark, edgeDir, EdgeSchema)
    // terminal cap gate: a block can outgrow the cap after earlier
    // deliveries already emitted its edges — the final census decides
    Linkage.resolve(allRecs, Linkage.enforceBlockCap(allRecs, allEdges))
  }

  /** State COMPACTION for the grow-only record index and edge store:
    * each delivery appends a `batch-N` subtree of micro-batch-sized
    * parquet files, so after N deliveries every index probe pays N×
    * file-listing + footer overhead — the same small-file accretion
    * [[graft.operators.Maintenance.compact]] exists for, applied to
    * streaming state. Rewrites the accumulated state into
    * size-targeted files under `batch--compacted` (the `--` keeps the
    * name disjoint from any real batch id) and DELETES the consumed
    * subtrees only after the rewrite is fully published — a probe
    * racing the swap sees duplicated records at worst, and the index
    * probe's edge emission is duplicate-insensitive
    * (`matchedPairs` ends in `.distinct()`).
    *
    * The next micro-batch keeps appending `batch-N` subtrees beside
    * the compacted file — compaction is a recurring maintenance pass,
    * not a terminal step. Returns (filesBefore, filesAfter) for the
    * receipt. */
  private[graft] def compactState(spark: SparkSession, dir: String,
      schema: StructType, targetFileBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetCount(): Int = {
      val it = fs.listFiles(p, true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .count(_.getPath.getName.endsWith(".parquet"))
    }
    val before = parquetCount()
    // snapshot the consumed subtrees FIRST: a micro-batch landing a
    // new batch-N while the rewrite runs is neither read nor deleted —
    // it simply survives into the next compaction pass
    val consumed = fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch-"))
      .map(_.getPath)
    val src = readState(spark, dir, schema)
    val totalBytes = {
      val it = fs.listFiles(p, true)
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).sum
    }
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
    // (rename is atomic per dir) before any consumed subtree goes away
    fs.rename(tmp, new Path(p, s"batch--compacted-$pass"))
    consumed.foreach(d => fs.delete(d, true))
    (before, parquetCount())
  }

  private[graft] def compactLinkageState(spark: SparkSession,
      indexDir: String, edgeDir: String,
      targetFileBytes: Long = 128L << 20): ((Int, Int), (Int, Int)) =
    (compactState(spark, indexDir, RecordSchema, targetFileBytes),
      compactState(spark, edgeDir, EdgeSchema, targetFileBytes))
}
