package graft

import graft.operators.{Maintenance, ZOrder}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-layout maintenance: small-file compaction and the z-order
  * range-bucketed writer. Both are file-system effects with no SQL
  * form, so the invariants live here rather than in the oracle
  * harness: byte-derived file counts, content preservation, and the
  * per-file bounding-box geometry that makes multi-column pruning
  * work.
  */
class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def contentEqual(aDir: String, bDir: String): Unit = {
    val a = spark.read.parquet(aDir)
    val b = spark.read.parquet(bDir).select(a.columns.map(col).toSeq: _*)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"content drift between $aDir and $bDir")
  }

  test("compaction collapses a scattered table to byte-derived file counts") {
    val in = TempDirs.create("mx-scatter")
    val out1 = TempDirs.create("mx-one")
    val out4 = TempDirs.create("mx-four")
    try {
      // a streaming-ingest-shaped mess: 32 files for ~100 KB of rows
      Tables.load(spark, sf, "orders").repartition(32)
        .write.mode("overwrite").parquet(in)
      val s1 = Maintenance.compact(spark, in, out1,
        targetFileBytes = Long.MaxValue)
      assert(s1.filesBefore == 32, s1)
      assert(s1.filesAfter == 1, s1)
      contentEqual(in, out1)
      // target = ceil(total/4) → exactly 4 evenly-sized files
      val s4 = Maintenance.compact(spark, in, out4,
        targetFileBytes = (s1.bytesBefore + 3) / 4)
      assert(s4.filesAfter == 4, s4)
      contentEqual(in, out4)
      val sizes = spark.read.parquet(out4)
        .groupBy(input_file_name()).count().collect().map(_.getLong(1))
      assert(sizes.length == 4 &&
        sizes.max.toDouble / sizes.min <= 1.2,
        s"round-robin compaction produced skewed files: ${sizes.toSeq}")
    } finally Seq(in, out1, out4).foreach(TempDirs.delete)
  }

  test("compaction preserves nested types (embedding arrays) bit-exactly") {
    val in = TempDirs.create("mx-emb-in"); val out = TempDirs.create("mx-emb-out")
    try {
      Tables.load(spark, sf, "embeddings").repartition(8)
        .write.mode("overwrite").parquet(in)
      val s = Maintenance.compact(spark, in, out,
        targetFileBytes = Long.MaxValue)
      assert(s.filesBefore == 8 && s.filesAfter == 1, s)
      contentEqual(in, out)
    } finally Seq(in, out).foreach(TempDirs.delete)
  }

  test("compaction rejects an empty source instead of writing nothing") {
    val in = TempDirs.create("mx-empty")
    try intercept[IllegalArgumentException] {
      Maintenance.compact(spark, in, in + "-out")
    } finally TempDirs.delete(in)
  }

  test("z-order writer: band predicates prune files on BOTH dimensions") {
    val zo = TempDirs.create("mx-zorder")
    val ck = TempDirs.create("mx-cksort")
    try {
      val files = 32
      Maintenance.writeZOrderedOrders(spark, sf, zo, files)
      contentEqual(Tables.path(sf, "orders"), zo)
      // baseline: the SAME rows range-written on o_custkey alone —
      // the single-column layout whose dy footer stats are useless
      Tables.load(spark, sf, "orders")
        .join(ZOrder.zorderLayout(spark, sf).select("o_orderkey", "ck", "dy"),
          Seq("o_orderkey"))
        .repartitionByRange(files, col("ck"))
        .sortWithinPartitions(col("ck"))
        .write.mode("overwrite").parquet(ck)
      // The data-skipping claim, measured the way a scanner pays it:
      // for a 10%-wide band predicate on a dimension, what fraction
      // of files have a footer [min,max] intersecting the band? (A
      // worst-case per-file span is the WRONG metric for Morton range
      // bucketing: the few files whose contiguous z interval crosses
      // a top-level quadrant boundary legitimately span wide on one
      // dim; what matters is that MOST files prune for ANY predicate
      // dimension, where a single-column sort prunes on one dim
      // perfectly and on every other dim not at all.)
      // averaged over 5 band positions so one unlucky quantile cut
      // (47-row files at this fixture scale) can't dominate
      def scanFraction(dir: String, dim: String): Double = {
        val boxes = Maintenance.fileBoxes(spark, dir).collect()
        assert(boxes.length >= files / 2, s"$dir produced ${boxes.length} files")
        val bands = Seq(0L, 13107L, 29491L, 45875L, 58982L).map(lo => (lo, lo + 6554L))
        bands.map { case (lo, hi) =>
          boxes.count(r => r.getAs[Long](s"${dim}_min") <= hi &&
            r.getAs[Long](s"${dim}_max") >= lo).toDouble / boxes.length
        }.sum / bands.length
      }
      // single-column ck sort: dy footers are useless — (almost) every
      // file intersects any dy band
      assert(scanFraction(ck, "dy") >= 0.9,
        s"baseline dy scan fraction ${scanFraction(ck, "dy")}")
      // z-order: BOTH dims prune — a 10% band touches well under
      // half the files on either dimension
      assert(scanFraction(zo, "ck") <= 0.5,
        s"z-order ck scan fraction ${scanFraction(zo, "ck")}")
      assert(scanFraction(zo, "dy") <= 0.5,
        s"z-order dy scan fraction ${scanFraction(zo, "dy")}")
    } finally Seq(zo, ck).foreach(TempDirs.delete)
  }

  test("z-order writer keeps curve keys consistent with the layout query") {
    val zo = TempDirs.create("mx-zconsist")
    try {
      Maintenance.writeZOrderedOrders(spark, sf, zo, files = 8)
      val fromFiles = spark.read.parquet(zo)
        .select("o_orderkey", "ck", "dy", "z")
      val fromQuery = ZOrder.zorderLayout(spark, sf)
        .select("o_orderkey", "ck", "dy", "z")
      assert(fromFiles.exceptAll(fromQuery).isEmpty &&
        fromQuery.exceptAll(fromFiles).isEmpty,
        "writer and layout query disagree on curve keys")
    } finally TempDirs.delete(zo)
  }
}
