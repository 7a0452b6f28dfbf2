package graft

import graft.operators.{IndexStore, Similarity, Text}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persist-and-serve contract for trained index/model artifacts:
  * save → (simulated fresh session: trainer memos dropped) → load →
  * the loaded artifact is bit-identical to the trained one and a
  * query served from it equals train-in-place row-for-row.
  */
class IndexStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("IVF centroids: save -> drop memo -> load is bit-identical; served query matches train-in-place") {
    val trained = Similarity.centroidsFor(spark, sf)
    val inPlace = Similarity.annIvf(spark, sf).collect()
      .map(_.toSeq.toList).toSeq

    val root = TempDirs.create("graft-ivfstore-spec")
    val v = IndexStore.saveIvf(spark, sf, root)
    // fresh-session simulation: nothing may flow from training to
    // serving except the artifact bytes
    Similarity.clearCentroidCache()
    val loaded = IndexStore.loadIvfCentroids(spark, root, Some(v))
    assert(loaded == trained, "centroid round-trip not bit-identical")

    Similarity.clearCentroidCache()
    val served = Similarity.annIvfSaved(spark, sf).collect()
      .map(_.toSeq.toList).toSeq
    assert(served.nonEmpty && served == inPlace,
      "query served from the loaded artifact diverged from train-in-place")
  }

  test("IVF artifact versions are immutable: a retrain publishes v+1, the pinned v1 still serves the old index") {
    val root = TempDirs.create("graft-ivfstore-versions")
    val v1 = IndexStore.saveIvf(spark, sf, root)
    val first = IndexStore.loadIvfCentroids(spark, root, Some(v1))
    val v2 = IndexStore.saveIvf(spark, sf, root)
    assert(v2 == v1 + 1, s"versions not monotone: $v1 -> $v2")
    // same corpus → same deterministic trainer → same artifact; the
    // pin proves the LEDGER resolves, immutability proves the bytes
    assert(IndexStore.loadIvfCentroids(spark, root, Some(v1)) == first)
    assert(IndexStore.loadIvfCentroids(spark, root, None) == first,
      "latest-version resolution diverged")
  }

  test("PQ codebooks and SQ grid round-trip bit-identically through the store") {
    val books = Similarity.pqCodebooksFor(spark, sf)
    val rootPq = TempDirs.create("graft-pqstore-spec")
    val vPq = IndexStore.savePq(spark, sf, rootPq)
    Similarity.clearPqCache()
    assert(IndexStore.loadPqCodebooks(spark, rootPq, Some(vPq)) == books,
      "PQ codebook round-trip not bit-identical")

    val grid = Similarity.sqGridFor(spark, sf)
    val rootSq = TempDirs.create("graft-sqstore-spec")
    val vSq = IndexStore.saveSq(spark, sf, rootSq)
    Similarity.clearSqGridCache()
    assert(IndexStore.loadSqGrid(spark, rootSq, Some(vSq)) == grid,
      "SQ grid round-trip not bit-identical")
  }

  test("NB model: holdout scored against the loaded artifact equals the in-place classifier") {
    val root = TempDirs.create("graft-nbstore-spec")
    val v = IndexStore.saveNb(spark, sf, root)
    val (classes, counts) = IndexStore.loadNb(spark, root, Some(v))
    val held = Text.nbTokenized(Tables.load(spark, sf, "documents"))
      .filter(expr(Text.NbHoldoutExpr))
    val served = Text.nbScore(held, classes.persist(), counts.persist())
      .orderBy(col("doc_id")).collect().map(_.toSeq.toList).toSeq
    val inPlace = Text.nbClassify(spark, sf)
      .collect().map(_.toSeq.toList).toSeq
    assert(served.nonEmpty && served == inPlace,
      "scoring from the loaded NB artifact diverged")
  }
}
