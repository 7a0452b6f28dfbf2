package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed range join must produce EXACTLY the naive theta-join
  * pair set (no duplicates from intervals spanning several buckets, no
  * boundary drift at bucket edges) while planning as an equality join.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def naive(points: Seq[Long],
      intervals: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      p <- points
      (id, s, e) <- intervals
      if p >= s && p < e
    } yield (p, id)).toSet

  test("bucketed range join equals the theta join, duplicate-free") {
    import spark.implicits._
    // boundary-heavy fixture: points at bucket edges, intervals that
    // span 1..5 buckets, a zero-length interval, an interval ending
    // exactly on a point (half-open: excluded)
    val points = Seq(0L, 9L, 10L, 11L, 19L, 20L, 35L, 99L, 100L)
    val intervals = Seq( // (id, start, end)
      (1L, 0L, 10L), (2L, 10L, 20L), (3L, 5L, 47L), (4L, 35L, 35L),
      (5L, 20L, 21L), (6L, 0L, 101L), (7L, 99L, 100L))
    for (width <- Seq(1L, 7L, 10L, 64L)) {
      val got = RangeJoin.rangeJoin(
          points.toDF("p"), intervals.toDF("id", "s", "e"),
          "p", "s", "e", width)
        .select(col("p"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.toSet.size, s"duplicates at width $width")
      assert(got.toSet == naive(points, intervals.map(t => (t._1, t._2, t._3))),
        s"pair set mismatch at width $width")
    }
  }

  test("bucketed range join equals the theta join on seeded random workloads") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 5) {
      val points = Seq.fill(200)(rnd.nextInt(1000).toLong)
      val intervals = (1 to 80).map { id =>
        val s = rnd.nextInt(1000).toLong
        // mix of empty, short, and bucket-spanning intervals
        (id.toLong, s, s + rnd.nextInt(120) - 10)
      }
      val width = Seq(3L, 10L, 37L, 100L)(rnd.nextInt(4))
      val got = RangeJoin.rangeJoin(
          points.toDF("p"), intervals.toDF("id", "s", "e"),
          "p", "s", "e", width)
        .select(col("p"), col("id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // multiset equality: duplicate point values must pair
      // independently, and no (point-row, interval) pair may duplicate
      val naivePairs = for {
        p <- points; (id, s, e) <- intervals if p >= s && p < e
      } yield (p, id)
      assert(got.sorted.sameElements(naivePairs.sorted),
        s"trial $trial width $width")
    }
  }

  test("range join fails loudly on negative-domain inputs and respects caller __bucket columns") {
    import spark.implicits._
    val points = Seq(5L, -3L).toDF("p")
    val intervals = Seq((0L, 10L)).toDF("s", "e")
    // negative point → raise_error, not a silent miss (div truncation
    // toward zero only equals floor division on the non-negative domain)
    val ex = intercept[Exception] {
      RangeJoin.rangeJoin(points, intervals, "p", "s", "e", 4L).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("non-negative"),
      ex.toString)
    // a caller column literally named __bucket survives untouched
    val p2 = Seq((5L, 42L)).toDF("p", "__bucket")
    val got = RangeJoin.rangeJoin(p2, intervals, "p", "s", "e", 4L).collect()
    assert(got.length == 1 &&
      got.head.getLong(got.head.fieldIndex("__bucket")) == 42L)
  }

  test("range join plans as an equality join, not a nested loop") {
    val df = RangeJoin.intervalJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("interval join matches the naive theta join and keeps zero-match orders") {
    val got = RangeJoin.intervalJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val orders = Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        expr("unix_date(cast(o_orderdate as date))")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val ships = Tables.load(spark, sf, "lineitem")
      .select(expr("unix_date(cast(l_shipdate as date))")).collect()
      .map(_.getInt(0).toLong).sorted
    assert(got.length == orders.length) // one row per order, zero-matches kept
    val expect = orders.map { case (k, d) =>
      k -> ships.count(s => s >= d && s < d + 7).toLong
    }.toMap
    got.foreach { case (k, _, n) => assert(n == expect(k), s"order $k") }
  }
}
