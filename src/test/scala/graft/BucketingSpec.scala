package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout claims, asserted from executed plans — the
  * point of write-side bucketing is WHAT THE PLAN NO LONGER CONTAINS.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("bucketed fact-fact join has no Exchange and no Sort") {
    // at fixture scale the planner rightly prefers a broadcast join
    // (and drops bucketed reading with it); the claim under test is
    // the AT-SCALE path, where neither fact side fits a broadcast —
    // force it by disabling the broadcast thresholds for this test
    val conf = spark.conf
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.legacy.bucketedTableScan.outputOrdering")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoinPlan(spark, sf, buckets = 8)
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(plan.contains("SelectedBucketsCount"),
        s"scan is not bucket-aware:\n$plan")
      // Sort elimination additionally needs the read-side ordering
      // contract Spark 3 turned off by default (SPARK-28113: trusting
      // sortBy metadata requires exactly one file per bucket, which our
      // hash-aligned repartition-before-write guarantees). With it on,
      // the scan exposes the per-bucket sort order and the SMJ needs
      // neither Exchange NOR Sort.
      conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val sorted = Bucketing.bucketedJoinPlan(spark, sf, buckets = 8)
      assert(sorted.count() > 0)
      val sortedPlan = sorted.queryExecution.executedPlan.toString
      assert(!sortedPlan.contains("Exchange"), sortedPlan)
      assert(!sortedPlan.contains("Sort "),
        s"bucketed join still sorts (multiple files per bucket?):\n$sortedPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("bucketed result is value-identical to the plain parquet join") {
    val got = Bucketing.bucketedRevenue(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val li = Tables.load(spark, sf, "lineitem")
    val o = Tables.load(spark, sf, "orders")
    val want = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)) *
          (lit(1).cast(org.apache.spark.sql.types.DecimalType(18, 2)) -
            col("l_discount")
              .cast(org.apache.spark.sql.types.DecimalType(18, 2))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("o_orderpriority")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("bucket pruning: an exact-key filter reads one bucket") {
    val conf = spark.conf
    // a filter-only query carries no distribution requirement, so the
    // planner's auto-bucketed-scan heuristic turns the bucketed scan
    // (and with it, bucket pruning) off; a point-lookup workload
    // disables the heuristic to get 1/n-bucket reads
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val saved = conf.getOption(key)
    conf.set(key, "false")
    try {
      val (liName, _) = Bucketing.writeBucketed(spark, sf, buckets = 8)
      val someKey = spark.table(liName).select(col("l_orderkey"))
        .head().getLong(0)
      val pruned = spark.table(liName)
        .filter(col("l_orderkey") === someKey)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning did not engage:\n$plan")
      assert(pruned.count() > 0, "pruned read returned no rows")
    } finally saved match {
      case Some(v) => conf.set(key, v)
      case None => conf.unset(key)
    }
  }

  test("the layout memo re-writes when its tables vanish from the catalog") {
    val (li, o) = Bucketing.writeBucketed(spark, sf, buckets = 4)
    // memo hit while the tables exist — same names back
    assert(Bucketing.writeBucketed(spark, sf, buckets = 4) == (li, o))
    // simulate the session-restart shape: catalog loses the tables
    // while the JVM-level memo survives
    spark.sql(s"DROP TABLE $li")
    spark.sql(s"DROP TABLE $o")
    val (li2, o2) = Bucketing.writeBucketed(spark, sf, buckets = 4)
    assert(spark.catalog.tableExists(li2) && spark.catalog.tableExists(o2),
      "stale memo was handed out instead of a re-write")
    assert(spark.table(li2).count() > 0)
  }
}
