package graft

import graft.operators.{Events, PartitionPruning}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Dynamic partition pruning, asserted from the executed plan and its
  * scan metrics — the claim is the ACCESS PATH (7 of 30 partitions
  * read), the values being pinned separately by the driver oracle. */
class DppSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("fact scan carries a dynamicpruning filter and reads 7 of 30 partitions") {
    val df = PartitionPruning.dppWeekStats(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val executed = df.queryExecution.executedPlan
    val plan = executed.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamic pruning subquery in the fact scan:\n$plan")
    // the partitioned fact scan is the leaf whose PartitionFilters
    // carry the runtime subquery; its metrics record what was read.
    // AQE wraps materialized stages in QueryStageExec leaves, so the
    // traversal must descend into each stage's inner plan.
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = {
      val direct = p.collect { case s: FileSourceScanExec => s }
      val stages = p.collect {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q }
      direct ++ stages.flatMap(q => allScans(q.plan))
    }
    val scans = allScans(executed match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
    val fact = scans.find(_.toString.contains("dynamicpruning"))
    assert(fact.nonEmpty, s"no scan with dynamicpruning:\n$plan")
    val partsRead = fact.get.metrics.get("numPartitions").map(_.value)
    assert(partsRead.contains(7L),
      s"expected 7 partitions read, metrics=${fact.get.metrics.view
        .mapValues(_.value).toMap}")
  }

  test("pruned-path values equal the plain WHERE filter") {
    val got = PartitionPruning.dppWeekStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val e = Events.load(spark, sf)
    val minDate = e.agg(min(to_date(col("ts")))).head().getDate(0)
    val cutoff = java.sql.Date.valueOf(minDate.toLocalDate.plusDays(7))
    val want = e.filter(to_date(col("ts")) < lit(cutoff))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy(col("event_type")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == want.toSeq)
  }
}
