package graft

import graft.operators.Events
import graft.streaming.EventStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("streaming hourly counts equal the batch hourly counts") {
    val q = EventStream.runToMemory(
      EventStream.hourlyCounts(EventStream.readEvents(spark, sf)),
      "hourly_stream")
    try {
      val streamed = spark.table("hourly_stream")
        .select(col("hour"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      val batch = Events.hourlyStats(spark, sf)
        .select(col("hour"), col("event_type"), col("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
        .toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization matches the batch session count per user") {
    import spark.implicits._
    implicit val s = spark
    val ds = EventStream.readEvents(spark, sf) // schema source
    // batch-drive the stateful operator through a streaming-compatible
    // Dataset (mapGroupsWithState also runs on batch Datasets)
    val evs = Events.load(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStream.Ev]
    val stateful = EventStream.sessionizeStateful(evs).collect()
      .map(u => u.user_id -> u.session_id).toMap
    val batch = Events.sessionize(spark, sf)
      .groupBy(col("user_id")).agg(max(col("session_id")).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stateful == batch)
  }
}
