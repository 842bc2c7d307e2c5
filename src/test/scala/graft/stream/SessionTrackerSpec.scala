package graft.stream

import graft.SparkFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class SessionTrackerSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("flatMapGroupsWithState carries per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionTracker.Event]
    val q = SessionTracker.track(spark, input.toDS())
      .writeStream.format("memory").queryName("tracker")
      .outputMode("update").start()
    try {
      input.addData(
        SessionTracker.Event(1L, ts("2024-01-01 10:00:00"), 5.0),
        SessionTracker.Event(1L, ts("2024-01-01 10:05:00"), 7.0),
        SessionTracker.Event(2L, ts("2024-01-01 10:00:00"), 1.0))
      q.processAllAvailable()
      input.addData(
        SessionTracker.Event(1L, ts("2024-01-01 10:10:00"), 3.0))
      q.processAllAvailable()

      // latest emitted summary per user reflects cumulative state
      val out = spark.table("tracker")
      val latest = out.groupBy("user_id")
        .agg(max(struct(col("n_events"), col("total_value"))).as("s"))
        .select(col("user_id"), col("s.n_events"), col("s.total_value"))
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
      assert(latest(1L) == ((3L, 15.0))) // 2 events batch1 + 1 event batch2
      assert(latest(2L) == ((1L, 1.0)))
    } finally q.stop()
  }
}
