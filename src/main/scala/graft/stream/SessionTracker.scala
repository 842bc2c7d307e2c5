package graft.stream

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Custom streaming state via flatMapGroupsWithState (SURVEY.md §2b X6,
  * the "custom state" tier beyond built-in windows).
  *
  * Tracks a running per-user activity summary across micro-batches:
  * total events, total value, and the latest event time — state the
  * built-in aggregations could also express, kept intentionally simple
  * so the mechanics (state schema, timeout handling, incremental
  * emission) are the demonstration. Real pipelines put arbitrary
  * session machines here.
  *
  * Scale: state lives in the state store, partitioned by user key —
  * memory per key is O(1) (three numbers), so state size grows with
  * distinct users, not events.
  */
object SessionTracker {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class UserState(nEvents: Long, totalValue: Double, lastTs: Long)
  case class UserSummary(user_id: Long, n_events: Long, total_value: Double, last_ts: Timestamp)

  def track(spark: SparkSession, events: Dataset[Event]): Dataset[UserSummary] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          var n = prev.nEvents
          var total = prev.totalValue
          var last = prev.lastTs
          batch.foreach { e =>
            n += 1
            total += e.value
            if (e.ts.getTime > last) last = e.ts.getTime
          }
          val next = UserState(n, total, last)
          state.update(next)
          Iterator.single(UserSummary(userId, n, math.round(total * 100).toDouble / 100,
            new Timestamp(last)))
      }
  }
}
