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
  case class UserState(nEvents: Long, totalValue: Double, lastTsMicros: Long)
  case class UserSummary(user_id: Long, n_events: Long, total_value: Double, last_ts: Timestamp)

  // State keeps event time in epoch MICROseconds: Timestamp.getTime is
  // millisecond-truncating, and the event-time column carries micros —
  // a tracker that truncates loses ordering between events inside the
  // same millisecond (caught by the fixture oracle's exact compare).
  private def toMicros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private def fromMicros(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  def track(spark: SparkSession, events: Dataset[Event]): Dataset[UserSummary] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserSummary](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0, Long.MinValue))
          var n = prev.nEvents
          var total = prev.totalValue
          var last = prev.lastTsMicros
          batch.foreach { e =>
            n += 1
            total += e.value
            val us = toMicros(e.ts)
            if (us > last) last = us
          }
          val next = UserState(n, total, last)
          state.update(next)
          Iterator.single(UserSummary(userId, n, math.round(total * 100).toDouble / 100,
            fromMicros(last)))
      }
  }
}
