package graft.stream

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig}

import SessionClose.{Closed, Event, Open}

/** The SAME session-close state machine as [[SessionClose]], on Spark
  * 4's `transformWithState` API (`StatefulProcessor` + typed
  * `ValueState` + explicit event-time TIMERS) — the successor to
  * `flatMapGroupsWithState` and the API new stateful pipelines should
  * target. Implementing the identical semantics on both tiers and
  * certifying them under the SAME DuckDB oracle is the point: the
  * round-10 query `events_session_tws_stream` must emit byte-identical
  * sessions to `events_session_timeout_stream`.
  *
  * What the new API changes operationally, all exercised here:
  *  - state is named and typed (`getValueState("session", …)`) instead
  *    of one opaque blob, so schema evolution is per-variable;
  *  - timeouts are first-class TIMERS (`registerTimer`/`deleteTimer`/
  *    `listTimers`), many per key if wanted, fired via
  *    `handleExpiredTimer` when the watermark passes them — the same
  *    floored-millisecond strict-`<` arithmetic the oracle mirrors;
  *  - the operator REQUIRES the RocksDB state store provider, so this
  *    query is also the second RocksDB certification.
  *
  * Scale shape identical to [[SessionClose]]: one open session + one
  * timer per active user, pruned as the watermark advances.
  */
object SessionCloseTws {

  private class SessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, Event, Closed] {
    private val gapUs = gapMinutes * 60L * 1000000L
    private val gapMs = gapMinutes * 60L * 1000L

    @transient private var session: org.apache.spark.sql.streaming.ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[Open](
        "session", Encoders.product[Open], TTLConfig.NONE)

    private def toMicros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    private def fromMicros(us: Long): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    private def emit(userId: Long, s: Open): Closed =
      Closed(fromMicros(s.startUs), userId, s.nEvents,
        math.round(s.sumValue * 100).toDouble / 100)

    override def handleInputRows(
        userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Closed] = {
      val sorted = rows.toIndexedSeq.sortBy(e => toMicros(e.ts))
      var closed = List.empty[Closed]
      var cur = if (session.exists()) Some(session.get()) else None
      sorted.foreach { e =>
        val us = toMicros(e.ts)
        cur = cur match {
          case Some(s) if us - s.lastUs > gapUs =>
            closed ::= emit(userId, s)
            Some(Open(us, us, 1L, e.value))
          case Some(s) =>
            Some(Open(s.startUs, math.max(s.lastUs, us),
              s.nEvents + 1, s.sumValue + e.value))
          case None =>
            Some(Open(us, us, 1L, e.value))
        }
      }
      val s = cur.get
      session.update(s)
      // one live timer per key: drop whatever was scheduled for the
      // superseded session end, then arm the new close time (same
      // max-guard as SessionClose — ordered sources never hit it)
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(math.max(
        Math.floorDiv(s.lastUs, 1000L) + gapMs,
        timerValues.getCurrentWatermarkInMs() + 1))
      closed.reverse.iterator
    }

    override def handleExpiredTimer(
        userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Closed] = {
      // watermark passed session end + gap: final emission, state freed
      if (session.exists()) {
        val s = session.get()
        session.clear()
        Iterator.single(emit(userId, s))
      } else Iterator.empty
    }
  }

  /** `events` must carry a watermark on `ts`; requires the RocksDB
    * state store provider (a transformWithState constraint).
    */
  def close(events: Dataset[Event], gapMinutes: Int): Dataset[Closed] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState[Closed](new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Update())
  }
}
