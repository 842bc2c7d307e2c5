package graft.ext

import java.sql.Timestamp

import graft.SparkFunSuite

class FunnelSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stage ordering is strict: same-ts and earlier events don't advance") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:05:00"), "click"),
      (1L, ts("2024-01-01 10:10:00"), "purchase"),
      // user 2: click BEFORE view → stalls at view
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // user 3: click at the SAME instant as view (strict > → no advance)
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (3L, ts("2024-01-01 10:00:00"), "click"),
      // user 4: never views
      (4L, ts("2024-01-01 10:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversion(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 3L, "click" -> 1L, "purchase" -> 1L))
  }

  test("first-touch attribution: the EARLIEST stage arrival anchors the next") {
    val ev = Seq(
      // earliest view 09:00; the 08:00 click precedes it, the 09:30 one counts
      (1L, ts("2024-01-01 08:00:00"), "click"),
      (1L, ts("2024-01-01 09:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "view"),
      (1L, ts("2024-01-01 09:30:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.conversion(ev, "user_id", "ts", "event_type",
        Seq("view", "click")).as[(String, Long)].collect().toMap
    assert(got == Map("view" -> 1L, "click" -> 1L))
  }
}
