package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential-funnel analysis over an event log: how many users reach
  * each stage, where reaching stage i+1 means an event of that type
  * STRICTLY AFTER the user's earliest arrival at stage i (first-touch
  * attribution).
  *
  * One shuffle keyed by user (events of other types are filtered before
  * the exchange); the per-user sequential reach times are conditional
  * window minima over the user's partition, one pass per stage with no
  * extra exchange (every Window shares the same partitioning, and the
  * final per-user collapse reuses it too). Per-user state is bounded —
  * S timestamp columns per row — and the window buffers spill to disk,
  * so a hot user (bot with millions of events) degrades to disk
  * bandwidth instead of blowing an executor heap the way a
  * collect_list-of-all-timestamps aggregation would.
  */
object Funnel {

  /** (stage, n_users) for each stage name in order. */
  def conversion(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val w = Window.partitionBy(col("u"))
    val base = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("u"), col(tsCol).as("ts"), col(typeCol).as("et"))
    // t0 = earliest stage-0 event; t(i) = earliest stage-i event strictly
    // after t(i-1). t(i-1) is constant within the user partition, so each
    // reach time is a conditional min over the same window; a missing
    // stage yields null, and `ts > null` is null, so nulls cascade.
    val withTimes = stages.zipWithIndex.foldLeft(base) { case (df, (stage, i)) =>
      val cond =
        if (i == 0) col("et") === stage
        else col("et") === stage && col("ts") > col(s"t${i - 1}")
      df.withColumn(s"t$i", min(when(cond, col("ts"))).over(w))
    }
    // collapse to one row per user (all t_i are per-user constants; the
    // groupBy reuses the window's hash partitioning — no new exchange),
    // then all stage counts in one global aggregation
    val firstAgg +: restAggs = stages.indices.map(i => max(col(s"t$i")).as(s"t$i"))
    val perUser = withTimes.groupBy(col("u")).agg(firstAgg, restAggs: _*)
    val counts = perUser.agg(
      count(col("t0")).as("n0"),
      stages.indices.tail.map(i => count(col(s"t$i")).as(s"n$i")): _*)
    counts
      .select(explode(array(stages.zipWithIndex.map { case (stage, i) =>
        struct(lit(stage).as("stage"), col(s"n$i").as("n_users"))
      }: _*)).as("x"))
      .select(col("x.stage").as("stage"), col("x.n_users").as("n_users"))
  }

  /** Cohort retention: users grouped by their first-activity day; for
    * each (cohort day, days since cohort) the number of cohort users
    * active on that offset day.
    *
    * Shuffle shape: the (user, day) dedup and the per-user cohort
    * minimum both key on user — AQE coalesces them onto one exchange
    * family — and the cohort join is user-keyed on both sides (broadcast
    * when the user dimension fits, which it never does at 100 TB, and
    * doesn't need to: both sides are already hash-partitioned by user).
    * The final rollup shuffles only (cohort_day, day_n) pre-aggregated
    * pairs. Per-user state is one date — no skew risk from hot users
    * because the distinct collapses their events first.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val days = events
      .select(col(userCol).as("u"), date_trunc("day", col(tsCol)).as("day"))
      .distinct()
    val cohorts = days.groupBy(col("u")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "u")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_n"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Rolling `windowDays`-day active-user counts (the DAU/WAU/MAU
    * family): for each report day, the distinct users active in the
    * trailing window ending that day.
    *
    * Shape: NOT a self-join of the day grid against the event log (the
    * naive range join) — each distinct (user, day) row is exploded
    * map-side to the `windowDays` report days it contributes to, then
    * one distinct aggregation per report day. The multiply-by-window
    * fan-out is the same contract as sliding event windows; report days
    * up to windowDays−1 past the last event are emitted (their windows
    * still contain activity), which keeps the plan free of a
    * max-day bound join.
    *
    * Cost model: the explode is ×windowDays on the DISTINCT (user, day)
    * relation, not the raw event log — WAU(7) is a 7× fan-out of the
    * deduped actives, MAU(30) is 30×. Measured at 16× sf0.1 (1.6 M
    * events): WAU 1.3 s vs MAU 1.1 s — indistinguishable within
    * run-to-run noise, because the dedup dominates and the fan-out is
    * noise (STRESS.md). At 100 TB the deduped (user, day) relation is orders
    * of magnitude smaller than the log, so even 30× of it stays far
    * below one log scan. If windowDays grows past ~90, switch shapes:
    * aggregate per (user, day), then a day-grid range join against a
    * broadcast calendar — same results, fan-out traded for a bounded
    * join.
    */
  def rollingActives(
      events: DataFrame, userCol: String, tsCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "windowDays must be at least 1")
    val days = events
      .select(col(userCol).as("u"), date_trunc("day", col(tsCol)).as("day"))
      .distinct()
    days
      .select(col("u"), explode(sequence(
        col("day"),
        col("day") + expr(s"INTERVAL ${windowDays - 1} DAYS"),
        expr("INTERVAL 1 DAY"))).as("report_day"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("u")).as("n_active"))
  }
}
