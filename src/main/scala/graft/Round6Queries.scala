package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-6 surface widening: time-based window frames and time-series
  * gap-filling — two classic warehouse shapes the engine must answer
  * that no earlier query exercised (all prior windows used ROWS frames;
  * all prior time buckets dropped empty periods).
  *
  * Oracle rules as everywhere: identical column names, deterministic
  * values (the range-frame aggregate sums l_quantity — small integers in
  * doubles, so sums are EXACT and immune to cross-engine summation
  * order; an avg of prices could straddle a rounding boundary).
  */
object Round6Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // RANGE window frame: per supplier, quantity shipped in the TRAILING
    // 30 DAYS of each line's ship date — a time-range frame, not a row
    // count (peers at the same timestamp are all included, which is what
    // makes it deterministic under ties). Spark expresses the interval
    // bound as epoch-second offsets over an ordered-by-seconds window;
    // DuckDB natively as RANGE BETWEEN INTERVAL 30 DAYS PRECEDING.
    "window_range_frame" -> { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        // shipdate is TIMESTAMP_NTZ; the session timezone is pinned UTC,
        // so the cast to (tz-aware) timestamp → epoch seconds is exact
        .orderBy(unix_seconds(col("l_shipdate").cast("timestamp")))
        .rangeBetween(-30L * 86400, 0)
      Tables.lineitem(s, dir)
        .filter(col("l_suppkey") < 20)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
          sum(col("l_quantity")).over(w).as("qty_30d"))
    },
    // Time-series gap-fill: hourly event counts per type INCLUDING empty
    // hours. The hour grid is derived per type from its own min/max via
    // sequence + explode — a grouped aggregation plus a generator, no
    // cross join (a grid × dimension crossJoin is the naive shape; this
    // one never materializes hours outside a type's active range and
    // stays inside the no-cartesian plan guard).
    "events_gapfill" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      val hourly = ev.groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"))
      val grid = ev.groupBy(col("event_type"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("event_type"),
          explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
      grid.join(hourly, Seq("event_type", "hour"), "left_outer")
        .select(col("event_type"), col("hour"),
          coalesce(col("n"), lit(0L)).as("n_events"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "window_range_frame" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey,
        |       sum(l_quantity) OVER (
        |         PARTITION BY l_suppkey ORDER BY l_shipdate
        |         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |         AS qty_30d
        |FROM lineitem WHERE l_suppkey < 20""".stripMargin,
    "events_gapfill" ->
      """WITH e AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour FROM events),
        |hourly AS (
        |  SELECT event_type, hour, count(*) AS n FROM e GROUP BY 1, 2),
        |grid AS (
        |  SELECT event_type,
        |         unnest(generate_series(min(hour), max(hour),
        |                                INTERVAL 1 HOUR)) AS hour
        |  FROM e GROUP BY event_type)
        |SELECT g.event_type, g.hour,
        |       CAST(coalesce(n, 0) AS BIGINT) AS n_events
        |FROM grid g LEFT JOIN hourly USING (event_type, hour)""".stripMargin
  )
}
