package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-stream operators (SURVEY.md §2b X6).
  *
  * Every transform is defined ONCE over a DataFrame and works in both
  * batch and streaming mode — the batch form is what the DuckDB oracle
  * checks; the streaming form is the same function applied to a
  * `readStream` source with a watermark. That symmetry is the point:
  * Structured Streaming treats a stream as an unbounded table, so a
  * correct batch aggregation IS the streaming aggregation.
  *
  * Scale notes: tumbling windows and session windows are grouped
  * aggregations — partial aggregation map-side, one shuffle on
  * (window/user) keys. Watermarks bound state: late events beyond the
  * watermark are dropped (documented policy, SURVEY.md §7.4 #6).
  */
object EventWindows {

  /** Tumbling-window counts/sums per event type. Epoch-aligned windows
    * (same origin as DuckDB's time_bucket, so oracle-comparable).
    */
  def tumbling(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Session windows per user: a session closes after `gap` of
    * inactivity. The boundary is inclusive — an event at exactly
    * last_ts + gap still merges into the running session (verified
    * against Spark's session_window in EventWindowsSpec).
    */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Sliding-window event rate (window/slide), for monitoring-style
    * queries.
    */
  def sliding(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"))

  /** The events parquet path as an unbounded source (file-stream).
    * The schema is taken from a batch read of the same path (streaming
    * file sources require a declared schema), then normalized the same
    * way as the batch loader (nanos → µs timestamps).
    */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    // Streaming file sources require a directory; the fixture is a single
    // file, so stream its parent with a glob restricted to that file.
    val f = new java.io.File(path)
    val (dir, glob) =
      if (f.isFile) (f.getParent, f.getName) else (path, "*")
    graft.core.Tables.normalizeEvents(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", glob)
        .parquet(dir))
  }

  /** Streaming tumbling aggregation with a watermark: state for a window
    * is dropped once the watermark passes its end; events later than
    * `lateness` beyond max(ts) seen are discarded.
    */
  def tumblingStream(events: DataFrame, width: String, lateness: String): DataFrame =
    tumbling(events.withWatermark("ts", lateness), width)

  /** Streaming sessionization with a watermark (state cleanup for
    * closed sessions).
    */
  def sessionsStream(events: DataFrame, gap: String, lateness: String): DataFrame =
    sessions(events.withWatermark("ts", lateness), gap)

  /** Streaming sliding windows: each event lands in width/slide live
    * windows, so the stateful aggregation holds width/slide × the
    * tumbling window count — the watermark evicts each window
    * width/slide triggers' worth later than its tumbling counterpart.
    */
  def slidingStream(
      events: DataFrame, width: String, slide: String, lateness: String): DataFrame =
    sliding(events.withWatermark("ts", lateness), width, slide)

  /** Streaming exact dedup (X1 × X6): drop repeated keys across
    * micro-batches. The watermark bounds the dedup state — a key's
    * entry is dropped once the watermark passes its event time, so
    * state size tracks the lateness window, not the stream's history.
    * On a batch DataFrame the same semantics degenerate to a plain
    * dropDuplicates (bounded input needs no state eviction;
    * dropDuplicatesWithinWatermark itself rejects batch inputs), so the
    * batch twin branches there — one function, both execution modes.
    */
  def dedupStream(events: DataFrame, keys: Seq[String], lateness: String): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Stream-static enrichment join (the dimension-lookup shape of a
    * production ingest: every arriving event picks up its dimension
    * attributes before landing). The static side is explicitly
    * broadcast — per micro-batch the engine re-plans the join, so a
    * small dimension rides the broadcast exchange every trigger and the
    * streaming side never shuffles; an inner stream-static join is
    * stateless (no watermark, no state store — each event is enriched
    * exactly once in the batch it arrives). Works identically on a
    * batch DataFrame, which is what the oracle checks; the streaming
    * certification is that the union of per-trigger emissions equals
    * the batch join.
    */
  def enrichStream(
      events: DataFrame, dim: DataFrame,
      eventKey: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), col(eventKey) === col(dimKey), "inner")
      .drop(dimKey)

  /** Stream-stream interval join: pair each left event with the right
    * events of the same `key` that arrive within `within` after it.
    * Both sides carry watermarks so the join state is bounded — a
    * buffered left row is dropped once the right watermark passes
    * left.ts + within (Spark derives the state retention from the
    * time-range condition; without it a stream-stream join would
    * buffer forever). Works identically on batch DataFrames.
    */
  def correlateStreams(
      left: DataFrame, right: DataFrame, key: String,
      within: String, lateness: String): DataFrame =
    correlateJoin(left, right, key, within, lateness, "inner")

  /** LEFT OUTER variant: lefts with no partner within the interval are
    * emitted with nulls — but only once the watermark proves no partner
    * can still arrive (it passes left.ts + `within`), which is when the
    * engine evicts the unmatched buffered row. On a bounded run those
    * final evictions ride the trailing no-data batch. Matched pairs
    * emit eagerly exactly like the inner form.
    */
  def correlateStreamsOuter(
      left: DataFrame, right: DataFrame, key: String,
      within: String, lateness: String): DataFrame =
    correlateJoin(left, right, key, within, lateness, "left_outer")

  /** FULL OUTER variant — both eviction-driven null paths at once:
    * unmatched lefts emit null-right when the watermark passes
    * left.ts + `within` (no partner can still arrive — as in the
    * left-outer form), and unmatched rights emit null-left when the
    * watermark passes right.ts (the condition `r.ts >= l.ts` means a
    * right can only match lefts at-or-before it, so once the watermark
    * is beyond right.ts any matching left would be dropped as late).
    * Matched pairs emit eagerly.
    */
  def correlateStreamsFull(
      left: DataFrame, right: DataFrame, key: String,
      within: String, lateness: String): DataFrame =
    correlateJoin(left, right, key, within, lateness, "full_outer")

  private def correlateJoin(
      left: DataFrame, right: DataFrame, key: String,
      within: String, lateness: String, joinType: String): DataFrame = {
    val l = left.withWatermark("ts", lateness).alias("l")
    val r = right.withWatermark("ts", lateness).alias("r")
    l.join(r,
        expr(s"""l.$key = r.$key AND
                 |r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $within""".stripMargin),
        joinType)
      .select(col(s"l.$key").as(key),
        col("l.ts").as("ts_left"), col("r.ts").as("ts_right"),
        col("l.event_type").as("type_left"), col("r.event_type").as("type_right"))
  }
}
