package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Scratch, Tables}
import graft.ext.{Curation, Dedup, FuzzyJoin, LshJoin, SimSearch}
import graft.stream.{EventWindows, SessionTracker, StreamingReconcile, StreamRun}

/** Round-7 depth queries (verdict asks #2–#7): the certifications that
  * prove the engine's 100 TB posture end-to-end rather than widening the
  * surface — REAL micro-batch streaming executions under the batch
  * twins' oracles (complete/append/update output modes; tumbling,
  * session-merge, interval-join, watermark dedup, running-count, and
  * flatMapGroupsWithState custom state), observable skew-cap drop
  * audits, the incremental-store ingest lifecycle over two cycles, a
  * cross-bucket pack manifest, and the two-corpora retrieval shape of
  * IVF.
  */
object Round7Queries {

  /** The full events table as a 4-chunk bounded stream source, built in
    * a scratch dir SHARED by every streaming query that consumes the
    * unfiltered table (six of them): the layout is a deterministic
    * function of (source sf dir, chunk count), so per-query dirs were
    * six identical builds per harness pass. Keyed by sf dir — see
    * chunkedSource's reuse contract. Queries with a different source
    * (the u150-filtered join) keep their own dirs.
    */
  private[graft] def eventsChunks(s: SparkSession, dir: String): DataFrame =
    StreamRun.chunkedSource(s, Tables.events(s, dir),
      s"${CoreQueries.scratchDir("stream_src")}/events-4-${dir.replaceAll("[^A-Za-z0-9.]", "_")}", 4)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X6, EXECUTED BY THE STREAMING ENGINE (round-6 ask #2): the same
    // tumbling aggregation as events_windowed, but run as a bounded
    // readStream — the events fixture split into 4 time-range chunk
    // files, streamed one file per trigger (4 real micro-batches with
    // state carried across triggers), Trigger.AvailableNow, complete
    // output mode, foreachBatch parquet sink, result read back from
    // disk. Complete mode makes the bounded run's final emission equal
    // the batch aggregation, so the oracle is events_windowed's oracle
    // VERBATIM — a green row here certifies the micro-batch engine
    // (file-stream source, state store, watermark advancement, trigger
    // loop), not the batch twin.
    "events_windowed_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_windowed_stream")
      val src = eventsChunks(s, dir)
      StreamRun.runAvailableNow(
        EventWindows.tumblingStream(src, "1 hour", "1 hour"),
        s"$out/run", complete = true)
    },
    // X6, append mode — the variant that certifies WATERMARK EVICTION
    // under the oracle: each trigger emits only the windows the advancing
    // watermark finalized (their state is then dropped), and windows
    // within `lateness` of the stream's end are never finalized on a
    // bounded run. The oracle encodes that cutoff explicitly: windows
    // whose end exceeds max(ts) − 1h are absent. The result being the
    // UNION of per-trigger emissions (4 micro-batches, parquet-appended)
    // with no window emitted twice is itself part of what a green row
    // certifies — a window emitted at two triggers (eviction broken)
    // would duplicate rows and fail the compare.
    "events_windowed_stream_append" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_windowed_stream_append")
      val src = eventsChunks(s, dir)
      StreamRun.runAvailableNow(
        EventWindows.tumblingStream(src, "1 hour", "1 hour"),
        s"$out/run", complete = false)
    },
    // X6, session windows EXECUTED BY THE STREAMING ENGINE: unlike
    // tumbling windows, session state MERGES across micro-batches (a
    // user's session spanning a chunk boundary must fuse in the state
    // store — the richest stateful path the engine has). Same bounded
    // AvailableNow run, complete mode, same oracle as events_sessions:
    // a green row means the merge produced exactly the batch sessions.
    "events_sessions_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_sessions_stream")
      val src = eventsChunks(s, dir)
      StreamRun.runAvailableNow(
        EventWindows.sessionsStream(src, "30 minutes", "1 hour"),
        s"$out/run", complete = true)
    },
    // X2 observability (round-6 ask #4): the skew-cap drop audit under
    // the oracle, on a deterministic hot-key band index — band 0 keys
    // docs by lang (5 hot buckets, always over the 64 cap), band 1 by
    // doc_id % 101 (cold at small sf, hot at sf0.1 — the oracle
    // recomputes per scale). The REAL MinHash/SimHash band hashes are
    // engine-internal (xxhash64 over signature slices, not expressible
    // in the oracle engine), so this query certifies the audit
    // machinery's sizing/threshold/zero-fill semantics on bands whose
    // bucket sizes ARE SQL-derivable; LshJoinSpec asserts the same audit
    // over the real minhash band index against an independent recount,
    // and that capped candidatePairs output ⊆ uncapped exactly when the
    // audit reports drops.
    "dedup_lsh_drop_audit" -> { (s, dir) =>
      val bands = Tables.documents(s, dir)
        .select(col("doc_id").as("id"),
          array(xxhash64(col("lang")), xxhash64(col("doc_id") % 101)).as("keys"))
        .select(col("id"), col("keys"),
          posexplode(col("keys")).as(Seq("band", "band_hash")))
      LshJoin.dropAudit(bands, numBands = 2, maxBucketSize = 64)
    },
    // X1 ingest LIFECYCLE (round-6 ask #5): two successive ingest cycles
    // against a dated-partition fingerprint store — the shape the
    // single-shot dedup_incremental stops short of. Cycle 1 accepts the
    // %3=0 third and appends its fingerprints as ingest_date=2024-01-01;
    // cycle 2 dedups the %3=1 third against the store, appends ITS
    // survivors as =2024-01-02 (append, never overwrite — a 100 TB
    // store's prior partitions are immutable); the certified output is
    // cycle 3: the %3=2 third deduped against both appended partitions,
    // whose correctness depends transitively on cycle 2 having deduped
    // and appended correctly. The store tree is wiped at construction
    // (stale partitions from a prior harness run would double-append).
    "dedup_incremental_cycle" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val store = CoreQueries.scratchDir("dedup_incremental_cycle") + "/fp_store"
      Scratch.rmTree(store)
      Dedup.appendFingerprints(docs.filter(col("doc_id") % 3 === 0),
        "text", store, "2024-01-01")
      val surv2 = Dedup.dedupAgainstStore(
        s, docs.filter(col("doc_id") % 3 === 1), "text", store)
      Dedup.appendFingerprints(surv2, "text", store, "2024-01-02")
      Dedup.dedupAgainstStore(s, docs.filter(col("doc_id") % 3 === 2), "text", store)
        .select(col("doc_id"))
    },
    // X6, stream-STREAM interval join EXECUTED BY THE STREAMING ENGINE —
    // the hardest stateful path X6 has (two buffered sides, state
    // retention derived from the time-range condition, eviction by both
    // watermarks). Inner joins emit each match eagerly on arrival, so a
    // bounded event-time-ordered run emits EXACTLY the batch join's
    // pairs (evicted right-side state is never needed again — left
    // arrivals are monotone in ts); the append-mode sink is rolled up
    // in batch and certified under events_correlated's oracle verbatim.
    "events_correlated_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_correlated_stream")
      // user_id < 150 is the deterministic bench-cost prefix (the same
      // pattern as the doc_id < 1000 certification queries): at the
      // sf0.01 correctness gate it IS the whole table (max uid 149), so
      // the oracle certifies the full join; at the sf0.1 bench it bounds
      // the two-sided join state to ~10% of users — the certification
      // (buffered sides, interval condition, dual-watermark eviction)
      // is per-key machinery, not corpus-size-dependent.
      // dir suffix -u150: the chunk layout is keyed by (source, chunk
      // count) — a changed source filter must land in a fresh dir or the
      // reuse marker would serve the old layout
      // 2 chunks, not 4: inner-join emissions are eager and the final
      // answer is chunk-count-invariant (certified identical at 4), so
      // extra triggers were pure per-trigger overhead — RocksDB commit +
      // checkpoint fsync per micro-batch, ~1 s each of r14 bench wall.
      // Two triggers still certify the multi-batch machinery: state
      // buffered across a trigger boundary, watermark advanced between
      // batches, eviction exercised in batch 2.
      def src() = StreamRun.chunkedSource(s,
        Tables.events(s, dir).filter(col("user_id") < 150),
        s"$out/src-u150-${dir.replaceAll("[^A-Za-z0-9.]", "_")}", 2)
      val joined = EventWindows.correlateStreams(
        src(), src(), "user_id", "10 MINUTES", "1 minute")
      // inner joins emit eagerly in the data batch — the trailing
      // no-data batch would only evict state, so it is skipped
      StreamRun.runAvailableNow(joined, s"$out/run", complete = false,
          noDataBatch = false)
        .groupBy(col("type_left"), col("type_right"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    // X1 × X6, streaming-ingest dedup EXECUTED BY THE STREAMING ENGINE:
    // dropDuplicatesWithinWatermark over 4 real micro-batches. Its
    // contract is dedup WITHIN the watermark window only — a key whose
    // state the advancing watermark evicted is legitimately re-emitted
    // on its next occurrence (the fixture spans ~30 days vs a 1 h
    // watermark, so re-emission WILL happen) — so the
    // engine-independent invariants a bounded run certifies are (a) the
    // emitted key SET is exactly the distinct keys (a key lost to a
    // late-drop, or junk emitted, both fail) and (b) emissions per key
    // are bounded by the trigger count (state is fixed during a batch —
    // at most one emission per key per micro-batch; >4 means dedup
    // state was ignored). Within-window suppression itself is pinned in
    // EventWindowsSpec on a union-doubled stream.
    "events_dedup_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_dedup_stream")
      val src = eventsChunks(s, dir)
      // watermark dedup emits first-seen rows in their data batch — the
      // trailing no-data batch only evicts state, so it is skipped
      StreamRun.runAvailableNow(
          EventWindows.dedupStream(src, Seq("user_id", "event_type"), "1 hour"),
          s"$out/run", complete = false, noDataBatch = false)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n_emits"))
        .select(col("user_id"), col("event_type"),
          (col("n_emits") >= 1 && col("n_emits") <= 4).as("emits_bounded"))
    },
    // X6, UPDATE-mode stateful aggregation — StreamingReconcile's core
    // path executed by the engine: running per-group counts where each
    // trigger ships only the CHANGED groups (delta, not the full group
    // space — the property that makes a per-batch reconcile join cheap
    // at 100 TB). The batch-id-stamped update log is reduced to the
    // latest row per group; convergence of that final state to the true
    // batch counts is exactly the reconcile's "zero mismatches once the
    // backlog drains" claim, certified under the plain GROUP BY oracle.
    // The update log's shape (1..4 updates per group) rides the same
    // verdict-column convention as emits_bounded above.
    "events_reconcile_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_reconcile_stream")
      val src = eventsChunks(s, dir)
      StreamRun.runAvailableNowUpdate(
          StreamingReconcile.runningCounts(src, "event_type"), s"$out/run")
        .groupBy(col("event_type"))
        .agg(max_by(col("cnt"), col("batch_id")).as("cnt"),
          count(lit(1)).as("n_updates"))
        .select(col("event_type"), col("cnt"),
          (col("n_updates") >= 1 && col("n_updates") <= 4).as("updates_bounded"))
    },
    // X6, CUSTOM state EXECUTED BY THE STREAMING ENGINE — the
    // flatMapGroupsWithState tier beyond built-in windows: a per-user
    // running summary accumulated in user code across 4 micro-batches.
    // The state-store risk this certifies is cross-batch ACCUMULATION
    // (a user spanning chunks must fold into prior state, not reset —
    // the built-in-window queries never exercise user-managed state).
    // Update-mode emissions are batch-id-stamped; the latest emission
    // per user must equal the whole-input summary, certified under a
    // plain per-user GROUP BY oracle.
    "events_custom_state_stream" -> { (s, dir) =>
      import s.implicits._
      val out = CoreQueries.scratchDir("events_custom_state_stream")
      val src = eventsChunks(s, dir)
      val tracked = SessionTracker.track(s,
        src.select(col("user_id"), col("ts"), col("value"))
          .as[SessionTracker.Event]).toDF()
      StreamRun.runAvailableNowUpdate(tracked, s"$out/run")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_events"), col("total_value"), col("last_ts")),
          col("batch_id")).as("fin"))
        .select(col("user_id"), col("fin.n_events").as("n_events"),
          col("fin.total_value").as("total_value"),
          col("fin.last_ts").as("last_ts"))
    },
    // X6, SLIDING windows EXECUTED BY THE STREAMING ENGINE — the last
    // built-in window form the streaming matrix lacked. Each event
    // lands in width/slide = 2 live windows, so the state store holds
    // 2× the tumbling row count and every event updates two state rows
    // per trigger; complete mode makes the final emission the batch
    // aggregation, certified under events_sliding's oracle VERBATIM.
    "events_sliding_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_sliding_stream")
      val src = eventsChunks(s, dir)
      StreamRun.runAvailableNow(
        EventWindows.slidingStream(src, "1 hour", "30 minutes", "1 hour"),
        s"$out/run", complete = true)
    },
    // X6, stop/restart RECOVERY executed by the streaming engine: drain
    // the first half of the events (split at the midpoint timestamp) to
    // completion, stop, land the second half as new files, restart
    // against the SAME checkpoint. runRestartObserved `require`s the
    // engine-level invariants (batch numbering resumes, only the late
    // files are read); the oracle certifies the result: the final
    // complete-mode emission must equal the batch aggregation over the
    // WHOLE table — which it can only do if the state store was
    // restored, since the hour window straddling the stop/restart
    // boundary needs counts from both runs. Oracle VERBATIM from
    // events_windowed. Layout is rebuilt per run by design (the source
    // dir mutates mid-scenario), so this query keeps its own dir.
    "events_restart_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_restart_stream")
      val ev = Tables.events(s, dir)
      val bounds = ev.agg(min(col("ts")), max(col("ts"))).head()
      val mid = new java.sql.Timestamp(
        (bounds.getTimestamp(0).getTime + bounds.getTimestamp(1).getTime) / 2)
      val (result, _, _) = StreamRun.runRestartObserved(
        ev.filter(col("ts") < lit(mid)), ev.filter(col("ts") >= lit(mid)),
        src => EventWindows.tumblingStream(src, "1 hour", "1 hour"),
        s"$out/run")
      result
    },
    // X6, stream-STATIC broadcast enrichment EXECUTED BY THE STREAMING
    // ENGINE — the dimension-lookup shape of a production ingest and
    // the one X6 join form the matrix lacked (stream-stream buffers
    // both sides; this buffers NEITHER: an inner stream-static join is
    // stateless, the broadcast dimension rides every micro-batch's
    // re-planned join and each event is enriched exactly once in the
    // batch it arrives). The per-trigger emissions land in batch-id
    // partitions; their union must equal the batch join — rolled up by
    // segment under a plain join-GROUP BY oracle. Sums ride integer
    // cents (floor(v*100+0.5)): segment-level double sums are 400×
    // coarser groups than the hourly windows, wide enough for
    // cross-engine addition-order drift at 2 decimals.
    "events_enrich_stream" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("events_enrich_stream")
      val src = eventsChunks(s, dir)
      val dim = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      StreamRun.runAvailableNow(
          EventWindows.enrichStream(src, dim, "user_id", "c_custkey"),
          s"$out/run", complete = false)
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("sum_cents"))
    },
    // The fuzzy join's drop audit under the oracle, on its REAL blocks:
    // deletion-neighborhood variants are plain string arithmetic, so —
    // unlike the MinHash band hashes — the oracle engine can recompute
    // every block size exactly. Customer names share variants along
    // their digit suffixes (names differing in one digit collide on the
    // variant that deletes it), so cap 8 deterministically drops the
    // hot blocks at every scale; together with dedup_lsh_drop_audit
    // this certifies both cap-audit implementations end-to-end.
    "fuzzy_join_drop_audit" -> { (s, dir) =>
      FuzzyJoin.dropAudit(
        Tables.customer(s, dir).filter(col("c_custkey") < 500),
        "c_custkey", "c_name", maxBlock = 8)
    },
    // X7 → trainer handoff (round-6 ask #6): the pack manifest. Per-
    // bucket shard ids collide across buckets; the manifest assigns a
    // globally unique dense id per (bucket, shard) plus the doc/token
    // totals a data loader reads, is EXPORTED to parquet next to the
    // shards, and the query certifies the read-back file — write →
    // read → oracle, same contract as reports_roundtrip.
    "token_budget_manifest" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("token_budget_manifest")
      val packed = Curation.packTokenBudget(
        Tables.documents(s, dir), "doc_id", "text", 2048L)
      Curation.shardManifest(packed)
        .write.mode("overwrite").parquet(s"$out/manifest")
      s.read.parquet(s"$out/manifest")
    },
    // X3, two-corpora retrieval shape (round-6 ask #7): every prior
    // similarity query self-joins one table; production retrieval ranks
    // a QUERY BATCH against a DISJOINT corpus. The split alternates
    // BLOCKS of 50 = the planted-cluster period — NOT id parity: 50 is
    // even, so a parity split puts even ids only in even cluster
    // residues, the odd queries' cluster-mates are entirely absent from
    // the corpus, and IVF recall collapses once N grows (caught by the
    // full sf0.1 oracle sweep; parity passed at sf0.01 by small-N
    // luck). Block alternation keeps every cluster populated on both
    // sides — the realistic retrieval setup, where queries come from
    // the same distribution as the corpus. recall@3 ≥ 0.9 pinned
    // against the in-engine exact top-k; count + content checksum
    // oracle-computed (same verdict contract as similarity_ivf_topk).
    "similarity_ivf_batch" -> { (s, dir) =>
      val v = SimSearch.clusteredView(Tables.embeddings(s, dir), "vec_id", "embedding",
        nClusters = Round2Queries.IvfNClusters, mix = Round2Queries.IvfMix.toDouble)
      val corpus = v.filter(expr("(vec_id DIV 50) % 2 = 0"))
      val q = v.filter(expr("(vec_id DIV 50) % 2 = 1") && col("vec_id") < 200)
      val ivf = SimSearch.ivfTopK(corpus, "vec_id", "embedding", 3,
          nCentroids = 64, lloydIters = 0, probeFrac = 0.1, queries = Some(q))
        .select(col("id_q"), col("neighbor_id"), lit(1L).as("hit"))
      SimSearch.topKBruteForce(q, corpus, "vec_id", "embedding", 3)
        .join(ivf, Seq("id_q", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          round(sum(col("cos")), 2).as("sum_cos"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            >= count(lit(1)) * 0.9).as("recall_ok"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    // identical to events_windowed — that is the point: the streaming
    // execution must reproduce the batch aggregation exactly
    "events_windowed_stream" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // append mode: only windows the final watermark (max ts − 1h
    // lateness) finalized are emitted; Spark finalizes a window when
    // watermark ≥ window end (inclusive boundary, pinned by
    // StreamRunSpec)
    "events_windowed_stream_append" ->
      """WITH m AS (SELECT max(ts) - INTERVAL 1 HOUR AS wm FROM events)
        |SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events, m
        |GROUP BY 1, 2, m.wm
        |HAVING window_start + INTERVAL 1 HOUR <= m.wm""".stripMargin,
    // identical to events_windowed — recovery is only certified if the
    // restarted run reproduces the full-table batch aggregation, state
    // restored across the stop/restart boundary included
    "events_restart_stream" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // identical to events_sessions — the streaming session merge must
    // reproduce the batch sessionization exactly
    "events_sessions_stream" ->
      """WITH marked AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |numbered AS (
        |  SELECT user_id, ts, value,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM marked)
        |SELECT min(ts) AS session_start, user_id,
        |       count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM numbered GROUP BY user_id, session_id""".stripMargin,
    // bucket sizes per band are plain group counts; xxhash64 collisions
    // across ≤101 distinct keys are absent (verified by the match itself
    // — a collision would merge two buckets and shift the counts)
    "dedup_lsh_drop_audit" ->
      """WITH b0 AS (SELECT count(*) AS n FROM documents GROUP BY lang),
        |b1 AS (SELECT count(*) AS n FROM documents GROUP BY doc_id % 101)
        |SELECT CAST(0 AS INT) AS band,
        |       CAST(coalesce(sum(CASE WHEN n > 64 THEN 1 END), 0) AS BIGINT)
        |         AS dropped_buckets,
        |       CAST(coalesce(sum(CASE WHEN n > 64 THEN n END), 0) AS BIGINT)
        |         AS dropped_rows
        |FROM b0
        |UNION ALL
        |SELECT CAST(1 AS INT),
        |       CAST(coalesce(sum(CASE WHEN n > 64 THEN 1 END), 0) AS BIGINT),
        |       CAST(coalesce(sum(CASE WHEN n > 64 THEN n END), 0) AS BIGINT)
        |FROM b1""".stripMargin,
    // NOT EXISTS on both hops (the A3 advice pattern — NOT IN's
    // three-valued logic diverges from the anti-join under NULLs);
    // cycle-2 survivors keep within-batch duplicate texts (the store
    // dedups fingerprints, not the batch), matching dedupAgainstStore
    "dedup_incremental_cycle" ->
      """WITH b1 AS (
        |  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 = 0),
        |s2 AS (
        |  SELECT md5(text) AS fp FROM documents d
        |  WHERE doc_id % 3 = 1
        |    AND NOT EXISTS (SELECT 1 FROM b1 WHERE b1.fp = md5(d.text))),
        |store AS (SELECT fp FROM b1 UNION SELECT fp FROM s2)
        |SELECT doc_id FROM documents d
        |WHERE doc_id % 3 = 2
        |  AND NOT EXISTS (SELECT 1 FROM store WHERE store.fp = md5(d.text))"""
        .stripMargin,
    // identical to events_correlated — the streaming join must emit
    // exactly the batch join's matches, once each
    "events_correlated_stream" ->
      """SELECT l.event_type AS type_left, r.event_type AS type_right,
        |       count(*) AS n_pairs
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
        |WHERE l.user_id < 150
        |GROUP BY 1, 2""".stripMargin,
    // the emitted key set = the distinct keys; the emission-count bound
    // is a verdict column (the count itself depends on chunk boundaries)
    "events_dedup_stream" ->
      "SELECT DISTINCT user_id, event_type, true AS emits_bounded FROM events",
    // the converged running counts = the batch counts
    "events_reconcile_stream" ->
      """SELECT event_type, count(*) AS cnt, true AS updates_bounded
        |FROM events GROUP BY 1""".stripMargin,
    // the final custom-state emission per user = the whole-input
    // summary (total rounded at emission, mirrored half-up here)
    "events_custom_state_stream" ->
      """SELECT user_id, count(*) AS n_events,
        |       floor(sum(value) * 100 + 0.5) / 100 AS total_value,
        |       max(ts) AS last_ts
        |FROM events GROUP BY 1""".stripMargin,
    // identical to events_sliding — the streaming sliding aggregation
    // must reproduce the batch one exactly
    "events_sliding_stream" ->
      """SELECT time_bucket(INTERVAL '30 minutes', ts)
        |         - INTERVAL '30 minutes' * k.k AS window_start,
        |       event_type, count(*) AS n_events
        |FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
        |GROUP BY 1, 2""".stripMargin,
    // the streaming enrichment must emit each event's enrichment
    // exactly once — a dropped or doubled micro-batch shifts the
    // per-segment counts/cents and fails the compare. The inner CAST
    // keeps the SUM itself over BIGINTs (mirroring the Spark side's
    // integer-cent sum); the outer CAST only narrows DuckDB's HUGEINT
    // sum dtype — summing doubles instead would reintroduce the 2^53
    // drift the cents encoding exists to avoid
    "events_enrich_stream" ->
      """SELECT c.c_mktsegment, e.event_type, count(*) AS n_events,
        |       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |         AS sum_cents
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2""".stripMargin,
    // list_distinct mirrors deletionVariants' array_union (a name's
    // repeated characters — the zero runs — produce duplicate variants
    // that count once per name)
    "fuzzy_join_drop_audit" ->
      """WITH v AS (
        |  SELECT c_custkey,
        |         unnest(list_distinct(list_prepend(c_name,
        |           list_transform(range(1, len(c_name) + 1),
        |             i -> substr(c_name, 1, i - 1) || substr(c_name, i + 1)))))
        |           AS v
        |  FROM customer WHERE c_custkey < 500),
        |b AS (SELECT v, count(*) AS n FROM v GROUP BY 1)
        |SELECT CAST(coalesce(sum(CASE WHEN n > 8 THEN 1 END), 0) AS BIGINT)
        |         AS dropped_blocks,
        |       CAST(coalesce(sum(CASE WHEN n > 8 THEN n END), 0) AS BIGINT)
        |         AS dropped_rows
        |FROM b""".stripMargin,
    // the per-(bucket, shard) totals are Round4's pack oracle; the
    // global id is a dense row_number over the manifest rows
    "token_budget_manifest" ->
      s"""SELECT CAST(row_number() OVER (ORDER BY bucket, shard) - 1 AS BIGINT)
         |         AS global_shard,
         |       bucket, shard, n_docs, n_tokens
         |FROM (${Round4Queries.packOracleSql(2048, 256)})""".stripMargin,
    // clustered view replayed as in similarity_ivf_topk; corpus = even
    // 50-blocks, queries = odd 50-blocks below 200 (disjoint by block,
    // every cluster populated on both sides, no self-pair filter needed)
    "similarity_ivf_batch" ->
      s"""WITH ctr AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < ${Round2Queries.IvfNClusters}),
         |v AS (
         |  SELECT e.vec_id, list_transform(range(len(cemb)),
         |           i -> CAST(cemb[i + 1] + ${Round2Queries.IvfMix} * e.embedding[i + 1]
         |                     AS REAL)) AS emb
         |  FROM embeddings e JOIN ctr ON e.vec_id % ${Round2Queries.IvfNClusters} = ctr.cid),
         |s AS (
         |  SELECT q.vec_id AS id_q, c.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
         |  FROM v q JOIN v c ON (c.vec_id // 50) % 2 = 0
         |  WHERE (q.vec_id // 50) % 2 = 1 AND q.vec_id < 200)
         |SELECT count(*) AS n_exact, round(sum(cos), 2) AS sum_cos,
         |       true AS recall_ok FROM (
         |  SELECT cos, row_number() OVER (PARTITION BY id_q
         |           ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM s)
         |WHERE rank <= 3""".stripMargin
  )
}
