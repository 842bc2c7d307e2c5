package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.{Dedup, Graph}
import graft.plans.AsOfJoinNative

/** Round-13 depth queries.
  *
  * Headliners close the two scale gaps the round-12 verdict named:
  *  - `dedup_containment_prefix` — the PRODUCTION containment join
  *    (prefix-filter equi-joins, ext.Dedup.containmentPairs) over the
  *    FULL corpus, oracle-certified identical to the all-pairs lens
  *    (recall 1.0 by construction, not sampled);
  *  - `events_anomaly_mad_approx` — the median/MAD anomaly screen on
  *    approx_percentile sketches (fixed-size mergeable state — the
  *    100 TB memory shape) with tolerance verdicts against the exact
  *    screen.
  * Plus `graph_triangles_lsh` (triangles on the forced-LSH near-dup
  * graph, recall-pinned against the exact graph), `reconcile_jdbc`
  * (the reference's remote-warehouse connection shape over a live
  * thrift endpoint), and the `asof_join_native*` trio certifying the
  * engine's whole-operator Catalyst extension (plans.AsOfJoinNative)
  * against DuckDB's native ASOF JOIN with the custom exec `require`d
  * in the plan.
  */
object Round13Queries {

  private val TokensSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  /** ONE as-of SQL text for `asof_join_sql_auto`: runs in Spark (with
    * the rewrite) and verbatim in DuckDB (which decorrelates it its own
    * way) — engine-independent by construction.
    */
  private def asofSqlText(events: String, orders: String): String =
    s"""SELECT e.event_id, e.user_id,
       |       (SELECT max(o.o_orderdate) FROM $orders o
       |        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
       |         AS matched_order_date
       |FROM $events e""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The scalable containment join: prefix-filter candidates (rarest-
    // first global shingle order, floor((1-t)·|A|)+1-length prefixes,
    // smaller-set-prefix × full-inverted-index equi join) + exact
    // sorted-intersect verification. Runs over the WHOLE documents
    // table — no certification cap — because the plan is equi-joins end
    // to end; the oracle recomputes the full-corpus answer exactly, so
    // this certifies recall 1.0 against the all-pairs lens rather than
    // sampling it.
    // Round-14 note: the hot-token lane lever (Dedup.containmentPairs
    // hotTokenDf/hotTokenSalts) stays OFF here by measurement. The
    // fixture vocabulary is ~31 tokens, so every posting is heavy —
    // but the 18 distinct prefix tokens spread across 32 shuffle
    // partitions are already task-balanced (no straggler to fix), and
    // the lane fan-out's ×salts replication of the array-carrying
    // prefix rows costs ~2 s at sf0.1 for nothing (cache-cleared: 9.5 s
    // plain vs 11.4 s laned, identical 7,036,349 pairs). The lever
    // earns its keep only when pair generation CONCENTRATES — the
    // duplicate-heavy clique shape, where the density stress measures
    // 31.9 → 8.8 s — which is exactly why it ships default-off.
    "dedup_containment_prefix" -> { (s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text", 0.9)
    },

    // Robust anomaly detection, SKETCH FORM — the 100 TB memory shape
    // of events_anomaly_mad: exact per-group percentile buffers every
    // value per group in executor memory (with a handful of event types
    // that is an OOM at scale, not a slowdown); approx_percentile is a
    // fixed-size mergeable sketch. Both medians (value and deviation)
    // ride the sketch; the exact screen is computed alongside for the
    // verdicts. Quantized to integer cents first (same discipline as
    // the exact twin). Tolerance: sketch medians within 5% (or one
    // dollar) of exact — accuracy 10000 → rank error ~n/10⁴, far inside
    // — and the outlier count within 2% of n (or 5 rows): dev > 3·MAD
    // decisions can flip only for rows within the sketch error band of
    // the threshold.
    "events_anomaly_mad_approx" -> { (s, dir) =>
      val v = Tables.events(s, dir).select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val m = v.groupBy("event_type").agg(
        expr("percentile(vc, 0.5)").as("med"),
        expr("approx_percentile(vc, 0.5, 10000)").cast("double").as("med_a"))
      val d = v.join(broadcast(m), "event_type")
        .withColumn("dev", abs(col("vc") - col("med")))
        .withColumn("dev_a", abs(col("vc") - col("med_a")))
      val md = d.groupBy("event_type").agg(
        expr("percentile(dev, 0.5)").as("mad"),
        expr("approx_percentile(dev_a, 0.5, 10000)").cast("double").as("mad_a"))
      d.join(broadcast(md), "event_type")
        .groupBy("event_type")
        .agg(max("med").as("med"), max("mad").as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"),
          (abs(max("med_a") - max("med")) <=
            greatest(lit(0.05) * abs(max("med")), lit(100.0)))
            .as("med_within"),
          (abs(max("mad_a") - max("mad")) <=
            greatest(lit(0.05) * abs(max("mad")), lit(100.0)))
            .as("mad_within"),
          (abs(
            sum(when(col("dev_a") > lit(3) * col("mad_a"), 1L).otherwise(0L)) -
            sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L)))
            .cast("double") <=
            greatest(lit(0.02) * count(lit(1)), lit(5.0)))
            .as("outliers_within"))
    },

    // Remote-warehouse reconcile over JDBC — the reference's ACTUAL job
    // shape (two live warehouse connections, configuration.properties
    // host/port/user/password per side) through a real network
    // endpoint: side A is read back from an in-process HiveServer2 via
    // `spark.read.jdbc` as 8 range-sliced remote queries (stride
    // partitioning on o_orderkey), side B is the local table with a
    // deterministic drift (keys %97 missing, prices %53 corrected) so
    // both engines reconstruct identical inputs. The requires pin what
    // matters at 100 TB: the o_custkey predicate is PUSHED into the
    // remote scan (GraftHiveDialect backtick quoting makes that sound —
    // the default dialect's double quotes would turn it into a string
    // literal server-side) and the scan is genuinely partitioned.
    // Downstream is the canonical full-outer reconcile keyed on
    // o_orderkey.
    "reconcile_jdbc" -> { (s, dir) =>
      import graft.sources.JdbcWarehouse
      val port = JdbcWarehouse.ensureServer(s)
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val tbl = JdbcWarehouse.publish(orders, "graft_jdbc_orders")
      val bounds = orders.agg(min("o_orderkey"), max("o_orderkey")).head
      // Client slice count derived from the SCHEDULER SIZE (round 22):
      // the in-process endpoint executes each slice's statement as Spark
      // jobs in THIS scheduler, so client scan tasks that fill every
      // task slot starve the server side of slots — a hard resource
      // DEADLOCK, hit by the driver's 8-core scaling bench with the
      // previous constant 8 (BENCH_r21_c8 rc 124 died hung inside a
      // thrift statement; thread dump: 8 JDBCRDD tasks parked in
      // waitForOperationToComplete, 8 server statements queued with zero
      // free slots). A quarter of the pool keeps the 32-core value at
      // the certified 8 slices and leaves the server side headroom at
      // any size; on a real two-warehouse deployment the server runs
      // elsewhere and the constraint disappears.
      val parts = math.min(8, math.max(1, s.sparkContext.defaultParallelism / 4))
      val remote = JdbcWarehouse.readTable(s, port, tbl,
          "o_orderkey", bounds.getLong(0), bounds.getLong(1) + 1, parts)
        .filter(col("o_custkey") < 500)
      val plan = remote.queryExecution.explainString(FormattedMode)
      require("PushedFilters: \\[[^\\]]*o_custkey"
          .r.findFirstIn(plan).isDefined,
        s"o_custkey predicate not pushed into the JDBC scan:\n$plan")
      require(plan.contains(s"numPartitions=$parts"),
        s"JDBC scan is not range-partitioned:\n$plan")
      val a = remote.select(col("o_orderkey").as("ak"),
        col("o_orderstatus").as("a_status"), col("o_totalprice").as("a_price"))
      val b = orders.filter(col("o_custkey") < 500)
        .filter(col("o_orderkey") % 97 =!= 0)
        .select(col("o_orderkey").as("bk"),
          col("o_orderstatus").as("b_status"),
          when(col("o_orderkey") % 53 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")).as("b_price"))
      a.join(b, col("ak") === col("bk"), "full_outer")
        .groupBy(coalesce(col("a_status"), col("b_status")).as("o_orderstatus"))
        .agg(
          sum(when(col("ak").isNotNull && col("bk").isNotNull &&
            col("a_price") === col("b_price"), 1L).otherwise(0L)).as("n_match"),
          sum(when(col("ak").isNotNull && col("bk").isNotNull &&
            col("a_price") =!= col("b_price"), 1L).otherwise(0L)).as("n_mismatch"),
          sum(when(col("bk").isNull, 1L).otherwise(0L)).as("n_only_remote"),
          sum(when(col("ak").isNull, 1L).otherwise(0L)).as("n_only_local"))
    },

    // Native as-of join — the engine's whole-operator Catalyst
    // extension (plans.AsOfJoinNative: logical node + strategy +
    // physical single-pass merge operator). Same semantics and SAME
    // DuckDB ASOF JOIN oracle as asof_join_events, but the plan is the
    // custom AsOfJoin exec over two co-partitioned sorted exchanges —
    // no union, no null-padded shuffle rows, no window re-scan. The
    // require pins the forced path: the window form can never print an
    // AsOfJoin node, so this query certifies the OPERATOR, not a
    // fallback.
    "asof_join_native" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderdate").as("matched_order_date"))
      val df = AsOfJoinNative.join(ev, o, "user_id", "o_custkey",
          "ts", "o_orderdate", Seq("matched_order_date"))
        .select("event_id", "user_id", "matched_order_date")
      val plan = df.queryExecution.explainString(FormattedMode)
      require(plan.contains("AsOfJoin"),
        s"native as-of operator missing from plan:\n$plan")
      df
    },

    // Forward direction through the native operator (earliest following
    // purchase per click) — asof_join_forward's oracle.
    "asof_join_native_forward" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("ts").as("next_purchase"))
      val df = AsOfJoinNative.join(clicks, purchases, "user_id", "p_user",
          "ts", "p_ts", Seq("next_purchase"), forward = true)
        .select(col("event_id"), col("user_id"),
          unix_seconds(col("next_purchase")).as("next_purchase_epoch"))
      require(df.queryExecution.explainString(FormattedMode)
        .contains("AsOfJoin"), "native as-of operator missing from plan")
      df
    },

    // Tolerance-bounded native as-of (stale-quote guard pushed INTO the
    // merge) — asof_join_tolerance's oracle.
    "asof_join_native_tolerance" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("ts").as("last_click"))
      val df = AsOfJoinNative.join(errors, clicks, "user_id", "c_user",
          "ts", "c_ts", Seq("last_click"), toleranceSeconds = Some(3600L))
        .select(col("event_id"), col("user_id"),
          unix_seconds(col("last_click")).as("last_click_epoch"))
      require(df.queryExecution.explainString(FormattedMode)
        .contains("AsOfJoin"), "native as-of operator missing from plan")
      df
    },

    // The SQL front door to the native operator: a correlated scalar
    // max-subquery — the natural as-of SQL in engines without an ASOF
    // keyword — decorrelates into a domain join whose inner theta join
    // is |distinct left times| × |orders| (the nested-loop scale trap).
    // plans.AsOfRewriteRule (conf-gated, installed post-decorrelation)
    // collapses the sandwich into the native AsOfJoinPlan. Certified
    // the same way as range_join_auto: ONE SQL text, run in Spark with
    // the rule on (plan require'd to contain the AsOfJoin exec and no
    // nested loop) and verbatim in DuckDB as the oracle.
    "asof_join_sql_auto" -> { (s, dir) =>
      plans.AsOfRewriteRule.installLate(s)
      val key = plans.AsOfRewriteRule.EnabledKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, "true")
      try {
        Tables.events(s, dir).createOrReplaceTempView("asql_events")
        Tables.orders(s, dir).createOrReplaceTempView("asql_orders")
        val df = s.sql(asofSqlText("asql_events", "asql_orders"))
        val plan = df.queryExecution.explainString(FormattedMode)
        require(plan.contains("AsOfJoin"),
          s"as-of rewrite did not fire:\n$plan")
        require(!plan.contains("BroadcastNestedLoopJoin") &&
                !plan.contains("CartesianProduct"),
          "rewrite enabled but the domain join still nested-loops")
        val out = CoreQueries.scratchDir("asof_join_sql_auto")
        df.write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    },

    // Triangle counting fed by the FORCED MinHash-LSH pair generator
    // (brute-force cutover disabled — the banding path runs at any
    // scale), recall-pinned against the exact inverted-index graph.
    // LSH pairs are exact-verified, so lsh-edges ⊆ exact-edges and the
    // recall verdicts are one-sided: edges ≥ 0.9 of exact, triangles
    // ≥ 0.7 (edge recall compounds ~cubically on triangles). The
    // oracle-checked columns are the exact graph's counts — identical
    // to graph_triangles — plus the literal-true verdicts.
    "graph_triangles_lsh" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      // Round-22 (guide §1.2 "don't compute things twice"): the exact
      // postings-join pair set is computed ONCE and feeds BOTH sides.
      // The LSH tier's verified pairs are, by definition, the banding
      // candidates that pass the exact Jaccard threshold — i.e. exactly
      // candidates ∩ exact-pairs (the exact set IS all qualifying
      // pairs, and both paths evaluate the identical i/(|A|+|B|-i) ≥ t
      // double-arithmetic predicate) — so verification is a semi-join
      // against the already-computed exact edge list instead of a
      // second tokenize + shingle-set join pipeline. The banding path
      // itself (signatures, bucket sizing, skew cap, first-collision
      // pair emission) still runs at full fidelity; output is
      // row-identical (oracle-verified) while the duplicated exact
      // verification work is gone.
      val exactPairs = graft.core.CacheScope.cached(
        Dedup.jaccardPairsPostings(docs, "doc_id", "text", 0.8)
          .select("id_a", "id_b"))
      val exact = Graph.triangleStats(exactPairs)
      val cand = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        Dedup.MinHashParams(bruteForceMaxDocs = 0L))
      val lshPairs = cand.join(exactPairs, Seq("id_a", "id_b"), "left_semi")
      val lsh = Graph.triangleStats(lshPairs)
        .select(col("n_edges").as("e_lsh"), col("n_triangles").as("t_lsh"))
      exact.join(lsh)
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          (col("e_lsh").cast("double") >= lit(0.9) * col("n_edges"))
            .as("edges_recall_ok"),
          (col("t_lsh").cast("double") >= lit(0.7) * col("n_triangles"))
            .as("triangles_recall_ok"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "dedup_containment_prefix" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($TokensSql) AS tok
         |  FROM documents),
         |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b,
         |       round(i / least(sa.n, sb.n), 6) AS containment
         |FROM inter
         |JOIN sz sa ON sa.doc_id = id_a
         |JOIN sz sb ON sb.doc_id = id_b
         |WHERE i / least(sa.n, sb.n) >= 0.9""".stripMargin,

    "reconcile_jdbc" ->
      """WITH a AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_custkey < 500),
        |b AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 53 = 0 THEN o_totalprice * 1.1
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_custkey < 500 AND o_orderkey % 97 <> 0)
        |SELECT coalesce(a.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
        |       CAST(sum(CASE WHEN a.o_orderkey IS NOT NULL
        |                      AND b.o_orderkey IS NOT NULL
        |                      AND a.o_totalprice = b.o_totalprice
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
        |       CAST(sum(CASE WHEN a.o_orderkey IS NOT NULL
        |                      AND b.o_orderkey IS NOT NULL
        |                      AND a.o_totalprice <> b.o_totalprice
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
        |       CAST(sum(CASE WHEN b.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_only_remote,
        |       CAST(sum(CASE WHEN a.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_only_local
        |FROM a FULL JOIN b ON a.o_orderkey = b.o_orderkey
        |GROUP BY 1""".stripMargin,

    "events_anomaly_mad_approx" ->
      """WITH v AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(vc, 0.5) AS med
        |      FROM v GROUP BY 1),
        |d AS (SELECT v.event_type, abs(v.vc - m.med) AS dev
        |      FROM v JOIN m ON v.event_type = m.event_type),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |       FROM d GROUP BY 1)
        |SELECT d.event_type, max(m.med) AS med, max(md.mad) AS mad,
        |       count(*) AS n,
        |       CAST(sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_outliers,
        |       true AS med_within, true AS mad_within,
        |       true AS outliers_within
        |FROM d
        |JOIN m ON d.event_type = m.event_type
        |JOIN md ON d.event_type = md.event_type
        |GROUP BY 1""".stripMargin,

    "asof_join_sql_auto" -> asofSqlText("events", "orders"),

    "asof_join_native" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS matched_order_date
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    "asof_join_native_forward" ->
      """SELECT c.event_id, c.user_id,
        |       CAST(floor(epoch(p.ts)) AS BIGINT) AS next_purchase_epoch
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts""".stripMargin,

    "asof_join_native_tolerance" ->
      """SELECT e.event_id, e.user_id,
        |       CASE WHEN e.ts - c.ts <= INTERVAL 1 HOUR
        |            THEN CAST(floor(epoch(c.ts)) AS BIGINT) END AS last_click_epoch
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin,

    "graph_triangles_lsh" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($TokensSql) AS tok
         |  FROM documents WHERE doc_id < 300),
         |sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
         |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM inter
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b
         |  WHERE i / (sa.n + sb.n - i) >= 0.8),
         |deg AS (
         |  SELECT id, count(*) AS d FROM (
         |    SELECT id_a AS id FROM pairs
         |    UNION ALL SELECT id_b FROM pairs)
         |  GROUP BY 1)
         |SELECT (SELECT count(*) FROM pairs) AS n_edges,
         |       (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) FROM deg)
         |         AS n_wedges,
         |       (SELECT count(*)
         |        FROM pairs e1
         |        JOIN pairs e2 ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
         |        JOIN pairs e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b)
         |         AS n_triangles,
         |       true AS edges_recall_ok, true AS triangles_recall_ok""".stripMargin
  )
}
