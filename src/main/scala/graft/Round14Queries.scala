package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-14 depth queries.
  *
  * Headliners close the round-13 verdict asks on the as-of tier:
  *  - `asof_join_sql_tolerance_auto` / `asof_join_sql_forward_auto` —
  *    the tolerance-bounded and forward spellings of the natural
  *    correlated-scalar as-of SQL, collapsed by the extended
  *    [[graft.plans.AsOfRewriteRule]] into the native operator (the
  *    stale-quote SQL a real user writes no longer falls onto the
  *    killed-at-12-minutes nested-loop path);
  *  - `asof_join_native_skew` — the hot-key mitigation: time-split
  *    salting of the native as-of join, certified against the same
  *    answer as the unsalted operator;
  *  - `asof_stream_enrich` — streaming as-of enrichment (each event
  *    joined to the latest prior dimension row, per trigger);
  *  - `reconcile_jdbc_dual` — BOTH reconcile sides read over live JDBC
  *    endpoints with per-side pushed predicates (the reference's
  *    two-connection job, `configuration.properties:1-8`).
  */
object Round14Queries {

  /** Tolerance as-of SQL: latest click within 1 hour before each error,
    * as the natural correlated scalar subquery. ONE text, run in Spark
    * (rewrite collapses it to the native operator with
    * toleranceMicros=3600s) and verbatim in DuckDB.
    */
  private def asofTolSqlText(events: String): String =
    s"""SELECT e.event_id, e.user_id,
       |       (SELECT max(c.ts) FROM $events c
       |        WHERE c.event_type = 'click' AND c.user_id = e.user_id
       |          AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR)
       |         AS last_click_ts
       |FROM $events e
       |WHERE e.event_type = 'error'""".stripMargin

  /** STRICT tolerance spelling: `>` instead of `>=` on the bound. The
    * rewrite maps it to toleranceMicros = 1h − 1µs (timestamps are
    * microsecond-resolution, so the two are identical relations);
    * DuckDB evaluates the strict predicate directly — any boundary-tie
    * divergence would hash-mismatch.
    */
  private def asofStrictTolSqlText(events: String): String =
    s"""SELECT e.event_id, e.user_id,
       |       (SELECT max(c.ts) FROM $events c
       |        WHERE c.event_type = 'click' AND c.user_id = e.user_id
       |          AND c.ts <= e.ts AND c.ts > e.ts - INTERVAL 1 HOUR)
       |         AS last_click_ts
       |FROM $events e
       |WHERE e.event_type = 'error'""".stripMargin

  /** Forward as-of SQL: earliest following purchase per click. */
  private def asofFwdSqlText(events: String): String =
    s"""SELECT c.event_id, c.user_id,
       |       (SELECT min(p.ts) FROM $events p
       |        WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
       |          AND p.ts >= c.ts) AS next_purchase_ts
       |FROM $events c
       |WHERE c.event_type = 'click'""".stripMargin

  /** Run an as-of SQL text with the rewrite enabled, pin the expected
    * plan shape, and materialize the result so the conf toggle cannot
    * leak into later execution (same discipline as asof_join_sql_auto).
    */
  private def runAsofSql(s: SparkSession, dir: String, name: String,
      sql: String, forward: Boolean, tolMicros: Option[Long]): DataFrame = {
    plans.AsOfRewriteRule.installLate(s)
    val key = plans.AsOfRewriteRule.EnabledKey
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      Tables.events(s, dir).createOrReplaceTempView("asql14_events")
      val df = s.sql(sql)
      // pin the rewrite INCLUDING direction and tolerance: a fire that
      // dropped the tolerance would still look like an AsOfJoin in the
      // formatted plan but return wrong (non-null) rows at 100 TB
      val nodes = df.queryExecution.optimizedPlan.collect {
        case p: plans.AsOfJoinPlan
            if p.forward == forward && p.toleranceMicros == tolMicros => p
      }
      require(nodes.nonEmpty,
        s"as-of rewrite did not fire with forward=$forward tol=$tolMicros:\n" +
          df.queryExecution.optimizedPlan)
      val plan = df.queryExecution.explainString(FormattedMode)
      require(!plan.contains("BroadcastNestedLoopJoin") &&
              !plan.contains("CartesianProduct"),
        "rewrite enabled but the domain join still nested-loops")
      val out = CoreQueries.scratchDir(name)
      df.write.mode("overwrite").parquet(out)
      s.read.parquet(out)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The stale-quote SQL shape (round-13 "what's missing" #2): a user
    // bounding the backward as-of with `AND c.ts >= e.ts - INTERVAL 1
    // HOUR` previously stayed on the BNLJ domain-join path even with
    // the rewrite on — the matcher now maps the tolerance conjunct
    // onto the operator's toleranceMicros.
    "asof_join_sql_tolerance_auto" -> { (s, dir) =>
      runAsofSql(s, dir, "asof_join_sql_tolerance_auto",
        asofTolSqlText("asql14_events"),
        forward = false, tolMicros = Some(3600000000L))
    },

    // The same stale-quote SQL with a STRICT bound — the other
    // spelling a user reaches for — certified through the 1µs
    // tolerance tightening.
    "asof_join_sql_strict_auto" -> { (s, dir) =>
      runAsofSql(s, dir, "asof_join_sql_strict_auto",
        asofStrictTolSqlText("asql14_events"),
        forward = false, tolMicros = Some(3600000000L - 1L))
    },

    // The forward (min/>=) SQL spelling through the same front door —
    // the rule matched it since round 13 but the certified SQL surface
    // only exercised backward/max.
    "asof_join_sql_forward_auto" -> { (s, dir) =>
      runAsofSql(s, dir, "asof_join_sql_forward_auto",
        asofFwdSqlText("asql14_events"),
        forward = true, tolMicros = None)
    },

    // Hot-key mitigation for the native as-of operator (round-13
    // verdict #1): AQE's OptimizeSkewedJoin only splits SMJ/SHJ nodes,
    // so a hot key would stall the custom exec in one task with no
    // runtime remedy. joinSkewSalted time-splits the key space and
    // replicates ONE boundary row per (key, split) — O(1) state makes
    // that sufficient — spreading a hot key's merge across numSplits
    // tasks. Same inputs and same DuckDB ASOF JOIN oracle as
    // asof_join_native: the mitigation must change the PLAN, never the
    // answer. The require pins both the native exec and the composite
    // (key, split) clustering.
    "asof_join_native_skew" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val o = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderdate").as("matched_order_date"))
      val df = plans.AsOfJoinNative.joinSkewSalted(ev, o,
          "user_id", "o_custkey", "ts", "o_orderdate",
          Seq("matched_order_date"))
        .select("event_id", "user_id", "matched_order_date")
      val nodes = df.queryExecution.optimizedPlan.collect {
        case p: plans.AsOfJoinPlan if p.leftKeys.length == 2 => p
      }
      require(nodes.nonEmpty,
        "salted as-of lost the native operator or the split key")
      df
    },

    // Streaming as-of enrichment (round-13 verdict ask #4): the
    // canonical stream-enrichment shape the events tier lacked — each
    // streaming event joined to the LATEST PRIOR dimension row. The
    // native as-of operator is a batch physical operator, so the
    // streaming form runs it per trigger inside foreachBatch, where
    // each micro-batch is an ordinary DataFrame under the session's
    // full planner: every event is enriched exactly once in the batch
    // it arrives, the right side is static, and the union of the
    // batch-id-partitioned emissions equals the batch as-of — which is
    // why the oracle is the SAME DuckDB ASOF JOIN as asof_join_native.
    // STATE: the streaming query holds none (no watermark, no state
    // store — the as-of state lives inside each batch's merge, O(1)
    // per task); exactly-once comes from the replay-stable batch-id
    // partition overwrite, and the requires pin a real multi-trigger
    // run with the native exec planned in every batch.
    "asof_stream_enrich" -> { (s, dir) =>
      import graft.stream.StreamRun
      val out = CoreQueries.scratchDir("asof_stream_enrich")
      val src = Round7Queries.eventsChunks(s, dir)
      val dim = Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderdate"),
          col("o_orderdate").as("matched_order_date"))
      val batchesWithAsOf = new java.util.concurrent.atomic.AtomicInteger
      val (result, stats) = StreamRun.runAvailableNowSummarized(
        src, s"$out/run",
        batch => {
          val enriched = plans.AsOfJoinNative.join(
              batch.select("event_id", "user_id", "ts"), dim,
              "user_id", "o_custkey", "ts", "o_orderdate",
              Seq("matched_order_date"))
            .select("event_id", "user_id", "matched_order_date")
          if (enriched.queryExecution.optimizedPlan.collect {
              case p: plans.AsOfJoinPlan => p }.nonEmpty)
            batchesWithAsOf.incrementAndGet()
          enriched
        })
      val dataBatches = stats.count(_.inputRows > 0)
      require(dataBatches >= 4,
        s"expected a real multi-trigger run, got $dataBatches data batches")
      require(batchesWithAsOf.get() >= dataBatches,
        "a micro-batch was enriched without the native as-of operator")
      result.select("event_id", "user_id", "matched_order_date")
    },

    // TRUE two-connection reconcile (round-13 verdict ask #8): BOTH
    // sides arrive over live JDBC — two independent connections with
    // their own credentials, their own pushed predicate, and their own
    // range slicing (8 vs 6 partitions), reading two different
    // warehouse tables (side B is published already-drifted, so the
    // drift lives server-side like a real divergent replica). One
    // in-process endpoint serves both connections — a JVM can host
    // exactly one HiveServer2 (Hive service singletons; probed) — but
    // the engine-side path is identical to two hosts: two separate
    // spark.read.jdbc scans, nothing shared but the session.
    // SCHEDULER NOTE (advisor): the client-side scan tasks and the
    // server-side query tasks share this one scheduler, so client
    // parallelism (8 + 6) must stay below the pool size (32 here) or
    // the remote queries starve behind their own consumers — on a real
    // two-warehouse deployment the server side runs elsewhere and the
    // constraint disappears.
    "reconcile_jdbc_dual" -> { (s, dir) =>
      import graft.sources.JdbcWarehouse
      val port = JdbcWarehouse.ensureServer(s)
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val drifted = orders.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 53 === 0, col("o_totalprice") * 1.1)
            .otherwise(col("o_totalprice")))
      val tblA = JdbcWarehouse.publish(orders, "graft_jdbc_dual_a")
      val tblB = JdbcWarehouse.publish(drifted, "graft_jdbc_dual_b")
      val bounds = orders.agg(min("o_orderkey"), max("o_orderkey")).head
      def remote(tbl: String, user: String, parts: Int): DataFrame =
        JdbcWarehouse.readTable(s, port, tbl, "o_orderkey",
            bounds.getLong(0), bounds.getLong(1) + 1, parts,
            user = user, password = user)
          .filter(col("o_custkey") < 500)
      // slice counts derived from the scheduler size (round 22 — see
      // reconcile_jdbc: client tasks that fill the pool deadlock the
      // in-process server side; 32 cores keeps the certified 8 vs 6)
      val pool = s.sparkContext.defaultParallelism
      val partsA = math.min(8, math.max(1, pool / 4))
      val partsB = math.min(6, math.max(1, pool * 3 / 16))
      val a = remote(tblA, "warehouse_a", partsA)
      val b = remote(tblB, "warehouse_b", partsB)
      for ((df, parts, side) <- Seq((a, partsA, "A"), (b, partsB, "B"))) {
        val plan = df.queryExecution.explainString(FormattedMode)
        require("PushedFilters: \\[[^\\]]*o_custkey".r.findFirstIn(plan)
            .isDefined, s"side $side predicate not pushed:\n$plan")
        require(plan.contains(s"numPartitions=$parts"),
          s"side $side scan is not range-partitioned:\n$plan")
      }
      val aa = a.select(col("o_orderkey").as("ak"),
        col("o_orderstatus").as("a_status"), col("o_totalprice").as("a_price"))
      val bb = b.select(col("o_orderkey").as("bk"),
        col("o_orderstatus").as("b_status"), col("o_totalprice").as("b_price"))
      aa.join(bb, col("ak") === col("bk"), "full_outer")
        .groupBy(coalesce(col("a_status"), col("b_status")).as("o_orderstatus"))
        .agg(
          sum(when(col("ak").isNotNull && col("bk").isNotNull &&
            col("a_price") === col("b_price"), 1L).otherwise(0L)).as("n_match"),
          sum(when(col("ak").isNotNull && col("bk").isNotNull &&
            col("a_price") =!= col("b_price"), 1L).otherwise(0L)).as("n_mismatch"),
          sum(when(col("bk").isNull, 1L).otherwise(0L)).as("n_only_remote"),
          sum(when(col("ak").isNull, 1L).otherwise(0L)).as("n_only_local"))
    },

    // RECURSIVE CTE — iterative SQL executed by the engine's own
    // recursion operator (Spark 4.1 plans it as UnionLoop; DuckDB
    // iterates natively): every customer walks the implicit binary
    // tree n → ⌊n/2⌋ to the root, and the query folds the walk into a
    // depth histogram. The recursion is |customers| chains advanced in
    // PARALLEL one level per iteration — ⌈log₂ max key⌉ rounds of
    // distributed map work, the same iterate-to-fixpoint shape as the
    // engine's pointer-jumping connected components, but expressed in
    // pure SQL and oracle-certified verbatim. Integer halving is
    // spelled CAST(floor(cur / 2)) so both engines do identical
    // arithmetic (bare / is float division in DuckDB, integer division
    // in Spark).
    "sql_recursive_tree" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("rcte_customer")
      val df = s.sql(recursiveTreeSql("rcte_customer"))
      require(df.queryExecution.optimizedPlan.toString.contains("UnionLoop") ||
        df.queryExecution.analyzed.toString.contains("CTERelation"),
        "recursive CTE did not plan as the engine's recursion operator")
      df
    },

    // LATERAL correlated subquery with ORDER BY … LIMIT — the other
    // natural per-group top-k SQL spelling (the first is the window
    // rank of window_rank_topn). Catalyst DECORRELATES it into
    // WindowGroupLimit + a broadcast join: per-partition rank
    // pushdown, no nested loop, no global sort — the plan a 100 TB
    // top-k needs, reached from the lateral spelling automatically.
    // The require pins that decorrelation (a regression to a
    // correlated nested loop would execute per-customer subqueries).
    "sql_lateral_topk" -> { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("lat_customer")
      Tables.orders(s, dir).createOrReplaceTempView("lat_orders")
      val df = s.sql(lateralTopkSql("lat_customer", "lat_orders"))
      val plan = df.queryExecution.explainString(FormattedMode)
      require(plan.contains("WindowGroupLimit"),
        s"lateral top-k did not decorrelate to WindowGroupLimit:\n$plan")
      require(!plan.contains("BroadcastNestedLoopJoin") &&
              !plan.contains("CartesianProduct"),
        s"lateral top-k fell back to a nested loop:\n$plan")
      df
    },

    // Incremental view maintenance for a JOIN view (X8 depth): the
    // denormalized orders ⋈ customer view is maintained from a DELTA
    // batch alone — deletes drop keys, updates/inserts re-join ONLY
    // the delta rows against the dimension — instead of recomputing
    // the join over the full fact table. Deterministic delta: keys
    // %103 deleted, %101 repriced ×1.05, and a synthetic insert tier
    // (key + 10⁹, segment customer 1). The oracle recomputes the
    // final state from scratch — the incremental path must equal the
    // full recompute exactly. Scale shape: the maintenance cost is
    // |Δ| joined against a broadcast dim + one store rewrite (at
    // 100 TB the store is partitioned and only touched partitions
    // rewrite, same scoping as Warehouse.mergeByKey); the require
    // pins that the delta-side join is broadcast (dim side), so the
    // fact-sized view never reshuffles.
    "warehouse_ivm_join" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("warehouse_ivm_join")
      val cust = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      def joined(o: DataFrame): DataFrame =
        o.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("c_mktsegment"))
      // V0: the materialized view before the delta arrives
      joined(orders).write.mode("overwrite").parquet(s"$out/view")
      val v0 = s.read.parquet(s"$out/view")
      // the delta batch (upserts carry full rows; deletes carry keys;
      // the %101 exclusion keeps the delete and upsert key sets
      // disjoint — a key in both would be order-of-application
      // ambiguous, the classic IVM delta-normalization requirement)
      val deletes = orders.filter(col("o_orderkey") % 103 === 0 &&
          col("o_orderkey") % 101 =!= 0)
        .select(col("o_orderkey"))
      // reprice by an exact-in-double +1.00 (a fractional factor plus
      // per-row rounding flips penny boundaries between engines)
      val upserts = orders.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1.0)
        .unionByName(orders.filter(col("o_orderkey") % 101 === 0)
          .select((col("o_orderkey") + lit(1000000000L)).as("o_orderkey"),
            lit(1L).as("o_custkey"), col("o_totalprice")))
      val dPlan = joined(upserts).queryExecution
        .explainString(FormattedMode)
      require(dPlan.contains("BroadcastHashJoin"),
        s"IVM delta join must broadcast the dimension:\n$dPlan")
      val touched = deletes.select("o_orderkey")
        .unionByName(upserts.select("o_orderkey")).distinct()
      val v1 = v0.join(touched, Seq("o_orderkey"), "left_anti")
        .unionByName(joined(upserts))
      v1.write.mode("overwrite").parquet(s"$out/view_next")
      s.read.parquet(s"$out/view_next")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          round(sum("o_totalprice"), 2).as("sum_price"))
    },

    // Product-quantization ANN (X3's third index family, beside
    // RHP-LSH and IVF): corpus vectors compressed to m=8 one-byte
    // codes (32× memory compression — the lever that turns a 100 TB
    // embedding corpus into an in-memory index), queries answered from
    // the codes via ADC lookup-table sums, top rerank·k candidates
    // exactly re-ranked. Certified like the IVF pair: over the
    // planted-cluster view (the raw fixture is near-uniform on the
    // sphere — no quantizer discriminates there, measured 0.59 recall
    // vs 1.000 on the clustered view), single-pass verdict against
    // the exact brute-force top-3, recall_ok pinned at >= 0.9
    // (measured 1.000 at sf0.01 and sf0.1 with rerank=16).
    "similarity_pq_topk" -> { (s, dir) =>
      val e = ext.SimSearch.clusteredView(Tables.embeddings(s, dir),
        "vec_id", "embedding", nClusters = PqNClusters, mix = PqMix.toDouble)
      val q = e.filter(col("vec_id") < 100)
      val pq = ext.SimSearch.pqTopK(e, "vec_id", "embedding", 3,
          rerank = 16, lloydIters = 1, queries = Some(q))
        .select(col("id_q"), col("neighbor_id"), lit(1L).as("hit"))
      ext.SimSearch.topKBruteForce(q, e, "vec_id", "embedding", 3)
        .join(pq, Seq("id_q", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          round(sum(col("cos")), 2).as("sum_cos"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            >= count(lit(1)) * 0.9).as("recall_ok"))
    },

    // The DataSource V2 front door (S4 grown into a connector tier —
    // sources/v2/DelimV2): orders serialized as pipe-delimited text,
    // read back through the graft-delim connector with a TYPED schema,
    // a selective predicate, and a 3-column projection. The requires
    // pin what makes this a SOURCE and not a parse-in-a-projection:
    // both WHERE conjuncts are absorbed into the scan (evaluated on
    // parsed fields before a row object exists — no residual Filter),
    // and the read schema is pruned to the three surviving columns, so
    // fields 1, 2, and the filter-only status column never leave the
    // reader (status is parsed for the pushed predicate only). At
    // 100 TB this is the difference between shipping every field of
    // every row into the query and shipping three fields of the
    // selective subset; splitBytes=64 KiB forces multi-split reads at
    // every SF, so the exactly-once newline realignment is certified
    // by the oracle row count, not just the unit suite.
    "delim_v2_pushdown" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_pushdown")
      Tables.orders(s, dir)
        .select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), col("o_totalprice"),
          col("o_orderdate").cast("date"), col("o_orderpriority")).as("line"))
        .write.mode("overwrite").text(s"$out/orders")
      val df = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, " +
          "o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING")
        .option("splitBytes", (64 * 1024).toString)
        .load(s"$out/orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"),
          min("o_orderdate").as("first_date"))
      val plan = df.queryExecution.explainString(FormattedMode)
      require(plan.contains("GraftDelim"), s"graft-delim scan missing:\n$plan")
      require(plan.contains("EqualTo(o_orderstatus,F)") &&
        plan.contains("GreaterThan(o_totalprice,150000.0)"),
        s"WHERE conjuncts not absorbed into the scan:\n$plan")
      // ReadSchema types appear as name:type — the filter-only status
      // column and the untouched key columns must not be read out
      require(plan.contains("o_totalprice:double") &&
        !plan.contains("o_orderstatus:string") &&
        !plan.contains("o_orderkey:bigint") && !plan.contains("o_custkey:bigint"),
        s"scan not pruned to the surviving columns:\n$plan")
      df
    },

    // Runtime (DPP-style) filtering on the V2 connector, in the
    // certified surface: lineitem as delimited text joined to the
    // part dimension under a selective predicate. The require pins
    // `dynamicpruningexpression` ON the graft-delim scan — Spark's
    // PartitionPruning hands the broadcast build side's key set to the
    // scan as an `In` filter at execution, and the reader applies it
    // at ROW level during the parse (a delimited file has no partition
    // directories, but a pruned fact row is never typed, materialized,
    // or shuffled toward the join). At 100 TB this is the classic
    // star-join shape: the 2%-selective dim predicate prunes the fact
    // scan itself, not just the join output. Correctness does not
    // depend on the runtime filter (the join re-checks the key), which
    // is exactly why row-level partial application is legal — the
    // oracle certifies the join, the require certifies the pruning.
    "delim_v2_runtime_prune" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_runtime_prune")
      Tables.lineitem(s, dir)
        .select(concat_ws("|", col("l_partkey"), col("l_quantity"),
          col("l_extendedprice")).as("line"))
        .write.mode("overwrite").text(s"$out/lineitem")
      val fact = s.read.format("graft-delim")
        .schema("l_partkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE")
        .load(s"$out/lineitem")
      val dim = Tables.part(s, dir)
        .filter(col("p_size") <= 3)
        .select(col("p_partkey"), col("p_brand"))
      val df = fact.join(broadcast(dim), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum("l_extendedprice"), 2).as("revenue"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("GraftDelim"), s"graft-delim scan missing:\n$plan")
      require(plan.contains("dynamicpruningexpression"),
        s"runtime filter not planned onto the delim scan:\n$plan")
      df
    },

    // The connector's WRITE path in the certified surface: high-value
    // orders written through the graft-delim SINK (the V2 staged-commit
    // protocol — tasks write to _staging_<queryId>/, the commit
    // coordinator picks one winner per partition, the driver's job
    // commit clears the old generation and moves exactly the committed
    // files), read back through the connector's typed scan, aggregated.
    // The oracle recomputes from parquet, so a duplicated, dropped, or
    // torn line anywhere in the sink→source loop hash-mismatches; the
    // bench's double-run additionally exercises the TRUNCATE path
    // (second overwrite must fully replace the first generation).
    "delim_v2_sink_roundtrip" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_sink_roundtrip")
      Tables.orders(s, dir)
        .filter(col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_totalprice"))
        .write.format("graft-delim").mode("overwrite").save(s"$out/orders")
      s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_orderdate DATE, o_totalprice DOUBLE")
        .load(s"$out/orders")
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"),
          countDistinct("o_custkey").as("n_custs"))
    },

    // Pushed COUNT(*) on the connector (A1's delim analog of the
    // parquet footer-only count): each split counts its owned lines by
    // scanning bytes for '\n' — no parse, no String, no per-line row —
    // and Spark sums the per-split partials. The require pins the
    // pushdown; declining paths (filters present, GROUP BY) are
    // spec-covered.
    "delim_v2_count_pushdown" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_count_pushdown")
      Tables.orders(s, dir)
        .select(concat_ws("|", col("o_orderkey"), col("o_orderstatus")).as("line"))
        .write.mode("overwrite").text(s"$out/orders")
      val df = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_orderstatus STRING")
        .option("splitBytes", (64 * 1024).toString)
        .load(s"$out/orders")
        .groupBy()
        .agg(count(lit(1)).as("n_rows"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("PushedAggregation: [count(*)]"),
        s"COUNT(*) not pushed into the delim scan:\n$plan")
      df
    }
  )

  /** PQ certification constants, shared between the Spark call site and
    * the oracle text (the clustered view mirrors the IVF pair's —
    * Round2Queries.IvfNClusters/IvfMix — so the two ANN indexes certify
    * over the same planted-structure corpus).
    */
  private val PqNClusters = Round2Queries.IvfNClusters
  private val PqMix = Round2Queries.IvfMix

  private def recursiveTreeSql(customer: String): String =
    s"""WITH RECURSIVE walk(start, cur, depth) AS (
       |  SELECT c_custkey, c_custkey, 0 FROM $customer
       |  UNION ALL
       |  SELECT start, CAST(floor(cur / 2) AS BIGINT), depth + 1
       |  FROM walk WHERE cur > 1)
       |SELECT depth AS tree_depth, count(*) AS n_customers FROM (
       |  SELECT start, max(depth) AS depth FROM walk GROUP BY start)
       |GROUP BY 1""".stripMargin

  /** Comma-LATERAL spelling: the one both engines parse (DuckDB's
    * `JOIN LATERAL` form requires an ON clause Spark doesn't).
    */
  private def lateralTopkSql(customer: String, orders: String): String =
    s"""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
       |FROM $customer c, LATERAL (
       |  SELECT o_orderkey, o_totalprice FROM $orders
       |  WHERE o_custkey = c.c_custkey
       |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // identical exact-baseline relation to similarity_ivf_topk's
    // oracle: same clustered view, same ranking; the PQ path only has
    // to hit >= 90% of it (literal-true verdict)
    "similarity_pq_topk" ->
      s"""WITH ctr AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < $PqNClusters),
         |v AS (
         |  SELECT e.vec_id, list_transform(range(len(cemb)),
         |           i -> CAST(cemb[i + 1] + $PqMix * e.embedding[i + 1] AS REAL)) AS emb
         |  FROM embeddings e JOIN ctr ON e.vec_id % $PqNClusters = ctr.cid),
         |s AS (
         |  SELECT q.vec_id AS id_q, c.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
         |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100)
         |SELECT count(*) AS n_exact, round(sum(cos), 2) AS sum_cos,
         |       true AS recall_ok FROM (
         |  SELECT cos, row_number() OVER (PARTITION BY id_q
         |           ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM s)
         |WHERE rank <= 3""".stripMargin,

    // the text roundtrip is lossless (keys/status exact; double via
    // shortest-roundtrip toString; date via ISO), so the oracle
    // recomputes straight from the parquet table
    "delim_v2_pushdown" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       min(CAST(o_orderdate AS DATE)) AS first_date
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |GROUP BY 1""".stripMargin,

    "delim_v2_runtime_prune" ->
      """SELECT p_brand, count(*) AS n_items,
        |       round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE p.p_size <= 3
        |GROUP BY 1""".stripMargin,

    "delim_v2_sink_roundtrip" ->
      """SELECT year(CAST(o_orderdate AS DATE)) AS order_year,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       count(DISTINCT o_custkey) AS n_custs
        |FROM orders
        |WHERE o_totalprice > 200000.0
        |GROUP BY 1""".stripMargin,

    "delim_v2_count_pushdown" ->
      "SELECT count(*) AS n_rows FROM orders",

    "sql_recursive_tree" -> recursiveTreeSql("customer"),
    "sql_lateral_topk" -> lateralTopkSql("customer", "orders"),

    // full recompute of the post-delta state: the incremental path
    // must equal it exactly
    "warehouse_ivm_join" ->
      """WITH final_orders AS (
        |  SELECT o_orderkey, o_custkey,
        |         CASE WHEN o_orderkey % 101 = 0
        |              THEN o_totalprice + 1.0
        |              ELSE o_totalprice END AS o_totalprice
        |  FROM orders
        |  WHERE NOT (o_orderkey % 103 = 0 AND o_orderkey % 101 <> 0)
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, 1, o_totalprice
        |  FROM orders WHERE o_orderkey % 101 = 0)
        |SELECT c.c_mktsegment, count(*) AS n_rows,
        |       round(sum(f.o_totalprice), 2) AS sum_price
        |FROM final_orders f JOIN customer c ON f.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,

    "asof_join_sql_tolerance_auto" -> asofTolSqlText("events"),
    "asof_join_sql_strict_auto" -> asofStrictTolSqlText("events"),
    "asof_join_sql_forward_auto" -> asofFwdSqlText("events"),

    // identical text to asof_join_native's oracle: the salted plan must
    // reproduce the unsalted answer bit for bit
    "asof_join_native_skew" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS matched_order_date
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    // and the same oracle once more for the STREAMING form: the union
    // of per-trigger as-of emissions must equal the batch as-of
    "asof_stream_enrich" ->
      """SELECT e.event_id, e.user_id, o.o_orderdate AS matched_order_date
        |FROM events e
        |ASOF LEFT JOIN orders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,

    // identical relation to reconcile_jdbc's oracle: moving side B
    // behind its own JDBC connection must not change the reconcile
    "reconcile_jdbc_dual" ->
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
        |GROUP BY 1""".stripMargin
  )
}
