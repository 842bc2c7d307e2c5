package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.v2.DelimV2

/** Round-15 depth queries.
  *
  * Headliner: the `graft-delim` connector learns the reference's
  * central data model — `k=v` partition DIRECTORIES
  * (verizon_automation_script.sh:104-115's dt=/hr= trees) — with the
  * two pruning levers that matter at 100 TB:
  *  - `delim_v2_partition_prune` — STATIC file-level pruning: a pushed
  *    partition predicate drops whole directories at planning, so
  *    their bytes are never read (r14's connector could only skip rows
  *    AFTER reading them);
  *  - `delim_v2_partition_dpp` — RUNTIME file-level pruning: Spark's
  *    partition-pruning rule hands the broadcast build side's key set
  *    to the scan, and the re-planned splits exclude every
  *    non-matching partition FILE.
  */
object Round15Queries {

  /** The payload-bearing as-of SQL (round-14 "what's missing" #3): a
    * LATERAL top-1 that returns the matched row's COLUMNS, not just its
    * time. ONE text, run in Spark (the extended AsOfRewriteRule
    * collapses it onto the native operator) and verbatim in DuckDB.
    * The clicks CTE reduces to one row per (user, ts) so the top-1 is
    * tie-free — ORDER-BY-LIMIT ties are nondeterministic in ANY
    * engine, so a hash-compared certification must exclude them.
    */
  private def asofLateralSqlText(events: String): String =
    s"""WITH clicks AS (
       |  SELECT user_id AS q_user, ts AS q_ts, max(event_id) AS q_id
       |  FROM $events
       |  WHERE event_type = 'click'
       |  GROUP BY 1, 2)
       |SELECT e.event_id, e.user_id, q.q_ts AS click_ts, q.q_id AS click_id
       |FROM $events e, LATERAL (
       |  SELECT q_ts, q_id FROM clicks q
       |  WHERE q.q_user = e.user_id AND q.q_ts <= e.ts
       |  ORDER BY q.q_ts DESC LIMIT 1) q
       |WHERE e.event_type = 'error'""".stripMargin

  /** LEFT-outer spelling of the same payload as-of: no-match events
    * survive with NULL click columns — the operator's output as-is (no
    * inner filter). Both engines parse this text verbatim.
    */
  private def asofLateralLeftSqlText(events: String): String =
    s"""WITH clicks AS (
       |  SELECT user_id AS q_user, ts AS q_ts, max(event_id) AS q_id
       |  FROM $events
       |  WHERE event_type = 'click'
       |  GROUP BY 1, 2)
       |SELECT e.event_id, e.user_id, q.q_ts AS click_ts, q.q_id AS click_id
       |FROM $events e LEFT OUTER JOIN LATERAL (
       |  SELECT q_ts, q_id FROM clicks q
       |  WHERE q.q_user = e.user_id AND q.q_ts <= e.ts
       |  ORDER BY q.q_ts DESC LIMIT 1) q ON true
       |WHERE e.event_type = 'purchase'""".stripMargin

  /** Shared runner for the lateral as-of certifications. */
  private[graft] def runLateralAsof(
      s: SparkSession, dir: String, name: String, sql: String,
      tolMicros: Option[Long] = None,
      nearest: Boolean = false): DataFrame = {
    plans.AsOfRewriteRule.installLate(s)
    val key = plans.AsOfRewriteRule.EnabledKey
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try {
      Tables.events(s, dir).createOrReplaceTempView("asql15_events")
      val df = s.sql(sql)
      val opt = df.queryExecution.optimizedPlan
      val nodes = opt.collect {
        case p: plans.AsOfJoinPlan
            if !p.forward && p.toleranceMicros == tolMicros &&
              p.nearest == nearest => p
      }
      require(nodes.nonEmpty,
        s"lateral as-of rewrite did not fire with tol=$tolMicros " +
          s"nearest=$nearest:\n$opt")
      val leftoverRanking = opt.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
        case w: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit => w
      }
      require(leftoverRanking.isEmpty,
        s"ranking sandwich survived the rewrite:\n$opt")
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

  /** Tolerance-bounded lateral: the stale-quote payload spelling. */
  private def asofLateralTolSqlText(events: String): String =
    s"""WITH clicks AS (
       |  SELECT user_id AS q_user, ts AS q_ts, max(event_id) AS q_id
       |  FROM $events
       |  WHERE event_type = 'click'
       |  GROUP BY 1, 2)
       |SELECT e.event_id, e.user_id, q.q_ts AS click_ts, q.q_id AS click_id
       |FROM $events e, LATERAL (
       |  SELECT q_ts, q_id FROM clicks q
       |  WHERE q.q_user = e.user_id AND q.q_ts <= e.ts
       |    AND q.q_ts >= e.ts - INTERVAL 1 HOUR
       |  ORDER BY q.q_ts DESC LIMIT 1) q
       |WHERE e.event_type = 'error'""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The LEFT-outer lateral as-of: the spelling that KEEPS no-match
    // rows with nulls — the operator's own output, no inner filter.
    // Same collapse, same requires; the purchase-side left means real
    // null rows exist at every SF (purchases with no prior click).
    "asof_lateral_left_auto" -> { (s, dir) =>
      runLateralAsof(s, dir, "asof_lateral_left_auto",
        asofLateralLeftSqlText("asql15_events"))
    },

    // The stale-quote LATERAL: the tolerance-bounded payload as-of a
    // real user writes — latest click within 1 hour before each error,
    // RETURNING THE CLICK'S COLUMNS. The rewrite maps the extra bound
    // onto the operator's toleranceMicros (require'd EXACTLY — a fire
    // that dropped the tolerance would look right in a name-only plan
    // check and return wrong rows); DuckDB evaluates the bound
    // directly, so any divergence hash-mismatches.
    "asof_lateral_tolerance_auto" -> { (s, dir) =>
      runLateralAsof(s, dir, "asof_lateral_tolerance_auto",
        asofLateralTolSqlText("asql15_events"), tolMicros = Some(3600000000L))
    },

    // The LATERAL as-of front door: without the rewrite, Spark
    // decorrelates the top-1 into the domain sandwich PLUS a
    // WindowGroupLimit re-sort of the full right side per (key, time)
    // group — the same |distinct ts| × |R| nested-loop shape the
    // scalar rewrite killed, now with payload columns. The extended
    // matcher collapses it onto the native operator with the payloads
    // riding through; the requires pin the fire (backward, no
    // tolerance), the ABSENCE of the ranking machinery (Window /
    // WindowGroupLimit both gone), and the nested-loop-free plan.
    "asof_lateral_auto" -> { (s, dir) =>
      runLateralAsof(s, dir, "asof_lateral_auto",
        asofLateralSqlText("asql15_events"))
    },

    // STATIC partition pruning on the connector: orders serialized as
    // an o_orderstatus=X partition tree (one coalesced file per status
    // — deterministic file counts for the require), read back with the
    // status as a PARTITION column (it is not in the file bytes at
    // all). The pushed status predicate prunes at FILE level: the
    // require pins (a) the partition-column marker and the absorbed
    // predicate in the plan, and (b) via the planned-splits hook after
    // a pushed-limit probe, that the two non-matching directories
    // contributed ZERO splits. At 100 TB this is the reference's own
    // abstraction — `WHERE dt='2024-01-01'` opens one directory, not
    // the table — now native to the delimited-text tier.
    "delim_v2_partition_prune" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_partition_prune")
      val fact = s"$out/orders-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val o = Tables.orders(s, dir)
      for (st <- Seq("F", "O", "P")) {
        o.filter(col("o_orderstatus") === st)
          .select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderdate").cast("date")).as("line"))
          .coalesce(1)
          .write.mode("overwrite").text(s"$fact/o_orderstatus=$st")
      }
      def reader = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
          "o_orderdate DATE, o_orderstatus STRING")
        .load(fact)
      val df = reader
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 150000.0)
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
      val plan = df.queryExecution.explainString(FormattedMode)
      require(plan.contains("PartitionColumns: [o_orderstatus]"),
        s"status not recognized as a partition column:\n$plan")
      require(plan.contains("EqualTo(o_orderstatus,F)"),
        s"partition predicate not absorbed into the scan:\n$plan")
      // file-level proof: a pushed-limit probe with the same partition
      // predicate (reads ~1 line) — the hook records (discovered files,
      // files kept after pruning, planned splits)
      DelimV2.recordPlannedSplits(fact, -1, -1, -1)
      reader.filter(col("o_orderstatus") === "F").limit(1).collect()
      val (disc, kept, _) = DelimV2.plannedSplitsFor(fact).get
      require(disc == 3 && kept == 1,
        s"pruned directories must contribute ZERO splits: " +
          s"discovered=$disc kept=$kept")
      df
    },

    // RUNTIME (DPP) partition pruning on the connector, FILE level:
    // events as an event_type=X partition tree joined to a parquet dim
    // under a selective predicate — Spark plugs the broadcast build
    // side's key set into the scan at execution, the splits are
    // RE-PLANNED under it, and non-matching partition directories
    // contribute zero splits (r14's `delim_v2_runtime_prune` could
    // only drop their rows after reading the bytes). The require pins
    // `dynamicpruningexpression` in the plan AND the planned-splits
    // hook after execution; correctness does not depend on the pruning
    // (the join re-checks the key), which is why file-level
    // application is legal — the oracle certifies the join, the
    // requires certify the pruning.
    "delim_v2_partition_dpp" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_partition_dpp")
      val fact = s"$out/events-${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
      val ev = Tables.events(s, dir)
      val types = ev.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted // bounded: event-type domain
      for (t <- types) {
        ev.filter(col("event_type") === t)
          .select(concat_ws("|", col("event_id"), col("user_id"),
            col("value")).as("line"))
          .coalesce(1)
          .write.mode("overwrite").text(s"$fact/event_type=$t")
      }
      import s.implicits._
      types.map(t => (t, if (t == "purchase") "hot" else "cold"))
        .toSeq.toDF("event_type", "grp")
        .write.mode("overwrite").parquet(s"$out/dim")
      val factDf = s.read.format("graft-delim")
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING")
        .load(fact)
      val dim = s.read.parquet(s"$out/dim").filter(col("grp") === "hot")
      val df = factDf.join(broadcast(dim), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("dynamicpruningexpression"),
        s"runtime filter not planned onto the delim scan:\n$plan")
      DelimV2.recordPlannedSplits(fact, -1, -1, -1)
      df.collect()
      val (disc, kept, _) = DelimV2.plannedSplitsFor(fact).get
      require(disc == types.length && kept == 1,
        s"runtime In must prune non-matching partition FILES: " +
          s"discovered=$disc kept=$kept")
      df
    },

    // The connector's PARTITIONED WRITE path closing the loop with its
    // partition-discovery read path: events written through the
    // graft-delim SINK with option("partitionBy", "event_type") — the
    // staged-commit protocol now renames each task's per-value staged
    // files into k=v subdirectories, partition values live in the
    // directory names (not the line bytes), and truncate-on-overwrite
    // replaces whole partition subtrees. Read back through the same
    // connector with the partition column typed from the directory,
    // statically pruned to one partition (zero splits from the other
    // four — require'd via the planned-splits hook), aggregated under
    // the parquet oracle: a row routed to the wrong directory, a
    // partition value mangled in formatting, or a leaked staged file
    // anywhere hash-mismatches.
    "delim_v2_partition_write" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_partition_write")
      val fact = s"$out/events"
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.format("graft-delim").option("partitionBy", "event_type")
        .mode("overwrite").save(fact)
      def reader = s.read.format("graft-delim")
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING")
        .load(fact)
      val df = reader
        .filter(col("event_type") === "click")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
      val plan = df.queryExecution.explainString(FormattedMode)
      require(plan.contains("PartitionColumns: [event_type]"),
        s"written layout not discovered as partitioned:\n$plan")
      DelimV2.recordPlannedSplits(fact, -1, -1, -1)
      reader.filter(col("event_type") === "click").limit(1).collect()
      val (disc, kept, _) = DelimV2.plannedSplitsFor(fact).get
      require(kept < disc,
        s"pruned partitions must contribute zero splits: ($disc, $kept)")
      df
    },

    // DYNAMIC partition overwrite on the connector — the reference's
    // `INSERT OVERWRITE TABLE ... PARTITION (dt)` nightly-load shape
    // (verizon_automation_script.sh's partitioned tables): generation 1
    // lands all event_type partitions; generation 2 OVERWRITES ONLY the
    // 'error' partition with a corrected feed (value + 1.00 — exact in
    // doubles), touching nothing else. The job commit derives the
    // replacement set from the commit messages' own k=v subdirs, so an
    // untouched partition keeps its files byte-for-byte. The oracle
    // recomputes the post-load state from parquet: a wiped untouched
    // partition, a survived stale 'error' row, or a double-applied
    // correction all hash-mismatch.
    "delim_v2_partition_overwrite" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_partition_overwrite")
      val fact = s"$out/events"
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      ev.write.format("graft-delim").option("partitionBy", "event_type")
        .mode("overwrite").save(fact)
      ev.filter(col("event_type") === "error")
        .withColumn("value", col("value") + 1.0)
        .write.format("graft-delim").option("partitionBy", "event_type")
        .option("overwriteMode", "dynamic")
        .mode("overwrite").save(fact)
      s.read.format("graft-delim")
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING")
        .load(fact)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"))
    },

    // The connector as a CATALOG table — the reference's EXTERNAL-TABLE
    // model in pure SQL (`CREATE EXTERNAL TABLE ... PARTITIONED BY ...
    // LOCATION ...` is how every reference table exists): CREATE TABLE
    // USING graft-delim over the partition-written layout, then a
    // plain SQL aggregate with a partition predicate — no DataFrame
    // reader call anywhere. The table-level OPTIONS (path, partitionBy)
    // resolve through the catalog hop into the scan, the partition
    // predicate still prunes at FILE level (require'd via the hook),
    // and the pushed filter marker survives. DROP IF EXISTS first: the
    // bench constructs every query twice in one session.
    "delim_v2_sql_table" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_sql_table")
      val fact = s"$out/events"
      Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .write.format("graft-delim").option("partitionBy", "event_type")
        .mode("overwrite").save(fact)
      s.sql("DROP TABLE IF EXISTS graft_delim_events_t")
      s.sql(s"""CREATE TABLE graft_delim_events_t
        (event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING)
        USING `graft-delim` OPTIONS (path '$fact', partitionBy 'event_type')""")
      val df = s.sql(
        """SELECT event_type, count(*) AS n_events,
          |       round(sum(value), 2) AS sum_value
          |FROM graft_delim_events_t
          |WHERE event_type IN ('click', 'purchase')
          |GROUP BY event_type""".stripMargin)
      // reset the hook BEFORE touching the plan: rendering the executed
      // plan materializes the scan's lazy input partitions (which is
      // when the hook records), so a reset after it would erase the
      // real counts
      DelimV2.recordPlannedSplits(fact, -1, -1, -1)
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("PartitionColumns: [event_type]"),
        s"catalog hop lost the partition layout:\n$plan")
      require(plan.contains("In(event_type"),
        s"partition predicate not absorbed through the catalog:\n$plan")
      df.collect()
      val (disc, kept, _) = DelimV2.plannedSplitsFor(fact).get
      require(kept < disc && kept > 0,
        s"partition predicate must prune files through SQL: ($disc, $kept)")
      df
    },

    // The connector as a STREAMING SINK — the landing-directory
    // PRODUCER role (every reference table is such a directory; this
    // is how one gets fed): the events stream written per trigger
    // through writeStream.format("graft-delim") into a k=v tree.
    // Each epoch commits like a small batch job onto DETERMINISTIC
    // (epoch, partition)-keyed file names, so a replayed epoch
    // overwrites its own files instead of duplicating rows —
    // at-least-once execution, exactly-once landed bytes. The oracle
    // recomputes from parquet: a dropped epoch, a duplicated replay,
    // or a row routed to the wrong partition directory all
    // hash-mismatch; the require pins a real multi-trigger run.
    "delim_v2_stream_sink" -> { (s, dir) =>
      import graft.stream.StreamRun
      val out = CoreQueries.scratchDir("delim_v2_stream_sink")
      val sink = s"$out/landed"
      graft.core.Scratch.rmTree(sink)
      graft.core.Scratch.rmTree(s"$out/ckpt")
      val src = Round7Queries.eventsChunks(s, dir)
      val q = src
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
        .writeStream.format("graft-delim")
        .option("path", sink)
        .option("partitionBy", "event_type")
        .option("checkpointLocation", s"$out/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      require(dataBatches >= 4,
        s"expected a real multi-trigger landing run, got $dataBatches")
      s.read.format("graft-delim")
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING")
        .load(sink)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    },

    // Pushed TopN on the connector (the scan-level feature after
    // limit): `ORDER BY price DESC LIMIT 10` keeps a 10-row bounded
    // heap PER SPLIT — k·splits rows enter the final merge instead of
    // the corpus entering a full-width sort. The requires pin the
    // pushed-TopN marker, the absorbed filter it composes with, and
    // the no-sort plan: TakeOrderedAndProject over the scan, no Sort
    // node anywhere. splitBytes=64 KiB forces multi-split heaps at
    // every SF; the unique-key tie-break keeps the answer
    // deterministic for the hash compare.
    "delim_v2_topn_pushdown" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_topn_pushdown")
      Tables.orders(s, dir)
        .select(concat_ws("|", col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("o_orderpriority")).as("line"))
        .write.mode("overwrite").text(s"$out/orders")
      val df = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
          "o_orderpriority STRING")
        .option("splitBytes", (64 * 1024).toString)
        .load(s"$out/orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("PushedTopN"),
        s"TopN not pushed into the delim scan:\n$plan")
      require(plan.contains("EqualTo(o_orderpriority,1-URGENT)"),
        s"filter must compose with the pushed TopN:\n$plan")
      require(plan.contains("TakeOrderedAndProject") && !plan.contains("+- Sort"),
        s"final merge must be a TakeOrdered, not a full sort:\n$plan")
      df
    },

    // Streaming as-of against an EVOLVING dimension (round-14 verdict
    // ask #7): asof_stream_enrich joined a static right side; the
    // production stale-quote shape appends dimension rows between
    // triggers. SNAPSHOT RULE, certified here: trigger b sees exactly
    // the dimension generations appended before it — gen <= b, gen =
    // o_orderkey % 4 — so an early event can NEVER be enriched by a
    // dimension row that had not landed yet (time-travel), and a
    // later trigger picks up the newer generations without reprocessing
    // old events. The union of the batch-partitioned emissions is
    // therefore NOT one batch as-of (the static query's oracle): it is
    // the per-batch as-of under each batch's own snapshot, which the
    // oracle replays row-for-row because the source uses the
    // rank-chunked layout — batch = ntile(4) OVER (ORDER BY ts,
    // event_id), a total order DuckDB reproduces exactly (the plain
    // chunked layout's sampled range boundaries could not be). The
    // requires pin a real 4-trigger run, the native as-of exec in
    // EVERY batch, and the batch-id domain the snapshot rule keyed on.
    "asof_stream_enrich_evolving" -> { (s, dir) =>
      import graft.stream.StreamRun
      val out = CoreQueries.scratchDir("asof_stream_enrich_evolving")
      val nChunks = 4
      val src = StreamRun.rankChunkedSource(s,
        Tables.events(s, dir).select("event_id", "user_id", "ts"),
        s"$out/src-${dir.replaceAll("[^A-Za-z0-9.]", "_")}", nChunks)
      val dim = Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderdate"),
        col("o_orderdate").as("matched_order_date"),
        pmod(col("o_orderkey"), lit(nChunks.toLong)).as("gen"))
      val batchesWithAsOf = new java.util.concurrent.atomic.AtomicInteger
      val seenBatches = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val (result, stats) = StreamRun.runAvailableNowSummarizedById(
        src, s"$out/run",
        (batch, id) => {
          seenBatches.add(id)
          // the snapshot: generations landed before this trigger
          val snap = dim.filter(col("gen") <= lit(id)).drop("gen")
          val enriched = plans.AsOfJoinNative.join(
              batch.select("event_id", "user_id", "ts"), snap,
              "user_id", "o_custkey", "ts", "o_orderdate",
              Seq("matched_order_date"))
            .select("event_id", "user_id", "matched_order_date")
          if (enriched.queryExecution.optimizedPlan.collect {
              case p: plans.AsOfJoinPlan => p }.nonEmpty)
            batchesWithAsOf.incrementAndGet()
          enriched
        })
      val dataBatches = stats.count(_.inputRows > 0)
      require(dataBatches == nChunks,
        s"expected exactly $nChunks data triggers, got $dataBatches")
      require(batchesWithAsOf.get() >= dataBatches,
        "a micro-batch was enriched without the native as-of operator")
      val ids = seenBatches.iterator().asScala.toSet
      require((0L until nChunks.toLong).toSet.subsetOf(ids),
        s"snapshot rule keyed on unexpected batch ids: $ids")
      result.select("event_id", "user_id", "matched_order_date")
    },

    // IVF-PQ composition (round-14 "what's missing" #2): the IVF
    // coarse quantizer prunes WHICH vectors get scored (routed cells
    // only) and PQ shrinks WHAT a scored vector costs (8 one-byte
    // codes, 32x compression) — flat ADC scanned every corpus code per
    // query batch; this is the sublinear 100 TB ANN shape. Same
    // planted-cluster corpus and exact-baseline verdict as the
    // IVF/PQ siblings, recall_ok pinned >= 0.9, PLUS the measured
    // sublinearity proof: max per-query ADC candidate count < half the
    // corpus (actual ~11% — probeFrac 0.1 over 64 cells), certified
    // from the ADC join's own output, not the plan text.
    "similarity_ivfpq_topk" -> { (s, dir) =>
      val e = ext.SimSearch.clusteredView(Tables.embeddings(s, dir),
        "vec_id", "embedding",
        nClusters = Round2Queries.IvfNClusters,
        mix = Round2Queries.IvfMix.toDouble)
      val q = e.filter(col("vec_id") < 100)
      val ipq = ext.SimSearch.ivfPqTopK(e, "vec_id", "embedding", 3,
          nCentroids = 64, lloydIters = 0, probeFrac = 0.1,
          rerank = 16, pqLloydIters = 1,
          queries = Some(q), withScanCount = true)
        .select(col("id_q"), col("neighbor_id"), lit(1L).as("hit"),
          col("n_scored"))
      val nCorpus = e.agg(count(lit(1)).as("n_corpus"))
      ext.SimSearch.topKBruteForce(q, e, "vec_id", "embedding", 3)
        .join(ipq, Seq("id_q", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          round(sum(col("cos")), 2).as("sum_cos"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            >= count(lit(1)) * 0.9).as("recall_ok"),
          max(col("n_scored")).as("max_scored"))
        .crossJoin(nCorpus)
        .select(col("n_exact"), col("sum_cos"), col("recall_ok"),
          (col("max_scored") < col("n_corpus") * 0.5).as("sublinear_ok"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    // the SAME text the engine ran (modulo the view name): DuckDB
    // executes the lateral top-1 directly
    "asof_lateral_auto" -> asofLateralSqlText("events"),
    "asof_lateral_left_auto" -> asofLateralLeftSqlText("events"),
    "asof_lateral_tolerance_auto" -> asofLateralTolSqlText("events"),

    // the partition tree is a lossless re-layout of orders (status in
    // the directory name instead of the line), so the oracle recomputes
    // straight from the parquet table
    "delim_v2_partition_prune" ->
      """SELECT year(CAST(o_orderdate AS DATE)) AS order_year,
        |       count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
        |GROUP BY 1""".stripMargin,

    "delim_v2_partition_dpp" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum("value"), 2) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE event_type = 'purchase'
        |GROUP BY 1""".stripMargin,

    "delim_v2_partition_write" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum("value"), 2) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |WHERE event_type = 'click'
        |GROUP BY 1""".stripMargin,

    "delim_v2_partition_overwrite" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum(CASE WHEN event_type = 'error'
        |                      THEN "value" + 1.0 ELSE "value" END), 2)
        |         AS sum_value
        |FROM events
        |GROUP BY 1""".stripMargin,

    "delim_v2_sql_table" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum("value"), 2) AS sum_value
        |FROM events
        |WHERE event_type IN ('click', 'purchase')
        |GROUP BY event_type""".stripMargin,

    "delim_v2_stream_sink" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum("value"), 2) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1""".stripMargin,

    "delim_v2_topn_pushdown" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    // replays the engine's snapshot rule row-for-row: batch = the same
    // ntile(4) total order the rank-chunked source wrote, generation =
    // o_orderkey % 4, and the as-of match may only use generations <=
    // the event's batch — a dimension row "from the future" anywhere
    // in the corpus hash-mismatches
    "asof_stream_enrich_evolving" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts,
        |         ntile(4) OVER (ORDER BY ts, event_id) - 1 AS batch
        |  FROM events)
        |SELECT e.event_id, e.user_id,
        |       (SELECT max(o.o_orderdate) FROM orders o
        |        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |          AND o.o_orderkey % 4 <= e.batch) AS matched_order_date
        |FROM ev e""".stripMargin,

    // identical exact-baseline relation to the IVF/PQ siblings' oracles
    // (same clustered view, same ranking); the IVF-PQ path has to hit
    // >= 90% of it AND prove the sublinear scan (literal-true verdicts)
    "similarity_ivfpq_topk" ->
      s"""WITH ctr AS (
         |  SELECT vec_id AS cid, embedding AS cemb
         |  FROM embeddings WHERE vec_id < ${Round2Queries.IvfNClusters}),
         |v AS (
         |  SELECT e.vec_id, list_transform(range(len(cemb)),
         |           i -> CAST(cemb[i + 1] + ${Round2Queries.IvfMix} * e.embedding[i + 1] AS REAL)) AS emb
         |  FROM embeddings e JOIN ctr ON e.vec_id % ${Round2Queries.IvfNClusters} = ctr.cid),
         |s AS (
         |  SELECT q.vec_id AS id_q, c.vec_id AS neighbor_id,
         |         round(list_cosine_similarity(q.emb, c.emb), 6) AS cos
         |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 100)
         |SELECT count(*) AS n_exact, round(sum(cos), 2) AS sum_cos,
         |       true AS recall_ok, true AS sublinear_ok FROM (
         |  SELECT cos, row_number() OVER (PARTITION BY id_q
         |           ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM s)
         |WHERE rank <= 3""".stripMargin
  )
}
