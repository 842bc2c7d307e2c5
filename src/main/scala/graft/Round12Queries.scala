package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-12 depth queries.
  *
  * Headliner: `range_join_auto` — the first query through the engine's
  * OPTIMIZER EXTENSION (plans.GraftExtensions / RangeBinJoinRule): a
  * plain-SQL non-equi interval join, the exact text a Hive/DuckDB user
  * would write, planned as a binned EQUI join by an injected
  * `Rule[LogicalPlan]` instead of the O(N·M) nested loop Catalyst
  * falls back to. The rest widen the warehouse-maintenance and
  * curation tiers: CDC snapshot diff, small-file compaction,
  * incremental rollup maintenance, PII redaction, weighted (PPS)
  * sampling, and wide→long unpivot.
  */
object Round12Queries {

  private val TokensSql =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> len(x) > 0)"""

  /** The natural point-in-interval SQL — ONE text, run verbatim by BOTH
    * engines (only the event-table name differs): Spark executes it via
    * `range_join_auto` with the rewrite rule enabled, DuckDB executes it
    * as the oracle. Daily 01:00–07:00 maintenance windows derived from
    * the data itself, then events counted into their window.
    */
  private[graft] def rangeJoinSql(eventsTable: String): String =
    s"""WITH w AS (
       |  SELECT DISTINCT date_trunc('day', ts) + INTERVAL 1 HOUR AS w_start,
       |         date_trunc('day', ts) + INTERVAL 7 HOUR AS w_end
       |  FROM $eventsTable)
       |SELECT w_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
       |FROM $eventsTable e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
       |GROUP BY 1""".stripMargin

  /** The NOT EXISTS twin — events OUTSIDE every maintenance window,
    * the "exclude the maintenance traffic" query every ops pipeline
    * writes. Spark decorrelates the NOT EXISTS into a left-ANTI join
    * carrying the same non-equi sandwich; the rule's semi/anti tier
    * rewrites it (point on the left, existence semantics absorb the
    * interval explosion).
    */
  private[graft] def rangeAntiJoinSql(eventsTable: String): String =
    s"""WITH w AS (
       |  SELECT DISTINCT date_trunc('day', ts) + INTERVAL 1 HOUR AS w_start,
       |         date_trunc('day', ts) + INTERVAL 7 HOUR AS w_end
       |  FROM $eventsTable)
       |SELECT event_type, count(*) AS n_outside,
       |       round(sum(value), 2) AS sum_value
       |FROM $eventsTable e
       |WHERE NOT EXISTS (SELECT 1 FROM w
       |                  WHERE e.ts >= w.w_start AND e.ts < w.w_end)
       |GROUP BY 1""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // NOT EXISTS window exclusion through the same extension — the
    // anti-join tier of RangeBinJoinRule certified on the driver
    // surface with one SQL text run verbatim by both engines.
    "range_antijoin_auto" -> { (s, dir) =>
      val key = plans.RangeBinJoinRule.BinSecondsKey
      plans.RangeBinJoinRule.installLate(s)
      val prev = s.conf.getOption(key)
      s.conf.set(key, "3600")
      try {
        Tables.events(s, dir).createOrReplaceTempView("rja_events")
        val df = s.sql(rangeAntiJoinSql("rja_events"))
        val plan = df.queryExecution.explainString(FormattedMode)
        require(!plan.contains("BroadcastNestedLoopJoin") &&
                !plan.contains("CartesianProduct"),
          s"anti-join sandwich still planned as a nested loop:\n$plan")
        require(plan.contains("_graft_pbucket"),
          s"bucket key missing — the anti rewrite did not fire:\n$plan")
        val out = CoreQueries.scratchDir("range_antijoin_auto")
        df.write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    },
    // The optimizer-extension certification. The rule is gated on its
    // conf, so it is enabled for exactly this query's optimization and
    // the result is materialized under it (eager write + read-back —
    // the same construction-eager idiom as reports_roundtrip; a lazy
    // frame would optimize after the conf restore). The construction
    // `require`s prove the rewrite actually fired: no nested-loop /
    // cartesian join anywhere in the physical plan, and the injected
    // bucket key present. At 100 TB this is the difference between an
    // O(points × windows) broadcast nested loop and a shuffled hash
    // join on the bucket key.
    "range_join_auto" -> { (s, dir) =>
      val key = plans.RangeBinJoinRule.BinSecondsKey
      val prev = s.conf.getOption(key)
      s.conf.set(key, "3600")
      try {
        Tables.events(s, dir).createOrReplaceTempView("rja_events")
        val df = s.sql(rangeJoinSql("rja_events"))
        val plan = df.queryExecution.explainString(FormattedMode)
        require(!plan.contains("BroadcastNestedLoopJoin") &&
                !plan.contains("CartesianProduct"),
          "RangeBinJoinRule enabled but the non-equi join still planned " +
            s"as a nested loop:\n$plan")
        require(plan.contains("_graft_pbucket"),
          s"bucket key missing — the rewrite did not fire:\n$plan")
        val out = CoreQueries.scratchDir("range_join_auto")
        df.write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None    => s.conf.unset(key)
      }
    },

    // CDC snapshot diff — the change-data-capture extraction shape: two
    // table snapshots, emit the delta as (op, key, old, new). The next
    // snapshot is DERIVED deterministically from the base (deletes:
    // key % 97, updates: status flip on key % 53, inserts: re-keyed
    // key % 89 rows), so both engines reconstruct identical inputs.
    // One full-outer sort-merge join on the key — the join that cannot
    // broadcast by definition — with changed-only output; unchanged
    // rows (the 100 TB majority) produce nothing downstream.
    "cdc_snapshot_diff" -> { (s, dir) =>
      val base = Tables.orders(s, dir).select("o_orderkey", "o_orderstatus")
      val next = base.filter(col("o_orderkey") % 97 =!= 0)
        .withColumn("o_orderstatus",
          when(col("o_orderkey") % 53 === 0, lit("X"))
            .otherwise(col("o_orderstatus")))
        .unionByName(base.filter(col("o_orderkey") % 89 === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_orderstatus")))
      val b = base.select(col("o_orderkey").as("bk"),
        col("o_orderstatus").as("old_status"))
      val n = next.select(col("o_orderkey").as("nk"),
        col("o_orderstatus").as("new_status"))
      b.join(n, col("bk") === col("nk"), "full_outer")
        .select(
          when(col("nk").isNull, "delete")
            .when(col("bk").isNull, "insert")
            .when(col("old_status") =!= col("new_status"), "update")
            .as("op"),
          coalesce(col("bk"), col("nk")).as("o_orderkey"),
          col("old_status"), col("new_status"))
        .filter(col("op").isNotNull)
    },

    // Small-file compaction — the table-maintenance pass every landing
    // directory needs: N small files bin-packed into ceil(bytes/target)
    // rewritten files, content untouched. Eager by design (the rewrite
    // IS the operator); the requires pin the file-count collapse and
    // the read-back is certified against the source content by the
    // oracle. At 100 TB this runs per partition directory (the same
    // dynamic-partition-overwrite scoping as Warehouse.mergeByKey), so
    // the repartition shuffle is bounded by one partition's volume, not
    // the table's.
    "compact_small_files" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("compact_small_files")
      val src = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      src.repartition(64).write.mode("overwrite").parquet(s"$out/fragmented")
      def dataFiles(p: String): Seq[org.apache.hadoop.fs.FileStatus] = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(s.sessionState.newHadoopConf())
        fs.listStatus(path).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      }
      val frag = dataFiles(s"$out/fragmented")
      require(frag.size == 64, s"expected 64 fragment files, got ${frag.size}")
      val targetBytes = 1L << 20
      val nOut = math.max(1L, (frag.map(_.getLen).sum + targetBytes - 1) / targetBytes).toInt
      s.read.parquet(s"$out/fragmented")
        .repartition(nOut)
        .write.mode("overwrite").parquet(s"$out/compacted")
      val compacted = dataFiles(s"$out/compacted")
      require(compacted.size <= nOut && compacted.size * 4 <= frag.size,
        s"compaction did not collapse the file count: ${frag.size} -> ${compacted.size}")
      s.read.parquet(s"$out/compacted")
    },

    // Incremental rollup maintenance — keep a month-level aggregate
    // store current by merging ONLY the new delta's aggregate into it,
    // never rescanning history. The store is built from the pre-cutoff
    // history (eager, parquet); the query aggregates the delta alone
    // and re-aggregates store ∪ delta on the month key. Correctness
    // gate: the oracle recomputes the rollup from ALL rows — the
    // incremental path must land on the full-recompute answer. COUNT
    // and SUM re-aggregate losslessly (the same algebraic-aggregate
    // property the CMS/HLL sketches extend to approximate state); at
    // 100 TB the delta scan is a day's partition, not seven years.
    "rollup_incremental" -> { (s, dir) =>
      val cutoff = "2001-06-01"
      val orders = Tables.orders(s, dir)
      // prices quantized to integer CENTS before any aggregation: the
      // store-then-reaggregate sum is then exact integer arithmetic in
      // any re-aggregation order (a stored double sum re-summed would
      // sit an order-dependent ulp away from the full recompute and
      // could flip the hash-exact oracle at a rounding boundary — the
      // same quantize-first discipline as events_anomaly_mad)
      def monthly(df: DataFrame): DataFrame =
        df.groupBy(date_trunc("month", col("o_orderdate")).as("om"))
          .agg(count(lit(1)).as("n_orders"),
            sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
              .as("sum_cents"))
      val store = CoreQueries.scratchDir("rollup_incremental") + "/store"
      monthly(orders.filter(col("o_orderdate") < lit(cutoff)))
        .write.mode("overwrite").parquet(store)
      s.read.parquet(store)
        .unionByName(monthly(orders.filter(col("o_orderdate") >= lit(cutoff))))
        .groupBy("om")
        .agg(sum("n_orders").as("n_orders"),
          (sum("sum_cents") / 100.0).as("sum_price"))
    },

    // PII redaction — the curation scrub stage for personal data:
    // emails and phone-shaped tokens replaced with typed placeholders,
    // per-document hit counts kept for the audit trail. The corpus has
    // no real PII, so a deterministic injection (doc_id-derived email +
    // phone appended to every third document) gives both engines the
    // same input; patterns stay in the RE2 ∩ Java subset so the
    // IDENTICAL regex runs in the oracle. Pure per-row expressions —
    // map-side only, zero shuffle at any scale.
    "pii_scrub" -> { (s, dir) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\b555-[0-9]{4}\\b"
      val injected = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or call 555-"),
          lpad(((col("doc_id") * 7) % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      val scrubbed = regexp_replace(
        regexp_replace(injected, emailRe, "<EMAIL>"), phoneRe, "<PHONE>")
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(regexp_extract_all(injected, lit(emailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(injected, lit(phoneRe), lit(0)))
          .cast("long").as("n_phones"),
        md5(scrubbed).as("scrubbed_md5"))
    },

    // Weighted (probability-proportional-to-size) sampling — longer
    // documents are proportionally more likely to be kept, the standard
    // token-budget-aware corpus downsample. Inclusion test is PURE
    // INTEGER arithmetic on an md5-derived uniform (u32 < n_chars/2000
    // of the hash space), so it is exactly reproducible in any engine,
    // needs no seed coordination, and runs entirely map-side: at 100 TB
    // every executor decides its own rows, no shuffle, no driver.
    "sample_weighted" -> { (s, dir) =>
      val u32 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      Tables.documents(s, dir)
        .filter(u32 * lit(2000L) < col("n_chars") * lit(4294967296L))
        .select("doc_id", "lang", "n_chars")
    },

    // Context-window chunking — the stage between curation and
    // tokenization: each document split into fixed-size overlapping
    // windows (200 chars, stride 180 → 20-char overlap), k-th chunk =
    // substr(1 + k·stride, size), k while k·stride < len. One
    // posexplode over a computed sequence — rows fan out map-side,
    // no shuffle; at 100 TB chunking is embarrassingly parallel and
    // this shape keeps it that way. The greatest(len,1) guard matters:
    // Spark's sequence(0, -1) helpfully counts BACKWARDS, so an empty
    // doc would fabricate chunks instead of yielding none.
    "chunk_documents" -> { (s, dir) =>
      val (size, stride) = (200, 180)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          posexplode(sequence(lit(0),
            ((greatest(length(col("text")), lit(1)) - 1) / stride)
              .cast("int"))))
        .select(col("doc_id"), col("pos").as("chunk_id"),
          expr(s"substring(text, 1 + pos * $stride, $size)").as("chunk"))
        .select(col("doc_id"), col("chunk_id"),
          length(col("chunk")).cast("long").as("chunk_len"),
          md5(col("chunk")).as("chunk_md5"))
    },

    // Containment near-dup, ALL-PAIRS BASELINE LENS — the ASYMMETRIC
    // overlap measure |A∩B| / min(|A|,|B|): a short document embedded
    // verbatim in a longer one scores ~1.0 here while symmetric Jaccard
    // (the X2 tier) scores it low. Round 13 demoted this form to the
    // verification baseline (capped at the 300-doc certification
    // prefix, codegen'd sorted-intersect kernel inside the join
    // condition); the PRODUCTION path is dedup_containment_prefix —
    // ext.Dedup.containmentPairs, the prefix-filter equi-join that
    // reproduces the full-corpus answer cartesian-free with recall 1.0.
    "dedup_containment" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val sets = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select(col("doc_id").as("id"),
          graft.ext.Text.hashedShingleSet(col("text"), 1).as("sh"))
        .withColumn("sz", size(col("sh"))).filter(col("sz") > 0)
      val par = s.sparkContext.defaultParallelism
      val a = sets.repartition(par)
        .select(col("id").as("id_a"), col("sh").as("s_a"), col("sz").as("sz_a"))
      val b = sets
        .select(col("id").as("id_b"), col("sh").as("s_b"), col("sz").as("sz_b"))
      def inter = call_function(
        "graft_sorted_intersect_count", col("s_a"), col("s_b")).cast("double")
      a.join(b,
          col("id_a") < col("id_b") &&
          inter >= lit(0.9) * least(col("sz_a"), col("sz_b")))
        .select(col("id_a"), col("id_b"),
          round(inter / least(col("sz_a"), col("sz_b")), 6).as("containment"))
    },

    // Robust anomaly detection — median/MAD outlier flagging per event
    // type, the metric-quality screen that survives the heavy tails
    // that break z-scores. Two aggregation passes over events with the
    // tiny per-type stats broadcast back between them (no events-side
    // re-shuffle beyond the groupBys). Values are quantized to integer
    // cents FIRST: every median/MAD is then an exact .0/.25-step
    // double in BOTH engines, so the 3×MAD threshold compare cannot
    // flip on a ulp (exact percentile here; at 100 TB swap in the
    // approx_percentile sketch — certified separately by
    // stats_quantiles_approx).
    "events_anomaly_mad" -> { (s, dir) =>
      val v = Tables.events(s, dir).select(col("event_type"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("vc"))
      val m = v.groupBy("event_type")
        .agg(expr("percentile(vc, 0.5)").as("med"))
      val d = v.join(broadcast(m), "event_type")
        .withColumn("dev", abs(col("vc") - col("med")))
      val md = d.groupBy("event_type")
        .agg(expr("percentile(dev, 0.5)").as("mad"))
      d.join(broadcast(md), "event_type")
        .groupBy("event_type")
        .agg(max("med").as("med"), max("mad").as("mad"),
          count(lit(1)).as("n"),
          sum(when(col("dev") > lit(3) * col("mad"), 1L).otherwise(0L))
            .as("n_outliers"))
    },

    // Triangle counting on the near-dup similarity graph — the graph
    // statistic beyond connected components (triangle density separates
    // a genuine duplicate CLUSTER from a chain of borderline pairs).
    // Degree-ordered wedge counting (see ext.Graph.triangleStats). The
    // edge list comes from the EXACT inverted-index Jaccard join
    // (round 13: replaced the all-pairs cartesian baseline — same exact
    // pairs, computed from postings equi-joins, so the production path
    // is cartesian-free end to end; the only remaining crosses are the
    // 1-row summary combines). The LSH-fed twin is graph_triangles_lsh.
    "graph_triangles" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      graft.ext.Graph.triangleStats(
        graft.ext.Dedup.jaccardPairsPostings(docs, "doc_id", "text", 0.8))
    },

    // Catalog-table partition lifecycle — the reference's actual DDL
    // idiom (`INSERT OVERWRITE TABLE ... PARTITION(...)`,
    // verizon_automation_script.sh's loaders) through Spark's REAL
    // session catalog instead of path-based writes: CREATE a
    // partitioned datasource table, dynamic-load it, then correct ONE
    // month with a STATIC partition overwrite (`PARTITION (om='...')`)
    // — which must rewrite only that directory. The requires pin the
    // catalog's partition tracking (SHOW PARTITIONS) and the physical
    // scoping (an untouched month's file snapshot is byte-identical
    // across the correction — same witness as warehouse_merge_upsert).
    // Eager by design: the INSERTs are the operator.
    "catalog_partition_lifecycle" -> { (s, dir) =>
      val wh = CoreQueries.scratchDir("catalog_lifecycle")
      // drop BEFORE wiping the location: a stale catalog entry over a
      // deleted directory makes the drop's table resolution log
      // FileNotFound noise
      s.sql("DROP TABLE IF EXISTS graft_orders_cat")
      graft.core.Scratch.rmTree(wh)
      // CREATE TABLE lists its LOCATION for schema/partition discovery
      // and logs FileNotFound when it does not exist yet
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$wh/orders_cat"))
      s.sql(
        s"""CREATE TABLE graft_orders_cat
           |  (o_orderkey BIGINT, o_totalprice DOUBLE, om STRING)
           |USING parquet PARTITIONED BY (om)
           |LOCATION '$wh/orders_cat'""".stripMargin)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM").as("om"))
        .createOrReplaceTempView("graft_orders_src")
      // REPARTITION(om) clusters the insert's tasks by partition value:
      // one file per partition directory instead of (tasks × partitions)
      // small files — the layout practice a 100 TB dynamic-partition
      // load needs (and what keeps compact_small_files rare)
      s.sql(
        """INSERT OVERWRITE TABLE graft_orders_cat PARTITION (om)
          |SELECT /*+ REPARTITION(om) */ o_orderkey, o_totalprice, om
          |FROM graft_orders_src""".stripMargin)
      val calmBefore = core.Warehouse.partitionFileSnapshot(
        s"$wh/orders_cat", "om", "1997-03")
      require(calmBefore.nonEmpty, "fixture month 1997-03 missing")
      s.sql(
        """INSERT OVERWRITE TABLE graft_orders_cat PARTITION (om = '2001-06')
          |SELECT o_orderkey, o_totalprice * 1.1 FROM graft_orders_src
          |WHERE om = '2001-06'""".stripMargin)
      require(core.Warehouse.partitionFileSnapshot(
          s"$wh/orders_cat", "om", "1997-03") == calmBefore,
        "static partition overwrite touched an unrelated partition")
      val nParts = s.sql("SHOW PARTITIONS graft_orders_cat").count()
      require(nParts >= 70,
        s"catalog lost partition tracking: $nParts partitions")
      s.sql(
        """SELECT om, count(*) AS n_orders,
          |       round(sum(o_totalprice), 2) AS sum_price
          |FROM graft_orders_cat GROUP BY om""".stripMargin)
    },

    // Training-mixture rebalancing — downsample every language to the
    // smallest language's volume (uniform mixture), the knob between
    // "corpus as crawled" and "corpus as trained on". Per-language
    // inclusion rate min_n/n_lang applied as PURE INTEGER hash
    // arithmetic (include iff u32·n_lang < min_n·2³²) — deterministic,
    // engine-independent, and map-side after one broadcast of the
    // 5-row per-language rate table; the min rides an unpartitioned
    // window over the POST-AGGREGATE relation (language-bounded rows —
    // the safe case). 64-bit products hold to ~2³¹ rows per language;
    // beyond that the same rates ship as per-language u32 thresholds.
    "mixture_rebalance" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy("lang")
        .agg(count(lit(1)).as("n_before"))
        .withColumn("mn", min("n_before").over(
          Window.partitionBy().orderBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing)))
      val u32 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
      val sampled = docs.join(broadcast(counts), "lang")
        .filter(u32 * col("n_before") < col("mn") * lit(4294967296L))
        .groupBy("lang").agg(count(lit(1)).as("n_sampled"))
      counts.select("lang", "n_before")
        .join(sampled, Seq("lang"), "left")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
    },

    // Wide→long unpivot (melt) — the reshape between a reporting table
    // and a metric-per-row feed, via Dataset.unpivot (constant-folded
    // expand, no shuffle beyond the feeding aggregate). Values are
    // rounded BEFORE melting so the long format carries oracle-exact
    // doubles.
    "unpivot_metrics" -> { (s, dir) =>
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base"), col("sum_disc")),
          "metric", "val")
    }
  )

  def oracleSql: Map[String, String] = Map(
    "range_join_auto" -> rangeJoinSql("events"),
    "range_antijoin_auto" -> rangeAntiJoinSql("events"),

    "cdc_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus FROM orders),
        |next AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 53 = 0 THEN 'X'
        |              ELSE o_orderstatus END AS o_orderstatus
        |  FROM base WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_orderstatus
        |  FROM base WHERE o_orderkey % 89 = 0)
        |SELECT * FROM (
        |  SELECT CASE WHEN n.o_orderkey IS NULL THEN 'delete'
        |              WHEN b.o_orderkey IS NULL THEN 'insert'
        |              WHEN b.o_orderstatus <> n.o_orderstatus THEN 'update'
        |              END AS op,
        |         coalesce(b.o_orderkey, n.o_orderkey) AS o_orderkey,
        |         b.o_orderstatus AS old_status,
        |         n.o_orderstatus AS new_status
        |  FROM base b FULL JOIN next n ON b.o_orderkey = n.o_orderkey)
        |WHERE op IS NOT NULL""".stripMargin,

    "compact_small_files" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,

    "rollup_incremental" ->
      // the DOUBLE cast matters for the SQL-surface differential: Spark
      // parses the bare literal 100.0 as DECIMAL (BIGINT/DECIMAL →
      // DECIMAL with trailing zeros) while DuckDB and the DataFrame
      // path divide as doubles
      """SELECT date_trunc('month', o_orderdate) AS om,
        |       count(*) AS n_orders,
        |       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
        |            AS DOUBLE) / 100.0 AS sum_price
        |FROM orders GROUP BY 1""".stripMargin,

    "pii_scrub" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0
        |              THEN text || ' contact user' || CAST(doc_id AS STRING)
        |                   || '@example.com or call 555-'
        |                   || lpad(CAST((doc_id * 7) % 10000 AS STRING), 4, '0')
        |              ELSE text END AS txt
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(txt,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |         AS n_emails,
        |       CAST(len(regexp_extract_all(txt, '\b555-[0-9]{4}\b')) AS BIGINT)
        |         AS n_phones,
        |       md5(regexp_replace(regexp_replace(txt,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS scrubbed_md5
        |FROM inj""".stripMargin,

    "sample_weighted" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::UBIGINT
        |        * 2000 < n_chars * 4294967296""".stripMargin,

    "chunk_documents" ->
      """SELECT doc_id, k AS chunk_id,
        |       CAST(length(substr(text, 1 + k * 180, 200)) AS BIGINT)
        |         AS chunk_len,
        |       md5(substr(text, 1 + k * 180, 200)) AS chunk_md5
        |FROM documents,
        |     unnest(generate_series(0,
        |       (greatest(length(text), 1) - 1) // 180)) AS t(k)""".stripMargin,

    "dedup_containment" ->
      s"""WITH tok AS (
         |  SELECT DISTINCT doc_id, unnest($TokensSql) AS tok
         |  FROM documents WHERE doc_id < 300),
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

    "events_anomaly_mad" ->
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
        |            AS BIGINT) AS n_outliers
        |FROM d
        |JOIN m ON d.event_type = m.event_type
        |JOIN md ON d.event_type = md.event_type
        |GROUP BY 1""".stripMargin,

    "graph_triangles" ->
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
         |         AS n_triangles""".stripMargin,

    "catalog_partition_lifecycle" ->
      """WITH src AS (
        |  SELECT o_orderkey, o_totalprice,
        |         strftime(o_orderdate, '%Y-%m') AS om
        |  FROM orders),
        |fin AS (
        |  SELECT om, o_totalprice FROM src WHERE om <> '2001-06'
        |  UNION ALL
        |  SELECT om, o_totalprice * 1.1 FROM src WHERE om = '2001-06')
        |SELECT om, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS sum_price
        |FROM fin GROUP BY om""".stripMargin,

    "mixture_rebalance" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n_before,
        |         min(count(*)) OVER () AS mn
        |  FROM documents GROUP BY lang),
        |s AS (
        |  SELECT d.lang, count(*) AS n_sampled
        |  FROM documents d JOIN c ON d.lang = c.lang
        |  WHERE ('0x' || substr(md5(CAST(d.doc_id AS STRING)), 1, 8))::UBIGINT
        |          * c.n_before < c.mn * 4294967296
        |  GROUP BY 1)
        |SELECT c.lang, c.n_before,
        |       coalesce(s.n_sampled, 0) AS n_sampled
        |FROM c LEFT JOIN s ON c.lang = s.lang""".stripMargin,

    "unpivot_metrics" ->
      """WITH w AS (
        |  SELECT l_returnflag,
        |         round(sum(l_quantity), 2) AS sum_qty,
        |         round(sum(l_extendedprice), 2) AS sum_base,
        |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_base', sum_base FROM w
        |UNION ALL
        |SELECT l_returnflag, 'sum_disc', sum_disc FROM w""".stripMargin
  )
}
