package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-17 depth queries.
  *
  * Headliner: the graft-delim manifest grows into a small table
  * FORMAT — versioned snapshot manifests claimed with
  * create-no-overwrite (a racing committer now fails loudly instead of
  * silently unlisting the other job's files), TIME TRAVEL
  * (`versionAsOf` over a `retainVersions` window), SCHEMA EVOLUTION
  * (each generation's manifest records its writer schema; readers map
  * columns to file positions BY NAME through it, so a column added
  * later reads as null from older generations — where the reference
  * treats every table as opaque `SELECT *` text,
  * verizon_automation_script.sh:220, this keeps the typed model across
  * generations), and small-file COMPACTION (OPTIMIZE) that rewrites a
  * partition's accumulated files into one and swaps the manifest
  * atomically.
  */
object Round17Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // TIME TRAVEL over the retention window: generation 1 is
    // overwritten by generation 2, yet `versionAsOf 1` still plans
    // exactly the old snapshot (its manifest and files are retained by
    // the `retainVersions=2` policy) while the default read sees only
    // generation 2. The oracle recomputes both generations' aggregates
    // from the parquet source — any leakage between generations breaks
    // a row count, a revenue sum, or a key signature.
    "delim_v2_time_travel" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_time_travel")
      // deterministic generation numbers across harness runs: the
      // table starts from scratch so gen 1/2 are exactly the two writes
      graft.core.Scratch.rmTree(s"$out/t")
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      orders.filter(col("o_totalprice") <= 100000.0)
        .write.format("graft-delim").option("retainVersions", "2")
        .mode("overwrite").save(s"$out/t")
      orders.filter(col("o_totalprice") > 100000.0)
        .write.format("graft-delim").mode("overwrite").save(s"$out/t")
      def snap(tag: String, opts: Map[String, String]): DataFrame = {
        var r = s.read.format("graft-delim")
          .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
        opts.foreach { case (k, v) => r = r.option(k, v) }
        r.load(s"$out/t").agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          sum(col("o_orderkey")).as("key_sig"))
          .select(lit(tag).as("gen"), col("n_rows"), col("revenue"),
            col("key_sig"))
      }
      snap("v1", Map("versionAsOf" -> "1"))
        .unionByName(snap("current", Map.empty))
    },

    // SCHEMA EVOLUTION across manifest generations: generation 1
    // writes (c_custkey, c_name); generation 2 appends a WIDER schema
    // (+ c_acctbal) with its columns REORDERED — the reader reconciles
    // both through each generation's recorded writer schema, so gen-1
    // rows read the added column as null and gen-2's reordered fields
    // land by name. The oracle derives the same union from parquet
    // (CASE-ing the added column to null for the gen-1 slice).
    "delim_v2_schema_evolution" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_schema_evolution")
      graft.core.Scratch.rmTree(s"$out/t")
      val c = Tables.customer(s, dir)
      c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"))
        .write.format("graft-delim").mode("overwrite").save(s"$out/t")
      c.filter(col("c_custkey") % 2 === 1)
        .select(col("c_name"), col("c_acctbal"), col("c_custkey")) // reordered
        .write.format("graft-delim").mode("append").save(s"$out/t")
      s.read.format("graft-delim")
        .schema("c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE")
        .load(s"$out/t")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(col("c_custkey")).as("key_sig"),
          sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)).as("n_null_bal"),
          round(sum(col("c_acctbal")), 2).as("sum_bal"),
          sum(length(col("c_name"))).as("name_chars"))
    },

    // SQL MERGE INTO front door — the Warehouse.mergeByKey partition
    // discipline (WarehouseQueries.warehouse_merge_upsert) expressed
    // as one SQL statement against a graft-delim catalog table,
    // executed by Spark's group-based copy-on-write rewrite over the
    // connector's row-level operation (DelimRowLevel): the runtime
    // group filter delivers matched files as an `In(_file, ...)` the
    // scan prunes at FILE level, so only the hot month's files are
    // read and rewritten. The require pins the partition scoping the
    // same way the API query does — the calm month's FILE survives
    // (name, length, mtime) — and the oracle recomputes the upsert
    // from parquet.
    "warehouse_merge_sql" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("warehouse_merge_sql")
      graft.core.Scratch.rmTree(s"$out/t")
      s.sql("DROP TABLE IF EXISTS graft_cat.default.wm17_t")
      s.sql(s"""CREATE TABLE graft_cat.default.wm17_t
        (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
         o_totalprice DOUBLE, o_orderdate DATE, o_orderpriority STRING,
         om STRING)
        USING `graft-delim` PARTITIONED BY (om) LOCATION '$out/t'""")
      val base = Tables.orders(s, dir)
        .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderdate").cast("date").as("o_orderdate"),
          col("o_orderpriority"), col("om"))
      base.writeTo("graft_cat.default.wm17_t").append()
      val hot = "1995-03"
      val calm = "1997-01"
      val updates = base
        .filter(col("om") === hot && col("o_orderkey") % 7 === 0)
        .withColumn("o_orderpriority", lit("0-CORRECTED"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      val inserts = base
        .filter(col("om") === hot && col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("o_orderstatus", lit("I"))
      updates.unionByName(inserts).createOrReplaceTempView("wm17_delta")
      val calmBefore =
        graft.core.Warehouse.partitionFileSnapshot(s"$out/t", "om", calm)
      require(calmBefore.nonEmpty, s"fixture must populate month $calm")
      s.sql("""MERGE INTO graft_cat.default.wm17_t t
        USING wm17_delta d ON t.o_orderkey = d.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      require(
        graft.core.Warehouse.partitionFileSnapshot(s"$out/t", "om", calm)
          == calmBefore,
        s"SQL MERGE must not rewrite the unaffected partition om=$calm")
      s.sql("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority, om
        |FROM graft_cat.default.wm17_t""".stripMargin)
    },

    // DATA SKIPPING via manifest file stats: the writer records
    // per-file min/max/null-count for every pushable column, and the
    // scan tests pushed DATA filters against them — a file whose stats
    // prove no row matches is never opened. Here orders is written
    // key-CLUSTERED (repartitionByRange + sortWithinPartitions, the
    // layout discipline that makes key-range queries cheap at 100 TB),
    // so an o_orderkey range keeps ~1 of 8 files — require'd via the
    // planned-splits observability hook — while the aggregate must
    // still equal the parquet-derived oracle exactly (skipping a file
    // with a matching row would break all three columns).
    "delim_v2_stats_skipping" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_stats_skipping")
      val t = s"$out/t"
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.format("graft-delim").mode("overwrite").save(t)
      // SF-relative cutoff (a fixed literal matches every file at the
      // smallest fixture): the bottom quarter of the key range keeps
      // ~2 of the 8 range-clustered files at every SF
      val cutoff = Tables.orders(s, dir)
        .agg(max(col("o_orderkey"))).head.getLong(0) / 4
      val df = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
        .load(t)
        .filter(col("o_orderkey") <= cutoff)
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          sum(col("o_orderkey")).as("key_sig"))
      df.collect()
      val (disc, kept, _) = graft.sources.v2.DelimV2.plannedSplitsFor(t).get
      require(kept < disc && kept >= 1,
        s"file stats failed to skip clustered files: discovered=$disc kept=$kept")
      df
    },

    // COMPLETE aggregate pushdown from manifest stats: MIN/MAX/COUNT
    // over a stats-covered table are answered from the per-file bounds
    // the writers recorded — the scan plans ONE precomputed row and
    // reads ZERO data bytes (require'd: 0 files kept, 1 synthetic
    // split). At 100 TB this is the difference between a metadata read
    // and a full corpus scan for the reference's daily count/extent
    // reconciliations. The oracle recomputes the same aggregates from
    // parquet.
    "delim_v2_stats_agg" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_stats_agg")
      val t = s"$out/t"
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.format("graft-delim").mode("overwrite").save(t)
      val df = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
        .load(t)
        .agg(min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"),
          count(lit(1)).as("n_rows"),
          count(col("o_totalprice")).as("n_price"),
          min(col("o_orderpriority")).as("min_prio"),
          max(col("o_orderpriority")).as("max_prio"))
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("PushedAggregation: [stats-complete]"),
        s"aggregate not answered from manifest stats:\n$plan")
      df.collect()
      val (_, kept, splits) = graft.sources.v2.DelimV2.plannedSplitsFor(t).get
      require(kept == 0 && splits == 1,
        s"stats-complete aggregate opened data files: kept=$kept splits=$splits")
      df
    },

    // graft-delim as a STREAMING SOURCE — manifest generations are the
    // offsets (each commit = one offset increment), so a downstream
    // pipeline can readStream the reference's landing directories with
    // exactly-once progress across restarts (spec-certified; see
    // DelimStreamSourceSpec for restart/live/loop/pruning). Here three
    // batch commits land disjoint thirds of orders (gen 1..3 —
    // require'd), the stream drains them through a real
    // MicroBatchStream run, and the landed rollup must equal the
    // parquet-derived oracle — a dropped generation, a duplicated
    // replay, or a misplanned range all hash-mismatch.
    "delim_v2_stream_source" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_stream_source")
      graft.core.Scratch.rmTree(s"$out/t")
      graft.core.Scratch.rmTree(s"$out/landed")
      graft.core.Scratch.rmTree(s"$out/ckpt")
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      for (slice <- 0 until 3)
        orders.filter(col("o_orderkey") % 3 === slice)
          .write.format("graft-delim").mode("append").save(s"$out/t")
      val hp = new org.apache.hadoop.fs.Path(s"$out/t")
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      require(graft.sources.v2.DelimV2.readManifest(fs, hp).get.gen == 3L,
        "fixture must land three generations")
      val q = s.readStream.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
        .load(s"$out/t")
        .writeStream.format("parquet")
        .option("path", s"$out/landed")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$out/landed")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          sum(col("o_orderkey")).as("key_sig"))
    },

    // Small-file COMPACTION (OPTIMIZE): real streaming epochs land one
    // file per (epoch, partition) — the accumulation every streaming
    // sink produces — then DelimCompact rewrites each partition's
    // files into ONE (byte-level concatenation, no parse) and swaps
    // the manifest through the claim-race-detected commit. The
    // requires pin the before (more files than partitions) and after
    // (exactly one file per partition) manifests; the aggregate over
    // the compacted table must equal the parquet-derived oracle — a
    // lost row, a duplicated file, or a partition routed wrong all
    // hash-mismatch.
    "delim_v2_compact" -> { (s, dir) =>
      import graft.sources.v2.{DelimCompact, DelimV2}
      val out = CoreQueries.scratchDir("delim_v2_compact")
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
      val hp = new org.apache.hadoop.fs.Path(sink)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def parent(rel: String): String = {
        val i = rel.lastIndexOf('/')
        if (i < 0) "" else rel.substring(0, i)
      }
      val before = DelimV2.readManifest(fs, hp).get.files
      val nParts = before.map(e => parent(e.rel)).distinct.size
      require(before.size > nParts,
        s"expected epoch-accumulated small files, got ${before.size} over " +
          s"$nParts partitions")
      DelimCompact.compact(s, sink)
      val after = DelimV2.readManifest(fs, hp).get.files
      require(after.size == nParts,
        s"OPTIMIZE must leave one file per partition: ${after.size} vs $nParts")
      s.read.format("graft-delim")
        .schema("event_id BIGINT, user_id BIGINT, value DOUBLE, event_type STRING")
        .load(sink)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    })

  def oracleSql: Map[String, String] = Map(

    "delim_v2_time_travel" ->
      """SELECT 'v1' AS gen, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders WHERE o_totalprice <= 100000.0
        |UNION ALL
        |SELECT 'current', count(*), round(sum(o_totalprice), 2),
        |       CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders WHERE o_totalprice > 100000.0""".stripMargin,

    // the warehouse_merge_upsert derivation with the DATE cast the
    // delimited format's type set requires
    "warehouse_merge_sql" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
        |         strftime(o_orderdate, '%Y-%m') AS om
        |  FROM orders),
        |upd AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 1.0 AS o_totalprice, o_orderdate,
        |         '0-CORRECTED' AS o_orderpriority, om
        |  FROM base WHERE om = '1995-03' AND o_orderkey % 7 = 0),
        |ins AS (
        |  SELECT o_orderkey + 100000000 AS o_orderkey, o_custkey,
        |         'I' AS o_orderstatus, o_totalprice, o_orderdate,
        |         o_orderpriority, om
        |  FROM base WHERE om = '1995-03' AND o_orderkey % 11 = 0),
        |changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins)
        |SELECT * FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM changes c
        |                  WHERE c.o_orderkey = b.o_orderkey)
        |UNION ALL
        |SELECT * FROM changes""".stripMargin,

    "delim_v2_stats_agg" ->
      """SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |       count(*) AS n_rows, count(o_totalprice) AS n_price,
        |       min(o_orderpriority) AS min_prio,
        |       max(o_orderpriority) AS max_prio
        |FROM orders""".stripMargin,

    "delim_v2_stats_skipping" ->
      """SELECT count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders
        |WHERE o_orderkey <= (SELECT max(o_orderkey) // 4 FROM orders)""".stripMargin,

    "delim_v2_stream_source" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders
        |GROUP BY 1""".stripMargin,

    // compaction is content-preserving: the oracle is the same
    // per-partition rollup the stream-sink certification uses
    "delim_v2_compact" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum("value"), 2) AS sum_value,
        |       count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1""".stripMargin,

    "delim_v2_schema_evolution" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(c_custkey) AS BIGINT) AS key_sig,
        |       CAST(sum(CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_null_bal,
        |       round(sum(CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END), 2)
        |         AS sum_bal,
        |       CAST(sum(length(c_name)) AS BIGINT) AS name_chars
        |FROM customer""".stripMargin)
}
