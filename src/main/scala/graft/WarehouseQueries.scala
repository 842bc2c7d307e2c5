package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Layout, Tables, Warehouse}
import graft.ext.Scd2
import graft.functions.CmsSketch
import graft.stream.StreamRun

/** Warehouse-maintenance depth queries (round 11, second block): the
  * operations that keep a 100 TB directory-partitioned warehouse
  * correct and fast BETWEEN queries — partition-scoped MERGE with
  * physical untouched-partition evidence, SCD type-2 history building,
  * range-clustered data layout with a measured file-pruning gap, and a
  * second mergeable-sketch family (Count-Min heavy-hitter frequencies,
  * store-then-reaggregate like the HLL pair — batch-sharded AND
  * maintained per-trigger from the ingest stream).
  */
object WarehouseQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Partition-scoped MERGE (upsert) — the reference warehouse's
    // INSERT OVERWRITE ... PARTITION maintenance step
    // (verizon_automation_script.sh's loaders), done the way it must be
    // at 100 TB: corrections to ONE month (updates keyed on existing
    // orders + late-arriving inserts) rewrite ONLY that month's
    // directory via dynamic partition overwrite. The physical claim is
    // `require`d, not asserted: an unaffected month's (name, size,
    // mtime) file snapshot is byte-identical across the merge, while
    // the hot month's files change. Certified output: the FULL table
    // read back — merge semantics (replaced / kept / inserted rows)
    // under the oracle.
    "warehouse_merge_upsert" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("warehouse_merge_upsert")
      val hot = "1995-03" // the month being corrected
      val calm = "1997-01" // witness partition that must stay untouched
      // cluster on the partition key before the partitioned write: each
      // task then emits whole months (≈1 file per month) instead of
      // every task spraying a fragment into all ~80 directories — the
      // small-files problem that cripples partitioned tables at scale
      Tables.orders(s, dir)
        .withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
        .repartition(col("om"))
        .write.mode("overwrite").partitionBy("om").parquet(s"$out/orders")
      val tbl = s.read.parquet(s"$out/orders")
      val updates = tbl
        .filter(col("om") === hot && col("o_orderkey") % 7 === 0)
        .withColumn("o_orderpriority", lit("0-CORRECTED"))
        .withColumn("o_totalprice", col("o_totalprice") + lit(1.0))
      val inserts = tbl
        .filter(col("om") === hot && col("o_orderkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
        .withColumn("o_orderstatus", lit("I"))
      val changes = updates.unionByName(inserts)
      // stage-then-swap: the merge output cannot overwrite a path it
      // reads from, and staging is also what makes the swap atomic per
      // partition on a real object store
      Warehouse.mergeByKey(tbl, changes, "o_orderkey", "om")
        .write.mode("overwrite").parquet(s"$out/stage")
      val calmBefore = Warehouse.partitionFileSnapshot(s"$out/orders", "om", calm)
      val hotBefore = Warehouse.partitionFileSnapshot(s"$out/orders", "om", hot)
      require(calmBefore.nonEmpty && hotBefore.nonEmpty,
        s"fixture must populate both witness months $calm and $hot")
      Warehouse.overwritePartitions(
        s.read.parquet(s"$out/stage"), s"$out/orders", "om")
      require(
        Warehouse.partitionFileSnapshot(s"$out/orders", "om", calm) == calmBefore,
        s"merge must not touch the unaffected partition om=$calm")
      require(
        Warehouse.partitionFileSnapshot(s"$out/orders", "om", hot) != hotBefore,
        s"merge must rewrite the affected partition om=$hot")
      s.read.parquet(s"$out/orders")
    },
    // SCD type-2 history with run collapsing (gaps-and-islands): each
    // user's event-type stream folds into validity intervals
    // [valid_from, valid_to), consecutive repeats of a state collapsing
    // into ONE interval — the part a naive lead() gets wrong. The lag
    // marker and the run-numbering sum share a single keyed
    // Exchange+Sort; the closing lead() runs at collapsed-run grain.
    "scd2_user_state_history" -> { (s, dir) =>
      Scd2.history(Tables.events(s, dir),
          col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumnRenamed("key", "user_id")
    },
    // Range-clustered data layout: the same events written (a) range-
    // partitioned + sorted on (user_id, ts) and (b) round-robin
    // scattered; a single-user predicate is `require`d to touch ≤3
    // clustered files but ≥8 scattered ones AND >2x the clustered
    // count — the measured locality gap that at 100 TB is the
    // difference between opening a handful of files (plus row-group
    // min/max skipping inside them, which the sort makes effective)
    // and opening the whole table. Certified output: the clustered
    // read's aggregate under the plain-events oracle — layout must
    // never change answers.
    "layout_cluster_prune" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("layout_cluster_prune")
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      Layout.clusterByRange(ev, s"$out/clustered", 24, col("user_id"), col("ts"))
      ev.repartition(24).write.mode("overwrite").parquet(s"$out/scattered")
      val pred = col("user_id") === 7
      val clustered = s.read.parquet(s"$out/clustered").filter(pred)
      val scattered = s.read.parquet(s"$out/scattered").filter(pred)
      val cF = Layout.filesTouched(clustered)
      val sF = Layout.filesTouched(scattered)
      require(cF >= 1 && cF <= 3,
        s"clustered layout must confine user 7 to <=3 of 24 files, got $cF")
      require(sF >= 8 && sF > 2 * cF,
        s"scattered layout must spread user 7 (got $sF files vs clustered $cF)")
      clustered.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"))
    },
    // Count-Min heavy-hitter frequencies — the SECOND mergeable-sketch
    // family (HLL answers "how many distinct", CMS answers "how often
    // is key k"), in the store-then-reaggregate shape of
    // hll_sketch_roundtrip: per-event-type shard sketches persisted to
    // parquet, union-merged FROM DISK, and `require`d BYTE-IDENTICAL to
    // the one-pass whole-table sketch — CMS cells are sums, so the
    // merge tree provably cannot change the sketch, which is exactly
    // why per-shard/per-day sketches can answer corpus-wide frequency
    // questions without rescanning 100 TB. Certified output: per probed
    // user, the exact count plus the two CMS guarantees as verdict
    // columns (estimate never undercounts; overcount within eps·N).
    "freq_cms_heavy_hitters" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("freq_cms_heavy_hitters")
      val ev = Tables.events(s, dir)
      ev.groupBy(col("event_type"))
        .agg(CmsSketch.buildLong(col("user_id")).as("sk"))
        .write.mode("overwrite").parquet(s"$out/sketches")
      val merged = s.read.parquet(s"$out/sketches")
        .agg(CmsSketch.union(col("sk")).as("sk"))
        .head().getAs[Array[Byte]](0)
      requireMatchesOnePass(ev, merged,
        "union of per-type shard sketches")
      cmsProbeVerdict(s, ev, merged)
    },
    // The SAME sketch family maintained FROM THE STREAM: each ingest
    // micro-batch folds to one CMS shard inside foreachBatch (the batch
    // is a plain frame there — no streaming state, no watermark; the
    // reduction's mergeability is what makes statelessness sufficient)
    // and lands replay-idempotent under its batch_id partition. The
    // per-trigger shard log — four sketch rows, bytes not data — is
    // then union-merged OFFLINE and `require`d byte-identical to the
    // one-pass corpus sketch: a consumer answers corpus-wide frequency
    // questions from the summary log alone, never rescanning the
    // ingested 100 TB. Certified under the same probe oracle as the
    // batch twin.
    "freq_cms_stream_ingest" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("freq_cms_stream_ingest")
      val ev = Tables.events(s, dir)
      val src = StreamRun.chunkedSource(s, ev,
        s"$out/src-${dir.replaceAll("[^A-Za-z0-9.]", "_")}", 4)
      val (shards, stats) = StreamRun.runAvailableNowSummarized(src,
        s"$out/run",
        b => b.agg(CmsSketch.buildLong(col("user_id")).as("sk")))
      require(stats.count(_.inputRows > 0) == 4,
        s"the backlog must stream as 4 data triggers: $stats")
      require(shards.count() == 4L, "one shard sketch per data trigger")
      val merged = shards.agg(CmsSketch.union(col("sk")).as("sk"))
        .head().getAs[Array[Byte]](0)
      requireMatchesOnePass(ev, merged,
        "the merged per-trigger shard sketches")
      cmsProbeVerdict(s, ev, merged)
    }
  )

  private def requireMatchesOnePass(ev: DataFrame, merged: Array[Byte],
                                    what: String): Unit = {
    val direct = ev.agg(CmsSketch.buildLong(col("user_id")).as("sk"))
      .head().getAs[Array[Byte]](0)
    require(java.util.Arrays.equals(merged, direct),
      s"$what must equal the one-pass corpus sketch byte-for-byte")
  }

  /** Per probed user: exact count plus the two CMS guarantees as
    * verdict columns (never undercounts; overcount within eps·N). The
    * 1-row sketch collect and the 10-key probe loop are driver-side BY
    * DESIGN — the sketch IS the driver-sized summary of the corpus.
    */
  private def cmsProbeVerdict(s: SparkSession, ev: DataFrame,
                              sketch: Array[Byte]): DataFrame = {
    val cms = CmsSketch.deserialize(sketch)
    val slack = CmsSketch.Eps * cms.totalCount()
    val probes = (0L until 10L).map { u =>
      (u, cms.estimateCount(java.lang.Long.valueOf(u)))
    }
    import s.implicits._
    val estDf = probes.toDF("user_id", "n_est")
    ev.filter(col("user_id") < 10)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .join(broadcast(estDf), "user_id")
      .select(col("user_id"), col("n_exact"),
        (col("n_est") >= col("n_exact")).as("lower_ok"),
        (col("n_est") <= col("n_exact") + lit(slack)).as("within_eps"))
  }

  def oracleSql: Map[String, String] = Map(
    // merge semantics over the original table: updated keys replaced,
    // inserts appended, everything else verbatim (keys are unique, so
    // the global NOT EXISTS equals the query's partition-scoped
    // anti-join)
    "warehouse_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority,
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
    // same islands construction: lag-marked changes, running-sum run
    // ids, run-grain intervals closed by lead; (ts, event_id) is a
    // total order so run numbering is unique
    "scd2_user_state_history" ->
      """WITH o AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (
        |  SELECT *, sum(CASE WHEN prev IS NULL OR prev <> event_type
        |                     THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS run
        |  FROM o),
        |runs AS (
        |  SELECT user_id, event_type AS state, run,
        |         min(ts) AS valid_from, count(*) AS n_events
        |  FROM m GROUP BY user_id, event_type, run)
        |SELECT user_id, state, valid_from,
        |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
        |         AS valid_to,
        |       n_events,
        |       lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
        |         IS NULL AS is_current
        |FROM runs""".stripMargin,
    // layout must never change answers: the clustered read's aggregate
    // equals the plain table scan
    "layout_cluster_prune" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM events WHERE user_id = 7
        |GROUP BY 1""".stripMargin,
    // the CMS guarantees as the certified verdict: never undercounts
    // (always true by construction), overcount within eps*N (holds with
    // confidence 0.999 per probe; deterministic for a fixed fixture +
    // seed — at these key cardinalities the sketch is collision-free)
    "freq_cms_heavy_hitters" -> cmsProbeOracle,
    // the stream-maintained shard log must answer identically
    "freq_cms_stream_ingest" -> cmsProbeOracle
  )

  private val cmsProbeOracle: String =
    """SELECT user_id, count(*) AS n_exact,
      |       TRUE AS lower_ok, TRUE AS within_eps
      |FROM events WHERE user_id < 10
      |GROUP BY 1""".stripMargin
}
