package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-20 queries: maturity items on the round-19 machinery. The
  * persisted ANN index gains incremental maintenance (append-only
  * encode against the frozen quantizers, plus a loud staleness guard),
  * closing the build-once/read-many gap: at 100 TB the corpus grows
  * daily while retraining is a scheduled event, so appends must cost
  * O(delta) — never a k-means pass, never a full-corpus re-encode.
  */
object Round20Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SNAPSHOT TAGS: a named, retention-EXEMPT pin on a generation
    // (Iceberg's tags, re-expressed for the graft manifest): `CALL
    // create_tag` records tag->generation in the manifest header, the
    // tagged versioned manifest survives retention expiry (and with it
    // every file/segment it references — the sweeps all key off the
    // versioned manifests present on disk), `option("tagAsOf", name)`
    // reads the pinned snapshot, and `drop_tag` releases it back to
    // ordinary retention. The requires pin the lifecycle: the tagged
    // .v file SURVIVES an overwrite + expire_snapshots(retain=1) while
    // its untagged siblings expire; the tagAsOf read returns the
    // ORIGINAL overwritten data; an unknown tag fails loudly; and
    // after drop_tag + expire the pinned manifest is actually
    // reclaimed (a tag that never releases is a storage leak).
    "delim_v2_snapshot_tag" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_snapshot_tag")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      def intercept(body: => Any): Option[String] =
        try { body; None } catch {
          case e: Throwable => Some(Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null)
            .map(x => Option(x.getMessage).getOrElse("")).mkString("|"))
        }
      s.sql("DROP TABLE IF EXISTS graft_cat.default.tag20_t")
      s.sql(s"""CREATE TABLE graft_cat.default.tag20_t
        (o_orderkey BIGINT, o_totalprice DOUBLE)
        USING `graft-delim` LOCATION '$t'""")
      val orders = core.Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      orders.filter(col("o_orderkey") % 3 === 0)
        .writeTo("graft_cat.default.tag20_t").append() // gen 1
      s.sql("""CALL graft_cat.system.create_tag(
        table => 'default.tag20_t', tag => 'baseline')""") // gen 2
      // OVERWRITE: gen 1's files die for every purpose EXCEPT the tag
      orders.filter(col("o_orderkey") % 3 === 1)
        .write.format("graft-delim").mode("overwrite").save(t) // gen 3
      s.sql("""CALL graft_cat.system.expire_snapshots(
        table => 'default.tag20_t', retain => 1)""") // gen 4
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def vExists(g: Long) =
        fs.exists(new org.apache.hadoop.fs.Path(t, s"_manifest.v$g"))
      require(vExists(1L),
        "the TAGGED generation must survive retention expiry")
      require(!vExists(2L) && !vExists(3L),
        "untagged generations must expire normally")
      def slice(df: org.apache.spark.sql.DataFrame) = df
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sig"))
        .collect()(0)
      val base = slice(s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
        .option("tagAsOf", "baseline").load(t))
      val cur = slice(s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE").load(t))
      val eUnknown = intercept(
        s.read.format("graft-delim")
          .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
          .option("tagAsOf", "nope").load(t).count())
      require(eUnknown.exists(_.contains("no snapshot tag")),
        s"unknown tag must fail loudly, got $eUnknown")
      // release: drop_tag + expire reclaims the pinned manifest
      s.sql("""CALL graft_cat.system.drop_tag(
        table => 'default.tag20_t', tag => 'baseline')""") // gen 5
      s.sql("""CALL graft_cat.system.expire_snapshots(
        table => 'default.tag20_t', retain => 1)""") // gen 6
      require(!vExists(1L),
        "a dropped tag's generation must rejoin ordinary retention")
      val eDropped = intercept(
        s.read.format("graft-delim")
          .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
          .option("tagAsOf", "baseline").load(t).count())
      require(eDropped.exists(_.contains("no snapshot tag")),
        s"a dropped tag must fail loudly, got $eDropped")
      import s.implicits._
      Seq(("baseline", base.getLong(0), base.getLong(1)),
        ("current", cur.getLong(0), cur.getLong(1)))
        .toDF("slice", "n_rows", "key_sig")
    },

    // PER-ROOT MANIFESTS FOR MULTI-ROOT READS: round 19 rejected a
    // union over table roots when any carried a live merge-on-read
    // tombstone (generation numbers are only meaningful within one
    // lineage — a flattened tombstone set would delete the wrong
    // rows). Round 20 implements it: every listed file carries its
    // root, and each root's tombstones apply to exactly its own
    // files. The requires pin the mechanism: the listing tracks the
    // tombstone under ONE root only, the even-key table keeps rows the
    // odd-key table's delete predicate ALSO matches (same generation
    // number on both lineages — the flattened design's failure case),
    // and the union matches the oracle.
    "delim_v2_multiroot_mor" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_multiroot_mor")
      graft.core.Scratch.rmTree(out)
      val orders = core.Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      def mk(name: String, t: String, residue: Int): Unit = {
        s.sql(s"DROP TABLE IF EXISTS graft_cat.default.$name")
        s.sql(s"""CREATE TABLE graft_cat.default.$name
          (o_orderkey BIGINT, o_totalprice DOUBLE)
          USING `graft-delim` LOCATION '$t'""")
        orders.filter(col("o_orderkey") % 2 === residue)
          .writeTo(s"graft_cat.default.$name").append()
      }
      mk("mra20_t", s"$out/a", 0)
      mk("mrb20_t", s"$out/b", 1)
      // the delete predicate matches rows in BOTH tables, at the SAME
      // generation number in both lineages — only B's rows may go
      s.sql("""DELETE FROM graft_cat.default.mrb20_t
        WHERE o_totalprice > 100000.0""")
      val snap = DelimV2.listSnapshot(Seq(s"$out/a", s"$out/b"),
        s.sessionState.newHadoopConf())
      require(snap.rootTombstones.size == 1 &&
        snap.rootTombstones.head._1.endsWith("/b"),
        s"the tombstone must stay scoped to root b: ${snap.rootTombstones
          .map(_._1)}")
      require(snap.files.forall(_.root != null) &&
        snap.files.map(_.root).distinct.size == 2,
        "every listed file must carry its root")
      s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
        .option("paths", s"$out/a,$out/b").load()
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_orderkey")).as("key_sig"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
    },

    // SEGMENT PRUNING ON ANY PARTITION COLUMN: round 19's segmented
    // manifest pruned segment loads only on the LEADING partition
    // column (lexicographic [minRel,maxRel] prefix test), so a k1/k2
    // table filtered on k2 parsed the whole index. A segment spans
    // exactly one leaf partition directory, so its full k=v map reads
    // straight off the recorded rel paths — no format change — and a
    // pushed equality on ANY partition column now prunes at listing
    // time. The requires pin it: a k2-only equality on a table
    // partitioned by (k1, k2) loads < 20% of the segments, and the
    // content matches the oracle both sliced and whole.
    "delim_v2_manifest_segmented_k2" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_manifest_segmented_k2")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      core.Tables.orders(s, dir)
        .select(col("o_orderkey"),
          format_string("a%d", col("o_orderkey") % 4).as("k1"),
          format_string("b%d", (col("o_orderkey") / 4).cast("long") % 8)
            .as("k2"))
        .coalesce(1).write.format("graft-delim")
        .option("partitionBy", "k1,k2")
        .option("manifestSegmentSize", "8")
        .mode("overwrite").save(t)
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val doc = {
        val in = fs.open(new org.apache.hadoop.fs.Path(t, DelimV2.ManifestFile))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      require(doc.contains("#segment\t"),
        "fixture must commit a segmented index")
      val nSegs = doc.linesIterator.count(_.startsWith("#segment\t"))
      require(nSegs == 32, s"expected 32 leaf-partition segments, got $nSegs")
      val rootKey = fs.makeQualified(hp).toUri.getPath
      DelimV2.clearSegmentReads()
      // equality on the SECOND partition column only
      val b3 = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, k1 STRING, k2 STRING").load(t)
        .filter(col("k2") === "b3")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sig"))
        .collect()(0)
      val (total, read) = DelimV2.segmentReads(rootKey).getOrElse(
        throw new IllegalStateException("no segmented read recorded"))
      require(read >= 1 && read * 5 <= total,
        s"a k2-only equality must load < 20% of segments, read $read of $total")
      val full = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, k1 STRING, k2 STRING").load(t)
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sig"))
        .collect()(0)
      import s.implicits._
      Seq(("b3", b3.getLong(0), b3.getLong(1)),
        ("all", full.getLong(0), full.getLong(1)))
        .toDF("slice", "n_rows", "key_sig")
    },

    // SCOPED TOMBSTONE SUPPRESSION of metadata aggregates: round 19
    // disabled the stats-complete COUNT/MIN/MAX path for the WHOLE
    // table on any live tombstone, so a delta-MERGE workload paid
    // scan-for-count on every untouched partition until OPTIMIZE. A
    // tombstone can touch a file only when the file's generation is at
    // or before the tombstone's AND no partition-only conjunct of its
    // predicate contradicts the file's k=v values. The requires pin
    // both sides with a LIVE tombstone on partition 'F': the same
    // aggregate over untouched partition 'O' is answered stats-
    // complete with ZERO data reads (plan marker + planned-splits
    // probe), while over the tombstoned partition 'F' it correctly
    // declines the metadata path and excludes the deleted rows.
    "delim_v2_stats_agg_mor" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_stats_agg_mor")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.sam20_t")
      s.sql(s"""CREATE TABLE graft_cat.default.sam20_t
        (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        USING `graft-delim` PARTITIONED BY (o_orderstatus) LOCATION '$t'""")
      core.Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .writeTo("graft_cat.default.sam20_t").append()
      // a LIVE merge-on-read tombstone scoped to partition F (the
      // predicate's partition conjunct makes it provably inert for
      // every other partition's files)
      s.sql("""DELETE FROM graft_cat.default.sam20_t
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0""")
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val m = DelimV2.readManifest(fs, hp).get
      require(m.tombstones.size == 1,
        s"fixture expects one live tombstone, got ${m.tombstones.size}")
      def tbl = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
        .load(t)
      def agg(status: String) = tbl
        .filter(col("o_orderstatus") === status)
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
      // untouched partition: stats-complete, zero data reads
      val oDf = agg("O")
      val oPlan = oDf.queryExecution.executedPlan.toString
      require(oPlan.contains("PushedAggregation: [stats-complete]"),
        "aggregate over the untouched partition must stay stats-served " +
          s"under a live tombstone on another partition:\n$oPlan")
      val oRow = oDf.collect()(0)
      val (_, kept, splits) = DelimV2.plannedSplitsFor(t).get
      require(kept == 0 && splits == 1,
        s"stats-complete aggregate opened data files: kept=$kept splits=$splits")
      // tombstoned partition: the metadata path must DECLINE (counts
      // would include deleted rows) and the scan excludes them
      val fDf = agg("F")
      require(!fDf.queryExecution.executedPlan.toString
          .contains("PushedAggregation: [stats-complete]"),
        "aggregate over the tombstoned partition must not be stats-served")
      val fRow = fDf.collect()(0)
      // the deleted rows' revenue is gone from a full scan too
      val fRev = tbl.filter(col("o_orderstatus") === "F")
        .agg(round(sum(col("o_totalprice")), 2)).collect()(0).getDouble(0)
      import s.implicits._
      Seq((oRow.getLong(0), oRow.getLong(1), oRow.getLong(2),
        fRow.getLong(0), fRow.getLong(1), fRow.getLong(2), fRev))
        .toDF("o_rows", "o_min_key", "o_max_key",
          "f_rows", "f_min_key", "f_max_key", "f_revenue")
    },

    // INCREMENTAL ANN INDEX MAINTENANCE: build the persisted IVF-PQ
    // index over 90% of the corpus, append the remaining 10% by
    // encoding ONLY the delta against the STORED centroids/codebook,
    // then answer a query batch from the maintained index. The
    // requires pin each mechanism: (1) the append and the queries
    // launch ZERO training jobs (trainJobCount frozen after build);
    // (2) the append touched exactly the delta — the cells artifact
    // grew by |delta| rows and the codes artifact by m·|delta|
    // (appendToIvfPqIndex never receives the corpus, and the artifact
    // row deltas prove no re-encode happened); (3) BEFORE the append
    // the staleness guard fails LOUDLY (10% of the corpus un-indexed
    // silently depresses recall — the round-19 gap); (4) recall >= 0.9
    // against the in-engine exact baseline over the full corpus.
    "similarity_ivf_incremental" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("similarity_ivf_incremental")
      graft.core.Scratch.rmTree(out)
      // the clustered view feeds MANY independent branches (index build,
      // staleness-guard counts, append delta, the recall join's query
      // and corpus sides) — each withNorm/count otherwise re-executes
      // the embeddings⨝centers view per branch (round-22: measured 95
      // serial jobs ≈ wall; caching the view once removes the repeated
      // view recomputation from every downstream job)
      val e = core.CacheScope.cached(ext.SimSearch.clusteredView(
        core.Tables.embeddings(s, dir), "vec_id", "embedding",
        nClusters = Round2Queries.IvfNClusters,
        mix = Round2Queries.IvfMix.toDouble))
      val base = e.filter(col("vec_id") % 10 =!= 0)
      val delta = e.filter(col("vec_id") % 10 === 0)
      ext.SimSearch.buildIvfPqIndex(base, "vec_id", "embedding",
        s"$out/idx", nCentroids = 64, lloydIters = 0, pqLloydIters = 1)
      val trainedAfterBuild = ext.SimSearch.trainJobCount
      // (3) staleness: 10% of the corpus is not in the index — a
      // query demanding 95% coverage must refuse, naming the fix
      val stale =
        try {
          ext.SimSearch.ivfPqTopKWith(e, "vec_id", "embedding", 3,
            s"$out/idx", e.filter(col("vec_id") < 100),
            probeFrac = 0.1, rerank = 16, maxStaleFrac = 0.05).count()
          false
        } catch {
          case ex: IllegalArgumentException =>
            Option(ex.getMessage).exists(_.contains("STALE"))
        }
      require(stale,
        "the staleness guard must reject a query against an index " +
          "missing 10% of the corpus")
      // (2) delta-only encode: artifact growth == |delta| exactly
      val cellsBefore = s.read.parquet(s"$out/idx/cells").count()
      val codesBefore = s.read.parquet(s"$out/idx/codes").count()
      val appended = ext.SimSearch.appendToIvfPqIndex(
        delta, "vec_id", "embedding", s"$out/idx")
      val nDelta = delta.count()
      require(appended == nDelta,
        s"append encoded $appended rows, delta holds $nDelta")
      val cellsGrew = s.read.parquet(s"$out/idx/cells").count() - cellsBefore
      val codesGrew = s.read.parquet(s"$out/idx/codes").count() - codesBefore
      require(cellsGrew == nDelta && codesGrew == 8L * nDelta,
        s"append re-encoded beyond the delta: cells +$cellsGrew, " +
          s"codes +$codesGrew for |delta|=$nDelta (m=8)")
      // (1) no training anywhere past the build
      require(ext.SimSearch.trainJobCount == trainedAfterBuild,
        "incremental append/query must launch no training jobs")
      // (4) the maintained index answers with recall >= 0.9; the
      // guard now passes (n_indexed covers the full corpus)
      val r = ext.SimSearch.ivfPqTopKWith(e, "vec_id", "embedding", 3,
        s"$out/idx", e.filter(col("vec_id") < 100),
        probeFrac = 0.1, rerank = 16, maxStaleFrac = 0.05)
        .select(col("id_q"), col("neighbor_id"), lit(1L).as("hit"))
      val row = ext.SimSearch.topKBruteForce(
          e.filter(col("vec_id") < 100), e, "vec_id", "embedding", 3)
        .join(r, Seq("id_q", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          round(sum(col("cos")), 2).as("sum_cos"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            >= count(lit(1)) * 0.9).as("recall_ok"))
        .collect()(0)
      require(ext.SimSearch.trainJobCount == trainedAfterBuild,
        "the maintained-index QUERY path must launch no training jobs")
      require(row.getBoolean(2), "recall below 0.9 after the append")
      import s.implicits._
      Seq((row.getLong(0), row.getDouble(1), row.getBoolean(2), true, true))
        .toDF("n_exact", "sum_cos", "recall_ok", "train_free_ok",
          "delta_only_ok")
    })

  def oracleSql: Map[String, String] = Map(
    // the tagged snapshot is the %3=0 slice as originally written; the
    // current table is the %3=1 overwrite
    "delim_v2_snapshot_tag" ->
      """SELECT 'baseline' AS slice, count(*) AS n_rows,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT 'current', count(*), CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin,

    // even keys all survive; odd keys lose the delete predicate's rows
    "delim_v2_multiroot_mor" ->
      """SELECT count(*) AS n_rows,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |WHERE o_orderkey % 2 = 0
        |   OR (o_orderkey % 2 = 1 AND NOT o_totalprice > 100000.0)""".stripMargin,

    // the k2 residue is (o_orderkey // 4) % 8 — DuckDB integer division
    "delim_v2_manifest_segmented_k2" ->
      """SELECT 'b3' AS slice, count(*) AS n_rows,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders WHERE (o_orderkey // 4) % 8 = 3
        |UNION ALL
        |SELECT 'all', count(*), CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders""".stripMargin,

    // the tombstone suppresses only the F partition's metadata path;
    // results both sides recompute directly from orders
    "delim_v2_stats_agg_mor" ->
      """SELECT
        |  (SELECT count(*) FROM orders WHERE o_orderstatus = 'O') AS o_rows,
        |  (SELECT min(o_orderkey) FROM orders WHERE o_orderstatus = 'O') AS o_min_key,
        |  (SELECT max(o_orderkey) FROM orders WHERE o_orderstatus = 'O') AS o_max_key,
        |  (SELECT count(*) FROM orders
        |     WHERE o_orderstatus = 'F' AND NOT o_totalprice > 100000.0) AS f_rows,
        |  (SELECT min(o_orderkey) FROM orders
        |     WHERE o_orderstatus = 'F' AND NOT o_totalprice > 100000.0) AS f_min_key,
        |  (SELECT max(o_orderkey) FROM orders
        |     WHERE o_orderstatus = 'F' AND NOT o_totalprice > 100000.0) AS f_max_key,
        |  (SELECT round(sum(o_totalprice), 2) FROM orders
        |     WHERE o_orderstatus = 'F' AND NOT o_totalprice > 100000.0) AS f_revenue""".stripMargin,
    // identical exact-baseline relation to similarity_ivf_persisted's
    // oracle (same clustered view, same ranking); recall, train-free
    // and delta-only are literal-true verdicts the engine must match
    "similarity_ivf_incremental" ->
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
         |       true AS recall_ok, true AS train_free_ok,
         |       true AS delta_only_ok FROM (
         |  SELECT cos, row_number() OVER (PARTITION BY id_q
         |           ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM s)
         |WHERE rank <= 3""".stripMargin)
}
