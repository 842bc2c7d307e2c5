package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-19 queries: the last named scale-killer (the monolithic
  * manifest) plus compaction debt retirement. A 100 TB table implies
  * ~800k live files; a single-document manifest re-serializes every
  * entry on every commit and re-parses every entry on every plan.
  * Segmentation (Iceberg's manifest-list move, re-expressed for the
  * graft-delim format) makes commits O(changed partitions) and
  * pruned plans O(kept partitions).
  */
object Round19Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SEGMENTED MANIFEST: many small appends push the table past the
    // segmentation threshold; the committed `_manifest.v<gen>` becomes
    // a small index over immutable content-addressed per-partition
    // segment files. The requires pin the three mechanisms the design
    // exists for: (1) a narrow append commits exactly ONE new segment
    // plus the index (every other chunk's bytes — and so its content
    // hash — are unchanged and the landed file is reused); (2) a plan
    // with a pushed partition equality LOADS < 20% of the segments
    // (the listing itself prunes, not just split planning); (3) the
    // full read still sees every row (content oracle).
    "delim_v2_manifest_segmented" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_manifest_segmented")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          format_string("p%02d", col("o_orderkey") % 16).as("pc"))
      // 4 appends x 16 partitions x 1 task = 64 entries; segSize 8
      // keeps each partition's 4-entry run a single chunk -> 16 segs.
      // Slice on (key div 16) so each append covers ALL 16 residues
      // (slicing on key % 4 would correlate with the partition
      // residue and land only 4 partitions per append).
      for (slice <- 0 until 4)
        orders.filter(expr(s"(o_orderkey div 16) % 4 = $slice"))
          .coalesce(1).write.format("graft-delim")
          .option("partitionBy", "pc")
          .option("manifestSegmentSize", "8")
          .mode(if (slice == 0) "overwrite" else "append").save(t)
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def segs(): Set[String] =
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(t,
          s"${DelimV2.SegPrefix}*")))
          .map(_.toSeq).getOrElse(Nil).map(_.getPath.getName).toSet
      val m0 = DelimV2.readManifest(fs, hp).get
      require(m0.files.size == 64,
        s"fixture must land 64 entries, got ${m0.files.size}")
      // the pointer is an INDEX: no inline entry lines past threshold.
      // REFERENCED segments count 16 (one per partition run); replaced
      // chunks from earlier appends may still breathe on disk inside
      // the GC grace window (readers mid-plan on an old index), so the
      // structural requires read the INDEX, not the directory.
      def pointerDoc(): String = {
        val in = fs.open(new org.apache.hadoop.fs.Path(t, DelimV2.ManifestFile))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      val doc = pointerDoc()
      require(doc.contains("#segment\t") && !doc.linesIterator.exists(l =>
        l.nonEmpty && !l.startsWith("#")),
        "past the threshold the committed manifest must be a segment index")
      val refBefore = doc.linesIterator.filter(_.startsWith("#segment\t"))
        .map(_.split('\t')(1)).toSet
      require(refBefore.size == 16,
        s"expected 16 per-partition segments, got ${refBefore.size}")
      val before = segs()
      // (1) narrow append -> exactly one new segment + the new index
      orders.filter(col("o_orderkey") % 128 === 7)
        .select((col("o_orderkey") + 100000000L).as("o_orderkey"), col("pc"))
        .coalesce(1).write.format("graft-delim")
        .option("partitionBy", "pc").mode("append").save(t)
      val born = segs() -- before
      require(born.size == 1,
        s"a one-partition append must commit exactly one new segment, " +
          s"got ${born.size}: ${born.mkString(", ")}")
      require(DelimV2.readManifest(fs, hp).get.gen == m0.gen + 1,
        "the append must advance the index generation")
      // (2) pushed partition equality loads < 20% of segments
      val rootKey = fs.makeQualified(hp).toUri.getPath
      DelimV2.clearSegmentReads()
      val p03 = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, pc STRING").load(t)
        .filter(col("pc") === "p03")
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sig"))
        .collect()(0)
      val (total, read) = DelimV2.segmentReads(rootKey).getOrElse(
        throw new IllegalStateException("no segmented read recorded"))
      require(read >= 1 && read * 5 <= total,
        s"pruned planning must load < 20% of segments, read $read of $total")
      // (3) full-content oracle: p03 slice + whole-table signature
      val full = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, pc STRING").load(t)
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("sig"))
        .collect()(0)
      import s.implicits._
      Seq(
        ("p03", p03.getLong(0), p03.getLong(1)),
        ("all", full.getLong(0), full.getLong(1)))
        .toDF("slice", "n_rows", "key_sig")
    },

    // TOMBSTONE-RETIRING COMPACTION: a pushable DELETE commits a
    // tombstone and leaves every data file byte-identical (the MoR
    // contract, re-pinned here); OPTIMIZE then rewrites ONLY the
    // tombstoned files through the parse path — deleted rows are
    // physically gone (raw newline count proves it), rows inserted
    // AFTER the delete survive byte-identical even though they match
    // its predicate (generation-scoped applicability through the
    // rewrite), and the committed manifest carries zero tombstones,
    // re-enabling the stats/count pushdowns tombstones suppress.
    "delim_v2_delete_retire" -> { (s, dir) =>
      import graft.sources.v2.{DelimCompact, DelimV2}
      val out = CoreQueries.scratchDir("delim_v2_delete_retire")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.mor19_t")
      s.sql(s"""CREATE TABLE graft_cat.default.mor19_t
        (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        USING `graft-delim` PARTITIONED BY (o_orderstatus) LOCATION '$t'""")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.writeTo("graft_cat.default.mor19_t").append()
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def snap() = DelimV2.readManifest(fs, hp).get
      val before = snap()
      s.sql("DELETE FROM graft_cat.default.mor19_t WHERE o_totalprice > 100000.0")
      val tombed = snap()
      require(tombed.tombstones.size == 1 &&
        tombed.files.map(e => (e.rel, e.len, e.gen)).toSet ==
          before.files.map(e => (e.rel, e.len, e.gen)).toSet,
        "pushable DELETE must tombstone, not rewrite")
      val tombGen = tombed.tombstones.head._1
      // rows matching the delete predicate, inserted AFTER it
      base.filter(col("o_totalprice") > 100000.0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
        .writeTo("graft_cat.default.mor19_t").append()
      val postAppend = snap().files.filter(_.gen > tombGen)
        .map(e => (e.rel, e.len, e.gen)).toSet
      require(postAppend.nonEmpty, "fixture must land post-delete files")
      // OPTIMIZE with the concat path disabled: the ONLY rewrites are
      // the tombstone retirements
      DelimCompact.compact(s, t, minFilesPerGroup = Int.MaxValue)
      val m2 = snap()
      require(m2.tombstones.isEmpty,
        s"compaction must retire the tombstone debt, ${m2.tombstones.size} left")
      require(m2.files.forall(_.gen > tombGen),
        "every tombstone-applicable file must be rewritten")
      require(postAppend.subsetOf(m2.files.map(e => (e.rel, e.len, e.gen)).toSet),
        "post-delete files must survive BYTE-IDENTICAL (only tombstoned " +
          "files rewrite)")
      // physical proof: the deleted rows are gone from the BYTES, not
      // just filtered at read time — raw newline count over every live
      // file equals the surviving row count
      val expected = base.filter(col("o_totalprice") <= 100000.0).count() +
        base.filter(col("o_totalprice") > 100000.0).count()
      val rawLines = m2.files.map { e =>
        val in = fs.open(new org.apache.hadoop.fs.Path(hp, e.rel))
        try {
          var n = 0L; var c = in.read()
          while (c >= 0) { if (c == '\n') n += 1; c = in.read() }
          n
        } finally in.close()
      }.sum
      require(rawLines == expected,
        s"deleted rows still on disk: $rawLines lines, expected $expected")
      s.sql("""SELECT o_orderstatus, count(*) AS n_rows,
        round(sum(o_totalprice), 2) AS revenue,
        sum(o_orderkey) AS key_sig
        FROM graft_cat.default.mor19_t GROUP BY o_orderstatus""")
    },

    // ORPHAN SWEEP (`CALL graft_cat.system.remove_orphans`): a crashed
    // commit can leave promoted-but-never-listed data files, a dead
    // staging tree, and an unclaimed manifest tmp — garbage no
    // retained snapshot references, invisible to reads but paid for
    // forever in storage and listing time at 100 TB. The requires pin
    // the exact sweep set: the planted orphans (a stray data file
    // inside a partition dir, a stray bloom sidecar, a dead
    // `_staging_*` tree, a `_manifest.claim-*` leftover) all die,
    // while every live file of every RETAINED generation survives
    // with identical bytes (md5-pinned) and time travel still reads
    // the older snapshot. Oracle unchanged — orphans were never
    // visible to queries.
    "delim_v2_remove_orphans" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_remove_orphans")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.ro19_t")
      s.sql(s"""CREATE TABLE graft_cat.default.ro19_t
        (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        USING `graft-delim` PARTITIONED BY (o_orderstatus)
        OPTIONS (retainVersions '2') LOCATION '$t'""")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.filter(col("o_orderkey") % 2 === 0)
        .writeTo("graft_cat.default.ro19_t").append()
      base.filter(col("o_orderkey") % 2 === 1)
        .writeTo("graft_cat.default.ro19_t").append()
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val m = DelimV2.readManifest(fs, hp).get
      def md5Of(p: org.apache.hadoop.fs.Path): String = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        md.digest().map(b => f"$b%02x").mkString
      }
      val liveBefore = m.files.map(e =>
        e.rel -> md5Of(new org.apache.hadoop.fs.Path(hp, e.rel))).toMap
      // plant the orphans a crashed commit would leave
      def plant(rel: String, bytes: String): Unit = {
        val p = new org.apache.hadoop.fs.Path(hp, rel)
        fs.mkdirs(p.getParent)
        val o = fs.create(p, true)
        try o.write(bytes.getBytes("UTF-8")) finally o.close()
      }
      val strayData = m.files.head.rel.replaceAll("/[^/]+$", "") +
        "/part-crashed-orphan.txt"
      plant(strayData, "9|9.0\n")
      plant("part-root-orphan.txt.bloom", "junk")
      plant("_staging_deadbeef/task-0.txt", "1|1.0\n")
      plant("_manifest.claim-dead1234", "#junk")
      val r = s.sql("CALL graft_cat.system.remove_orphans(" +
        "table => 'default.ro19_t', older_than_ms => 0)").collect()(0)
      require(r.getLong(0) >= 4L,
        s"expected >= 4 orphans swept, got ${r.getLong(0)}")
      Seq(strayData, "part-root-orphan.txt.bloom", "_staging_deadbeef",
        "_manifest.claim-dead1234").foreach { rel =>
        require(!fs.exists(new org.apache.hadoop.fs.Path(hp, rel)),
          s"orphan '$rel' survived the sweep")
      }
      // every live file of the CURRENT snapshot: identical bytes
      liveBefore.foreach { case (rel, h) =>
        val p = new org.apache.hadoop.fs.Path(hp, rel)
        require(fs.exists(p) && md5Of(p) == h,
          s"live file '$rel' was touched by the orphan sweep")
      }
      // the RETAINED previous generation still time-travels
      require(s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
        .option("versionAsOf", (m.gen - 1).toString).load(t)
        .count() > 0, "retained snapshot lost readability")
      s.sql("""SELECT o_orderstatus, count(*) AS n_rows,
        round(sum(o_totalprice), 2) AS revenue,
        sum(o_orderkey) AS key_sig
        FROM graft_cat.default.ro19_t GROUP BY o_orderstatus""")
    },

    // RENAME / DROP COLUMN over stable field IDs: generation 1 lands
    // under the original name, ALTER TABLE RENAME commits a
    // schema-lineage generation (ZERO data rewrites — byte-identical
    // file set pinned), generation 3 lands under the new name, and a
    // read serves the column from BOTH generations through the
    // listing-time ID translation. DROP COLUMN makes a column's bytes
    // unreachable without rewrites, and a later re-ADD of the same
    // name gets a fresh ID — the old bytes must NOT resurrect.
    "delim_v2_column_rename" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_column_rename")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.cr19_t")
      s.sql(s"""CREATE TABLE graft_cat.default.cr19_t
        (o_orderkey BIGINT, o_totalamount DOUBLE, o_orderstatus STRING)
        USING `graft-delim` PARTITIONED BY (o_orderstatus) LOCATION '$t'""")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.filter(col("o_orderkey") % 2 === 0)
        .withColumnRenamed("o_totalprice", "o_totalamount")
        .writeTo("graft_cat.default.cr19_t").append()
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def snap() = DelimV2.readManifest(fs, hp).get
      val before = snap()
      val beforeSet = before.files.map(e => (e.rel, e.len, e.gen)).toSet
      s.sql("ALTER TABLE graft_cat.default.cr19_t " +
        "RENAME COLUMN o_totalamount TO o_totalprice")
      val renamed = snap()
      require(renamed.gen == before.gen + 1 &&
        renamed.files.map(e => (e.rel, e.len, e.gen)).toSet == beforeSet,
        "RENAME COLUMN must commit a schema-lineage generation and " +
          "rewrite ZERO data files")
      base.filter(col("o_orderkey") % 2 === 1)
        .writeTo("graft_cat.default.cr19_t").append()
      // both generations answer under the NEW name (gen 1 through the
      // field-ID translation, gen 3 natively)
      val perGen = s.table("graft_cat.default.cr19_t")
        .agg(count(lit(1)), sum(when(col("o_totalprice").isNull, 1)
          .otherwise(0))).collect()(0)
      require(perGen.getLong(1) == 0L,
        "renamed column must be non-null from EVERY generation")
      // DROP + re-ADD on a side table: the dropped bytes never resurrect
      val t2 = s"$out/t2"
      graft.core.Scratch.rmTree(t2)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.cr19_side")
      s.sql(s"""CREATE TABLE graft_cat.default.cr19_side
        (id BIGINT, secret STRING) USING `graft-delim` LOCATION '$t2'""")
      import s.implicits._
      Seq((1L, "classified"), (2L, "hidden")).toDF("id", "secret")
        .writeTo("graft_cat.default.cr19_side").append()
      val hp2 = new org.apache.hadoop.fs.Path(t2)
      val sideBefore = DelimV2.readManifest(fs, hp2).get.files
        .map(e => (e.rel, e.len, e.gen)).toSet
      s.sql("ALTER TABLE graft_cat.default.cr19_side DROP COLUMN secret")
      require(DelimV2.readManifest(fs, hp2).get.files
        .map(e => (e.rel, e.len, e.gen)).toSet == sideBefore,
        "DROP COLUMN must rewrite ZERO data files")
      require(!s.table("graft_cat.default.cr19_side").schema
        .fieldNames.contains("secret"), "dropped column still visible")
      s.sql("ALTER TABLE graft_cat.default.cr19_side ADD COLUMN secret STRING")
      val res = s.table("graft_cat.default.cr19_side")
        .select("id", "secret").collect()
      require(res.forall(_.isNullAt(1)),
        "re-added column must NOT resurrect the dropped column's bytes: " +
          res.map(r => s"${r.getLong(0)}=${r.getString(1)}").mkString(","))
      s.sql("""SELECT o_orderstatus, count(*) AS n_rows,
        round(sum(o_totalprice), 2) AS revenue,
        sum(o_orderkey) AS key_sig
        FROM graft_cat.default.cr19_t GROUP BY o_orderstatus""")
    },

    // CBO COLUMN STATISTICS: writers record a per-file per-column
    // distinct-count estimate (256-register HLL over the written
    // text) in the manifest stats; the scan surfaces table-level
    // distinct counts (min(Σ per-file ndv, rows)) through
    // SupportsReportStatistics.columnStats. The requires pin the
    // causal chain: (1) every scan's logical-plan stats carry
    // attributeStats with the recorded NDVs; (2) with CBO join
    // reordering on and NO hints, a 3-table join written with the
    // UNSELECTIVE dimension first is reordered to join the SELECTIVE
    // dimension (1% of customers — provably small output via the
    // o_custkey distinct count) innermost. Oracle = the same join in
    // DuckDB.
    "delim_v2_cbo_ndv" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_cbo_ndv")
      graft.core.Scratch.rmTree(out)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
        .coalesce(1).write.format("graft-delim").mode("overwrite")
        .save(s"$out/fact")
      Tables.customer(s, dir)
        .filter(col("c_custkey") % 100 === 0)
        .select(col("c_custkey"), col("c_acctbal"))
        .coalesce(1).write.format("graft-delim").mode("overwrite")
        .save(s"$out/dima")
      import s.implicits._
      Seq(("F", 1.0), ("O", 2.0), ("P", 3.0)).toDF("st", "w")
        .coalesce(1).write.format("graft-delim").mode("overwrite")
        .save(s"$out/dimb")
      def rd(name: String, ddl: String) =
        s.read.format("graft-delim").schema(ddl).load(s"$out/$name")
      val confs = Seq("spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val fact = rd("fact", "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING")
        val dima = rd("dima", "c_custkey BIGINT, c_acctbal DOUBLE")
        val dimb = rd("dimb", "st STRING, w DOUBLE")
        // syntactically the UNSELECTIVE dimension joins first
        val probe = fact
          .join(dimb, fact("o_orderstatus") === dimb("st"))
          .join(dima, fact("o_custkey") === dima("c_custkey"))
          .agg(count(lit(1)), sum(col("c_acctbal")), sum(col("w")))
        val optimized = probe.queryExecution.optimizedPlan
        import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
        val scans = optimized.collect { case r: DataSourceV2ScanRelation => r }
        require(scans.size == 3, s"expected 3 scans, got ${scans.size}")
        scans.foreach { r =>
          require(r.stats.rowCount.isDefined && r.stats.attributeStats.nonEmpty,
            s"NDV column stats did not reach the plan for ${r.scan}")
        }
        val joins = optimized.collect {
          case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
        require(joins.size == 2, s"expected 2 joins\n$optimized")
        val innerOutputs = joins.last.collect {
          case r: DataSourceV2ScanRelation => r }
          .flatMap(_.output.map(_.name)).toSet
        require(innerOutputs.contains("c_acctbal"),
          "CBO must reorder the SELECTIVE customer join innermost " +
            s"(inner join outputs: $innerOutputs)\n$optimized")
      } finally saved.foreach { case (k, v) =>
        v match {
          case Some(x) => s.conf.set(k, x)
          case None => s.conf.unset(k)
        }
      }
      // the certified result, recomputed under the session's normal
      // configuration (same rows either join order)
      val fact = rd("fact", "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING")
      val dima = rd("dima", "c_custkey BIGINT, c_acctbal DOUBLE")
      val dimb = rd("dimb", "st STRING, w DOUBLE")
      fact.join(dimb, fact("o_orderstatus") === dimb("st"))
        .join(dima, fact("o_custkey") === dima("c_custkey"))
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("c_acctbal")), 2).as("bal_sum"),
          round(sum(col("w")), 2).as("w_sum"))
    },

    // PERSISTED ANN INDEX: centroids, PQ codebook, corpus cell
    // assignments, and corpus codes are built ONCE and stored as
    // parquet artifacts; queries answer from the artifacts alone. The
    // requires pin the artifact contract: TWO query batches run
    // against the stored index with recall >= 0.9 vs the exact
    // baseline, and the query path bumps the training counter ZERO
    // times (no k-means, no codebook job — at 100 TB the per-query
    // rebuild re-reads the corpus every call, which is the reflex
    // this closes).
    "similarity_ivf_persisted" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("similarity_ivf_persisted")
      graft.core.Scratch.rmTree(out)
      // cached once: the view feeds the build, two query batches (each
      // with a staleness-guard corpus count) and both sides of the
      // exact-recall baseline (round-22, same measurement as
      // similarity_ivf_incremental)
      val e = core.CacheScope.cached(ext.SimSearch.clusteredView(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nClusters = Round2Queries.IvfNClusters,
        mix = Round2Queries.IvfMix.toDouble))
      ext.SimSearch.buildIvfPqIndex(e, "vec_id", "embedding", s"$out/idx",
        nCentroids = 64, lloydIters = 0, pqLloydIters = 1)
      val trainedBefore = ext.SimSearch.trainJobCount
      // two independent query batches against the SAME stored index
      val r1 = ext.SimSearch.ivfPqTopKWith(e, "vec_id", "embedding", 3,
        s"$out/idx", e.filter(col("vec_id") < 50),
        probeFrac = 0.1, rerank = 16)
      val r2 = ext.SimSearch.ivfPqTopKWith(e, "vec_id", "embedding", 3,
        s"$out/idx", e.filter(col("vec_id") >= 50 && col("vec_id") < 100),
        probeFrac = 0.1, rerank = 16)
      val ipq = r1.unionByName(r2)
        .select(col("id_q"), col("neighbor_id"), lit(1L).as("hit"))
      val row = ext.SimSearch.topKBruteForce(
          e.filter(col("vec_id") < 100), e, "vec_id", "embedding", 3)
        .join(ipq, Seq("id_q", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_exact"),
          round(sum(col("cos")), 2).as("sum_cos"),
          (sum(coalesce(col("hit"), lit(0L))).cast("double")
            >= count(lit(1)) * 0.9).as("recall_ok"))
        .collect()(0)
      require(ext.SimSearch.trainJobCount == trainedBefore,
        "the persisted-index QUERY path must launch no training jobs")
      require(row.getBoolean(2),
        s"recall below 0.9 against the exact baseline")
      import s.implicits._
      Seq((row.getLong(0), row.getDouble(1), row.getBoolean(2), true))
        .toDF("n_exact", "sum_cos", "recall_ok", "train_free_ok")
    },

    // MERGE-ON-READ MERGE (delta mode): a table declaring
    // `mergeMode 'merge-on-read'` + a `rowId` key answers a narrow
    // MERGE with exactly two artifacts — insert files for the updated
    // and new rows, and ONE key-equality tombstone at the previous
    // generation — instead of the copy-on-write rewrite of every
    // matched file. The requires pin the mechanism: every pre-merge
    // data file survives BYTE-IDENTICAL ((rel, len, gen) set, the
    // same pin as delim_v2_delete_mor), the manifest carries exactly
    // one In(rowId, keys) tombstone, and the read result matches the
    // copy-on-write semantics exactly (the oracle).
    "warehouse_merge_mor" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("warehouse_merge_mor")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.wm19_t")
      s.sql(s"""CREATE TABLE graft_cat.default.wm19_t
        (o_orderkey BIGINT NOT NULL, o_totalprice DOUBLE, o_orderstatus STRING)
        USING `graft-delim` PARTITIONED BY (o_orderstatus)
        OPTIONS (mergeMode 'merge-on-read', rowId 'o_orderkey')
        LOCATION '$t'""")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.writeTo("graft_cat.default.wm19_t").append()
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def snap() = DelimV2.readManifest(fs, hp).get
      val before = snap()
      val beforeSet = before.files.map(e => (e.rel, e.len, e.gen)).toSet
      // the narrow source: updates for keys % 1000 == 0, brand-new
      // inserts with shifted keys into a fresh partition
      val matched = base.filter(col("o_orderkey") % 1000 === 0)
      matched.select(col("o_orderkey"),
          (col("o_totalprice") + 1000000.0).as("o_totalprice"),
          col("o_orderstatus"))
        .unionByName(matched.select(
          (col("o_orderkey") + 2000000000L).as("o_orderkey"),
          (col("o_totalprice") * 2.0).as("o_totalprice"),
          lit("X").as("o_orderstatus")))
        .createOrReplaceTempView("wm19_src")
      s.sql("""MERGE INTO graft_cat.default.wm19_t t
        USING wm19_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice
        WHEN NOT MATCHED THEN INSERT *""")
      val m = snap()
      require(beforeSet.subsetOf(m.files.map(e => (e.rel, e.len, e.gen)).toSet),
        "a merge-on-read MERGE must leave every matched data file " +
          "byte-identical")
      require(m.gen == before.gen + 1 && m.files.size > beforeSet.size,
        "the delta's insert files must land as the new generation")
      require(m.tombstones.size == 1 && m.tombstones.head._1 == before.gen,
        s"expected ONE key-equality tombstone at gen ${before.gen}, " +
          s"got ${m.tombstones}")
      require(m.tombstones.head._2.startsWith("in:"),
        s"tombstone must be the key-equality form: ${m.tombstones.head._2}")
      s.sql("""SELECT o_orderstatus, count(*) AS n_rows,
        round(sum(o_totalprice), 2) AS revenue,
        sum(o_orderkey) AS key_sig
        FROM graft_cat.default.wm19_t GROUP BY o_orderstatus""")
    })

  def oracleSql: Map[String, String] = Map(

    "delim_v2_manifest_segmented" ->
      """SELECT 'p03' AS slice, count(*) AS n_rows,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders WHERE o_orderkey % 16 = 3
        |UNION ALL
        |SELECT 'all',
        |       (SELECT count(*) FROM orders)
        |         + (SELECT count(*) FROM orders WHERE o_orderkey % 128 = 7),
        |       CAST((SELECT sum(o_orderkey) FROM orders)
        |         + (SELECT sum(o_orderkey + 100000000) FROM orders
        |            WHERE o_orderkey % 128 = 7) AS BIGINT)""".stripMargin,

    "delim_v2_delete_retire" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_totalprice <= 100000.0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_totalprice > 100000.0
        |) GROUP BY 1""".stripMargin,

    "delim_v2_remove_orphans" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders GROUP BY 1""".stripMargin,

    "delim_v2_column_rename" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders GROUP BY 1""".stripMargin,

    "delim_v2_cbo_ndv" ->
      """SELECT count(*) AS n_rows,
        |       round(sum(c_acctbal), 2) AS bal_sum,
        |       round(sum(CASE o_orderstatus WHEN 'F' THEN 1.0
        |                 WHEN 'O' THEN 2.0 ELSE 3.0 END), 2) AS w_sum
        |FROM orders JOIN customer
        |  ON o_custkey = c_custkey AND c_custkey % 100 = 0""".stripMargin,

    // identical exact-baseline relation to similarity_ivfpq_topk's
    // oracle (same clustered view, same ranking); recall and the
    // no-training pin are literal-true verdicts the engine must match
    "similarity_ivf_persisted" ->
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
         |       true AS recall_ok, true AS train_free_ok FROM (
         |  SELECT cos, row_number() OVER (PARTITION BY id_q
         |           ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM s)
         |WHERE rank <= 3""".stripMargin,

    // the exact COPY-ON-WRITE semantics of the same MERGE — the
    // merge-on-read path must be read-indistinguishable from it
    "warehouse_merge_mor" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 1000 = 0
        |              THEN o_totalprice + 1000000.0
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderstatus
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey + 2000000000, o_totalprice * 2.0, 'X'
        |  FROM orders WHERE o_orderkey % 1000 = 0
        |) GROUP BY 1""".stripMargin)
}
