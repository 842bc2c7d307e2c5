package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-18 queries: table-format maturity for the graft-delim
  * connector — size-targeted (bin-packed) compaction, CBO row counts
  * from manifest stats, timestamp time travel, and merge-on-read
  * deletes. Each closes a 100 TB scale gap the round-17 audit named:
  * one-file-per-partition compaction makes hot partitions stragglers
  * and re-compaction quadratic; missing numRows makes broadcast
  * decisions guess from bytes; copy-on-write DELETE rewrites every
  * matched file for a 10-row correction.
  */
object Round18Queries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // SIZE-TARGETED compaction (OPTIMIZE ... targetFileSize): six
    // appends land six files per partition; compaction bin-packs each
    // partition's files into bins of cumulative size <= target (one
    // rewrite task per bin) instead of one unbounded file — at 100 TB
    // the one-file form makes a hot partition a single task streaming
    // terabytes, and every later compaction rewrites it all again.
    // The requires pin the exact bin layout: per partition, the file
    // count after must equal the greedy packing of the before-entries
    // (computed independently here with the same rule), and at least
    // ceil(partitionBytes/target) bins. Content oracle unchanged.
    "delim_v2_compact_binned" -> { (s, dir) =>
      import graft.sources.v2.{DelimCompact, DelimV2}
      val out = CoreQueries.scratchDir("delim_v2_compact_binned")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      for (slice <- 0 until 6)
        orders.filter(col("o_orderkey") % 6 === slice)
          .write.format("graft-delim")
          .option("partitionBy", "o_orderstatus")
          .mode("append").save(t)
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def parent(rel: String): String = {
        val i = rel.lastIndexOf('/')
        if (i < 0) "" else rel.substring(0, i)
      }
      val before = DelimV2.readManifest(fs, hp).get.files
      val byPart = before.groupBy(e => parent(e.rel))
      require(byPart.values.forall(_.size == 6),
        s"fixture must land 6 files per partition, got " +
          byPart.view.mapValues(_.size).toMap)
      // target ~2.5x the mean file size: greedy pairs files two per
      // bin for near-uniform sizes, and the expected layout below
      // replicates compact's exact packing rule for any skew
      val target = before.map(_.len).sum * 5 / (before.size * 2)
      def greedyBins(lens: Seq[Long]): Int = {
        var bins = 0; var cur = 0L
        lens.foreach { l =>
          if (cur > 0 && cur + l > target) { bins += 1; cur = 0L }
          cur += l
        }
        if (cur > 0) bins += 1
        bins
      }
      val expected = byPart.view.mapValues(es =>
        greedyBins(es.sortBy(_.rel).map(_.len))).toMap
      DelimCompact.compact(s, t, targetFileSize = target)
      val after = DelimV2.readManifest(fs, hp).get.files
        .groupBy(e => parent(e.rel)).view.mapValues(_.size).toMap
      expected.foreach { case (p, exp) =>
        require(after.getOrElse(p, 0) == exp,
          s"partition $p: expected $exp bin-packed files, got " +
            s"${after.getOrElse(p, 0)} (target=$target)")
        val bytes = byPart(p).map(_.len).sum
        require(exp >= math.ceil(bytes.toDouble / target).toInt,
          s"partition $p: $exp bins under the ceil(bytes/target) floor")
      }
      require(after.values.sum < before.size,
        "bin-packed compaction must reduce the file count")
      s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING")
        .load(t)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          sum(col("o_orderkey")).as("key_sig"))
    },

    // TIMESTAMP time travel: every commit records its wall-clock in
    // the manifest header, and `timestampAsOf` (option) / `TIMESTAMP
    // AS OF` (SQL, through TableCatalog.loadTable(ident, micros))
    // resolves an instant to the NEWEST retained generation committed
    // at or before it — operators reason in wall-clock ("the table as
    // of last night's load"), not in generation numbers. Gen 1 writes
    // the low-price half, gen 2 appends the rest; reading AS OF gen
    // 1's exact commit instant must see only the first half (the >=
    // boundary), and the SQL form must agree with the option form.
    "delim_v2_time_travel_ts" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_time_travel_ts")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      orders.filter(col("o_totalprice") <= 100000.0)
        .write.format("graft-delim").option("retainVersions", "2")
        .mode("overwrite").save(t)
      // commit times are millis: force gen 2 strictly after gen 1 so
      // "as of gen 1's instant" is unambiguous
      Thread.sleep(15L)
      orders.filter(col("o_totalprice") > 100000.0)
        .write.format("graft-delim").mode("append").save(t)
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val ts1 = DelimV2.readManifestFile(
        fs, new org.apache.hadoop.fs.Path(hp, "_manifest.v1")).get.ts
      val ts2 = DelimV2.readManifestFile(
        fs, new org.apache.hadoop.fs.Path(hp, "_manifest.v2")).get.ts
      require(ts1 > 0 && ts2 > ts1,
        s"commits must carry increasing timestamps, got $ts1 then $ts2")
      def snap(tag: String, opts: Map[String, String]): DataFrame = {
        var r = s.read.format("graft-delim")
          .schema("o_orderkey BIGINT, o_totalprice DOUBLE")
        opts.foreach { case (k, v) => r = r.option(k, v) }
        r.load(t).agg(
          count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          sum(col("o_orderkey")).as("key_sig"))
          .select(lit(tag).as("gen"), col("n_rows"), col("revenue"),
            col("key_sig"))
      }
      val v1Rows = snap("v1", Map("timestampAsOf" -> ts1.toString))
        .collect()(0).getLong(1)
      // SQL form through the catalog: the literal lands as micros in
      // loadTable(ident, timestamp) and must resolve identically
      s.sql("DROP TABLE IF EXISTS graft_cat.default.tt18_t")
      s.sql(s"""CREATE TABLE graft_cat.default.tt18_t
        (o_orderkey BIGINT, o_totalprice DOUBLE)
        USING `graft-delim` LOCATION '$t'""")
      val lit1 = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ts1))
      val sqlV1 = s.sql(
        s"""SELECT count(*) AS n FROM graft_cat.default.tt18_t
           |TIMESTAMP AS OF TIMESTAMP'$lit1'""".stripMargin)
        .collect()(0).getLong(0)
      require(sqlV1 == v1Rows,
        s"SQL TIMESTAMP AS OF read $sqlV1 rows, option form read $v1Rows")
      snap("v1", Map("timestampAsOf" -> ts1.toString))
        .unionByName(snap("current", Map.empty))
    },

    // SQL MAINTENANCE procedures (`CALL graft_cat.system.optimize`,
    // Spark 4's connector procedure API — the Iceberg convention):
    // the reference's nightly cron loop as ONE schedulable statement.
    // Six appends land six files; the CALL bin-packs them under a
    // target size and reports (generation, files_before, files_after)
    // as its one-row result — require'd against the manifest truth —
    // and the compacted table must still hash-match the oracle.
    "delim_v2_call_optimize" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_call_optimize")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.opt18_t")
      s.sql(s"""CREATE TABLE graft_cat.default.opt18_t
        (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
        USING `graft-delim` LOCATION '$t'""")
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
      for (slice <- 0 until 6)
        orders.filter(col("o_orderkey") % 6 === slice).coalesce(1)
          .writeTo("graft_cat.default.opt18_t").append()
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val before = DelimV2.readManifest(fs, hp).get.files
      require(before.size == 6, s"fixture must land 6 files, got ${before.size}")
      val target = before.map(_.len).sum * 5 / (before.size * 2)
      val r = s.sql("CALL graft_cat.system.optimize(" +
        s"table => 'default.opt18_t', target_file_size => ${target}L)")
        .collect()(0)
      val after = DelimV2.readManifest(fs, hp).get
      require(r.getInt(1) == 6 && r.getInt(2) == after.files.size &&
        r.getLong(0) == after.gen,
        s"CALL summary (${r.toSeq}) disagrees with the manifest " +
          s"(gen=${after.gen}, files=${after.files.size})")
      require(after.files.size == 3,
        s"expected 3 bins of 2 under target=$target, got ${after.files.size}")
      s.sql("""SELECT o_orderpriority, count(*) AS n_orders,
        round(sum(o_totalprice), 2) AS revenue,
        sum(o_orderkey) AS key_sig
        FROM graft_cat.default.opt18_t GROUP BY o_orderpriority""")
    },

    // SORTED WRITES (`sortBy` — the Iceberg sort-order move): an
    // unpartitioned write takes a GLOBAL ordered distribution, so
    // Spark range-partitions the job and every output file carries a
    // DISJOINT key range; the writer's recorded min/max bounds are
    // then tight and a key-range query's stats skipping opens only
    // the overlapping files — require'd via the planned-splits hook
    // (kept ≤ discovered/4), the non-partition-directory analogue of
    // partition pruning that key-clustered 100 TB tables live on.
    "delim_v2_sorted_skipping" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_sorted_skipping")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .write.format("graft-delim")
        .option("sortBy", "o_orderkey")
        .option("writePartitions", "16")
        .mode("overwrite").save(t)
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val files = DelimV2.readManifest(fs, hp).get.files
      require(files.size >= 8,
        s"fixture must range-partition into many files, got ${files.size}")
      // SCALE-INDEPENDENT bounds: a fixed 10% slice of the key span
      // (integer arithmetic, mirrored exactly in the oracle SQL) — a
      // fixed literal range is half the table at sf0.001 and nothing
      // at sf10, which is how the PlanAuditSpec run caught the first
      // cut of this require
      val Array(mn, mx) = Tables.orders(s, dir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
      val lo = mn + (mx - mn) / 20
      val hi = mn + 3 * (mx - mn) / 20
      val df = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING")
        .load(t)
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
        .agg(count(lit(1)).as("n_rows"),
          round(sum(col("o_totalprice")), 2).as("revenue"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
      df.collect() // plan + execute so the hook records this query's pruning
      val (discovered, kept, _) = DelimV2.plannedSplitsFor(t).get
      require(kept >= 1 && kept * 3 <= discovered,
        s"sorted write must make the 10%-span query skip most files: " +
          s"kept=$kept of discovered=$discovered")
      df
    },

    // TIMESTAMP columns end-to-end (the event-log landing shape the
    // reference lives on): TimestampType is now a first-class
    // connector type — written as the Hive text form
    // (`yyyy-MM-dd HH:mm:ss.SSSSSS`, UTC), parsed byte-wise on the
    // columnar path, filter-pushable, stats-tracked, and sortable.
    // Events land sorted by ts into 12 range-disjoint files; a 3-day
    // ts-range scan must SKIP the non-overlapping files (require'd
    // kept*3 <= discovered) and the per-type rollup must match the
    // parquet-derived oracle to the microsecond.
    "delim_v2_timestamp_landing" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_timestamp_landing")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      Tables.events(s, dir)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .write.format("graft-delim")
        .option("sortBy", "ts")
        .option("writePartitions", "12")
        .mode("overwrite").save(t)
      val df = s.read.format("graft-delim")
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
          "event_type STRING, value DOUBLE")
        .load(t)
        .filter(col("ts") >= lit("2024-01-10 00:00:00") &&
          col("ts") < lit("2024-01-13 00:00:00"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"))
      df.collect() // execute so the planned-splits hook records pruning
      val (discovered, kept, _) = DelimV2.plannedSplitsFor(t).get
      require(discovered >= 10 && kept >= 1 && kept * 3 <= discovered,
        s"ts-sorted landing must skip non-overlapping files: " +
          s"kept=$kept of discovered=$discovered")
      df
    },

    // Z-ORDER clustering (ext.ZOrder — the OPTIMIZE ZORDER BY move):
    // a single-column sort prunes range queries on that column only;
    // Morton-interleaving two columns' bucketed bits makes each of the
    // 16 files a small RECTANGLE of the (custkey, totalprice) space,
    // so stats skipping prunes narrow range queries on EITHER column
    // (require'd: each one-dimensional slice keeps at most half the
    // files; the combined slice at most a quarter). Content oracle:
    // both slices' aggregates, tagged and unioned.
    "delim_v2_zorder_skipping" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_zorder_skipping")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      graft.ext.ZOrder.writeDelim(
        Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        t, Seq("o_custkey", "o_totalprice"), nFiles = 16)
      val schema = "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE"
      def slice(tag: String, f: org.apache.spark.sql.Column): DataFrame = {
        val df = s.read.format("graft-delim").schema(schema).load(t)
          .filter(f)
          .agg(count(lit(1)).as("n_rows"),
            round(sum(col("o_totalprice")), 2).as("revenue"),
            sum(col("o_orderkey")).as("key_sig"))
          .select(lit(tag).as("slice"), col("n_rows"), col("revenue"),
            col("key_sig"))
        df.collect() // execute so the hook records this slice's pruning
        val (discovered, kept, _) = DelimV2.plannedSplitsFor(t).get
        require(discovered >= 12 && kept >= 1 && kept * 2 <= discovered,
          s"z-order must prune the $tag slice: kept=$kept of $discovered")
        df
      }
      val byCust = slice("cust",
        col("o_custkey") >= 100L && col("o_custkey") <= 200L)
      val byPrice = slice("price",
        col("o_totalprice") >= 400000.0 && col("o_totalprice") <= 450000.0)
      byCust.unionByName(byPrice)
    },

    // BLOOM-SIDECAR equality skipping (`bloomFor` — parquet's
    // footer-bloom move for a format without footers): ids land HASH-
    // SHUFFLED across 12 files, so every file's [min,max] spans the
    // whole domain and stats cannot prune an `=` probe — the 100 TB
    // full-scan-for-one-row trap. Each file carries a 32 KB
    // `<file>.bloom` sidecar (NOT in the manifest: 32 KB × 100k files
    // would blow STRESS §15's metadata envelope); readers test it at
    // task start and never open non-matching data bytes. The require
    // drives the verdicts per file: an absent key skips ≥ 11 of 12,
    // a present key keeps its file. Content oracle: hit + miss probes.
    "delim_v2_bloom_skipping" -> { (s, dir) =>
      import graft.sources.v2.{DelimBloom, DelimV2}
      val out = CoreQueries.scratchDir("delim_v2_bloom_skipping")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      // keys DOUBLED: the fixture's orderkeys are dense, and an
      // out-of-range miss would be caught by min/max stats before the
      // bloom ever ran — odd keys are in-range-but-absent, the exact
      // case only a bloom can skip
      Tables.orders(s, dir)
        .select((col("o_orderkey") * 2).as("o_orderkey"), col("o_totalprice"))
        .repartition(12) // hash-shuffle: min/max useless by design
        .write.format("graft-delim")
        .option("bloomFor", "o_orderkey")
        .mode("overwrite").save(t)
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      val m = DelimV2.readManifest(fs, hp).get
      require(m.files.size == 12 && m.bloomCols == Seq("o_orderkey"),
        s"fixture: ${m.files.size} files, bloomCols=${m.bloomCols}")
      val Array(mn, mx) = Tables.orders(s, dir)
        .agg(min(col("o_orderkey")), max(col("o_orderkey")))
        .collect()(0).toSeq.map(v => v.asInstanceOf[Long] * 2).toArray
      val absent = mn + 1L // odd: inside [min,max], in no file
      def skips(key: Long): Int = m.files.count(e =>
        DelimBloom.fileSkips(fs, new org.apache.hadoop.fs.Path(hp, e.rel),
          Seq(("o_orderkey", Seq(key.toString)))))
      require(skips(absent) >= m.files.size - 1,
        s"in-range absent key must skip ~every file, skipped ${skips(absent)}" +
          s" of ${m.files.size}")
      require(skips(mn) < m.files.size,
        "the file holding the min key must not skip")
      // POST-OPTIMIZE (round 19): compaction OR-merges the members'
      // sidecars (fixed geometry, bitwise union), so the compacted
      // files STILL prove the absent key away — the skipping survives
      // maintenance instead of silently degrading to full scans
      graft.sources.v2.DelimCompact.compact(s, t,
        targetFileSize = m.files.map(_.len).sum / 4)
      val m2 = DelimV2.readManifest(fs, hp).get
      require(m2.files.size < m.files.size && m2.bloomCols == Seq("o_orderkey"),
        s"compaction fixture: ${m2.files.size} files")
      def skips2(key: Long): Int = m2.files.count(e =>
        DelimBloom.fileSkips(fs, new org.apache.hadoop.fs.Path(hp, e.rel),
          Seq(("o_orderkey", Seq(key.toString)))))
      require(skips2(absent) >= m2.files.size - 1,
        s"post-OPTIMIZE probe: merged sidecars must still skip the " +
          s"absent key (skipped ${skips2(absent)} of ${m2.files.size})")
      require(skips2(mn) < m2.files.size,
        "post-OPTIMIZE probe: the min key's compacted file must not skip")
      val delim = s.read.format("graft-delim")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE").load(t)
      delim.createOrReplaceTempView("bloom18_t")
      s.sql(s"""SELECT 'hit' AS probe, count(*) AS n_rows,
          round(sum(o_totalprice), 2) AS revenue
        FROM bloom18_t WHERE o_orderkey = $mn
        UNION ALL
        SELECT 'miss', count(*), round(sum(o_totalprice), 2)
        FROM bloom18_t WHERE o_orderkey = $absent""")
    },

    // SNAPSHOT HISTORY (`CALL graft_cat.system.snapshots` — DESCRIBE
    // HISTORY): one row per retained generation with commit time,
    // file/row counts (rows from the manifest's recorded stats — zero
    // data reads), and live tombstones. Gen 1 lands the low-price
    // half (1 file), gen 2 appends the rest (+1 file); the recorded
    // row counts must equal the parquet-derived truth.
    "delim_v2_snapshots" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("delim_v2_snapshots")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.snap18_t")
      s.sql(s"""CREATE TABLE graft_cat.default.snap18_t
        (o_orderkey BIGINT, o_totalprice DOUBLE)
        USING `graft-delim` OPTIONS (retainVersions '3') LOCATION '$t'""")
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      orders.filter(col("o_totalprice") <= 100000.0).coalesce(1)
        .writeTo("graft_cat.default.snap18_t").append()
      orders.filter(col("o_totalprice") > 100000.0).coalesce(1)
        .writeTo("graft_cat.default.snap18_t").append()
      val hist = s.sql(
        "CALL graft_cat.system.snapshots(table => 'default.snap18_t')")
      require(hist.schema.fieldNames.contains("committed_at") &&
        hist.filter(col("committed_at").isNull).count() == 0,
        "every retained snapshot must carry its commit time")
      hist.select(col("generation"), col("n_files"), col("n_rows"),
        col("n_tombstones"))
    },

    // MERGE-ON-READ DELETE (deletion tombstones): a DELETE whose
    // condition is fully pushable routes through SupportsDelete
    // (Spark's OptimizeMetadataOnlyDeleteFromTable) instead of the
    // copy-on-write rewrite — a tombstone lands in the manifest and
    // every matched data file SURVIVES BYTE-IDENTICAL (require'd:
    // same rel/len/gen set), the CoW write-amplification fix for
    // small corrections at 100 TB. Tombstones are generation-scoped:
    // rows re-inserted AFTER the delete match its predicate but must
    // survive (require'd via the oracle). A partition-only DELETE
    // takes the stronger form — matched entries leave the manifest
    // outright, no tombstone debt.
    "delim_v2_delete_mor" -> { (s, dir) =>
      import graft.sources.v2.DelimV2
      val out = CoreQueries.scratchDir("delim_v2_delete_mor")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.mor18_t")
      s.sql(s"""CREATE TABLE graft_cat.default.mor18_t
        (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderstatus STRING)
        USING `graft-delim` PARTITIONED BY (o_orderstatus) LOCATION '$t'""")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      base.writeTo("graft_cat.default.mor18_t").append()
      val hp = new org.apache.hadoop.fs.Path(t)
      val fs = hp.getFileSystem(s.sessionState.newHadoopConf())
      def snap() = DelimV2.readManifest(fs, hp).get
      val before = snap()
      val beforeSet = before.files.map(e => (e.rel, e.len, e.gen)).toSet
      // 1) data-column DELETE → tombstone; every data file survives
      s.sql("DELETE FROM graft_cat.default.mor18_t WHERE o_totalprice > 100000.0")
      val afterTomb = snap()
      require(afterTomb.files.map(e => (e.rel, e.len, e.gen)).toSet == beforeSet,
        "merge-on-read DELETE must leave every data file byte-identical " +
          s"(before=${beforeSet.size} files, after=${afterTomb.files.size})")
      require(afterTomb.tombstones.size == 1 && afterTomb.gen == before.gen + 1,
        s"expected exactly one tombstone at gen ${before.gen + 1}, got " +
          s"${afterTomb.tombstones.size} at gen ${afterTomb.gen}")
      // 2) partition-only DELETE → matched entries leave the manifest
      s.sql("DELETE FROM graft_cat.default.mor18_t WHERE o_orderstatus = 'P'")
      val afterPart = snap()
      require(afterPart.tombstones.size == 1,
        "partition-only DELETE must not add a tombstone")
      require(afterPart.files.forall(!_.rel.startsWith("o_orderstatus=P/")) &&
        afterPart.files.map(e => (e.rel, e.len, e.gen)).toSet ==
          beforeSet.filterNot(_._1.startsWith("o_orderstatus=P/")),
        "partition-only DELETE must drop exactly the matched partition's entries")
      // 3) rows matching the OLD tombstone predicate, inserted after
      // it, must survive (generation-scoped applicability)
      base.filter(col("o_totalprice") > 100000.0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(1000000000L))
        .writeTo("graft_cat.default.mor18_t").append()
      s.sql("""SELECT o_orderstatus, count(*) AS n_rows,
        round(sum(o_totalprice), 2) AS revenue,
        sum(o_orderkey) AS key_sig
        FROM graft_cat.default.mor18_t GROUP BY o_orderstatus""")
    },

    // MERGE SCHEMA EVOLUTION: `MERGE WITH SCHEMA EVOLUTION` against a
    // WIDER source auto-adds the missing column (Spark's
    // ResolveMergeIntoSchemaEvolution → GraftCatalog.alterTable ADD
    // COLUMN) and the row-level write lands it across generations —
    // pre-evolution files read the new column as null through the
    // per-generation by-name mapping the connector already certifies
    // for ALTER TABLE. Matched rows get updated price + the new
    // column; untouched rows carry over with null; NOT MATCHED rows
    // insert with it.
    "warehouse_merge_evolve" -> { (s, dir) =>
      val out = CoreQueries.scratchDir("warehouse_merge_evolve")
      val t = s"$out/t"
      graft.core.Scratch.rmTree(t)
      s.sql("DROP TABLE IF EXISTS graft_cat.default.me18_t")
      s.sql(s"""CREATE TABLE graft_cat.default.me18_t
        (o_orderkey BIGINT, o_totalprice DOUBLE)
        USING `graft-delim` LOCATION '$t'""")
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
      base.writeTo("graft_cat.default.me18_t").append()
      // wider source: +o_orderpriority; updates every %3 key (exact
      // +1.0 reprice) and inserts shifted copies of the %101 keys
      val src = Tables.orders(s, dir)
        .filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + lit(1.0)).as("o_totalprice"),
          col("o_orderpriority"))
        .unionByName(Tables.orders(s, dir)
          .filter(col("o_orderkey") % 101 === 0)
          .select((col("o_orderkey") + lit(1000000000L)).as("o_orderkey"),
            col("o_totalprice"), col("o_orderpriority")))
      src.createOrReplaceTempView("me18_src")
      s.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft_cat.default.me18_t t
        USING me18_src d ON t.o_orderkey = d.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val widened = s.table("graft_cat.default.me18_t")
      require(widened.schema.fieldNames.toSeq ==
        Seq("o_orderkey", "o_totalprice", "o_orderpriority"),
        s"schema evolution must add o_orderpriority: ${widened.schema.simpleString}")
      widened.select(col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        col("o_orderpriority").as("prio"))
    },

    // CBO ROW COUNTS from manifest stats (SupportsReportStatistics
    // .numRows): a partition-pruned graft-delim dimension reports the
    // EXACT post-pruning row count recorded by its writers, so the
    // planner sizes the join on real cardinality — the pruned slice
    // broadcasts with NO hint. The requires pin both halves: the
    // scan's reported numRows equals the parquet-derived truth for
    // the pruned partition, and the join plans as BroadcastHashJoin.
    "delim_v2_broadcast_stats" -> { (s, dir) =>
      import graft.sources.v2.DelimScan
      val out = CoreQueries.scratchDir("delim_v2_broadcast_stats")
      val t = s"$out/cust"
      graft.core.Scratch.rmTree(t)
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
        .write.format("graft-delim")
        .option("partitionBy", "c_mktsegment")
        .mode("overwrite").save(t)
      val dim = s.read.format("graft-delim")
        .schema("c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING")
        .load(t)
        .filter(col("c_mktsegment") === "BUILDING")
      val truth = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").count()
      val scans = dim.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      require(scans.nonEmpty, "no BatchScanExec under the dim plan")
      val nr = scans.head.asInstanceOf[DelimScan].estimateStatistics().numRows()
      require(nr.isPresent && nr.getAsLong == truth,
        s"pruned scan must report exact numRows=$truth from manifest " +
          s"stats, got ${if (nr.isPresent) nr.getAsLong.toString else "<absent>"}")
      val joined = Tables.orders(s, dir)
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("revenue"))
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      require(plan.contains("BroadcastHashJoin"),
        s"pruned delim dim under the threshold must broadcast unhinted:\n$plan")
      joined
    })

  def oracleSql: Map[String, String] = Map(

    "delim_v2_compact_binned" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders GROUP BY 1""".stripMargin,

    "delim_v2_time_travel_ts" ->
      """SELECT 'v1' AS gen, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders WHERE o_totalprice <= 100000.0
        |UNION ALL
        |SELECT 'current', count(*),
        |       round(sum(o_totalprice), 2),
        |       CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders""".stripMargin,

    "delim_v2_bloom_skipping" ->
      """SELECT 'hit' AS probe, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |WHERE o_orderkey * 2 = (SELECT min(o_orderkey) * 2 FROM orders)
        |UNION ALL
        |SELECT 'miss', count(*), round(sum(o_totalprice), 2)
        |FROM orders
        |WHERE o_orderkey * 2 = (SELECT min(o_orderkey) * 2 + 1 FROM orders)""".stripMargin,

    "delim_v2_zorder_skipping" ->
      """SELECT 'cust' AS slice, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders WHERE o_custkey BETWEEN 100 AND 200
        |UNION ALL
        |SELECT 'price', count(*), round(sum(o_totalprice), 2),
        |       CAST(sum(o_orderkey) AS BIGINT)
        |FROM orders WHERE o_totalprice BETWEEN 400000.0 AND 450000.0""".stripMargin,

    "delim_v2_timestamp_landing" ->
      """SELECT event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value,
        |       count(DISTINCT user_id) AS n_users,
        |       min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-13 00:00:00'
        |GROUP BY 1""".stripMargin,

    "delim_v2_sorted_skipping" ->
      """WITH b AS (SELECT min(o_orderkey) AS mn, max(o_orderkey) AS mx
        |           FROM orders)
        |SELECT count(*) AS n_rows, round(sum(o_totalprice), 2) AS revenue,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders, b
        |WHERE o_orderkey >= mn + (mx - mn) // 20
        |  AND o_orderkey <  mn + 3 * (mx - mn) // 20""".stripMargin,

    "delim_v2_snapshots" ->
      """SELECT CAST(1 AS BIGINT) AS generation, 1 AS n_files,
        |       count(*) AS n_rows, 0 AS n_tombstones
        |FROM orders WHERE o_totalprice <= 100000.0
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 2, count(*), 0 FROM orders""".stripMargin,

    "delim_v2_call_optimize" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM orders GROUP BY 1""".stripMargin,

    "warehouse_merge_evolve" ->
      """SELECT o_orderkey,
        |       round(CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |                  ELSE o_totalprice END, 2) AS price,
        |       CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
        |            ELSE NULL END AS prio
        |FROM orders
        |UNION ALL
        |SELECT o_orderkey + 1000000000, round(o_totalprice, 2),
        |       o_orderpriority
        |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin,

    "delim_v2_delete_mor" ->
      """WITH kept AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE NOT (o_totalprice > 100000.0) AND o_orderstatus <> 'P'),
        |reinserted AS (
        |  SELECT o_orderkey + 1000000000 AS o_orderkey, o_totalprice,
        |         o_orderstatus
        |  FROM orders WHERE o_totalprice > 100000.0)
        |SELECT o_orderstatus, count(*) AS n_rows,
        |       round(sum(o_totalprice), 2) AS revenue,
        |       CAST(sum(o_orderkey) AS BIGINT) AS key_sig
        |FROM (SELECT * FROM kept UNION ALL SELECT * FROM reinserted)
        |GROUP BY 1""".stripMargin,

    "delim_v2_broadcast_stats" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1""".stripMargin)
}
