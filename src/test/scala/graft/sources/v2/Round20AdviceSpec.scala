package graft.sources.v2

import org.apache.hadoop.fs.{Path => HPath}

import graft.SparkFunSuite

/** Round-20 code-health regressions (ADVICE.md):
  * - a second ALTER must not re-mint field IDs a prior RENAME commit
  *   already persisted (name inheritance cannot cross the rename;
  *   re-minting orphans every pre-rename generation's column as
  *   `__dropped_<id>` — NULL on read);
  * - a commit whose just-landed segments were swept while still
  *   unreferenced (a concurrent GC past the grace window, or a
  *   cross-process remove_orphans) must re-verify and re-land them
  *   after its generation claim, not publish an index pointing at
  *   missing files;
  * - an all-null tracked column must not report distinctCount=0 to
  *   the CBO (degenerate selectivity/division paths);
  * - the delta commit's ConcurrentModificationException rollback must
  *   delete the promoted bloom sidecars along with the data files.
  */
class Round20AdviceSpec extends SparkFunSuite {
  import spark.implicits._

  private def fs(t: String) =
    new HPath(t).getFileSystem(spark.sessionState.newHadoopConf())
  private def manifest(t: String) =
    DelimV2.readManifest(fs(t), new HPath(t)).get

  test("a second ALTER keeps the field IDs a prior RENAME committed") {
    val t = s"${tempDir("advice20-fid")}/t"
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.fid20_t")
    spark.sql(s"""CREATE TABLE graft_cat.default.fid20_t
      (id BIGINT, a DOUBLE, b STRING) USING `graft-delim` LOCATION '$t'""")
    (1L to 10L).map(i => (i, i.toDouble, s"s$i")).toDF("id", "a", "b")
      .coalesce(1).writeTo("graft_cat.default.fid20_t").append()
    spark.sql("ALTER TABLE graft_cat.default.fid20_t RENAME COLUMN a TO x")
    spark.sql("ALTER TABLE graft_cat.default.fid20_t RENAME COLUMN b TO y")
    // mechanism: across the recorded lineage, `a`'s original ID flowed
    // to `x` and `b`'s to `y` — the second ALTER's retro pass kept the
    // first RENAME's persisted IDs instead of re-deriving by name
    val schemas = manifest(t).schemas.toSeq.sortBy(_._1).map(_._2.struct)
    def idOf(st: org.apache.spark.sql.types.StructType, n: String): Long =
      DelimV2.fieldId(st.fields.find(_.name == n).get).get
    val first = schemas.head
    val last = schemas.last
    assert(idOf(first, "a") == idOf(last, "x"),
      s"rename lineage broken for a->x: ${schemas.map(_.fields.toSeq)}")
    assert(idOf(first, "b") == idOf(last, "y"),
      s"rename lineage broken for b->y: ${schemas.map(_.fields.toSeq)}")
    // behavior: pre-rename data reads under both renamed names
    val got = spark.table("graft_cat.default.fid20_t").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got == (1L to 10L).map(i => (i, i.toDouble, s"s$i")),
      s"pre-rename generation nulled out: ${got.take(3)}")
  }

  test("a commit re-lands segments swept while they were unreferenced") {
    val saved = sys.props.get("graft.segment.gc.graceMs")
    sys.props("graft.segment.gc.graceMs") = "0"
    try {
      val t = s"${tempDir("advice20-seggc")}/t"
      // 2 partitions x 4 appends = 8 files, segSize 4 -> segmented index
      for (a <- 0 until 4) {
        (0 until 8).map(i => (a * 8L + i, if (i % 2 == 0) "a" else "b"))
          .toDF("id", "pc").coalesce(1)
          .write.format("graft-delim")
          .option("partitionBy", "pc")
          .option("manifestSegmentSize", "4")
          .mode(if (a == 0) "overwrite" else "append").save(t)
      }
      val pointer = {
        val in = fs(t).open(new HPath(t, DelimV2.ManifestFile))
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      }
      assert(pointer.contains("#segment\t"), "fixture is not segmented")
      // the chunk holding partition pc=a, swept OUT-OF-BAND (simulating
      // a cross-process sweep the in-JVM memo eviction never saw: the
      // run memo still vouches for it at the next commit)
      val sweptName = pointer.linesIterator
        .filter(_.startsWith("#segment\t")).map(_.split('\t'))
        .collectFirst { case a if a(3).startsWith("pc=a") => a(1) }
        .getOrElse(fail("no pc=a segment in the index"))
      assert(fs(t).delete(new HPath(t, sweptName), false))
      // append to pc=b ONLY: pc=a's run memo-hits and references the
      // swept chunk; the post-claim re-verify must land it again
      Seq((100L, "b"), (101L, "b")).toDF("id", "pc")
        .coalesce(1).write.format("graft-delim")
        .option("partitionBy", "pc")
        .option("manifestSegmentSize", "4")
        .mode("append").save(t)
      assert(fs(t).exists(new HPath(t, sweptName)),
        "commit published an index referencing a swept segment " +
          "without re-landing it")
      val back = spark.read.format("graft-delim")
        .schema("id BIGINT, pc STRING").load(t)
      assert(back.count() == 34L)
      assert(back.filter($"pc" === "b").count() == 18L)
    } finally {
      saved match {
        case Some(v) => sys.props("graft.segment.gc.graceMs") = v
        case None => sys.props.remove("graft.segment.gc.graceMs")
      }
    }
  }

  test("an all-null tracked column reports distinctCount >= 1 to the CBO") {
    val t = s"${tempDir("advice20-ndv0")}/t"
    spark.range(0L, 100L)
      .selectExpr("id", "CAST(NULL AS DOUBLE) AS nv")
      .coalesce(1).write.format("graft-delim").mode("overwrite").save(t)
    val confs = Seq("spark.sql.cbo.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = spark.read.format("graft-delim")
        .schema("id BIGINT, nv DOUBLE").load(t)
      val scans = df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources.v2
          .DataSourceV2ScanRelation => r
      }
      assert(scans.size == 1)
      val stats = scans.head.stats
      val nv = stats.attributeStats.collectFirst {
        case (a, cs) if a.name == "nv" => cs }
      assert(nv.isDefined, "all-null column lost its stats entirely")
      assert(nv.get.distinctCount.exists(_ >= 1),
        s"distinctCount must clamp >= 1, got ${nv.get.distinctCount}")
      assert(nv.get.nullCount.contains(BigInt(100)))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a delta commit CME rollback leaves no orphan bloom sidecars") {
    val t = s"${tempDir("advice20-deltabloom")}/t"
    spark.sql("DROP TABLE IF EXISTS graft_cat.default.dbr20_t")
    spark.sql(s"""CREATE TABLE graft_cat.default.dbr20_t
      (id BIGINT NOT NULL, v DOUBLE)
      USING `graft-delim`
      OPTIONS (mergeMode 'merge-on-read', rowId 'id')
      LOCATION '$t'""")
    (1L to 20L).map(i => (i, i.toDouble)).toDF("id", "v")
      .coalesce(1).write.format("graft-delim")
      .option("bloomFor", "id").mode("append").save(t)
    val m1 = manifest(t)
    assert(m1.bloomCols == Seq("id"))
    // claim the next generation out-of-band: the MERGE's delta commit
    // loses the CAS and must roll back its promoted files AND sidecars
    val fake = new HPath(t, s"${DelimV2.ManifestFile}.v${m1.gen + 1}")
    val out = fs(t).create(fake, false); out.close()
    Seq((5L, 500.0), (105L, 1050.0)).toDF("id", "v")
      .createOrReplaceTempView("dbr20_src")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO graft_cat.default.dbr20_t t
        USING dbr20_src s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(x => Option(x.getMessage).getOrElse(""))
      .mkString("|")
    assert(chain.contains("already claimed"), s"unexpected failure: $e")
    // every bloom sidecar on disk belongs to a data file that exists
    // and is listed — the rollback deleted the promoted pair together
    val blooms = Option(fs(t).globStatus(
      new HPath(t, s"*${DelimBloom.Suffix}"))).map(_.toSeq).getOrElse(Nil)
    val listed = manifest(t).files.map(_.rel).toSet
    blooms.foreach { st =>
      val dataName = st.getPath.getName.stripSuffix(DelimBloom.Suffix)
      assert(fs(t).exists(new HPath(t, dataName)),
        s"orphan bloom sidecar survived the rollback: ${st.getPath}")
      assert(listed.contains(dataName),
        s"bloom sidecar for an unlisted file: ${st.getPath}")
    }
    assert(manifest(t).gen == m1.gen)
    fs(t).delete(fake, false)
  }
}
