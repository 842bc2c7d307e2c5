package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Default to the machine's full parallelism (capped at 32, the target
    // harness size): an unset SPARK_GRAFT_CPUS previously meant local[4],
    // which under-reported throughput ~2x on the 32-core harness.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    // GraftSession.builder carries the shared runtime confs: UTC zone,
    // legacy nanos parquet, aggregate pushdown (on the default V1 path a
    // count's ReadSchema is struct<> — footers only, the analogue of the
    // reference's stats-served counts; the flag additionally enables
    // PushedAggregation on V2, asserted in PlanAuditSpec), and the
    // RocksDB state store provider with changelog checkpointing as the
    // production default for every stateful streaming query.
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Steady-state measurement (JMH-style): run EVERY query once
    // untimed, then measure. The warm pass absorbs the one-time costs —
    // executor startup, parquet footers, Janino compile of each query's
    // generated code — that otherwise land on whichever queries run
    // first and made per-query times incomparable across rounds
    // (q5_region_revenue read 6.5 s in round 3 vs 1.5 s steady-state
    // purely from map-order drift). Data caches are flushed between
    // passes and queries; only the JVM-wide codegen cache stays warm,
    // which is the steady state a resident engine runs in.
    spark.range(1000).selectExpr("sum(id)").collect()
    // Alphabetical order (map iteration order shifts whenever a query is
    // added, silently reshuffling which queries absorb residual JIT) and
    // a cache flush after each query (operators cache internally; reuse
    // across queries would contaminate the next measurement and grow
    // the heap across 70 queries).
    //
    // SPARK_GRAFT_BENCH_ONLY (comma-separated names) restricts the run —
    // a DIAGNOSIS knob (and the child-JVM protocol of the stream-tier
    // isolation below): re-measuring a query subset alone, in a fresh
    // JVM, separates real plan regressions from accumulated-JVM
    // pressure (round-12 postmortem).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // TIER CACHE (round-20 ask #1, contended-box robustness): the
    // parent's warm pass used to EXECUTE every streaming certification
    // once purely to classify it — ~2 minutes of wall per run whose
    // only output is a boolean, and whose box load inflates every
    // measurement that follows. The observed classification persists
    // across runs in target/bench-tiers.json; any cached name skips
    // the warm pass (its first measured pass warms it, and min()
    // discards that sample). SELF-HEALING, not a name list: unknown
    // names classify by execution exactly as before, a cached-batch
    // query that turns stream is caught live by the listener during
    // its measurement, and each fork re-observes and reports its
    // children's tier, so a stale entry corrects itself on the next
    // run. Subset (child) runs never consult the cache — they
    // classify by running, which they must do anyway.
    val tierCachePath = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), "target", "bench-tiers.json")
    // fall back to the repo-committed seed (bench/bench-tiers.json)
    // when target/ is fresh (clean checkout, sbt clean): without it a
    // cold run warm-classifies all 200+ queries — a third execution of
    // each on top of the two measured passes. Only names still in
    // SparkEntry.queries are trusted either way; new queries classify
    // by execution once and refresh the target copy.
    val seedPath = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), "bench", "bench-tiers.json")
    val cachedTier: Map[String, Boolean] =
      if (only.nonEmpty) Map.empty
      else {
        val src =
          if (java.nio.file.Files.exists(tierCachePath)) Some(tierCachePath)
          else if (java.nio.file.Files.exists(seedPath)) Some(seedPath)
          else None
        src.map { p =>
          try {
            val om = new com.fasterxml.jackson.databind.ObjectMapper()
            val root = om.readTree(java.nio.file.Files.readAllBytes(p))
            val names = SparkEntry.queries.keySet
            val it = root.fields()
            val b = Map.newBuilder[String, Boolean]
            while (it.hasNext) {
              val e = it.next()
              if (names.contains(e.getKey))
                b += (e.getKey -> e.getValue.asBoolean(false))
            }
            b.result()
          } catch { case _: Throwable => Map.empty[String, Boolean] }
        }.getOrElse(Map.empty)
      }
    // TIER classification (observed, not hardcoded): onQueryStarted is
    // delivered SYNCHRONOUSLY on the starting thread, so any query that
    // executes a real StreamingQuery during its run is classified
    // "stream" with no name list to rot. Classified during the WARM
    // pass because the stream tier is then MEASURED IN FRESH CHILD
    // JVMs (below), not in this one.
    val sawStream = new java.util.concurrent.atomic.AtomicBoolean(false)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit =
          sawStream.set(true)
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })
    // warm pass over the UNKNOWN names only (JMH-style): absorbs
    // executor startup, parquet footers, and each query's Janino
    // compile, and CLASSIFIES the query's tier by observation. A
    // tier-cached query skips it — its first measured pass below
    // doubles as its warm run, and the per-query min() discards that
    // sample — so a cached query executes exactly twice per run, the
    // round-19 cost envelope, with a second contention sample for
    // free (an UNKNOWN name pays one extra classification run the
    // first time it appears; the committed seed makes that rare).
    // Restricting the pass to the selection keeps a diagnosis
    // subset run from inheriting the full surface's in-JVM state —
    // exactly the variable a subset run exists to isolate.
    var isStream = selected.map { case (name, f) =>
      cachedTier.get(name) match {
        case Some(tier) => name -> tier
        // child/diagnosis (BENCH_ONLY) runs measure in-process either
        // way, so tier ROUTING is irrelevant there: skip the warm pass
        // (the first measured pass warms; min() discards it) and let
        // the live listener correction during measurement set the tier
        // the parent/cache adopt
        case None if only.nonEmpty => name -> false
        case None =>
          sawStream.set(false)
          try f(spark, sfDir).count() catch { case _: Throwable => () }
          spark.catalog.clearCache()
          name -> sawStream.get
      }
    }.toMap
    // per-query GC seconds (delta of the JVM-wide collector totals):
    // distinguishes "this query's work grew" from "this query paid
    // another query's garbage" when comparing rounds
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    def measureHere(queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
        : Seq[(String, Double, Option[String], Double)] =
      queries.map { case (name, fn) =>
        sawStream.set(false)
        val g0 = gcMillis
        val t0 = System.nanoTime()
        // a failed query is NOT a fast query: record the error message so
        // the bench json distinguishes the two, and exit nonzero below
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName))
        }
        val dt = (System.nanoTime() - t0) / 1e9
        val gc = (gcMillis - g0) / 1e3
        spark.catalog.clearCache()
        // live tier correction: a cached-batch query that now runs a
        // StreamingQuery reclassifies on the spot (the cache is an
        // optimization, never an authority)
        if (sawStream.get && !isStream.getOrElse(name, false))
          isStream = isStream + (name -> true)
        (name, dt, err, gc)
      }
    // MIN-OF-N PASSES (round-20 ask #1): one measured pass is one
    // sample of the shared box, and a load>2 contention phase inflated
    // the round-19 driver reading to 2.50x baseline on byte-identical
    // plans (quiet band 1.67-1.69x). Two FULL passes — separated in
    // time by the length of a pass, so they sample different phases —
    // with the per-query MIN is the standard least-noise estimator:
    // a query's floor is plan-governed, its excursions are the box's.
    // The first pass doubles as the JIT warm for anything the warm
    // pass skipped, which min() then discards.
    // Default passes: 2 (min-of-2, contended-box robustness). LOW-CORE
    // runs (≤ 8 cores) default to ONE pass: the driver's 8-core scaling
    // bench was killed at its time budget in round 21 (BENCH_r21_c8
    // rc 124 — a 233-query double-pass run that takes 250 s at 32 cores
    // cannot fit the same budget at 8), and a completed single-pass run
    // beats a killed double-pass run for scaling evidence. The 32-core
    // headline methodology is unchanged, and SPARK_GRAFT_BENCH_PASSES
    // still overrides in both directions.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .map(_.trim.toInt).filter(_ > 0)
      .getOrElse(if (cpus.toInt <= 8) 1 else 2)
    // Single-pass runs have no second pass to absorb codegen/JIT costs
    // (min-of-2 discards the cold sample; a tier-cached query also skips
    // the classification warm). To keep a passes=1 budget run's numbers
    // plan-governed rather than Janino-governed, warm each query ONCE at
    // the smallest sibling scale factor (sf0.001 when the bench runs a
    // larger SF): the plans — and therefore the generated-code cache
    // entries — are scale-independent, while the warm data pass costs
    // milliseconds per query. The measured pass still computes entirely
    // from the bench SF's parquet; nothing about it is cached (the JVM
    // codegen cache is the same steady state the 2-pass protocol keeps).
    val warmSfDir: Option[String] =
      if (passes > 1) None
      else {
        val d = new java.io.File(sfDir)
        Option(d.getParentFile)
          .map(p => new java.io.File(p, "sf0.001"))
          .filter(w => w.isDirectory && w.getPath != d.getPath)
          .map(_.getPath)
      }
    def measureMin(queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)])
        : Seq[(String, Double, Option[String], Double)] = {
      warmSfDir.foreach { w =>
        queries.foreach { case (_, fn) =>
          try f2count(fn, w) catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
      }
      (1 to passes).map(_ => measureHere(queries))
        .reduce { (a, b) =>
          a.zip(b).map { case ((n, dt1, e1, g1), (_, dt2, e2, g2)) =>
            // prefer a pass that succeeded; among successes, the faster
            (e1, e2) match {
              case (None, Some(_)) => (n, dt1, e1, g1)
              case (Some(_), None) => (n, dt2, e2, g2)
              case _ => if (dt1 <= dt2) (n, dt1, e1, g1) else (n, dt2, e2, g2)
            }
          }
        }
    }
    def f2count(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit = { fn(spark, dir).count(); () }
    // STREAM-TIER ISOLATION (round-17 verdict ask #1): the streaming
    // certifications execute real micro-batch StreamingQueries through
    // RocksDB state, and their wall time in a long-lived shared JVM
    // drifted ±20-50% on byte-identical code (225–275 s full-run spread
    // on one HEAD; isolated fresh-JVM re-measures of the same queries
    // read 2-4x lower). The acceptance bar compares s/q across rounds,
    // so the MEASUREMENT — not the plans — had become the dominant
    // noise term. Fix: measure the stream tier the way the trustworthy
    // diagnosis runs already do — fork a fresh child JVM per small
    // chunk of stream queries (SPARK_GRAFT_BENCH_ONLY protocol; the
    // child runs two measured passes and reports per-query mins, the
    // first pass doubling as its warm run), and adopt the children's
    // per-query seconds. Batch queries are plan-governed and stable;
    // they keep measuring in-process.
    // Forking needs `run / fork := true` (the real classpath in
    // java.class.path); SPARK_GRAFT_BENCH_NO_FORK=1 restores the old
    // single-JVM behavior, and subset (child) runs never re-fork.
    // chunk 12 (was 6): halves the number of fresh-JVM Spark startups
    // — the fixed cost a contended box amplifies ~2x — while a chunk
    // is still small enough that shared-JVM drift cannot accumulate
    // (the round-17 failure mode needed a 200+-query JVM lifetime)
    val noFork = sys.env.get("SPARK_GRAFT_BENCH_NO_FORK").contains("1")
    val chunkSize = sys.env.get("SPARK_GRAFT_BENCH_STREAM_CHUNK")
      .map(_.trim.toInt).filter(_ > 0).getOrElse(12)
    val (streamSel, batchSel) = selected.partition(q => isStream(q._1))
    val canFork = only.isEmpty && !noFork && streamSel.nonEmpty &&
      new java.io.File(System.getProperty("java.home"), "bin/java").exists()

    def forkChunk(names: Seq[String]): Option[Seq[(String, Double, Option[String], Double)]] = {
      val javaBin = new java.io.File(System.getProperty("java.home"), "bin/java").getPath
      val jvmOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filter(a => a.startsWith("--add-opens") || a.startsWith("--add-exports") ||
          a.startsWith("-X") || a.startsWith("-D"))
      val cmd = (Seq(javaBin) ++ jvmOpts ++
        Seq("-cp", System.getProperty("java.class.path"), "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", names.mkString(","))
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_CPUS", cpus)
      // the children inherit the parent's env (ProcessBuilder copies
      // it), so a PASSES override reaches them implicitly; pin the
      // RESOLVED value explicitly so a low-core parent's passes=1
      // default (below) also governs its stream-tier children
      pb.environment().put("SPARK_GRAFT_BENCH_PASSES", passes.toString)
      pb.redirectErrorStream(false)
      val errFile = java.io.File.createTempFile("graft-bench-child", ".err")
      pb.redirectError(errFile)
      try {
        val p = pb.start()
        val outBytes = p.getInputStream.readAllBytes()
        val exit = p.waitFor()
        val out = new String(outBytes, java.nio.charset.StandardCharsets.UTF_8)
        val line = out.linesIterator.find(_.contains("\"metric\":\"total\""))
        line match {
          case Some(l) =>
            val om = new com.fasterxml.jackson.databind.ObjectMapper()
            val root = om.readTree(l)
            val qs = root.get("queries"); val gcs = root.get("gc_sec")
            val errs = root.get("errors")
            // adopt the child's OBSERVED tier per query: the fork ran
            // each query and knows whether it started a StreamingQuery
            // — this is what keeps the parent's tier cache self-healing
            Option(root.get("stream")).foreach { sm =>
              names.foreach { n =>
                Option(sm.get(n)).foreach(v =>
                  isStream = isStream + (n -> v.asBoolean(true)))
              }
            }
            val parsed = names.map { n =>
              val q = Option(qs.get(n))
              if (q.isEmpty) (n, 0.0, Some("missing from child bench output"), 0.0)
              else (n, q.get.asDouble(),
                Option(errs).flatMap(e => Option(e.get(n))).map(_.asText()),
                Option(gcs).flatMap(g => Option(g.get(n))).map(_.asDouble()).getOrElse(0.0))
            }
            // exit != 0 with a parsed line = per-query errors already
            // recorded above; trust the parsed values either way
            Some(parsed)
          case None =>
            System.err.println(s"[bench] child JVM for ${names.mkString(",")} " +
              s"exited $exit without a total line; stderr tail: " +
              scala.util.Try(scala.io.Source.fromFile(errFile).getLines()
                .toSeq.takeRight(5).mkString(" | ")).getOrElse("<unreadable>"))
            None
        }
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] fork failed for ${names.mkString(",")}: " +
            Option(e.getMessage).getOrElse(e.getClass.getName))
          None
      } finally errFile.delete()
    }

    val batchResults = measureMin(batchSel)
    val streamResults: Seq[(String, Double, Option[String], Double)] =
      if (!canFork) measureMin(streamSel)
      else streamSel.map(_._1).grouped(chunkSize).toSeq.flatMap { chunk =>
        forkChunk(chunk).getOrElse {
          // fallback: a chunk whose child died measures in-process —
          // worse isolation beats a hole in the bench surface
          measureMin(streamSel.filter(q => chunk.contains(q._1)))
        }
      }
    // merged, alphabetical (stable output regardless of tier routing)
    val results = (batchResults ++ streamResults).sortBy(_._1)
      .map { case (n, dt, err, gc) =>
        (n, dt, err, gc, isStream.getOrElse(n, false)) }
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e), _, _) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, _, _, g, _) => s"\"" + k + "\":" + g }
      .mkString("{", ",", "}")
    // observed tier per query: a fork's parent adopts these, and the
    // parent's own line feeds the cross-run tier cache
    val tiers = results.map { case (k, _, _, _, s) => s"\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"gc_sec":$gcs,"stream":$tiers,"sf":"$sfDir"}""")
    // persist the tier observations for the next run's warm-pass skip
    // (full runs only: a subset run sees a sliver of the surface)
    if (only.isEmpty) try {
      java.nio.file.Files.createDirectories(tierCachePath.getParent)
      java.nio.file.Files.write(tierCachePath,
        tiers.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case _: Throwable => () }
    // Compact headline line, printed LAST: the driver keeps only a
    // 2000-char tail of this stdout, and the full per-query maps above
    // overflow it (round 13's artifact carried only the gc_sec tail —
    // no wall times survived). Everything a cross-round comparison
    // needs — total, s/q, the top-10 slowest with times — must fit in
    // the tail, so it goes on its own short final line.
    val slowest = results.sortBy(-_._2).take(10)
      .map { case (k, v, _, _, _) => f""""$k":${v}%.2f""" }
      .mkString("{", ",", "}")
    val nq = results.length
    val spq = if (nq == 0) 0.0 else total / nq
    // per-tier split: round-over-round comparisons should track the
    // batch tier (plan-governed, measured in this JVM) separately from
    // the streaming-cert tier (trigger-cadence wall time, measured in
    // fresh child JVMs — `isolated` says whether forking was active)
    val (streamQ, batchQ) = results.partition(_._5)
    val batchSec = batchQ.map(_._2).sum
    val streamSec = streamQ.map(_._2).sum
    // box-load transparency: the 1-minute load average at the end of
    // the run, so a contaminated reading is diagnosable from the
    // artifact alone (round-19 postmortem: a load>2 phase inflated the
    // driver reading 2.5-3.9x on shuffle tails with zero plan change)
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"""{"metric":"bench_summary","total_sec":$total%.1f,"n_queries":$nq,"sec_per_query":$spq%.3f,"batch_sec":$batchSec%.1f,"n_batch":${batchQ.length},"stream_sec":$streamSec%.1f,"n_stream":${streamQ.length},"stream_isolated":$canFork,"passes":$passes,"load_avg":$loadAvg%.2f,"slowest":$slowest,"n_errors":${results.count(_._3.isDefined)},"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
