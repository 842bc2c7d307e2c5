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
    // a DIAGNOSIS knob, unset in driver runs: re-measuring a prior
    // round's query subset alone, in a fresh JVM, separates real plan
    // regressions from accumulated-JVM pressure (round-12 postmortem).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // warm pass over the SELECTED set only (JMH-style): absorbs
    // executor startup, parquet footers, and each query's Janino
    // compile; restricting it to the selection keeps a diagnosis
    // subset run from inheriting the full surface's in-JVM state —
    // exactly the variable a subset run exists to isolate
    selected.foreach { case (_, f) =>
      try f(spark, sfDir).count() catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // per-query GC seconds (delta of the JVM-wide collector totals):
    // distinguishes "this query's work grew" from "this query paid
    // another query's garbage" when comparing rounds
    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // TIER classification (round-16 verdict ask #8): the streaming-cert
    // tier's wall time is real trigger cadence and varies ±20-50% on a
    // shared box, repeatedly masking (or faking) batch regressions in
    // the round-over-round total. Observed, not hardcoded:
    // onQueryStarted is delivered SYNCHRONOUSLY on the starting thread,
    // so any query that executes a real StreamingQuery during its run
    // is classified "stream" with no name list to rot.
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
    val results = selected.map { case (name, fn) =>
      val g0 = gcMillis
      val t0 = System.nanoTime()
      sawStream.set(false)
      // a failed query is NOT a fast query: record the error message so
      // the bench json distinguishes the two, and exit nonzero below
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName))
      }
      val dt = (System.nanoTime() - t0) / 1e9
      val gc = (gcMillis - g0) / 1e3
      spark.catalog.clearCache()
      (name, dt, err, gc, sawStream.get)
    }
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
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"gc_sec":$gcs,"sf":"$sfDir"}""")
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
    // batch tier (plan-governed, stable) separately from the
    // streaming-cert tier (trigger-cadence wall time, ±20-50% on a
    // shared box)
    val (streamQ, batchQ) = results.partition(_._5)
    val batchSec = batchQ.map(_._2).sum
    val streamSec = streamQ.map(_._2).sum
    println(f"""{"metric":"bench_summary","total_sec":$total%.1f,"n_queries":$nq,"sec_per_query":$spq%.3f,"batch_sec":$batchSec%.1f,"n_batch":${batchQ.length},"stream_sec":$streamSec%.1f,"n_stream":${streamQ.length},"slowest":$slowest,"n_errors":${results.count(_._3.isDefined)},"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
