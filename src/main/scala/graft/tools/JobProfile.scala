package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall breakdown of a single named driver query (dev tool for
  * the optimization rounds): the bench gives one number per query, but
  * the expensive certifications run 10-25 driver ACTIONS each (index
  * builds, artifact writes, eager requires, the final collect), and
  * choosing what to optimize needs the split. A SparkListener records
  * every job's start/end plus its call site; after the warm rep each
  * job line prints as `ms  jobId  callsite`.
  *
  * `sbt "runMain graft.tools.JobProfile <name> [reps]"`.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val starts = new ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val s = starts.remove(e.jobId)
        if (s != null)
          lines.add((e.jobId, (System.nanoTime() - s._1) / 1000000L, s._2))
      }
    })

    for (i <- 1 to reps) {
      lines.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // listener bus is async: give the tail job's end event a moment
      Thread.sleep(300)
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        val js = lines.asScala.toSeq.sortBy(_._1)
        js.foreach { case (id, ms, site) => println(f"[job] $ms%6d ms  #$id%-4d $site") }
        println(f"[job] jobs=${js.size} jobSum=${js.map(_._2).sum} ms")
      }
      println(f"[timeq] $name rep$i $dt%.2f s rows=$n")
    }
    spark.stop()
  }
}
