package graft.tools

import scala.collection.mutable

/** Poor-man's driver profiler for one named query (dev tool): samples
  * the query-running thread's stack every few ms and prints the hottest
  * frames, split into graft vs spark vs hadoop/fs buckets. The bench
  * showed several write-path certifications spending half their wall
  * OUTSIDE Spark jobs — this locates that driver-side time.
  *
  * `sbt "runMain graft.tools.DriverSample <name> [reps] [topN]"`.
  */
object DriverSample {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val topN = if (args.length > 2) args(2).toInt else 30
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    val main = Thread.currentThread()
    val allThreads = args.length > 3 && args(3) == "all"
    val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          val stacks: Seq[Array[StackTraceElement]] =
            if (allThreads) Thread.getAllStackTraces.asScala.values.toSeq
            else Seq(main.getStackTrace)
          stacks.foreach { st =>
            // leaf-most interesting frame: first graft/spark frame below
            // the JDK noise, plus the top graft frame anywhere in stack
            val frames = st.map(f => s"${f.getClassName}.${f.getMethodName}")
            if (!allThreads) {
              frames.find(f => !f.startsWith("java.") && !f.startsWith("jdk.") &&
                  !f.startsWith("scala.")).foreach(f => counts(f) += 1)
              frames.find(_.startsWith("graft.")).foreach(f => counts("GRAFT " + f) += 1)
            }
            // attribute shell-exec time to the first graft/spark caller
            val sh = frames.indexWhere(_.startsWith("org.apache.hadoop.util.Shell"))
            if (sh >= 0) {
              val caller = frames.drop(sh).filter(f =>
                !f.startsWith("org.apache.hadoop.util.Shell") &&
                !f.startsWith("java.") && !f.startsWith("jdk.")).take(4).mkString(" < ")
              counts("SHELL " + caller) += 1
            }
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    for (i <- 1 to reps) {
      if (i == reps) { counts.clear(); sampling = true }
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sf).count()
      val dt = (System.nanoTime() - t0) / 1e9
      sampling = false
      spark.catalog.clearCache()
      println(f"[timeq] $name rep$i $dt%.2f s rows=$n")
    }
    counts.toSeq.sortBy(-_._2).take(topN).foreach { case (f, c) =>
      println(f"[stack] ${c * 5}%6d ms  $f")
    }
    spark.stop()
  }
}
