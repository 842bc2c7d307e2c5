package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single named driver query at a given SF (dev tool).
  * `sbt "runMain graft.tools.TimeQ <name> [reps]"`.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sf).count()
      println(f"[timeq] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
