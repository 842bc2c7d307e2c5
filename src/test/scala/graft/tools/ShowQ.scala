package graft.tools
/** Dev-only: print a query's rows. ShowQ <sfDir> <query>... */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      println(s"=== $n")
      graft.SparkEntry.queries(n)(spark, args.head).show(30, false)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
