package graft.tools
/** Dev-only per-query timer: QTime <sfDir> <query>... — times each named
  * SparkEntry query (warm pass first) on a bench-shaped local session.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    for (n <- names) {
      try { graft.SparkEntry.queries(n)(spark, sfDir).count() }
      catch { case e: Throwable => println(s"WARMFAIL $n: ${e.getMessage}") }
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val rows = try graft.SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable => println(s"FAIL $n: ${e.getMessage}"); -1L }
      println(f"QTIME $n ${(System.nanoTime - t0) / 1e9}%.2f s rows=$rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
