package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup

    val docs = graft.core.Tables.documents(spark, sf)
    graft.functions.GraftFunctions.register(spark)
    val t = 0.9

    def time(label: String, reps: Int = 2)(body: => Long): Unit = {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = body
        println(f"TIME|$label|rep$i|rows=$n|secs=${(System.nanoTime() - t0) / 1e9}%.2f")
        spark.catalog.clearCache()
      }
    }
    // warm JIT once
    Dedup.containmentPairs(docs, "doc_id", "text", t).count()
    spark.catalog.clearCache()
    time("plain")(Dedup.containmentPairs(docs, "doc_id", "text", t).count())
    time("lanes_df1000_s32")(Dedup.containmentPairs(docs, "doc_id", "text", t,
      hotTokenDf = 1000L, hotTokenSalts = 32).count())
    time("lanes_df1000_s8")(Dedup.containmentPairs(docs, "doc_id", "text", t,
      hotTokenDf = 1000L, hotTokenSalts = 8).count())
    spark.stop()
  }
}
