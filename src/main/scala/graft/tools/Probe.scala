package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val docs = graft.core.Tables.documents(spark, sf)
    val params = graft.ext.Dedup.MinHashParams(numBands = 16, rowsPerBand = 2)
    time("dedup_minhash") {
      graft.ext.Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.9, params).count()
    }
    time("dedup_clusters") {
      graft.ext.Dedup.nearDupClusters(docs, "doc_id", "text", 0.9, params).count()
    }
    spark.stop()
  }
}
