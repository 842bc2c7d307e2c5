package graft.ext
import org.apache.spark.sql.functions._
import graft.core.Tables
object LshSubsetProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"STAGE $name ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val p = Dedup.MinHashParams(numBands = 16, rowsPerBand = 2, bruteForceMaxDocs = 0)
    for (cut <- Seq(1000L, 2000L); pass <- Seq("cold", "warm")) {
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < cut)
      val n = t(s"lsh_pairs_$cut($pass)") {
        Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.9, p).count()
      }
      println(s"  pairs=$n")
      spark.catalog.clearCache()
      val c = t(s"clusters_loop_$cut($pass)") {
        Dedup.nearDupClusters(docs, "doc_id", "text", 0.9,
          Dedup.MinHashParams(numBands = 16, rowsPerBand = 2),
          maxDriverEdges = 0L).count()
      }
      println(s"  clusters=$c")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
