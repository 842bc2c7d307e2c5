package graft.ext
import org.apache.spark.sql.functions._
import graft.core.Tables
object LshProfile {
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
    val docs = Tables.documents(spark, sfDir)
    val p = Dedup.MinHashParams(numBands = 16, rowsPerBand = 2, bruteForceMaxDocs = 0)
    t("bands") {
      Dedup.minhashBands(docs, "doc_id", "text", p).count()
    }
    spark.catalog.clearCache()
    t("candidates") {
      Dedup.minhashCandidatePairs(docs, "doc_id", "text", p).count()
    }
    spark.catalog.clearCache()
    t("full") {
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.9, p).count()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
