package graft.ext
import org.apache.spark.sql.functions._
import graft.core.Tables
object CcProfile {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](name:String)(f: =>A):A={val t0=System.nanoTime;val r=f;println(f"STAGE $name ${(System.nanoTime-t0)/1e9}%.2f s");r}
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    t("clusters-cold"){Dedup.nearDupClusters(docs, "doc_id", "text", 0.9,
      Dedup.MinHashParams(numBands=16, rowsPerBand=2)).count()}
    t("clusters-warm"){Dedup.nearDupClusters(docs, "doc_id", "text", 0.9,
      Dedup.MinHashParams(numBands=16, rowsPerBand=2)).count()}
    spark.stop()
  }
}
