package graft.ext
import org.apache.spark.sql.functions._
import graft.core.Tables
object IvfProfile {
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
    val e = SimSearch.clusteredView(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding", 50, 0.15)
    val q = e.filter(col("vec_id") < 100)
    def full(ll: Int, nc: Int): Unit = {
      val row = t(s"ivf_ll${ll}_nc$nc") {
        val ivf = SimSearch.ivfTopK(e, "vec_id", "embedding", 3,
            nCentroids = nc, lloydIters = ll, trainSample = 1024,
            probeFrac = 0.1, queries = Some(q))
          .select(col("id_q"), col("neighbor_id"), lit(1L).as("hit"))
        SimSearch.topKBruteForce(q, e, "vec_id", "embedding", 3)
          .join(ivf, Seq("id_q", "neighbor_id"), "left_outer")
          .agg(count(lit(1)).as("n_exact"),
            round(sum(col("cos")), 2).as("sum_cos"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
          .collect()(0)
      }
      println(s"  $row")
      spark.catalog.clearCache()
    }
    for (pass <- Seq("cold", "warm"); ll <- Seq(0, 1); nc <- Seq(32, 64))
      full(ll, nc)
    spark.stop()
  }
}
