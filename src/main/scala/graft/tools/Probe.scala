package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[8]", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.SimSearch

    val e = SimSearch.clusteredView(
      graft.core.Tables.embeddings(spark, sf), "vec_id", "embedding",
      nClusters = 50, mix = 0.15)
    println(s"corpus: ${e.count()} vectors")
    val exact = SimSearch
      .topKBruteForce(e.filter(col("vec_id") < 100), e, "vec_id", "embedding", 3)
      .select(col("id_q"), col("neighbor_id")).cache()
    val nE = exact.count()
    for ((m, k, rerank, iters) <- Seq(
        (8, 16, 16, 1), (8, 16, 32, 1), (8, 32, 8, 1), (8, 32, 16, 1),
        (16, 16, 8, 1), (16, 16, 16, 1), (16, 32, 8, 1), (8, 16, 8, 2))) {
      val t0 = System.nanoTime()
      val pq = SimSearch.pqTopK(e, "vec_id", "embedding", 3,
          m = m, k = k, rerank = rerank, lloydIters = iters,
          queries = Some(e.filter(col("vec_id") < 100)))
        .select(col("id_q"), col("neighbor_id"))
      val nH = pq.join(exact, Seq("id_q", "neighbor_id")).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"m=$m k=$k rerank=$rerank iters=$iters: recall=${nH.toDouble / nE}%.3f ($nH/$nE) in $dt%.1f s")
    }
    spark.stop()
  }
}
