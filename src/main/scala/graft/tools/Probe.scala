package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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

    val docs = graft.core.Tables.documents(spark, sf)
    val e = graft.core.Tables.embeddings(spark, sf)

    // simhash: block path vs exact all-pairs Hamming, across skew caps
    val t0e = System.nanoTime()
    val exact = graft.ext.Dedup
      .simhashPairsExact(spark, docs, "doc_id", "text", maxHamming = 3)
      .select(col("id_a"), col("id_b")).cache()
    val nE = exact.count()
    println(f"simhash exact: n=$nE t=${(System.nanoTime() - t0e) / 1e9}%.2f")
    for (cap <- Seq(2000, 800, 400)) {
      val t0 = System.nanoTime()
      val block = graft.ext.Dedup
        .simhashNearDupPairs(spark, docs, "doc_id", "text",
          maxHamming = 3, maxBucketSize = cap)
        .select(col("id_a"), col("id_b")).cache()
      val nB = block.count()
      val nI = block.join(exact, Seq("id_a", "id_b")).count()
      println(f"simhash cap=$cap: block=$nB inter=$nI " +
        f"recall=${nI.toDouble / nE}%.4f t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    // ANN (RHP) recall@3 on vec_id < 100
    val exactTopk = graft.ext.SimSearch
      .topKBruteForce(e.filter(col("vec_id") < 100), e, "vec_id", "embedding", 3)
      .select(col("id_q"), col("neighbor_id")).cache()
    val nX = exactTopk.count()
    for ((bands, bits) <- Seq((16, 6), (24, 5), (32, 4), (48, 4))) {
      val t0 = System.nanoTime()
      val ann = graft.ext.SimSearch
        .annTopK(e, "vec_id", "embedding", 3, numBands = bands, bitsPerBand = bits)
        .select(col("id_q"), col("neighbor_id"))
      val annHit = ann.join(exactTopk, Seq("id_q", "neighbor_id")).count()
      println(f"ann($bands x $bits): n_exact=$nX hit=$annHit " +
        f"recall=${annHit.toDouble / nX}%.4f t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    for ((it, samp) <- Seq((2, 4096), (1, 4096), (1, 1024), (2, 1024))) {
      val t0 = System.nanoTime()
      val ivf = graft.ext.SimSearch
        .ivfTopK(e, "vec_id", "embedding", 3, lloydIters = it,
          trainSample = samp, probeFrac = 0.5)
        .select(col("id_q"), col("neighbor_id"))
      val hit = ivf.join(exactTopk, Seq("id_q", "neighbor_id")).count()
      println(f"ivf(it=$it samp=$samp): hit=$hit " +
        f"recall=${hit.toDouble / nX}%.4f t=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
