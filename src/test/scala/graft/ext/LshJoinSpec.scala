package graft.ext

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LshJoin.candidatePairs must be exactly the distinct() formulation it
  * replaced — same pairs, once each — including under skew-guard bucket
  * drops (the sentinel-masking edge cases).
  */
class LshJoinSpec extends SparkFunSuite {
  import spark.implicits._

  private val numBands = 4

  /** Deterministic pseudo-random band index: doc i's key in band j. Low
    * key cardinality forces plenty of multi-band collisions and, at low
    * maxBucketSize, plenty of dropped buckets.
    */
  private def syntheticBands(nDocs: Int, cardinality: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (1 to nDocs).map { i =>
      (i.toLong, Array.fill(numBands)(rnd.nextInt(cardinality).toLong))
    }
    rows.toDF("id", "keys")
      .select(col("id"), col("keys"),
        posexplode(col("keys")).as(Seq("band", "band_hash")))
  }

  private def naivePairs(bands: DataFrame, maxBucketSize: Int): Set[(Long, Long)] = {
    val ok = bands.groupBy("band", "band_hash").count()
      .filter(col("count") >= 2 && col("count") <= maxBucketSize)
      .select("band", "band_hash")
    val pruned = bands.join(ok, Seq("band", "band_hash"))
    pruned.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(pruned.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      .as[(Long, Long)].collect().toSet
  }

  test("identical to the distinct() formulation with no bucket drops") {
    for (seed <- 1 to 3) {
      val bands = syntheticBands(60, 8, seed)
      val got = LshJoin.candidatePairs(bands, numBands, maxBucketSize = 1000)
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"seed=$seed emitted duplicates")
      assert(got.toSet == naivePairs(bands, 1000), s"seed=$seed mismatch")
    }
  }

  test("identical under heavy skew-guard drops (sentinel masking)") {
    for (seed <- 1 to 3; cap <- Seq(3, 6)) {
      val bands = syntheticBands(60, 4, seed) // cardinality 4 → hot buckets
      val got = LshJoin.candidatePairs(bands, numBands, maxBucketSize = cap)
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"seed=$seed cap=$cap duplicates")
      assert(got.toSet == naivePairs(bands, cap), s"seed=$seed cap=$cap mismatch")
    }
  }

  test("directed mode yields both orientations of each ordered pair") {
    val bands = syntheticBands(30, 5, 7)
    val ordered = LshJoin.candidatePairs(bands, numBands, 1000, ordered = true)
      .as[(Long, Long)].collect().toSet
    val directed = LshJoin.candidatePairs(bands, numBands, 1000, ordered = false)
      .as[(Long, Long)].collect().toSet
    assert(directed == ordered ++ ordered.map(_.swap))
  }
}
