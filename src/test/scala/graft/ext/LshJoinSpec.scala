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

  test("drop audit matches an independent bucket recount, with zero-filled bands") {
    for (seed <- 1 to 2; cap <- Seq(3, 6)) {
      val bands = syntheticBands(60, 4, seed)
      val got = LshJoin.dropAudit(bands, numBands, cap)
        .as[(Int, Long, Long)].collect()
        .map { case (b, d, r) => b -> (d, r) }.toMap
      val want = bands.groupBy("band", "band_hash").count()
        .filter(col("count") > cap)
        .groupBy("band").agg(count(lit(1)).as("d"), sum("count").as("r"))
        .as[(Int, Long, Long)].collect().map { case (b, d, r) => b -> (d, r) }.toMap
      assert(got.keySet == (0 until numBands).toSet, s"audit must emit every band: $got")
      for (b <- 0 until numBands)
        assert(got(b) == want.getOrElse(b, (0L, 0L)), s"band $b seed=$seed cap=$cap")
    }
  }

  test("drop audit over the REAL minhash band index: drops reported iff pairs lost") {
    val docs = graft.core.Tables.documents(spark, sf001).filter(col("doc_id") < 200)
    val params = Dedup.MinHashParams(numBands = 4, rowsPerBand = 2, maxBucketSize = 10)
    val audit = Dedup.minhashDropAudit(docs, "doc_id", "text", params)
      .as[(Int, Long, Long)].collect()
    val dropped = audit.map(_._2).sum
    // the low-entropy fixture at cap 10 must drop buckets in every band
    assert(audit.length == 4 && dropped > 0, audit.mkString(","))
    // audit matches a direct recount of the same band index
    val bands = Dedup.minhashBands(docs, "doc_id", "text", params)
    val recount = bands.groupBy("band", "band_hash").count()
      .filter(col("count") > 10).count()
    assert(dropped == recount)
    // and the capped candidate set is a strict subset of the uncapped one
    val capped = Dedup.minhashCandidatePairs(docs, "doc_id", "text", params)
      .as[(Long, Long)].collect().toSet
    val uncapped = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      params.copy(maxBucketSize = 1000000)).as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(uncapped) && capped.size < uncapped.size)
    spark.catalog.clearCache()
  }

  test("fuzzy-join drop audit counts degenerate variant blocks") {
    // 5 single-char strings share the empty-string deletion variant →
    // one block of size 5; cap 4 drops it (and nothing else: the five
    // distinct chars collide in no other variant)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("id", "s")
    val audit = FuzzyJoin.dropAudit(df, "id", "s", maxBlock = 4)
      .as[(Long, Long)].collect().head
    assert(audit == ((1L, 5L)), audit)
    val none = FuzzyJoin.dropAudit(df, "id", "s", maxBlock = 5)
      .as[(Long, Long)].collect().head
    assert(none == ((0L, 0L)), none)
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
