package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Shared LSH banding join machinery: candidate id pairs from a band
  * index, without a pair-level distinct.
  *
  * Input schema (one row per (doc, band)): `id`, `keys` (the full
  * band-key vector, array<bigint>), `band` (int position), `band_hash`
  * (that band's key). Both the MinHash (Dedup) and random-hyperplane
  * (SimSearch) indexes produce this shape.
  *
  * A pair colliding in m healthy buckets meets m times in the band
  * self-join; emitting it only at its FIRST healthy colliding band keeps
  * exactly one meeting. That replaces the candidate-level `distinct()` —
  * at scale the largest shuffle of any LSH pipeline, since candidates
  * outnumber docs by orders of magnitude — with doc-level plumbing. The
  * masked key vector holds the real band key where that doc's bucket is
  * healthy and a per-doc sentinel elsewhere (sentinels never collide
  * across docs), so `first_equal_index` finds the first HEALTHY shared
  * bucket and the output is identical to the distinct() formulation,
  * including skew-guard recall.
  */
object LshJoin {

  /** Candidate pairs (`id_a`, `id_b`): ordered (id_a < id_b) when
    * `ordered`, else both directions of every pair. Buckets with fewer
    * than 2 or more than `maxBucketSize` members are skipped (skew
    * guard).
    */
  def candidatePairs(
      bands: DataFrame, numBands: Int, maxBucketSize: Int,
      ordered: Boolean = true): DataFrame = {
    val spark = bands.sparkSession
    val okBuckets = bands.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2 && col("n") <= maxBucketSize)
      .select("band", "band_hash")
    val okRows = bands.join(okBuckets, Seq("band", "band_hash"))
    val okMasked = okRows
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("band"), col("band_hash"))))
        .as("okmap"))
      .select(col("id"), transform(
        sequence(lit(0), lit(numBands - 1)),
        j => when(map_contains_key(col("okmap"), j), element_at(col("okmap"), j))
          .otherwise(xxhash64(lit(-7L), col("id"), j))).as("mkeys"))
    val pruned = okRows.join(okMasked, Seq("id"))
    val l = pruned.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("mkeys").as("mkeys_a"))
    val r = pruned.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("mkeys").as("mkeys_b"))
    val idCond =
      if (ordered) col("id_a") < col("id_b") else col("id_a") =!= col("id_b")
    l.join(r,
        l("band") === r("band") && l("band_hash") === r("band_hash") && idCond &&
        GraftFunctions.firstEqualIndex(spark, col("mkeys_a"), col("mkeys_b"))
          === l("band"))
      .select("id_a", "id_b")
  }
}
