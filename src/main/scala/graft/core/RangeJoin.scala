package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-equi interval joins, made shuffle-joinable by bucketing.
  *
  * A point-in-interval join has no equi key, so Catalyst can only plan it
  * as a broadcast nested loop — O(N·M) comparisons, a non-starter when
  * both sides are large. The standard scale trick (used here): quantize
  * time into fixed-width buckets, expand each interval to the buckets it
  * overlaps, and join on bucket equality. The bucket column is a real
  * equi key, so the join runs as a hash/sort-merge join and each point is
  * only compared against intervals sharing its bucket. The residual
  * interval predicate runs inside the join condition, so no false pair is
  * ever materialized.
  *
  * Each point belongs to exactly one bucket, so a (point, interval) match
  * appears exactly once — no post-join dedup needed.
  *
  * Bucket width tuning: wider buckets → fewer expanded interval rows but
  * more residual comparisons; width ≈ median interval length is a good
  * default. At 100 TB both sides shuffle-partition on the bucket key, so
  * the pair space stays distributed and skew only appears if one bucket
  * is hot (salt the bucket key in that case, as in [[Skew.saltedJoin]]).
  */
object RangeJoin {

  /** Join `points` (timestamp `pointCol`) to `intervals`
    * ([`startCol`, `endCol`) half-open timestamps), returning matched
    * rows with all columns of both inputs. `bucketSeconds` is the
    * quantization width.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    // integer microsecond division — double division can misplace a
    // boundary timestamp by one ulp
    val w = bucketSeconds * 1000000L
    val p = points.withColumn("_bucket", expr(s"unix_micros($pointCol) DIV ${w}L"))
    // half-open end: an interval ending exactly on a bucket boundary does
    // not overlap that bucket, hence end-1µs for the last covered bucket;
    // empty/negative intervals are dropped (sequence() would otherwise
    // step backwards and fabricate buckets)
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_bucket", explode(sequence(
        expr(s"unix_micros($startCol) DIV ${w}L"),
        expr(s"(unix_micros($endCol) - 1L) DIV ${w}L"))))
    p.join(i,
        p("_bucket") === i("_bucket") &&
        col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bucket")
  }
}
