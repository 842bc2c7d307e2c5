package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER clustering: interleave the bits of several columns'
  * min-max-bucketed values into one Morton key, then range-partition
  * and sort the write by it — each output file covers a small
  * HYPER-RECTANGLE of the value space instead of a slab along one
  * axis, so the per-file min/max stats prune range queries on ANY of
  * the clustered columns (a single-column sort gives perfect pruning
  * on that column and none on the others; at 100 TB the second
  * predicate is usually the one that matters). This is the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` move, expressed as pure Column
  * arithmetic (shift/and/or fold — whole-stage codegen, no UDF).
  *
  * Bucketing is linear min-max over one cheap driver-side agg pass:
  * rank-based bucketing resists skew better but costs a full sort;
  * linear is the standard first cut and what the skipping oracle
  * certifies. Nulls bucket to 0 (they cluster together in the lowest
  * cells — IsNull pruning still works through the null counts).
  */
object ZOrder {

  /** Bits per dimension: `dims` columns interleave into a
    * `dims * bitsPer`-bit Morton key (capped so the key fits a Long).
    */
  private def bitsPer(dims: Int): Int = math.min(16, 62 / dims)

  /** The Morton key column for `cols`, bucketed by the given per-column
    * (min, max) ranges (external doubles — callers collect them in one
    * agg pass).
    */
  def mortonKey(cols: Seq[String], ranges: Seq[(Double, Double)]): Column = {
    require(cols.nonEmpty && cols.size == ranges.size)
    val k = cols.size
    val bits = bitsPer(k)
    val maxBucket = (1L << bits) - 1
    val scaled: Seq[Column] = cols.zip(ranges).map { case (c, (lo, hi)) =>
      val span = if (hi > lo) hi - lo else 1.0
      least(greatest(
        ((col(c).cast("double") - lit(lo)) / lit(span) * lit(maxBucket.toDouble))
          .cast("long"), lit(0L)), lit(maxBucket))
    }
    var z: Column = lit(0L)
    for (b <- 0 until bits; i <- 0 until k) {
      z = z.bitwiseOR(
        shiftleft(shiftright(scaled(i), b).bitwiseAND(lit(1L)), b * k + i))
    }
    z
  }

  /** Write `df` z-ordered by `cols` (numeric/date/timestamp) as a
    * graft-delim table: one agg pass collects the ranges, the Morton
    * key range-partitions the job into `nFiles` sorted slices, and the
    * key column is projected away before the rows hit the writer (a
    * projection preserves the arranged row order, and the V2 write
    * declares no distribution of its own, so Spark ships the arranged
    * partitioning straight through).
    */
  def writeDelim(df: DataFrame, path: String, cols: Seq[String],
      nFiles: Int, options: Map[String, String] = Map.empty): Unit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__min_$c"),
      max(col(c).cast("double")).as(s"__max_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val ranges = cols.indices.map { i =>
      (Option(r.get(2 * i)).fold(0.0)(_.asInstanceOf[Double]),
        Option(r.get(2 * i + 1)).fold(1.0)(_.asInstanceOf[Double]))
    }
    var w = df.withColumn("__z", mortonKey(cols, ranges))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.format("graft-delim").mode("overwrite")
    options.foreach { case (k, v) => w = w.option(k, v) }
    w.save(path)
  }
}
