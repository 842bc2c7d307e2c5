package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 quantization for embedding columns — the
  * standard 4× storage/shuffle shrink for 100 TB-scale vector corpora
  * (recall impact is negligible at int8 for cosine retrieval; the scale
  * factor rides along as one double per vector).
  *
  * All math is built-in higher-order functions over the array column —
  * per-row, no shuffle, fully parallel.
  */
object Quantize {

  private def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / 127.0

  /** Nearest-integer in pure binary double arithmetic (half rounds
    * toward +∞). Spark's round() detours through BigDecimal's shortest
    * DECIMAL rendering of the double, which can disagree with binary
    * engines (DuckDB, C round) by one whole quantum near .5 boundaries —
    * floor(x + 0.5) is bit-identical everywhere.
    */
  private def nearest(x: Column): Column = floor(x + lit(0.5d))

  /** (id, scale, q): per-vector scale = max|x|/127 and the int8 codes.
    * Zero vectors are passed through with scale 0 and all-zero codes.
    */
  def int8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val s = scaleOf(v)
    emb.select(col(idCol).as("id"), s.as("scale"),
      when(s > 0, transform(v, x => nearest(x.cast("double") / s).cast("byte")))
        .otherwise(transform(v, _ => lit(0).cast("byte"))).as("q"))
  }

  /** Reconstruction-error report per vector: max and mean |x - q·scale|.
    * The symmetric-quantizer bound max_err <= scale/2 is asserted in
    * QuantizeSpec and surfaced (rounded) for the oracle gate.
    */
  def dequantError(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val s = scaleOf(v)
    val err = transform(v,
      x => abs(x.cast("double") - nearest(x.cast("double") / s) * s))
    emb.filter(s > 0).select(col(idCol).as("id"),
      round(s, 6).as("scale"),
      round(array_max(err), 6).as("max_err"),
      round(aggregate(err, lit(0.0d), (a, b) => a + b) / size(v), 6).as("mean_err"))
  }
}
