package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed single-pass table digest as a user-facing Aggregator
  * (SURVEY.md §7.3 — the optional custom-aggregate form of the A3
  * fingerprint; the built-in `count + bit_xor(xxhash64)` combo in
  * core.Fingerprint remains the default hot path).
  *
  * Input: a pre-computed 64-bit row hash. Buffer: (count, xor) — both
  * merges are commutative/associative, so the aggregate is
  * order-insensitive and partial-aggregation friendly by construction.
  * Output: hex digest string of (count, xor), matching the semantics
  * (not the encoding) of Fingerprint.table's digest.
  */
object XorDigest extends Aggregator[Long, (Long, Long), String] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), rowHash: Long): (Long, Long) =
    (b._1 + 1, b._2 ^ rowHash)

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 ^ b._2)

  override def finish(r: (Long, Long)): String =
    f"${r._1}%016x:${r._2}%016x"

  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)

  override def outputEncoder: Encoder[String] = Encoders.STRING

  /** Column form: XorDigest.column(rowHashCol). */
  def column(rowHash: Column): Column = udaf(XorDigest).apply(rowHash)
}
