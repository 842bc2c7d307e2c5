package graft.ext

import graft.SparkFunSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkFunSuite {
  import spark.implicits._

  test("int8 codes stay in range and reconstruct within half a quantum") {
    val emb = Tables.embeddings(spark, sf001)
    val q = Quantize.int8(emb, "vec_id", "embedding")
    assert(q.select(explode(col("q")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count() == 0)
    val err = Quantize.dequantError(emb, "vec_id", "embedding")
    // symmetric quantizer bound: |x - q·s| <= s/2; both columns are
    // 6-dp-rounded for the oracle, so allow one rounding quantum
    assert(err.filter(col("max_err") > col("scale") / 2 + 1e-6).count() == 0)
    assert(err.count() > 0)
  }

  test("zero vector quantizes to zero codes with scale 0") {
    val one = Seq((1L, Seq(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val row = Quantize.int8(one, "vec_id", "embedding").collect()(0)
    assert(row.getDouble(1) == 0.0)
    assert(row.getSeq[Byte](2).forall(_ == 0))
  }

  test("quantized cosine stays close to full-precision cosine") {
    val emb = Tables.embeddings(spark, sf001).limit(50)
    val q = Quantize.int8(emb, "vec_id", "embedding")
      .select(col("id").as("vec_id"), col("scale"),
        transform(col("q"), c => c.cast("float") * col("scale")).as("deq"))
    val joined = emb.join(q, "vec_id")
    val pair = joined.alias("a").join(joined.alias("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(
        SimSearch.cosine(col("a.embedding"), col("b.embedding")).as("exact"),
        SimSearch.cosine(col("a.deq"), col("b.deq")).as("approx"))
    val maxDelta = pair.agg(max(abs(col("exact") - col("approx"))))
      .collect()(0).getDouble(0)
    assert(maxDelta < 0.02, s"quantized cosine drifted: $maxDelta")
  }
}
