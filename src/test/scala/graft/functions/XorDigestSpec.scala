package graft.functions

import graft.SparkFunSuite
import graft.core.Fingerprint
import org.apache.spark.sql.functions._

class XorDigestSpec extends SparkFunSuite {
  import spark.implicits._

  test("XorDigest is order-insensitive and agrees with itself across layouts") {
    val rows = (1 to 100).map(i => (i.toLong, s"row$i"))
    val a = rows.toDF("id", "s")
    val b = scala.util.Random.shuffle(rows).toDF("id", "s").repartition(7)
    def digest(df: org.apache.spark.sql.DataFrame): String =
      df.select(XorDigest.column(Fingerprint.rowHash(Seq("id", "s"))).as("d"))
        .head.getString(0)
    assert(digest(a) == digest(b))
  }

  test("XorDigest changes on mutation and encodes the row count") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val mutated = Seq((1L, "x"), (2L, "Y")).toDF("id", "s")
    def digest(df: org.apache.spark.sql.DataFrame): String =
      df.select(XorDigest.column(Fingerprint.rowHash(Seq("id", "s"))).as("d"))
        .head.getString(0)
    val da = digest(a)
    assert(da != digest(mutated))
    assert(da.startsWith("0000000000000002:")) // cnt=2 in the hex prefix
  }

  test("XorDigest works per group") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("k", "v")
    val got = df.groupBy("k")
      .agg(XorDigest.column(xxhash64(col("v"))).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("a").startsWith("0000000000000002:"))
    assert(got("b").startsWith("0000000000000001:"))
  }
}
