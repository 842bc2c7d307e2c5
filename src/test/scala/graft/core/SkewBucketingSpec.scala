package graft.core

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SkewBucketingSpec extends SparkFunSuite {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf001).select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", nSalts = 8)
    assert(salted.count() == plain.count())
    // multiset equality via except-all in both directions
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin spreads a hot key over multiple salts") {
    val hotFact = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "name")
    val salted = hotFact.withColumn("__salt",
      pmod(xxhash64(struct(hotFact.columns.map(col): _*)), lit(8)).cast("int"))
    val saltsUsed = salted.select("__salt").distinct().count()
    assert(saltsUsed >= 6) // 1000 hashed rows should hit most of 8 salts
    val joined = Skew.saltedJoin(hotFact, dim, "k", 8)
    assert(joined.count() == 1000)
  }

  test("bucketed join has no shuffle exchange on either side") {
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf001).select("l_orderkey", "l_quantity"),
        "li_bkt", "l_orderkey", 4)
      Bucketing.writeBucketed(
        Tables.orders(spark, sf001).select("o_orderkey", "o_totalprice")
          .withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_bkt", "l_orderkey", 4)
      val joined = Bucketing.bucketedJoin(spark, "li_bkt", "o_bkt", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free bucketed join, got:\n$plan")
      // and it computes the right thing
      val expected = Tables.lineitem(spark, sf001)
        .join(Tables.orders(spark, sf001),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    }
  }
}
