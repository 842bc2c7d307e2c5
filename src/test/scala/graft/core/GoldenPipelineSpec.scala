package graft.core

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** End-to-end golden test (SURVEY.md §5.4): a REAL perturbed target
  * warehouse — parquet dirs on disk with rows dropped and a value
  * mutated — must produce exactly the known matched / mismatched /
  * inconsistent sets through the full UC#1 → UC#2 pipeline.
  */
class GoldenPipelineSpec extends SparkFunSuite {

  private lazy val tgtDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("golden_tgt").toString
    // region: unchanged → matched + consistent
    Tables.region(spark, sf001).write.parquet(s"$dir/region.parquet")
    // nation: same count, one value mutated → matched counts, INCONSISTENT digest
    Tables.nation(spark, sf001)
      .withColumn("n_name",
        when(col("n_nationkey") === 7, lit("MUTATED")).otherwise(col("n_name")))
      .write.parquet(s"$dir/nation.parquet")
    // customer: rows dropped → MISMATCHED counts
    Tables.customer(spark, sf001)
      .filter(col("c_custkey") % 10 =!= 0)
      .write.parquet(s"$dir/customer.parquet")
    dir
  }

  test("golden reconciliation: matched, mismatched, and inconsistent sets are exact") {
    val p = new ReconcilePipeline(spark, sf001, tgtDir,
      Seq("region" -> Nil, "nation" -> Nil, "customer" -> Nil))

    val statuses = p.report.collect()
      .map(r => r.getString(0) -> r.getString(4)).toMap
    assert(statuses == Map(
      "region" -> "matched",
      "nation" -> "matched",     // same count — the count check cannot see the mutation
      "customer" -> "mismatched"))

    val integ = p.integrity().collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    // integrity runs only on count-matched tables
    assert(integ == Map("region" -> true, "nation" -> false))
  }

  test("golden reports round-trip through CSV") {
    val out = java.nio.file.Files.createTempDirectory("golden_out").toString
    val p = new ReconcilePipeline(spark, sf001, tgtDir,
      Seq("region" -> Nil, "nation" -> Nil, "customer" -> Nil))
    p.writeReports(out)

    val matched = spark.read.option("header", "true").csv(s"$out/MatchedData")
    assert(matched.select("table").collect().map(_.getString(0)).toSet
      == Set("region", "nation"))
    val mismatched = spark.read.option("header", "true").csv(s"$out/TableMismatchedData")
    assert(mismatched.select("table").collect().map(_.getString(0)).toSet == Set("customer"))
    val inconsistent = spark.read.option("header", "true").csv(s"$out/TableDataNotConsistent")
    assert(inconsistent.select("table").collect().map(_.getString(0)).toSet == Set("nation"))
  }
}
