package graft.core

import graft.SparkFunSuite
import org.apache.spark.sql.functions.col

class ReconcilePipelineSpec extends SparkFunSuite {

  // src = sf0.001, tgt = same dir → everything must match and be consistent.
  test("identical source and target: all matched, all consistent, empty inconsistent report") {
    val p = new ReconcilePipeline(spark, sf001, sf001,
      Seq("region" -> Nil, "nation" -> Nil, "lineitem" -> Seq("l_returnflag")))
    assert(p.report.filter(col("status") =!= "matched").count() == 0)
    val integ = p.integrity()
    assert(integ.count() > 0)
    assert(integ.filter(!col("consistent")).count() == 0)
  }

  test("writeReports produces the three CSV reports") {
    val out = java.nio.file.Files.createTempDirectory("pipeline").toString
    val p = new ReconcilePipeline(spark, sf001, sf001, Seq("region" -> Nil))
    p.writeReports(out)
    for (r <- Seq("MatchedData", "TableMismatchedData", "TableDataNotConsistent")) {
      val files = new java.io.File(s"$out/$r").listFiles()
      assert(files != null && files.exists(_.getName.endsWith(".csv")), s"missing $r")
    }
    val matched = spark.read.option("header", "true").csv(s"$out/MatchedData")
    assert(matched.count() == 1)
  }

  test("sampled integrity variant works (UC#2 faithful form)") {
    val p = new ReconcilePipeline(spark, sf001, sf001, Seq("customer" -> Nil), sampleSize = 5)
    val integ = p.integrity(sampled = true)
    assert(integ.filter(!col("consistent")).count() == 0)
  }
}
