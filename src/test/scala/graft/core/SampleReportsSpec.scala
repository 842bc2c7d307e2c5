package graft.core

import graft.SparkFunSuite

class SampleReportsSpec extends SparkFunSuite {

  test("limitN is deterministic across physical layouts") {
    val df = Tables.lineitem(spark, sf001)
    val a = Sample.limitN(df, 10).collect().toSeq
    val b = Sample.limitN(df.repartition(13), 10).collect().toSeq
    assert(a == b)
    assert(a.size == 10)
  }

  test("fraction sampling is seeded-deterministic and approximately sized") {
    val df = Tables.lineitem(spark, sf001)
    val n = df.count()
    val s1 = Sample.fraction(df, 10.0).count()
    val s2 = Sample.fraction(df, 10.0).count()
    assert(s1 == s2)
    assert(s1 > n / 20 && s1 < n / 5) // ~10% within loose bounds
  }

  test("writeCsv emits a single headered CSV; sampledExport writes n rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("reports").toFile
    val df = Seq(("t", "k=a", 1L), ("t", "k=b", 2L)).toDF("table", "partition", "cnt")
    Reports.writeCsv(df, s"$dir/report")
    val files = new java.io.File(s"$dir/report").listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "table,partition,cnt")
    assert(lines.size == 3)

    Reports.sampledExport(Tables.region(spark, sf001), s"$dir/sample", 3)
    val back = spark.read.option("header", "true").csv(s"$dir/sample")
    assert(back.count() == 3)
  }
}
