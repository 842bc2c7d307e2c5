package graft.core

import graft.SparkFunSuite

class DelimSpec extends SparkFunSuite {
  import spark.implicits._

  // The reference's file.txt verbatim: two 1-field rows, one 3-field row,
  // one empty row (/root/reference/file.txt:1-4).
  private val fileTxt = Seq("source", "target", "employee|employee1|employee2", "")

  test("scanAndProject reproduces compare_tables.sh output shape") {
    val df = fileTxt.toDF("line")
    val got = Delim.scanAndProject(df, "line").as[String].collect().toSeq
    // awk prints empty strings for missing fields: "source  " etc.
    assert(got == Seq("source  ", "target  ", "employee employee1 employee2", "  "))
  }

  test("split3 yields nulls for missing fields") {
    val df = Seq("a|b").toDF("line")
    val row = df.select(Delim.split3($"line"): _*).head
    assert(row.getString(0) == "a")
    assert(row.getString(1) == "b")
    assert(row.isNullAt(2))
  }

  test("read parses a delimited file with declared schema") {
    val dir = java.nio.file.Files.createTempDirectory("delim").toFile
    val f = new java.io.File(dir, "file.txt")
    java.nio.file.Files.write(f.toPath, fileTxt.filter(_.nonEmpty).mkString("\n").getBytes)
    val got = Delim.read(spark, f.getAbsolutePath)
    assert(got.count() == 3)
    assert(got.columns.toSeq == Seq("c1", "c2", "c3"))
  }
}
