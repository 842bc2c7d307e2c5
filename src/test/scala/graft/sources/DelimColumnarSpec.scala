package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkFunSuite

/** Certifies the vectorized (ColumnarBatch) read path of graft-delim:
  * it actually ENGAGES (the plan carries a ColumnarToRow over the
  * scan), and it is bit-identical to the row reader across the
  * adversarial surface — quoting, escaped quotes, multiline framing,
  * split boundaries, schema evolution's by-name mapping, pushed
  * filters, limits, partition constants, and the `_file` metadata
  * column.
  */
class DelimColumnarSpec extends SparkFunSuite {
  import spark.implicits._

  private def readBoth(dir: String, schema: String,
      opts: Map[String, String] = Map.empty)
      (f: DataFrame => DataFrame = identity): (Array[String], Array[String]) = {
    def go(columnar: Boolean): Array[String] = {
      var r = spark.read.format("graft-delim").schema(schema)
        .option("columnar", columnar.toString)
      opts.foreach { case (k, v) => r = r.option(k, v) }
      f(r.load(dir)).collect().map(_.toString).sorted
    }
    (go(true), go(false))
  }

  test("columnar path engages: plan has ColumnarToRow over the delim scan") {
    val dir = tempDir("delimcol-engage")
    Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
      .write.format("graft-delim").mode("overwrite").save(s"$dir/t")
    val df = spark.read.format("graft-delim")
      .schema("id BIGINT, name STRING, v DOUBLE").load(s"$dir/t")
      .filter(col("id") > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"columnar scan did not engage:\n$plan")
    assert(df.count() == 2)
    // and the escape hatch restores the row path
    val rowPlan = spark.read.format("graft-delim")
      .schema("id BIGINT, name STRING, v DOUBLE")
      .option("columnar", "false").load(s"$dir/t")
      .queryExecution.executedPlan.toString
    assert(!rowPlan.contains("ColumnarToRow"), rowPlan)
  }

  test("differential: quoting/escapes/types identical to the row reader at tiny splits") {
    val dir = tempDir("delimcol-diff")
    val rows = Seq(
      (1L, "plain", 1.5, "2024-01-31"),
      (2L, "has|delim", -0.0, "2024-02-29"),
      (3L, "has\"quote\"inside", 0.0, "1999-12-31"),
      (4L, "ends with quote\"", 1e300, "2000-01-01"),
      (5L, "", Double.MinPositiveValue, "2024-06-15"),
      (6L, "  spaced  ", -42.25, "2024-06-16"),
      (7L, "ünïcödé 🎉 text", 3.14159, "2024-06-17"))
    rows.toDF("id", "s", "v", "d")
      .select(col("id"), col("s"), col("v"), col("d").cast("date").as("d"))
      .repartition(1)
      .write.format("graft-delim").mode("overwrite").save(s"$dir/t")
    for (split <- Seq("7", "64", "1048576")) {
      val (c, r) = readBoth(s"$dir/t",
        "id BIGINT, s STRING, v DOUBLE, d DATE",
        Map("splitBytes" -> split))()
      assert(c.sameElements(r), s"splitBytes=$split:\n${c.toSeq}\nvs\n${r.toSeq}")
      assert(c.length == rows.length)
    }
  }

  test("differential: malformed typed fields null identically") {
    val dir = tempDir("delimcol-malformed")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/f.txt"),
      ("1|10|1.5|2024-01-01\n" +
        "x|+20|not_a_num|2024-13-99\n" +
        "3||  30  |\n" +
        "-9223372036854775808|9223372036854775807|-0.0|1970-01-01\n" +
        "99999999999999999999|-99999999999999999999|1e999|junk\n" +
        "4|5\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val (c, r) = readBoth(dir + "/f.txt",
      "a BIGINT, b BIGINT, v DOUBLE, d DATE")()
    assert(c.sameElements(r), s"\n${c.toSeq}\nvs\n${r.toSeq}")
    assert(c.length == 6)
  }

  test("differential: pushed filters + limit + partition constants + _file") {
    val dir = tempDir("delimcol-filters")
    Seq((1L, 1.0, "a"), (2L, 2.0, "a"), (3L, 3.0, "b"), (4L, 4.0, "b"))
      .toDF("id", "v", "pc")
      .write.format("graft-delim").option("partitionBy", "pc")
      .mode("overwrite").save(s"$dir/t")
    val (c, r) = readBoth(s"$dir/t", "id BIGINT, v DOUBLE, pc STRING")(
      _.filter(col("v") >= 2.0 && col("pc") === "b").select("id", "pc"))
    assert(c.sameElements(r) && c.length == 2)
    // _file metadata column rides the constant lane
    val withFile = spark.read.format("graft-delim")
      .schema("id BIGINT, v DOUBLE, pc STRING").load(s"$dir/t")
      .select(col("id"), col("_file")).collect()
    assert(withFile.forall(_.getString(1).contains("pc=")))
    // limit pushdown through the columnar reader
    val lim = spark.read.format("graft-delim")
      .schema("id BIGINT, v DOUBLE, pc STRING").load(s"$dir/t").limit(2)
    assert(lim.count() == 2)
  }

  test("differential: multiline quoted newlines frame identically") {
    val dir = tempDir("delimcol-multiline")
    Seq((1L, "line1\nline2", "x"), (2L, "a|b\"c\"\r\nd", "y"))
      .toDF("id", "t", "k")
      .write.format("graft-delim").mode("overwrite").save(s"$dir/t")
    val (c, r) = readBoth(s"$dir/t", "id BIGINT, t STRING, k STRING")()
    assert(c.sameElements(r) && c.length == 2)
  }

  test("differential: timestamps round-trip to the microsecond on both paths") {
    val dir = tempDir("delimcol-ts")
    val src = spark.sql("""SELECT * FROM VALUES
      (1L, TIMESTAMP'2024-01-01 00:00:00', 'plain'),
      (2L, TIMESTAMP'2024-06-15 23:59:59.999999', 'max-frac'),
      (3L, TIMESTAMP'1969-12-31 23:59:59.5', 'pre-epoch'),
      (4L, CAST(NULL AS TIMESTAMP), 'null'),
      (5L, TIMESTAMP'0001-01-03 01:02:03.000001', 'ancient')
      AS t(id, ts, tag)""")
    src.write.format("graft-delim").mode("overwrite").save(s"$dir/t")
    val (c, r) = readBoth(s"$dir/t", "id BIGINT, ts TIMESTAMP, tag STRING")()
    assert(c.sameElements(r) && c.length == 5)
    // micros-exact against the source (not just cross-path equal)
    val back = spark.read.format("graft-delim")
      .schema("id BIGINT, ts TIMESTAMP, tag STRING").load(s"$dir/t")
    assert(back.join(src.withColumnRenamed("ts", "ts0"), Seq("id"))
      .filter(!(col("ts") <=> col("ts0"))).count() == 0)
    // pushed range filter over ts prunes identically on both paths
    val (cf, rf) = readBoth(s"$dir/t", "id BIGINT, ts TIMESTAMP, tag STRING")(
      _.filter(col("ts") >= lit("2024-01-01 00:00:00")))
    assert(cf.sameElements(rf) && cf.length == 2)
  }

  test("differential: schema evolution by-name mapping through the columnar path") {
    val dir = tempDir("delimcol-evolve")
    Seq((1L, "a")).toDF("id", "name")
      .write.format("graft-delim").mode("overwrite").save(s"$dir/t")
    Seq(("b", 2.5, 2L)).toDF("name", "score", "id")
      .write.format("graft-delim").mode("append").save(s"$dir/t")
    val (c, r) = readBoth(s"$dir/t", "id BIGINT, name STRING, score DOUBLE")()
    assert(c.sameElements(r) && c.length == 2)
    assert(c.exists(_.contains("2.5")))
  }
}
