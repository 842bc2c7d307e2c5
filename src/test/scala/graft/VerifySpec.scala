package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The failure manifest is the guard against a fixture drift silently
  * shrinking the correctness report (round 8 lost 11 entries as absent
  * result dirs): a broken query must show up BY NAME in
  * `_failures.json`, while green queries still dump.
  */
class VerifySpec extends SparkFunSuite {

  test("a broken query lands in _failures.json; green queries still dump") {
    val out = Files.createTempDirectory("graft_verify_spec").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "ok_range" -> ((s, _) => s.range(3).toDF("n")),
      "boom" -> ((_, _) => throw new RuntimeException("deliberate boom")))
    val failures = Verify.run(spark, sf001, out, queries,
      Map("ok_range" -> "SELECT 1 AS n"))
    assert(failures.keySet == Set("boom"))
    assert(failures("boom").contains("deliberate boom"))
    val manifest = Files.readString(Paths.get(s"$out/_failures.json"))
    assert(manifest.contains("\"boom\"") && manifest.contains("deliberate boom"))
    assert(new java.io.File(s"$out/ok_range").exists,
      "the green query's parquet dump must still be written")
    assert(Files.readString(Paths.get(s"$out/oracle_sql.json")).contains("ok_range"))
  }

  test("an all-green run writes an empty manifest, not no manifest") {
    val out = Files.createTempDirectory("graft_verify_spec_green").toString
    val failures = Verify.run(spark, sf001, out,
      Map[String, (SparkSession, String) => DataFrame](
        "ok_range" -> ((s, _) => s.range(2).toDF("n"))),
      Map.empty)
    assert(failures.isEmpty)
    assert(Files.readString(Paths.get(s"$out/_failures.json")).trim == "{}")
  }
}
