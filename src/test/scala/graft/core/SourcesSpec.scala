package graft.core

import graft.SparkFunSuite
import org.apache.spark.sql.DataFrame

/** Source/sink format coverage: the engine reads and writes parquet,
  * CSV, JSON, and ORC. Round-trip content equality is asserted with the
  * engine's own order-insensitive fingerprint — the same primitive the
  * reconciliation pipeline uses, exercised here as a consumer.
  */
class SourcesSpec extends SparkFunSuite {

  private def digest(df: DataFrame): String =
    Fingerprint.table(df, "t").select("digest").head.getString(0)

  private lazy val src = Tables.nation(spark, sf001)
  private lazy val dir = java.nio.file.Files.createTempDirectory("sources").toString

  test("JSON round-trip preserves content") {
    src.write.mode("overwrite").json(s"$dir/nation_json")
    val back = spark.read.schema(src.schema).json(s"$dir/nation_json")
    assert(digest(back) == digest(src))
  }

  test("ORC round-trip preserves content") {
    src.write.mode("overwrite").orc(s"$dir/nation_orc")
    val back = spark.read.orc(s"$dir/nation_orc")
    assert(digest(back) == digest(src))
  }

  test("CSV round-trip with explicit schema preserves content") {
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    val back = spark.read.option("header", "true").schema(src.schema).csv(s"$dir/nation_csv")
    assert(digest(back) == digest(src))
  }

  test("parquet rewrite under repartition preserves content") {
    src.repartition(5).write.mode("overwrite").parquet(s"$dir/nation_pq")
    val back = spark.read.parquet(s"$dir/nation_pq")
    assert(digest(back) == digest(src))
  }
}
