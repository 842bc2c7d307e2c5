package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet table loaders for the driver test fixtures (TESTDATA.md).
  *
  * The reference resolves tables by name against a Hive metastore
  * (`use $db; select ... from $tbl` — verizon_automation_script.sh:104,119);
  * here a "database" is a directory of parquet tables and a table is a
  * `DataFrame` with the schema taken from the parquet footer.
  *
  * Scale note: `spark.read.parquet` on a directory-partitioned layout gives
  * partition pruning + column pruning + predicate pushdown for free; nothing
  * here ever materializes rows on the driver.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** The events fixture has stored `ts` two ways across driver
    * regenerations: parquet TIMESTAMP(NANOS) (rejected by Spark by
    * default, so read as raw nanos via legacy long mode and truncated
    * ns→µs with integer division — `/ 1000` in double would lose
    * precision on ~1.7e18 nano values; DuckDB truncates the same way)
    * and, since 2026-08-13, TIMESTAMP_NTZ (µs, no UTC adjustment, which
    * Spark surfaces as TimestampNTZType). Both are normalized to plain
    * TimestampType so every downstream consumer — `withWatermark`,
    * `unix_micros`, `Row.getTimestamp` — sees one type. The NTZ→TZ cast
    * is value-preserving because every entry point pins
    * `spark.sql.session.timeZone=UTC`.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(load(spark, sfDir, "events"))
  }

  /** ts: nanos-as-long or TIMESTAMP_NTZ → TimestampType (µs); no-op if
    * already timestamp.
    */
  def normalizeEvents(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
    case _                => df
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
