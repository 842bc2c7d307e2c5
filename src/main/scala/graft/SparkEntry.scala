package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets an entry in `queries`
  * (name → (session, sfDir) → DataFrame) and, when SQL-expressible, a
  * matching DuckDB oracle in `oracleSql`. Column names are aliased
  * identically on both sides (the driver sorts columns by name before
  * hashing). Aggregates over doubles are rounded to 2 decimals on both
  * sides so summation-order noise cannot flip the hash.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries

  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql
}

/** Core relational operators (SURVEY.md §2a) exposed as driver queries. */
object CoreQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A2: per-partition row count — one grouped agg, not one query per
    // partition like the reference (verizon_automation_script.sh:111-122).
    "rowcount_by_partition" -> { (s, dir) =>
      PartitionCounts.perPartition(Tables.lineitem(s, dir), "lineitem", Seq("l_returnflag"))
        .withColumnRenamed("table", "table_name")
        .withColumnRenamed("partition", "partition_spec")
    },
    // A1: whole-table counts for the full fixture set, one unioned plan.
    "rowcount_total" -> { (s, dir) =>
      PartitionCounts.forTables(s, dir,
        Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
          .map(_ -> Seq.empty[String]))
        .withColumnRenamed("table", "table_name")
        .withColumnRenamed("partition", "partition_spec")
    },
    // Flagship: TPC-H Q1-style pricing summary (A1 generalized beyond the
    // reference's count(*)-only surface).
    "q1_agg" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }
  )

  def oracleSql: Map[String, String] = Map(
    "rowcount_by_partition" ->
      """SELECT 'lineitem' AS table_name,
        |       'l_returnflag=' || l_returnflag AS partition_spec,
        |       count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "rowcount_total" ->
      """SELECT * FROM (
        |  SELECT 'region' AS table_name, NULL AS partition_spec, count(*) AS cnt FROM region
        |  UNION ALL SELECT 'nation', NULL, count(*) FROM nation
        |  UNION ALL SELECT 'customer', NULL, count(*) FROM customer
        |  UNION ALL SELECT 'supplier', NULL, count(*) FROM supplier
        |  UNION ALL SELECT 'part', NULL, count(*) FROM part
        |  UNION ALL SELECT 'orders', NULL, count(*) FROM orders
        |  UNION ALL SELECT 'lineitem', NULL, count(*) FROM lineitem)""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin
  )
}
