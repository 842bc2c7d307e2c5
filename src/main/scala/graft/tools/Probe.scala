package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Tables.customer(spark, sf).createOrReplaceTempView("customer")
    graft.core.Tables.orders(spark, sf).createOrReplaceTempView("orders")

    def tryq(label: String, sql: String): Unit =
      try {
        val df = spark.sql(sql)
        val t0 = System.nanoTime()
        val rows = df.collect()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"$label: OK ${rows.length} rows in $dt%.2f s -> ${rows.take(3).mkString(" | ")}")
        println(df.queryExecution.explainString(FormattedMode).linesIterator
          .filter(l => l.contains("(")).take(25).mkString("\n"))
      } catch {
        case e: Throwable =>
          println(s"$label: FAILED ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" "))
      }

    tryq("recursive tree depth",
      """WITH RECURSIVE walk(start, cur, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT start, CAST(floor(cur / 2) AS BIGINT), depth + 1
        |  FROM walk WHERE cur > 1)
        |SELECT depth AS tree_depth, count(*) AS n FROM (
        |  SELECT start, max(depth) AS depth FROM walk GROUP BY start)
        |GROUP BY 1 ORDER BY 1""".stripMargin)

    tryq("lateral top-2 orders per customer",
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer c
        |JOIN LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        |WHERE c.c_custkey < 100""".stripMargin)

    spark.stop()
  }
}
