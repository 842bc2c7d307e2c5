package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.core.Tables.events(spark, sf).createOrReplaceTempView("ev")
    graft.core.Tables.orders(spark, sf).createOrReplaceTempView("ord")

    def dump(label: String, sql: String): Unit = {
      println(s"========== $label ==========")
      try {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        println(plan.treeString)
      } catch {
        case e: Throwable => println(s"FAILED: $e")
      }
    }

    dump("canonical backward",
      """SELECT e.event_id,
        |  (SELECT max(o.o_orderdate) FROM ord o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS m
        |FROM ev e""".stripMargin)

    dump("tolerance backward (ts - interval)",
      """SELECT e.event_id,
        |  (SELECT max(c.ts) FROM ev c
        |   WHERE c.user_id = e.user_id AND c.ts <= e.ts
        |     AND c.ts >= e.ts - INTERVAL 1 HOUR) AS m
        |FROM ev e""".stripMargin)

    dump("tolerance forward (ts + interval)",
      """SELECT e.event_id,
        |  (SELECT min(c.ts) FROM ev c
        |   WHERE c.user_id = e.user_id AND c.ts >= e.ts
        |     AND c.ts <= e.ts + INTERVAL 1 HOUR) AS m
        |FROM ev e""".stripMargin)

    dump("tolerance backward on DATE right (orderdate)",
      """SELECT e.event_id,
        |  (SELECT max(o.o_orderdate) FROM ord o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate >= e.ts - INTERVAL 30 DAY) AS m
        |FROM ev e""".stripMargin)

    spark.stop()
  }
}
