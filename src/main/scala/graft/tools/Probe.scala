package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the verified surface).
  *
  * Current probe: the optimizer-plan shape of the payload-bearing
  * LATERAL as-of spelling (`, LATERAL (SELECT ... ORDER BY ts DESC
  * LIMIT 1)`) — what the AsOfRewriteRule's lateral matcher must
  * recognize, and at which optimizer stage.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.configure(spark) // installs the as-of rewrite rule
    import spark.implicits._

    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    graft.core.Tables.events(spark, sf).createOrReplaceTempView("ev")

    // --- catalog front door probe: CREATE TABLE ... USING graft-delim
    val dir0 = java.nio.file.Files.createTempDirectory("delimcat").toString
    spark.range(10).selectExpr("id", "concat('g', id % 2) AS pc")
      .write.format("graft-delim").option("partitionBy", "pc")
      .mode("overwrite").save(s"$dir0/t")
    try {
      spark.sql("DROP TABLE IF EXISTS probe_delim")
      spark.sql(s"""CREATE TABLE probe_delim (id BIGINT, pc STRING)
        USING `graft-delim` OPTIONS (path '$dir0/t')""")
      println("CATALOG CREATE OK")
      spark.sql("SELECT pc, count(*) AS n FROM probe_delim GROUP BY 1 ORDER BY 1").show()
      spark.sql("SELECT count(*) FROM probe_delim WHERE pc = 'g1'").show()
      println(spark.sql("SELECT * FROM probe_delim WHERE pc = 'g1'")
        .queryExecution.executedPlan.toString.take(800))
      spark.sql("INSERT INTO probe_delim VALUES (100, 'g0')")
      println("INSERT OK")
      spark.sql("SELECT count(*) AS after_insert FROM probe_delim").show()
    } catch {
      case e: Throwable => println(s"CATALOG PROBE FAILED: ${e.getMessage.take(300)}")
    }

    val sql =
      """WITH clicks AS (
        |  SELECT user_id AS q_user, ts AS q_ts, max(event_id) AS q_id
        |  FROM ev
        |  WHERE event_type = 'click'
        |  GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, q.q_ts AS click_ts, q.q_id AS click_id
        |FROM ev e, LATERAL (
        |  SELECT q_ts, q_id FROM clicks q
        |  WHERE q.q_user = e.user_id AND q.q_ts <= e.ts
        |    AND q.q_ts >= e.ts - INTERVAL 1 HOUR
        |  ORDER BY q.q_ts DESC LIMIT 1) q
        |WHERE e.event_type = 'error'""".stripMargin
    val df = spark.sql(sql)
    println("=== OPTIMIZED (rule off) ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== RESULT (rule off) ===")
    df.show(false)

    spark.conf.set(graft.plans.AsOfRewriteRule.EnabledKey, "true")
    val df2 = spark.sql(sql)
    println("=== OPTIMIZED (rule on) ===")
    println(df2.queryExecution.optimizedPlan.treeString)
    println("=== RESULT (rule on) ===")
    df2.show(false)
    spark.stop()
  }
}
