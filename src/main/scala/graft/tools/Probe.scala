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

    // --- partition DDL probe: GraftCatalog SHOW/ADD/DROP PARTITION
    val dir0 = java.nio.file.Files.createTempDirectory("delimddl").toString
    spark.range(10).selectExpr("id", "concat('g', id % 3) AS pc")
      .write.format("graft-delim").option("partitionBy", "pc")
      .mode("overwrite").save(s"$dir0/t")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_cat.default.pt")
      spark.sql(s"""CREATE TABLE graft_cat.default.pt (id BIGINT, pc STRING)
        USING `graft-delim` PARTITIONED BY (pc) LOCATION '$dir0/t'""")
      println("CREATE OK")
      println("--- SHOW PARTITIONS:")
      spark.sql("SHOW PARTITIONS graft_cat.default.pt").show(false)
      println("schema: " + spark.sql("SHOW PARTITIONS graft_cat.default.pt").schema)
      spark.sql("SELECT pc, count(*) n FROM graft_cat.default.pt GROUP BY 1 ORDER BY 1").show()
      spark.sql("ALTER TABLE graft_cat.default.pt ADD PARTITION (pc='gz')")
      println("--- after ADD gz:")
      spark.sql("SHOW PARTITIONS graft_cat.default.pt").show(false)
      spark.sql("ALTER TABLE graft_cat.default.pt DROP PARTITION (pc='g1')")
      println("--- after DROP g1:")
      spark.sql("SHOW PARTITIONS graft_cat.default.pt").show(false)
      spark.sql("SELECT pc, count(*) n FROM graft_cat.default.pt GROUP BY 1 ORDER BY 1").show()
      println("--- INSERT INTO partitioned catalog table:")
      spark.sql("INSERT INTO graft_cat.default.pt VALUES (100, 'g1')")
      spark.sql("SELECT pc, count(*) n FROM graft_cat.default.pt GROUP BY 1 ORDER BY 1").show()
    } catch {
      case e: Throwable =>
        println(s"DDL PROBE FAILED: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(500)}")
        e.printStackTrace()
    }
    spark.stop()
  }
}
