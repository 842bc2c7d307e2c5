package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-loop helper (not part of the shipped surface): Verify for a named
  * subset of SparkEntry.queries, so one query's oracle can be iterated
  * without re-running all 120. Usage:
  *   sbt "runMain graft.tools.VerifySubset <sfDir> <outDir> name1 name2 …"
  * then scripts/check_oracle.py <sfDir> <outDir>.
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = graft.Verify.run(spark, sfDir, outDir,
      graft.SparkEntry.queries.filter(kv => names(kv._1)),
      graft.SparkEntry.oracleSql.filter(kv => names(kv._1)))
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
