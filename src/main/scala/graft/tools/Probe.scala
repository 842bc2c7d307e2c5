package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the block-split IVF batch verdict at the scale that caught the
    // parity-split recall collapse
    val r = graft.Round7Queries.queries("similarity_ivf_batch")(spark, sf).collect()
    println("ivf_batch: " + r.mkString(","))
    spark.stop()
  }
}
