package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // streaming execution vs batch twin: identical relations expected
    val t0 = System.nanoTime()
    val streamed = graft.Round7Queries.queries("events_windowed_stream")(spark, sf).cache()
    val nS = streamed.count()
    println(f"stream rows=$nS t=${(System.nanoTime() - t0) / 1e9}%.2f")
    val batch = graft.StreamQueries.queries("events_windowed")(spark, sf).cache()
    val nB = batch.count()
    val d1 = streamed.exceptAll(batch).count()
    val d2 = batch.exceptAll(streamed).count()
    println(s"batch rows=$nB stream-batch=$d1 batch-stream=$d2 " +
      (if (d1 == 0 && d2 == 0 && nS == nB) "MATCH" else "MISMATCH"))

    // append mode: which boundary convention does eviction use?
    val app = graft.Round7Queries.queries("events_windowed_stream_append")(spark, sf).cache()
    val nA = app.count()
    val ev = graft.core.Tables.events(spark, sf)
    val wm = ev.agg((max(col("ts")).cast("long") - 3600).cast("timestamp")).head.getTimestamp(0)
    println(s"append rows=$nA (complete=$nB) final_wm=$wm")
    for ((nm, cond) <- Seq(
        "end<=wm" -> (col("window_start") + expr("INTERVAL 1 HOUR") <= lit(wm)),
        "end<wm" -> (col("window_start") + expr("INTERVAL 1 HOUR") < lit(wm)))) {
      val exp = batch.filter(cond)
      val x1 = app.exceptAll(exp).count(); val x2 = exp.exceptAll(app).count()
      println(s"convention $nm: exp=${exp.count()} a-e=$x1 e-a=$x2 " +
        (if (x1 == 0 && x2 == 0) "MATCH" else "no"))
    }
    spark.stop()
  }
}
