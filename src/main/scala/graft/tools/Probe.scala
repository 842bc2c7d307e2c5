package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: ad-hoc plan/size probes at arbitrary SF (edit & run;
  * not part of the library surface). `sbt "runMain graft.tools.Probe"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.stream.{EventWindows, StreamRun}
    val ev = graft.core.Tables.events(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("probe_ss").toString

    // stream-stream interval join on a bounded ordered run: does append
    // mode emit exactly the batch join's matches?
    try {
      val l = StreamRun.chunkedSource(spark, ev, s"$root/src", 4)
      val r = StreamRun.chunkedSource(spark, ev, s"$root/src", 4)
      val joined = EventWindows.correlateStreams(l, r, "user_id", "10 MINUTES", "1 minute")
      val got = StreamRun.runAvailableNow(joined, s"$root/run", complete = false)
        .groupBy(col("type_left"), col("type_right"))
        .agg(count(lit(1)).as("n_pairs")).cache()
      val want = EventWindows.correlateStreams(ev, ev, "user_id", "10 MINUTES", "1 minute")
        .groupBy(col("type_left"), col("type_right"))
        .agg(count(lit(1)).as("n_pairs")).cache()
      val d1 = got.exceptAll(want).count(); val d2 = want.exceptAll(got).count()
      println(s"SSJOIN: got=${got.count()} want=${want.count()} d1=$d1 d2=$d2 " +
        (if (d1 == 0 && d2 == 0) "MATCH" else "MISMATCH"))
      if (d1 != 0 || d2 != 0) {
        got.join(want.withColumnRenamed("n_pairs", "want_pairs"),
          Seq("type_left", "type_right"), "full_outer")
          .filter(!(col("n_pairs") <=> col("want_pairs"))).show(30, false)
      }
    } catch {
      case e: Throwable =>
        println(s"SSJOIN FAILED: ${e.getClass.getSimpleName}: " +
          e.getMessage.linesIterator.take(4).mkString(" | "))
    }
    spark.stop()
  }
}
