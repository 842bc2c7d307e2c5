package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.stream.EventWindows

/** Runnable smoke for the Structured Streaming path: streams the events
  * fixture through the windowed aggregation and checks it agrees with the
  * batch form of the same transform.
  *
  * Usage: runMain graft.tools.StreamSmoke [sfDir]
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.builder("local[4]", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stream = EventWindows.readEventStream(spark, s"$sfDir/events.parquet")
    require(stream.isStreaming, "expected a streaming DataFrame")
    val q = EventWindows.tumblingStream(stream, "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("smoke")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("smoke").agg(sum("n_events")).head().getLong(0)
      val batch = Tables.events(spark, sfDir).count()
      println(s"""{"streamed_events":$streamed,"batch_events":$batch,"match":${streamed == batch}}""")
      if (streamed != batch) sys.exit(1)
    } finally {
      q.stop()
      spark.stop()
    }
  }
}
