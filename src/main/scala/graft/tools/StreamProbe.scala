package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.stream.{EventWindows, StreamRun}

/** Dev probe: run the stream-stream interval join bounded and dump
  * per-trigger progress durations, to see where bounded-run wall time
  * goes (state commit vs planning vs sink). Not part of the surface.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = graft.CoreQueries.scratchDir("stream_probe")
    def src() = StreamRun.chunkedSource(spark,
      graft.core.Tables.events(spark, sf).filter(col("user_id") < 150),
      s"$out/src-${sf.replaceAll("[^A-Za-z0-9.]", "_")}", 4)
    val joined = EventWindows.correlateStreams(
      src(), src(), "user_id", "10 MINUTES", "1 minute")
    graft.core.Scratch.rmTree(s"$out/run")
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.props.getOrElse("graft.stream.statePartitions", "8"))
    val t0 = System.nanoTime()
    val q = joined.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$out/run/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(s"$out/run/result")
      }
      .start()
    q.awaitTermination()
    println(f"[probe] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durations=${p.durationMs} state=${p.stateOperators.map(s =>
          s"rowsTotal=${s.numRowsTotal} commitMs=${s.commitTimeMs}").mkString(";")}")
    }
    spark.stop()
  }
}
