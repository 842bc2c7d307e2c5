package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkFunSuite

/** Certifies graft-delim as a STREAMING SOURCE (manifest generations
  * as offsets): each commit is one offset increment, a micro-batch
  * reads exactly the files committed in its generation range, restarts
  * resume from the checkpointed generation exactly-once, and the
  * full loop — streaming sink INTO the table, streaming source OUT of
  * it — composes.
  */
class DelimStreamSourceSpec extends SparkFunSuite {
  import spark.implicits._

  private def append(t: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("id", "name").repartition(1)
      .write.format("graft-delim").mode("append").save(t)

  test("generations stream exactly-once across restarts") {
    val dir = tempDir("delimsrc-restart")
    val t = s"$dir/t"
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    append(t, Seq(1L -> "a", 2L -> "b")) // gen 1
    append(t, Seq(3L -> "c"))            // gen 2
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft-delim")
        .schema("id BIGINT, name STRING")
        .load(t)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val first = spark.read.parquet(out).collect().map(_.getLong(0)).toSet
    assert(first == Set(1L, 2L, 3L))
    // new generations land while the stream is down; the restart reads
    // ONLY them (the checkpointed offset is the generation number)
    append(t, Seq(4L -> "d")) // gen 3
    append(t, Seq(5L -> "e")) // gen 4
    runOnce()
    val all = spark.read.parquet(out).collect().map(_.getLong(0)).toList
    assert(all.sorted == List(1L, 2L, 3L, 4L, 5L),
      s"duplicated or dropped generations: $all")
  }

  test("a running stream picks up each appended generation as its own batch") {
    val dir = tempDir("delimsrc-live")
    val t = s"$dir/t"
    append(t, Seq(1L -> "a")) // gen 1
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[Long]]
    val q = spark.readStream.format("graft-delim")
      .schema("id BIGINT, name STRING")
      .load(t)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ids = df.collect().map(_.getLong(0)).toSet
        seen.synchronized { if (ids.nonEmpty) seen += ids }
        ()
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      def waitBatches(n: Int): Unit =
        while (seen.synchronized(seen.size) < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      waitBatches(1)
      append(t, Seq(2L -> "b", 3L -> "c")) // gen 2
      waitBatches(2)
      append(t, Seq(4L -> "d")) // gen 3
      waitBatches(3)
    } finally {
      q.exception.foreach(e => println("QEX>>>" + e.toString.take(500)))
      q.stop()
    }
    val batches = seen.synchronized(seen.toList)
    assert(batches.size >= 3, s"expected 3 data batches, got $batches")
    assert(batches.flatten.toSet == Set(1L, 2L, 3L, 4L))
    assert(batches.head == Set(1L))
    assert(batches.flatMap(x => x).size == 4, s"a row streamed twice: $batches")
  }

  test("the full loop: streaming sink INTO the table, streaming source OUT of it") {
    val dir = tempDir("delimsrc-loop")
    val t = s"$dir/t"
    val out = s"$dir/out"
    // land 3 epochs through the connector's streaming SINK
    for (b <- 0 until 3)
      spark.range(b * 10, (b + 1) * 10).select($"id")
        .coalesce(1).write.parquet(s"$dir/src/b$b")
    val landQ = spark.readStream.schema("id BIGINT")
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src/b*")
      .writeStream.format("graft-delim")
      .option("path", t)
      .option("checkpointLocation", s"$dir/ckpt-in")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    landQ.awaitTermination()
    // stream OUT of the landed table
    val outQ = spark.readStream.format("graft-delim")
      .schema("id BIGINT").load(t)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$dir/ckpt-out")
      .trigger(Trigger.AvailableNow())
      .start()
    outQ.awaitTermination()
    val got = spark.read.parquet(out).collect().map(_.getLong(0)).toList
    assert(got.sorted == (0L until 30L).toList, s"loop lost rows: ${got.size}")
  }

  test("maxGensPerTrigger paces backlog catchup into per-generation batches") {
    val dir = tempDir("delimsrc-pace")
    val t = s"$dir/t"
    for (g <- 0 until 4)
      append(t, Seq((g * 10 + 1L) -> s"g$g", (g * 10 + 2L) -> s"g$g"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("graft-delim")
      .schema("id BIGINT, name STRING")
      .option("maxGensPerTrigger", "1")
      .load(t)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count().toInt }
        ()
      }
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = batches.synchronized(batches.toList)
    assert(got.count(_ > 0) == 4 && got.sum == 8,
      s"expected 4 paced 2-row batches over the backlog, got $got")
  }

  test("partition-pruned streaming read plans only the matching files") {
    val dir = tempDir("delimsrc-prune")
    val t = s"$dir/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "pc")
      .write.format("graft-delim").option("partitionBy", "pc")
      .mode("append").save(t)
    Seq((3L, "a"), (4L, "b")).toDF("id", "pc")
      .write.format("graft-delim").option("partitionBy", "pc")
      .mode("append").save(t)
    val q = spark.readStream.format("graft-delim")
      .schema("id BIGINT, pc STRING").load(t)
      .filter(col("pc") === "a")
      .writeStream.format("memory").queryName("delimsrc_prune")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql("SELECT id FROM delimsrc_prune")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 3L))
  }
}
