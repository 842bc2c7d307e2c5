package graft.stream

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming form of the reference's UC#1 count reconciliation
  * (verizon_automation_script.sh:90-183): instead of re-running the
  * whole source-vs-target count sweep per batch, maintain running
  * per-group counts of the event stream and diff them against the
  * static target counts in each micro-batch via `foreachBatch`.
  *
  * The aggregation runs in update mode, so each micro-batch only ships
  * CHANGED groups — the reconcile join per batch touches the delta, not
  * the full group space. State is the per-group running count (bounded
  * by group cardinality, not stream length).
  */
object StreamingReconcile {

  /** Running counts per `groupCol` of a streaming DataFrame. */
  def runningCounts(stream: DataFrame, groupCol: String): DataFrame =
    stream.groupBy(col(groupCol)).agg(count(lit(1)).as("cnt"))

  /** Start a query that reconciles the stream's running counts against
    * `target` (a static (groupCol, cnt) relation) every micro-batch,
    * passing rows whose counts diverge to `onMismatch`. The batch join
    * broadcasts the target counts (group-cardinality sized).
    */
  def reconcileAgainst(
      stream: DataFrame, groupCol: String, target: DataFrame,
      onMismatch: Array[Row] => Unit): DataStreamWriter[Row] = {
    val t = broadcast(
      target.select(col(groupCol), col("cnt").as("tgt_cnt")))
    runningCounts(stream, groupCol).writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val diverged = batch
          .join(t, Seq(groupCol), "left_outer")
          .filter(col("tgt_cnt").isNull || col("cnt") =!= col("tgt_cnt"))
          .collect()
        if (diverged.nonEmpty) onMismatch(diverged)
      }
  }

  /** Convenience: run the reconcile to completion on an AvailableNow
    * trigger and return the started query (call awaitTermination).
    */
  def start(
      stream: DataFrame, groupCol: String, target: DataFrame,
      onMismatch: Array[Row] => Unit, checkpoint: String): StreamingQuery =
    reconcileAgainst(stream, groupCol, target, onMismatch)
      .option("checkpointLocation", checkpoint)
      .start()
}
