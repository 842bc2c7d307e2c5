package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-funnel analysis over an event log: how many users reach
  * each stage, where reaching stage i+1 means an event of that type
  * STRICTLY AFTER the user's earliest arrival at stage i (first-touch
  * attribution).
  *
  * Each stage is one filtered aggregation joined to the previous
  * frontier — all shuffles are keyed by user, the frontier only ever
  * shrinks, and the result is a single lazy union (one job).
  */
object Funnel {

  /** (stage, n_users) for each stage name in order. */
  def conversion(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol).as("u")).agg(min(col(tsCol)).as("t"))
    val frontiers = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .select(col(userCol).as("u"), col(tsCol).as("ts"))
        .join(prev, Seq("u"))
        .filter(col("ts") > col("t"))
        .groupBy(col("u")).agg(min(col("ts")).as("t"))
    }
    stages.zip(frontiers).map { case (stage, f) =>
      f.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }
}
