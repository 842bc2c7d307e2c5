package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential-funnel analysis over an event log: how many users reach
  * each stage, where reaching stage i+1 means an event of that type
  * STRICTLY AFTER the user's earliest arrival at stage i (first-touch
  * attribution).
  *
  * Single-pass design (100 TB posture): ONE shuffle keyed by user
  * carries only the stage-relevant event timestamps (events of other
  * types are filtered before the exchange); the per-user sequential
  * reach times fall out of array expressions over the aggregated row,
  * and the stage counts collapse in one final conditional aggregation.
  * The previous formulation joined each stage's events to the previous
  * frontier and re-executed the whole chain once per stage count
  * (O(S²) scans of the events table — 7.1 s at sf0.1; this form is a
  * single linear pass).
  */
object Funnel {

  /** (stage, n_users) for each stage name in order. */
  def conversion(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    // one row per user: per stage, the array of that user's event times
    // for the stage type (collect_list drops the nulls of other types)
    val aggs = stages.zipWithIndex.map { case (stage, i) =>
      collect_list(when(col(typeCol) === stage, col(tsCol))).as(s"a$i")
    }
    val byUser = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("u"), col(tsCol), col(typeCol))
      .groupBy(col("u"))
      .agg(aggs.head, aggs.tail: _*)
    // sequential reach times: t0 = earliest stage-0 event; t(i) =
    // earliest stage-i event strictly after t(i-1). A missing stage
    // yields null, and `x > null` filters everything, so nulls cascade.
    val withTimes = stages.indices.foldLeft(byUser) { (df, i) =>
      val t =
        if (i == 0) array_min(col("a0"))
        else array_min(filter(col(s"a$i"), x => x > col(s"t${i - 1}")))
      df.withColumn(s"t$i", t)
    }
    // all stage counts in one global aggregation, then unpivot the
    // single row to (stage, n_users) — no per-stage jobs
    val counts = withTimes.agg(
      count(col("t0")).as("n0"),
      stages.indices.tail.map(i => count(col(s"t$i")).as(s"n$i")): _*)
    counts
      .select(explode(array(stages.zipWithIndex.map { case (stage, i) =>
        struct(lit(stage).as("stage"), col(s"n$i").as("n_users"))
      }: _*)).as("x"))
      .select(col("x.stage").as("stage"), col("x.n_users").as("n_users"))
  }
}
