package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Compile-time bridge to the one `private[sql]` entry point the
  * optimizer extension needs: materializing a Dataset from a LOGICAL
  * subplan. A Catalyst rule holds `LogicalPlan` subtrees, not SQL
  * text, so a DPP-style side job (e.g. [[graft.plans.RangeBinJoinRule]]'s
  * auto bin-width statistic over the interval side) has no public way
  * back into the query path — `Dataset.ofRows` is that way, and it is
  * `private[sql]`. This object lives under `org.apache.spark.sql` for
  * exactly that access (the same pattern Spark-ecosystem extensions
  * use); nothing else from the internal surface is touched.
  */
object GraftSqlShim {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
