package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Certifies Spark's two RUNTIME filtering levers on this engine's
  * table shapes — the optimizations that, at 100 TB, decide whether a
  * selective dim join reads one partition or the whole fact table:
  *
  *  - dynamic partition pruning (DPP): a filter on the dim side of a
  *    partition-column join becomes a runtime subquery in the fact
  *    scan's PartitionFilters — directories are skipped using the
  *    JOINED keys, not just static predicates;
  *  - runtime bloom-filter join filtering: for a shuffled join keyed on
  *    a NON-partition column, a bloom filter built from the (small,
  *    filtered) creation side is injected into the fact scan, dropping
  *    non-joining rows before the shuffle.
  *
  * Both are plan-level guarantees, so the tests assert on the optimized
  * plan text the same way PlanAuditSpec does.
  */
class RuntimeFilterSpec extends SparkFunSuite {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("dim filter on a partition-column join prunes the fact scan at runtime (DPP)") {
    val out = tempDir("dpp_spec")
    core.Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$out/fact")
    val fact = spark.read.parquet(s"$out/fact")
    // the dim must be a real scan with a non-foldable, LIKELY-SELECTIVE
    // filter: a local relation constant-folds the predicate away, and a
    // bare boolean attribute fails Catalyst's isLikelySelective
    // heuristic — an equality comparison is the shape the rule trusts
    Seq(("click", "hot"), ("view", "cold"), ("purchase", "cold"))
      .toDF("event_type", "grp")
      .write.mode("overwrite").parquet(s"$out/dim")
    val dim = spark.read.parquet(s"$out/dim")
    // aggregate a DATA column: a partition-column-only projection reads
    // zero bytes from the fact scan and the pruning-benefit estimate is
    // nil — with real columns in play the rule fires
    val p = fact.join(dim.filter(col("grp") === "hot"), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery in the fact scan:\n$p")
  }

  test("selective dim join injects a runtime bloom filter into the fact scan") {
    // force the shuffled-join shape the rule targets (a broadcastable
    // dim would be handled by broadcast reuse instead) and drop the
    // application-side size floor to fixture scale
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = core.Tables.lineitem(spark, sf001)
      val hot = core.Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === "1-URGENT")
      val p = li.join(hot, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .queryExecution.explainString(FormattedMode)
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected on the lineitem side:\n$p")
    }
  }
}
