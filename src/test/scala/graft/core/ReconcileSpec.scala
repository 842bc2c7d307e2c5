package graft.core

import graft.SparkFunSuite

class ReconcileSpec extends SparkFunSuite {
  import spark.implicits._

  private def counts(rows: (String, String, Long)*) =
    rows.toDF("table", "partition", "cnt")

  test("counts classifies matched, mismatched, and one-sided rows") {
    val src = counts(
      ("t1", "k=a", 10L), ("t1", "k=b", 20L), ("t2", null, 5L), ("t3", null, 7L))
    val tgt = counts(
      ("t1", "k=a", 10L), ("t1", "k=b", 21L), ("t2", null, 5L), ("t4", null, 9L))
    val got = Reconcile.counts(src, tgt)
      .collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("-"), r.getString(4)))
      .toSet
    assert(got == Set(
      ("t1", "k=a", "matched"),
      ("t1", "k=b", "mismatched"),
      ("t2", "-", "matched"),
      ("t3", "-", "missing_in_target"),
      ("t4", "-", "missing_in_source")))
  }

  test("matched/mismatched views partition the report") {
    val src = counts(("t1", "k=a", 10L), ("t1", "k=b", 20L))
    val tgt = counts(("t1", "k=a", 10L), ("t1", "k=b", 21L))
    val report = Reconcile.counts(src, tgt)
    assert(Reconcile.matched(report).count() == 1)
    assert(Reconcile.mismatched(report).count() == 1)
    assert(Reconcile.matched(report).count() + Reconcile.mismatched(report).count()
      == report.count())
  }

  test("reconcile of a relation with itself is all matched") {
    val src = counts(("t", "k=a", 1L), ("t", null, 2L))
    val report = Reconcile.counts(src, src)
    assert(report.filter(org.apache.spark.sql.functions.col("status") =!= "matched").count() == 0)
  }
}
