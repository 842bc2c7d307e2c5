package graft.plans

import graft.SparkFunSuite
import java.sql.Timestamp

class AsOfRewriteSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val ready: Unit = {
    AsOfRewriteRule.installLate(spark)
    Seq(
      (1L, 10L, ts("2024-01-01 10:30:00"), "t1"),
      (1L, 10L, ts("2024-01-01 11:00:00"), "t2"),
      (1L, 20L, ts("2024-01-01 09:00:00"), "t3"),
      (2L, 10L, ts("2024-01-01 12:00:00"), "t4"),
      (3L, 10L, ts("2024-01-01 12:00:00"), "t5")
    ).toDF("k", "k2", "t", "id").createOrReplaceTempView("asof_l")
    Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (1L, 10L, ts("2024-01-01 11:00:00")),
      (1L, 20L, ts("2024-01-01 08:00:00")),
      (2L, 10L, ts("2024-01-01 10:30:00"))
    ).toDF("rk", "rk2", "rt").createOrReplaceTempView("asof_r")
  }

  /** Run `sql` with the rewrite on and off; assert identical sorted
    * results, and that the rewrite fired (or not) as expected.
    */
  private def check(sql: String, expectFire: Boolean): Unit = {
    ready
    val off = spark.sql(sql).collect().map(_.toString).sorted.toSeq
    spark.conf.set(AsOfRewriteRule.EnabledKey, "true")
    try {
      val df = spark.sql(sql)
      val fired = df.queryExecution.optimizedPlan.collect {
        case p: AsOfJoinPlan => p
      }.nonEmpty
      assert(fired == expectFire,
        s"expected fire=$expectFire:\n${df.queryExecution.optimizedPlan}")
      val on = df.collect().map(_.toString).sorted.toSeq
      assert(on == off, s"rewrite changed the answer for:\n$sql")
    } finally spark.conf.unset(AsOfRewriteRule.EnabledKey)
  }

  test("backward max/<= fires and preserves the answer") {
    check("""SELECT l.id,
             (SELECT max(r.rt) FROM asof_r r
              WHERE r.rk = l.k AND r.rt <= l.t) AS m
             FROM asof_l l""", expectFire = true)
  }

  test("forward min/>= fires and preserves the answer") {
    check("""SELECT l.id,
             (SELECT min(r.rt) FROM asof_r r
              WHERE r.rk = l.k AND r.rt >= l.t) AS m
             FROM asof_l l""", expectFire = true)
  }

  test("composite key fires and preserves the answer") {
    check("""SELECT l.id,
             (SELECT max(r.rt) FROM asof_r r
              WHERE r.rk = l.k AND r.rk2 = l.k2 AND r.rt <= l.t) AS m
             FROM asof_l l""", expectFire = true)
  }

  test("strict inequality is not an inclusive as-of: no fire") {
    check("""SELECT l.id,
             (SELECT max(r.rt) FROM asof_r r
              WHERE r.rk = l.k AND r.rt < l.t) AS m
             FROM asof_l l""", expectFire = false)
  }

  test("mismatched direction (min with <=) does not fire") {
    check("""SELECT l.id,
             (SELECT min(r.rt) FROM asof_r r
              WHERE r.rk = l.k AND r.rt <= l.t) AS m
             FROM asof_l l""", expectFire = false)
  }

  test("no equi key does not fire") {
    check("""SELECT l.id,
             (SELECT max(r.rt) FROM asof_r r
              WHERE r.rt <= l.t) AS m
             FROM asof_l l""", expectFire = false)
  }

  test("aggregate over a different column does not fire") {
    check("""SELECT l.id,
             (SELECT max(r.rk2) FROM asof_r r
              WHERE r.rk = l.k AND r.rt <= l.t) AS m
             FROM asof_l l""", expectFire = false)
  }

  test("null keys and times keep SQL semantics through the rewrite") {
    ready
    Seq(
      (Option(1L), Option(ts("2024-01-01 11:00:00")), "a"),
      (Option.empty[Long], Option(ts("2024-01-01 11:00:00")), "b"),
      (Option(1L), Option.empty[Timestamp], "c")
    ).toDF("k", "t", "id").createOrReplaceTempView("asof_ln")
    Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00"))),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00"))),
      (Option(1L), Option.empty[Timestamp])
    ).toDF("rk", "rt").createOrReplaceTempView("asof_rn")
    check("""SELECT l.id,
             (SELECT max(r.rt) FROM asof_rn r
              WHERE r.rk = l.k AND r.rt <= l.t) AS m
             FROM asof_ln l""", expectFire = true)
  }

  test("date/timestamp mix fires (fixture shape) and matches") {
    ready
    graft.core.Tables.events(spark, sf001)
      .createOrReplaceTempView("asof_ev")
    graft.core.Tables.orders(spark, sf001)
      .createOrReplaceTempView("asof_ord")
    check("""SELECT e.event_id,
             (SELECT max(o.o_orderdate) FROM asof_ord o
              WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS m
             FROM asof_ev e""", expectFire = true)
  }

  // Pins an UPSTREAM Spark 4.1.2 defect, not engine behavior: a
  // correlated scalar subquery whose outer table is a Union crashes
  // the optimizer (PushProjectionThroughUnion: NoSuchElementException)
  // BEFORE the late batch this rewrite runs in, so neither rule state
  // can help — reproduced in a bare spark-shell with no graft rules.
  // If a Spark upgrade makes this test fail, the bug is fixed: drop
  // the localCheckpoint workarounds (tools/Stress.scala asofsqlcmp)
  // and this pin together.
  test("UPSTREAM pin: union outer table crashes stock decorrelation") {
    ready
    val ev = graft.core.Tables.events(spark, sf001)
    ev.unionByName(ev.withColumn("event_id", $"event_id" + 1000000L))
      .createOrReplaceTempView("asof_ev_union")
    graft.core.Tables.orders(spark, sf001)
      .createOrReplaceTempView("asof_ord_u")
    val sql = """SELECT e.event_id,
                 (SELECT max(o.o_orderdate) FROM asof_ord_u o
                  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS m
                 FROM asof_ev_union e"""
    for (ruleOn <- Seq(false, true)) {
      if (ruleOn) spark.conf.set(AsOfRewriteRule.EnabledKey, "true")
      try {
        val e = intercept[Exception](spark.sql(sql).collect())
        def msgs(t: Throwable): Seq[String] =
          if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
        assert(msgs(e).exists(_.contains("key not found")),
          s"expected the upstream optimizer crash, got: $e")
      } finally if (ruleOn) spark.conf.unset(AsOfRewriteRule.EnabledKey)
    }
    // the documented workaround: flatten the union off the plan
    ev.unionByName(ev.withColumn("event_id", $"event_id" + 1000000L))
      .localCheckpoint().createOrReplaceTempView("asof_ev_union")
    spark.conf.set(AsOfRewriteRule.EnabledKey, "true")
    try {
      val df = spark.sql(sql)
      assert(df.queryExecution.optimizedPlan.collect {
        case p: AsOfJoinPlan => p }.nonEmpty, "rewrite should fire post-flatten")
      assert(df.count() > 0)
    } finally spark.conf.unset(AsOfRewriteRule.EnabledKey)
  }
}
