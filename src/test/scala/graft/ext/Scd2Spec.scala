package graft.ext

import org.apache.spark.sql.functions._

class Scd2Spec extends graft.SparkFunSuite {
  import spark.implicits._

  private def log = Seq(
    // key 1: A A B A — the repeat must collapse, the A↔B↔A flip must not
    (1L, "A", "2024-01-01 00:00:00", 1L),
    (1L, "A", "2024-01-01 01:00:00", 2L),
    (1L, "B", "2024-01-01 02:00:00", 3L),
    (1L, "A", "2024-01-01 03:00:00", 4L),
    // key 2: single state — one open interval
    (2L, "X", "2024-01-01 00:30:00", 5L)
  ).toDF("k", "state", "ts_s", "eid")
    .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")

  test("consecutive repeats collapse; intervals chain; last run is current") {
    val h = Scd2.history(log, col("k"), col("state"), col("ts"), col("eid"))
      .select(col("key"), col("state"), col("valid_from").cast("string"),
        col("valid_to").cast("string"), col("n_events"), col("is_current"))
      .as[(Long, String, String, String, Long, Boolean)]
      .collect().toSet
    assert(h == Set(
      (1L, "A", "2024-01-01 00:00:00", "2024-01-01 02:00:00", 2L, false),
      (1L, "B", "2024-01-01 02:00:00", "2024-01-01 03:00:00", 1L, false),
      (1L, "A", "2024-01-01 03:00:00", null, 1L, true),
      (2L, "X", "2024-01-01 00:30:00", null, 1L, true)))
  }

  test("equal timestamps resolve deterministically via the tie-break column") {
    val tied = Seq(
      (1L, "A", "2024-01-01 00:00:00", 2L),
      (1L, "B", "2024-01-01 00:00:00", 1L) // same ts: B first by eid
    ).toDF("k", "state", "ts_s", "eid")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val h = Scd2.history(tied, col("k"), col("state"), col("ts"), col("eid"))
      .select(col("state"), col("is_current"))
      .as[(String, Boolean)].collect().toSet
    assert(h == Set(("B", false), ("A", true)))
  }
}
