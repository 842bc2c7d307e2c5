package graft.core

import org.apache.spark.sql.functions._

class WarehouseSpec extends graft.SparkFunSuite {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", "p1"), (2L, "b", "p1"), (3L, "c", "p2"), (4L, "d", "p2")
  ).toDF("k", "v", "p")

  private def changes = Seq(
    (2L, "B", "p1"), // update of an existing key
    (9L, "Z", "p1")  // insert of a new key
  ).toDF("k", "v", "p")

  test("mergeByKey replaces updated keys, keeps others, inserts new — touched partitions only") {
    val merged = Warehouse.mergeByKey(base, changes, "k", "p")
      .select("k", "v", "p").as[(Long, String, String)].collect().toSet
    // p2 rows are NOT in the rewrite set (their partition is untouched)
    assert(merged == Set((1L, "a", "p1"), (2L, "B", "p1"), (9L, "Z", "p1")))
  }

  test("affectedPartitions: distinct, sorted, bounded by the change set") {
    assert(Warehouse.affectedPartitions(changes, "p") == Seq("p1"))
    assert(Warehouse.affectedPartitions(base, "p") == Seq("p1", "p2"))
  }

  test("overwritePartitions rewrites only partitions present in the data; conf restored") {
    val out = tempDir("wh_spec")
    base.write.mode("overwrite").partitionBy("p").parquet(s"$out/t")
    val calmBefore = Warehouse.partitionFileSnapshot(s"$out/t", "p", "p2")
    assert(calmBefore.nonEmpty)
    val confKey = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.set(confKey, "static")
    Warehouse.overwritePartitions(
      Warehouse.mergeByKey(spark.read.parquet(s"$out/t"), changes, "k", "p"),
      s"$out/t", "p")
    // conf restored to what the caller had
    assert(spark.conf.get(confKey) == "static")
    // untouched partition physically identical
    assert(Warehouse.partitionFileSnapshot(s"$out/t", "p", "p2") == calmBefore)
    // read-back = merged p1 ∪ original p2
    val after = spark.read.parquet(s"$out/t")
      .select("k", "v", "p").as[(Long, String, String)].collect().toSet
    assert(after == Set(
      (1L, "a", "p1"), (2L, "B", "p1"), (9L, "Z", "p1"),
      (3L, "c", "p2"), (4L, "d", "p2")))
  }

  test("mergeByKey's base read prunes to the affected partitions") {
    // the isin filter must resolve against directory metadata — at
    // 100 TB this is what keeps a one-month correction from scanning
    // seven years of history
    val out = tempDir("wh_prune")
    base.write.mode("overwrite").partitionBy("p").parquet(s"$out/t")
    val plan = Warehouse.mergeByKey(
        spark.read.parquet(s"$out/t"), changes, "k", "p")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*p1".r.findFirstIn(plan).isDefined,
      s"partition predicate not resolved as a PartitionFilter:\n$plan")
  }

  test("non-string partition column: values stay native-typed and still prune") {
    // a string cast in affectedPartitions would wrap the scan predicate
    // in a cast and stop it resolving as a PartitionFilter — the scan
    // would silently read every partition
    val out = tempDir("wh_intpart")
    val ibase = Seq((1L, "a", 202401), (2L, "b", 202401), (3L, "c", 202402))
      .toDF("k", "v", "ym")
    val ichanges = Seq((2L, "B", 202401)).toDF("k", "v", "ym")
    assert(Warehouse.affectedPartitions(ichanges, "ym") == Seq(202401))
    ibase.write.mode("overwrite").partitionBy("ym").parquet(s"$out/t")
    val plan = Warehouse.mergeByKey(
        spark.read.parquet(s"$out/t"), ichanges, "k", "ym")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*202401".r.findFirstIn(plan).isDefined,
      s"int partition predicate not resolved as a PartitionFilter:\n$plan")
  }

  test("mergeByKey refuses an empty change set") {
    val e = intercept[IllegalArgumentException] {
      Warehouse.mergeByKey(base, changes.filter(col("k") < 0), "k", "p")
    }
    assert(e.getMessage.contains("empty change set"))
  }

  test("clusterByRange concentrates a key into few files without changing content") {
    val out = tempDir("layout_spec")
    val df = spark.range(0, 1000)
      .select(col("id"), (col("id") % 50).as("key"))
    Layout.clusterByRange(df, s"$out/clustered", 10, col("key"), col("id"))
    df.repartition(10).write.mode("overwrite").parquet(s"$out/scattered")
    val cF = Layout.filesTouched(
      spark.read.parquet(s"$out/clustered").filter(col("key") === 7))
    val sF = Layout.filesTouched(
      spark.read.parquet(s"$out/scattered").filter(col("key") === 7))
    assert(cF <= 2, s"clustered: key 7 in $cF of 10 files")
    assert(sF > cF && sF >= 4, s"scattered: key 7 in $sF files vs clustered $cF")
    // the layout is a physical property only — content identical
    val a = spark.read.parquet(s"$out/clustered").as[(Long, Long)].collect().sorted
    val b = df.as[(Long, Long)].collect().sorted
    assert(a.sameElements(b))
  }
}
