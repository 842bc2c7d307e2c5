package graft.core

import graft.SparkFunSuite

class PartitionCountsSpec extends SparkFunSuite {
  import spark.implicits._

  test("perPartition counts each partition value in one aggregation") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val got = PartitionCounts.perPartition(df, "t", Seq("k"))
      .as[CountRecord].collect().sortBy(_.partition)
    assert(got.toSeq == Seq(CountRecord("t", "k=a", 2), CountRecord("t", "k=b", 1)))
  }

  test("perPartition supports multi-level partition specs") {
    val df = Seq(("a", "x", 1), ("a", "x", 2), ("a", "y", 3)).toDF("k1", "k2", "v")
    val got = PartitionCounts.perPartition(df, "t", Seq("k1", "k2"))
      .as[CountRecord].collect().sortBy(_.partition)
    assert(got.toSeq == Seq(CountRecord("t", "k1=a/k2=x", 2), CountRecord("t", "k1=a/k2=y", 1)))
  }

  test("total counts the whole table with a null partition") {
    val df = Seq(1, 2, 3).toDF("v")
    val got = PartitionCounts.total(df, "t").collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "t")
    assert(got(0).isNullAt(1))
    assert(got(0).getLong(2) == 3L)
  }

  test("forTables unions per-table counts against the sf0.001 fixtures") {
    val got = PartitionCounts.forTables(spark, sf001,
        Seq("region" -> Seq.empty, "lineitem" -> Seq("l_returnflag")))
      .as[CountRecord].collect()
    val region = got.filter(_.table == "region")
    assert(region.length == 1 && region(0).cnt == 5L)
    val li = got.filter(_.table == "lineitem")
    assert(li.map(_.cnt).sum == Tables.lineitem(spark, sf001).count())
    assert(li.forall(_.partition.startsWith("l_returnflag=")))
  }
}
