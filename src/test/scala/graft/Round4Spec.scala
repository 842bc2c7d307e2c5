package graft

import org.apache.spark.sql.functions._

/** Invariant tests for the round-4 curation stages (their value
  * correctness is oracle-checked; these pin the structural properties a
  * pipeline relies on).
  */
class Round4Spec extends SparkFunSuite {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("train_test_split partitions the corpus completely and ~80/20") {
    val rows = run("train_test_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = rows.values.sum
    val nDocs = graft.core.Tables.documents(spark, sf001).count()
    assert(total == nDocs, s"split lost docs: $rows vs $nDocs")
    val trainFrac = rows.getOrElse("train", 0L).toDouble / total
    // md5 first byte < 0xcc targets 204/256 = 79.7%; allow sampling noise
    assert(trainFrac > 0.70 && trainFrac < 0.90, s"train fraction $trainFrac")
  }

  test("token_budget_pack conserves documents and tokens") {
    val packed = run("token_budget_pack")
      .agg(sum("n_docs").as("d"), sum("n_tokens").as("t")).head()
    val docs = graft.core.Tables.documents(spark, sf001)
    val expected = docs.agg(
      count(lit(1)),
      sum(size(graft.ext.Text.tokens(col("text")))).cast("long")).head()
    assert(packed.getLong(0) == expected.getLong(0), "doc count not conserved")
    assert(packed.getLong(1) == expected.getLong(1), "token count not conserved")
  }

  test("token_budget_pack shards respect the budget (except single-doc overflows)") {
    // every shard but a bucket's last holds > budget - max_doc tokens is
    // hard to pin generically; the enforceable invariant: a shard only
    // exceeds the 2048 budget when one of its docs straddles the cut
    val byShard = run("token_budget_pack").collect()
    val over = byShard.filter(_.getAs[Long]("n_tokens") > 2048 * 2)
    assert(over.isEmpty, s"shard >2x budget: ${over.take(3).mkString}")
  }

  test("sample_stratified takes at most 20 docs per language, deterministically") {
    val s1 = run("sample_stratified").collect().map(_.toString).sorted.toSeq
    val s2 = run("sample_stratified").collect().map(_.toString).sorted.toSeq
    assert(s1 == s2, "stratified sample not deterministic")
    val perLang = run("sample_stratified").groupBy("lang").count().collect()
    assert(perLang.forall(_.getLong(1) <= 20))
  }

  test("contamination screen flags the benchmark source against itself") {
    // every src0 doc shares all its shingles with the benchmark set, so
    // screening src0 against itself must flag every doc that has >=1
    // shingle — sanity that the shingle join finds what it should
    val docs = graft.core.Tables.documents(spark, sf001)
    val bench = docs.filter(col("source") === "src0")
      .select(explode(graft.ext.Text.shingleSet(col("text"), 8)).as("sh")).distinct()
    val self = docs.filter(col("source") === "src0")
      .select(col("doc_id"), explode(graft.ext.Text.shingleSet(col("text"), 8)).as("sh"))
      .join(broadcast(bench), Seq("sh"))
      .select("doc_id").distinct().count()
    val n = docs.filter(col("source") === "src0").count()
    assert(self == n, s"self-contamination found $self of $n docs")
  }

  test("tfidf ranks are 1..3 per source with no duplicate terms") {
    val rows = run("tfidf_top_terms").collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (src, rs) =>
      val rnks = rs.map(_.getAs[Int]("rnk")).sorted.toSeq
      assert(rnks == (1 to rnks.length), s"$src ranks $rnks")
      assert(rs.map(_.getString(1)).distinct.length == rs.length, s"$src dup terms")
    }
  }
}
