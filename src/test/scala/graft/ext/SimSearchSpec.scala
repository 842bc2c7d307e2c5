package graft.ext

import graft.SparkFunSuite
import graft.core.Tables
import org.apache.spark.sql.functions._

class SimSearchSpec extends SparkFunSuite {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f)),  // close to 1
    (3L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 1
    (4L, Seq(-1.0f, 0.0f, 0.0f)), // opposite of 1
    (5L, Seq(0.0f, 0.0f, 0.0f))   // zero vector: filtered
  ).toDF("vec_id", "embedding")

  test("cosine math: identical=1, orthogonal=0, opposite=-1") {
    val c = vecs.alias("a").join(vecs.alias("b"),
        col("a.vec_id") === 1L && col("b.vec_id").isin(1L, 3L, 4L))
      .select(col("b.vec_id"),
        SimSearch.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(c(1L) - 1.0) < 1e-6)
    assert(math.abs(c(3L)) < 1e-6)
    assert(math.abs(c(4L) + 1.0) < 1e-6)
  }

  test("cosinePairs finds only the close pair at 0.9") {
    val got = SimSearch.cosinePairs(vecs, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("topKBruteForce ranks the close vector first and excludes self") {
    val q = vecs.filter($"vec_id" === 1L)
    val got = SimSearch.topKBruteForce(q, vecs, "vec_id", "embedding", 2)
      .collect().map(r => (r.getLong(1), r.getInt(2)))
    assert(got.length == 2)
    assert(got.contains((2L, 1))) // nearest neighbor of 1 is 2
    assert(!got.map(_._1).contains(1L))
  }

  test("ANN pairs on fixture embeddings: subset of exact with decent recall") {
    val e = Tables.embeddings(spark, sf001)
    val exact = SimSearch.cosinePairs(e, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimSearch.annPairs(e, "vec_id", "embedding", 0.4,
        numBands = 24, bitsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ann.subsetOf(exact)) // verification is exact → no false positives
    assert(exact.isEmpty || ann.size.toDouble / exact.size >= 0.5,
      s"ANN recall too low: ${ann.size}/${exact.size}")
  }

  test("annTopK returns ranked bucket-mate neighbors") {
    val e = Tables.embeddings(spark, sf001)
    val got = SimSearch.annTopK(e, "vec_id", "embedding", 3)
    val counts = got.groupBy("id_q").count()
    assert(counts.filter(col("count") > 3).count() == 0)
    assert(got.count() > 0)
  }

  test("ivfTopK: ≤k ranked neighbors per query, reasonable recall@1 vs exact") {
    val e = Tables.embeddings(spark, sf001)
    val got = SimSearch.ivfTopK(e, "vec_id", "embedding", 3, nCentroids = 8, nProbe = 3)
    assert(got.groupBy("id_q").count().filter(col("count") > 3).count() == 0)
    val ivf1 = got.filter($"rank" === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val exact1 = SimSearch.topKBruteForce(e, e, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = exact1.count { case (q, n) => ivf1.get(q).contains(n) }
    assert(hits.toDouble / exact1.size >= 0.5,
      s"IVF recall@1 too low: $hits/${exact1.size}")
  }

  test("pqTopK: ≤k neighbors per query, codes complete, high recall on the clustered view") {
    val e = SimSearch.clusteredView(Tables.embeddings(spark, sf001),
      "vec_id", "embedding", nClusters = 20, mix = 0.15)
    val q = e.filter($"vec_id" < 50)
    val pq = SimSearch.pqTopK(e, "vec_id", "embedding", 3,
        rerank = 16, lloydIters = 1, queries = Some(q))
      .collect()
    // every query gets at most k neighbors and never itself
    val byQ = pq.groupBy(_.getLong(0))
    assert(byQ.forall(_._2.length <= 3))
    assert(pq.forall(r => r.getLong(0) != r.getLong(1)))
    val exact = SimSearch.topKBruteForce(q, e, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = pq.count(r => exact((r.getLong(0), r.getLong(1))))
    assert(hits.toDouble / exact.size >= 0.8,
      s"PQ recall too low on planted clusters: $hits/${exact.size}")
    // emitted cosines are the EXACT re-ranked scores, not ADC estimates
    val withCos = pq.map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    val exactCos = SimSearch.topKBruteForce(q, e, "vec_id", "embedding", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    withCos.foreach { case (pair, cos) =>
      exactCos.get(pair).foreach(ec => assert(math.abs(ec - cos) < 1e-9)) }
  }

  test("ivfPqTopK: sublinear candidate sets, high recall on the clustered view") {
    val e = SimSearch.clusteredView(Tables.embeddings(spark, sf001),
      "vec_id", "embedding", nClusters = 20, mix = 0.15)
    val q = e.filter($"vec_id" < 50)
    val n = e.count()
    val got = SimSearch.ivfPqTopK(e, "vec_id", "embedding", 3,
        nCentroids = 25, lloydIters = 0, probeFrac = 0.2,
        rerank = 16, pqLloydIters = 1, queries = Some(q),
        withScanCount = true)
      .collect()
    assert(got.groupBy(_.getLong(0)).forall(_._2.length <= 3))
    assert(got.forall(r => r.getLong(0) != r.getLong(1)))
    // the IVF gate made the ADC scan SUBLINEAR: every query scored a
    // strict subset of the corpus (n_scored rides out of the ADC join)
    val maxScored = got.map(_.getLong(4)).max
    assert(maxScored < n - 1,
      s"ADC scan was not cell-restricted: $maxScored of ${n - 1}")
    val exact = SimSearch.topKBruteForce(q, e, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.count(r => exact((r.getLong(0), r.getLong(1))))
    assert(hits.toDouble / exact.size >= 0.8,
      s"IVF-PQ recall too low on planted clusters: $hits/${exact.size}")
  }

  test("Lloyd-refined centroids lift IVF recall@1 over the hash-ordered init") {
    val e = Tables.embeddings(spark, sf001)
    val exact1 = SimSearch.topKBruteForce(e, e, "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def recall1(iters: Int): Double = {
      val ivf1 = SimSearch
        .ivfTopK(e, "vec_id", "embedding", 1, lloydIters = iters)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      exact1.count { case (q, n) => ivf1.get(q).contains(n) }.toDouble / exact1.size
    }
    val (r0, r2) = (recall1(0), recall1(2))
    assert(r2 > r0, s"k-means refinement did not lift recall@1: $r0 -> $r2")
  }
}
