package graft.core

import graft.SparkFunSuite
import graft.ext.Dedup

class CacheScopeSpec extends SparkFunSuite {

  test("withCached releases operator-internal caches at scope exit") {
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sf001)
    val n = CacheScope.withCached {
      // forced LSH path caches bands + shingle sets internally
      Dedup.minhashNearDupPairs(docs, "doc_id", "text", 0.9,
        Dedup.MinHashParams(bruteForceMaxDocs = 0)).count()
    }
    assert(n > 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "operator caches survived the scope")
  }

  test("without a scope the lifecycle stays caller-owned") {
    spark.catalog.clearCache()
    import spark.implicits._
    val df = CacheScope.cached(Seq(1, 2, 3).toDF("x"))
    df.count()
    assert(!spark.sharedState.cacheManager.isEmpty)
    spark.catalog.clearCache()
  }

  test("nested scopes release their own caches, value passes through") {
    spark.catalog.clearCache()
    import spark.implicits._
    val got = CacheScope.withCached {
      val outer = CacheScope.cached(Seq(1, 2).toDF("x"))
      outer.count()
      val inner = CacheScope.withCached {
        CacheScope.cached(Seq(3, 4, 5).toDF("y")).count()
      }
      // inner scope already released its cache; outer's is still live
      assert(!spark.sharedState.cacheManager.isEmpty)
      outer.count() + inner
    }
    assert(got == 5L)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
