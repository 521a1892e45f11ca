package graft

import org.apache.spark.sql.functions._

import graft.ext.{CacheScope, Dedup, Similarity}

/** Scoped lifetime for operator-internal persists: a `withCached` scope
  * must reclaim every frame the engine persisted inside it — through the
  * Dataset layer, so the CacheManager entry goes too — while leaving
  * frames persisted outside the scope (other tenants) untouched. */
class CacheScopeSpec extends SparkSpec {
  import spark.implicits._

  private def persistentRddCount = spark.sparkContext.getPersistentRDDs.size

  private def embeddings = Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("withCached reclaims an operator's internal persists on exit") {
    spark.catalog.clearCache()
    val before = persistentRddCount
    val rows = CacheScope.withCached {
      // lshNearDupPairs persists the exploded bands frame; the terminal
      // action runs INSIDE the scope per the contract
      Similarity.lshNearDupPairs(embeddings, threshold = 0.35).count()
    }
    assert(rows >= 0)
    assert(persistentRddCount === before,
      "scope exit must unpersist every frame the operator persisted inside it")
  }

  test("tracked persists outside any scope keep the session-owned lifetime") {
    spark.catalog.clearCache()
    // set-difference, not a count delta: the session is suite-shared and
    // clearCache unpersists ASYNCHRONOUSLY, so stale RDDs from earlier
    // suites can vanish between two count reads (observed: 5 → 4 while
    // this operator added one) — the ids ADDED by this operator are
    // race-proof because the returned frame strongly references them
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val pairs = Dedup.minhashCandidatePairs(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    pairs.count()
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty,
      "without a scope the operator's persist must survive (documented default)")
    spark.catalog.clearCache()
  }

  test("nested scopes reclaim only their own registrations; outside frames untouched") {
    spark.catalog.clearCache()
    // a frame the 'other tenant' persisted before any scope opened
    val tenant = spark.range(1000).select(col("id"), (col("id") * 2).as("v")).persist()
    tenant.count()
    val withTenant = persistentRddCount
    CacheScope.withCached {
      val outerRegistered = CacheScope.registeredInScope
      assert(outerRegistered === 0)
      CacheScope.withCached {
        Similarity.lshNearDupPairs(embeddings).count()
        assert(CacheScope.registeredInScope >= 1)
      }
      // the inner scope reclaimed its own; the outer scope registered nothing
      assert(CacheScope.registeredInScope === 0)
      assert(persistentRddCount === withTenant)
    }
    assert(persistentRddCount === withTenant, "tenant frame must survive both scopes")
    assert(tenant.storageLevel.useMemory, "tenant frame still cached")
    tenant.unpersist(blocking = true)
    spark.catalog.clearCache()
  }

  test("result consumed inside the scope stays correct when re-read after exit") {
    spark.catalog.clearCache()
    // the escaped frame loses its persist but must recompute identically
    val inScope = CacheScope.withCached {
      val df = Similarity.lshNearDupPairs(embeddings)
      (df, df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq)
    }
    val after = inScope._1.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(after === inScope._2)
    spark.catalog.clearCache()
  }
}
