package graft

import graft.ops.{Analytics, Caches, Dedup}

/** Engine-level cache-eviction convention: every op that persists an
  * intermediate on behalf of its lazy result registers it in [[Caches]],
  * and one `releaseCaches()` evicts them all — the long-lived-session
  * guarantee (no unbounded cache accumulation across repeated op calls).
  */
class CachesSpec extends SparkSpec {

  import spark.implicits._

  test("releaseCaches evicts every op-registered persist; cache manager ends empty") {
    spark.catalog.clearCache() // isolate from caches left by earlier suites
    Caches.releaseCaches()

    val docs = (0L until 30L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta extra$i words"))
      .toDF("doc_id", "text")
    Dedup.minhashLsh(docs, 0.3).count()
    Dedup.ngramJaccard(docs, 0.3).count()

    val lineitem = (1L to 50L)
      .map(i => (i % 7, f"${i * 1.5}%.2f")).toDF("l_partkey", "l_extendedprice")
    Analytics.importantParts(lineitem, 1, 2).count()

    assert(Caches.trackedCount > 0, "ops should have registered their persists")
    Caches.releaseCaches()
    assert(Caches.trackedCount == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "cached frames remain after engine-level releaseCaches")
  }

  test("Scratch installs exactly ONE shutdown hook across repeated invocations") {
    val d1 = graft.Scratch.dir("graft-spec-scratch")
    val hooksAfterFirst = graft.Scratch.hookCount
    val d2 = graft.Scratch.dir("graft-spec-scratch")
    assert(d1 != d2, "each invocation hands out a fresh dir")
    assert(hooksAfterFirst == 1)
    assert(graft.Scratch.hookCount == 1,
      "second invocation must not add another JVM shutdown hook")
  }
}
