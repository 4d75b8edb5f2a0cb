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

  test("releaseStreamingState unloads state-store providers and drops registered sink views") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import java.sql.Timestamp
    // a stateful query loads providers into the process-wide map; a
    // terminated one never serves again but keeps paying maintenance
    // (the round-10 2.6s-vs-12.0s residue). The teardown must (a) empty
    // the map via the reflective unload hook and (b) drop exactly the
    // registered memory-sink views. loadedStateStoreProviders reaches
    // the map through the SAME reflective path releaseStreamingState
    // uses, so a Spark upgrade that breaks the hook fails HERE, loudly,
    // instead of silently disarming the fix.
    val ms = MemoryStream[(Timestamp, String, Double)](spark, numPartitions = 1)
    val view = Caches.registerStreamView("caches_spec_stream_1")
    val q = graft.streaming.StreamingAnalytics.windowedCounts(
      ms.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("append").format("memory").queryName(view)
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      ms.addData((new Timestamp(600000L), "click", 1.0))
      q.processAllAvailable()
    } finally q.stop()
    assert(Caches.loadedStateStoreProviders > 0,
      "the stateful query should have loaded at least one provider")
    assert(spark.catalog.tableExists(view))
    // a non-streaming view whose name merely CONTAINS 'stream' must
    // SURVIVE teardown (the old substring filter would have eaten it)
    Seq(1).toDF("x").createOrReplaceTempView("upstream_dims")
    Caches.releaseStreamingState(spark)
    assert(Caches.loadedStateStoreProviders == 0,
      "provider map must be empty after releaseStreamingState")
    assert(!spark.catalog.tableExists(view), "registered sink view must drop")
    assert(Caches.pendingStreamViews.isEmpty)
    assert(spark.catalog.tableExists("upstream_dims"),
      "non-registered views must survive even when their name contains 'stream'")
    spark.catalog.dropTempView("upstream_dims")
    // a registered name whose view never materialized must not throw
    Caches.registerStreamView("caches_spec_never_created")
    Caches.releaseStreamingState(spark)
    assert(Caches.pendingStreamViews.isEmpty)
  }

  test("withBatchShuffleWidth scopes the width down and restores it, also on exception") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    var inside = ""
    Caches.withBatchShuffleWidth(spark) {
      inside = spark.conf.get("spark.sql.shuffle.partitions")
    }
    assert(inside.toInt == math.max(4, spark.sparkContext.defaultParallelism / 4))
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev)
    intercept[RuntimeException] {
      Caches.withBatchShuffleWidth(spark) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") == prev,
      "width must restore on the exception path")
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
