package graft

/** Physical-plan contracts: the scale properties claimed in SCALING.md,
  * asserted so a refactor that silently de-optimizes a plan (loses
  * pushdown, drops a broadcast, adds a shuffle) fails the suite.
  */
class PlanShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("q3: filters pushed to every scan, dimension side broadcast") {
    val p = plan("q3_top_revenue")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [IsNotNull"), "lineitem pushdown missing")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "customer broadcast missing")
  }

  test("q1: scan reads only the needed columns (pruning)") {
    val p = plan("q1_pricing_summary")
    // 11-column lineitem pruned to the 5 used
    assert(!p.contains("l_partkey") && !p.contains("l_suppkey") && !p.contains("l_tax"),
      s"column pruning lost:\n$p")
    assert(p.contains("l_returnflag"))
  }

  test("changelog apply: exactly one hash-partition exchange (plus the output sort)") {
    val p = plan("cdc_lww_state")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"LWW apply must shuffle once, got $hashExchanges:\n$p")
    assert(p.contains("partial_max_by"), "map-side partial aggregation missing")
  }

  test("catchup range: position predicate reaches the scan") {
    val p = plan("cdc_catchup_range")
    assert(p.contains("PushedFilters") && p.contains("event_id"),
      s"pos range should push to parquet as event_id bounds:\n$p")
  }

  test("as-of lookup: probes broadcast as build side, changelog streams") {
    val p = plan("cdc_asof_lookup")
    // the big join must be a BHJ with the probe side built (BuildRight) —
    // a left-outer with probes hinted would broadcast the CHANGELOG
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("Inner") && l.contains("BuildRight")),
      s"expected inner BHJ BuildRight on probes:\n$p")
    assert(!p.contains("SortMergeJoin"), s"changelog must not shuffle for a probe join:\n$p")
  }

  test("contamination: benchmark features broadcast, corpus never shuffle-joins") {
    val p = plan("text_contamination")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("BuildRight")),
      s"benchmark feature set must be the broadcast build side:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus features must stream, not shuffle:\n$p")
  }

  test("stratified sample summary: single aggregation pass, no join, no window") {
    val p = plan("events_stratified_sample")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"map-side partial aggregation missing:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"rate sampling must be a pure filter+agg:\n$p")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"one shuffle on the stratum key, got $hashExchanges:\n$p")
  }

  test("wide LWW: payload width adds zero shuffles (same single exchange as narrow)") {
    val p = plan("cdc_lww_state_wide")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"wide LWW must still shuffle once, got $hashExchanges:\n$p")
    assert(p.contains("partial_max_by"), "map-side partial aggregation missing")
  }

  test("curation funnel: one corpus scan, zero joins (signals share one projection)") {
    val p = plan("pipeline_curation")
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1,
      s"signals must share ONE corpus scan:\n$p")
    assert(!p.contains("Join"), s"joining per-signal frames re-scans the corpus:\n$p")
  }

  test("boilerplate: frequent-span flag join picks broadcast at this scale, one tokenize pass") {
    val p = plan("text_boilerplate")
    // unhinted: stats decide (web-scale frequent tails are not
    // driver-sized); at fixture scale the planner must still broadcast
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftOuter")),
      s"frequent-span flag join should broadcast at fixture scale:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"span arrays must come from the persisted frame, not re-tokenize:\n$p")
  }

  test("unigram scoring: vocab broadcasts, corpus token stream never shuffle-joins") {
    val p = plan("text_unigram_logprob")
    assert(p.linesIterator.exists(_.contains("BroadcastHashJoin")),
      s"vocab counts must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"token stream must not shuffle for the join:\n$p")
  }

  test("ANN brute force: broadcast join + k-bounded partial top-k, one shuffle") {
    val p = plan("ann_bruteforce_topk")
    // queries broadcast against the corpus — never a shuffle join
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast join:\n$p")
    // per-map-partition top-k BEFORE the exchange: only ≤k rows per query
    // per partition shuffle (Spark's WindowGroupLimit partial pushdown)
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"),
      s"partial top-k pushdown missing:\n$p")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"expected exactly one hash exchange, got $hashExchanges:\n$p")
    // the codegen'd dot product sits in a plain Project (no HOF lambdas)
    assert(p.contains("dot_product_d"))
  }

  test("incremental dedup: batch side broadcasts everywhere, corpus never shuffle-joins") {
    val p = plan("dedup_incremental")
    // band probe + both verify joins carry the batch (tiny) as broadcast
    // build; the corpus index/signature side must only stream
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must stream, not shuffle, in incremental dedup:\n$p")
  }

  test("PQ: codebook broadcasts; corpus assignment is one partial agg, no corpus shuffle join") {
    val p = plan("emb_pq_codes")
    assert(p.contains("BroadcastHashJoin"), s"codebook must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle-join:\n$p")
    assert(p.contains("partial_min_by") || p.contains("partial_min"),
      s"map-side partial argmin missing:\n$p")
  }

  test("q19: OR-of-ANDs stays an equi-join with residual filter, never cartesian") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi-join on partkey:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"disjunctive predicate must not degrade the join:\n$p")
  }

  test("KMV sketch: partial aggregation (k-bounded partials ship, not raw values)") {
    val p = plan("events_approx_distinct")
    assert(p.contains("partial_kmv_minhashes"),
      s"map-side partial sketch missing — raw rows would shuffle:\n$p")
  }

  test("scd2: exactly one hash exchange — versioning costs what LWW costs") {
    val p = plan("cdc_scd2_history")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"SCD2 must shuffle once on (tbl, pk), got $hashExchanges:\n$p")
  }

  test("PQ ADC: distance tables broadcast, code frame never shuffle-joins, partial top-k") {
    val p = plan("ann_pq_adc")
    assert(!p.contains("SortMergeJoin"),
      s"ADC lookups must be broadcast hash joins against the code stream:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must run as partial group-limit before the exchange:\n$p")
  }

  test("bloom contamination: filter words broadcast; corpus probe never shuffle-joins") {
    val p = plan("text_contamination_bloom")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("BuildRight")),
      s"bloom word table must be the broadcast build side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus feature stream must probe the filter map-side:\n$p")
  }

  test("IVF+PQ: probes/tables broadcast, no cartesian, partial top-k") {
    val p = plan("ann_ivfpq_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"probe and distance-table joins must broadcast:\n$p")
    // the nq×nlist probe scoring may plan as a broadcast NL join, but a
    // CartesianProduct (both sides shuffled) is never acceptable
    assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must run as partial group-limit:\n$p")
  }

  test("histogram quantile sketch: bounded partial-merged aggregation, no percentile buffer") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val p = graft.ops.Sketches.histogramQuantiles(events, "event_type", "value", 64,
      Seq(("p50", 0.5), ("p95", 0.95))).queryExecution.executedPlan.toString
    assert(!p.contains("percentile"),
      s"sketch path must never buffer raw values in an aggregate:\n$p")
    assert(p.contains("partial_min") && p.contains("partial_count"),
      s"bounds and bin-count passes must combine map-side:\n$p")
    assert(p.contains("BroadcastExchange"),
      s"per-group bounds must broadcast into the binning scan:\n$p")
  }

  test("quality gate sketch: histogram threshold is one map-combined aggregation") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = graft.ops.Curation.qualityGateSketch(docs, 0.6, 64)
      .queryExecution.executedPlan.toString
    // the exact-percentile AUDIT column is allowed; the bin histogram
    // itself must be a partial-merged count aggregation
    assert(p.contains("partial_count"),
      s"bin counts must combine map-side:\n$p")
  }

  test("bucketed micro-batch merge: exactly ONE exchange (LWW and SCD2)") {
    import org.apache.spark.sql.functions.{col, lit, timestamp_micros}
    import spark.implicits._
    val env = (1L to 50L).map(i => ("t0", i % 7, if (i % 5 == 0) "D" else "U", i, i * 1.5))
      .toDF("tbl", "pk", "op", "pos", "value")
      .withColumn("ts", timestamp_micros(col("pos") * 1000000L))
      .withColumn("bucket", graft.streaming.StreamingApply.bucketOf(8))
    val prev = env.limit(0)
    val lww = graft.streaming.StreamingApply
      .mergeStateBucketed(prev, env, Seq("value"), 8)
      .queryExecution.executedPlan.toString
    assert(lww.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"bucketed LWW merge must shuffle exactly once on bucket:\n$lww")
    assert(lww.contains("partial_max_by") || lww.contains("max_by"),
      s"LWW aggregate missing:\n$lww")
    val scd2env = env.withColumn("valid_to_pos", lit(null).cast("long"))
      .withColumn("is_current", lit(false))
    val scd2 = graft.streaming.StreamingScd2
      .mergeBucketed(scd2env.limit(0), scd2env, 8)
      .queryExecution.executedPlan.toString
    assert(scd2.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"bucketed SCD2 merge must shuffle exactly once on bucket:\n$scd2")
    assert(scd2.contains("Window"), s"interval window missing:\n$scd2")
  }

  test("q21: per-order aggregate reuses the join's orderkey partitioning") {
    val p = plan("q21_sole_blame")
    // lineitem ⋈ orders shuffles each side once on orderkey; the per-order
    // aggregate must NOT add its own exchange on the same key
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 3,
      s"expected join-side exchanges reused by the aggregate (≤3 total), got $hashExchanges:\n$p")
  }

  test("rolling revenue: daily pre-agg shuffles day rows, window shares its partitioning") {
    val p = plan("events_rolling_avg")
    assert(p.contains("partial_sum"),
      s"daily aggregation must be partial (events combine map-side):\n$p")
    // exactly two hash exchanges: the daily aggregate's (event_type, day)
    // and the window's re-key to event_type — a regression that windows
    // per event or re-aggregates would add more
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges <= 2,
      s"expected the daily-agg + window exchanges only, got $hashExchanges:\n$p")
  }

  test("Count-Min: sketch build is one partial-agged count; cells broadcast to probes") {
    val p = plan("events_heavy_hitters")
    assert(p.contains("partial_count"),
      s"cell counts must combine map-side (the sketch IS the partial agg):\n$p")
    assert(p.linesIterator.exists(l => l.contains("BroadcastHashJoin")),
      s"the d*w cell grid must broadcast to the probe side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in the sketch path may shuffle-join:\n$p")
  }

  test("segment overlap: set algebra on sketch arrays only — no raw-id join") {
    val p = plan("events_segment_overlap")
    // the id-level work is the two aggregations (sketch build + exact
    // audit); the pair join must be a broadcast of segment-count rows
    assert(p.linesIterator.exists(l => l.contains("BroadcastNestedLoopJoin") ||
      l.contains("BroadcastHashJoin")),
      s"segment pairing must broadcast the sketch frame:\n$p")
    assert(p.contains("partial_kmv_minhashes"),
      s"KMV sketch must aggregate with partials:\n$p")
  }

  test("Hilbert walk: stays scan-local — no exchange before the stats aggregate") {
    val p = plan("events_hilbert_layout")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // two keyed exchanges total, both belonging to the aggregate (the
    // count_distinct two-phase); the 16-step walk itself is projections
    // inside the scan stage and must add none
    assert(hashExchanges <= 2,
      s"the d-value walk must not shuffle (agg exchanges only), got $hashExchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("bigram LM: all count frames broadcast; the corpus bigram stream never shuffles") {
    val p = plan("text_bigram_logprob")
    assert(!p.contains("SortMergeJoin"),
      s"count joins must broadcast at this scale (shuffle join only beyond broadcast size):\n$p")
    assert(p.contains("partial_count"),
      s"vocabulary counts must combine map-side:\n$p")
  }

  test("DLQ classify: a single projection — no shuffle, no join") {
    val p = plan("cdc_dlq_stats")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // one exchange for the per-table stats aggregate; classification adds none
    assert(hashExchanges == 1,
      s"disposition must be scan-local (1 stats exchange expected), got $hashExchanges:\n$p")
    assert(!p.contains("Join"), s"classification must not join:\n$p")
  }

  test("bm25: query workload and corpus stats broadcast; tf never sort-merge-joins them") {
    val p = plan("text_bm25_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"query terms / df / stats must broadcast:\n$p")
    // the only sort allowed is the final per-query ranking window + output
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-sized side may shuffle for a tiny-side join:\n$p")
  }

  test("orphan audit: anti-joins run on per-key aggregates, not raw child rows") {
    val p = plan("quality_orphan_fks")
    assert(p.contains("LeftAnti"), s"RI check must be an anti join:\n$p")
    // every anti join's streamed side is the child aggregated per key:
    // partial_count before the join proves the map-side shrink happened
    assert(p.contains("partial_count"), s"child must pre-aggregate per key:\n$p")
  }

  test("log compaction: one keyed shuffle, frontier broadcast into the filter") {
    val p = plan("cdc_log_compaction")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"compaction must shuffle once on (tbl, pk), got $hashExchanges:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"gc frontier must broadcast, not shuffle:\n$p")
  }

  test("attribution: zero joins — carry-forward window, never a range self-join") {
    val p = plan("events_attribution")
    assert(!p.contains("Join"),
      s"attribution must not pair purchases with clicks via a join:\n$p")
    assert(p.contains("Window"), s"carry-forward window missing:\n$p")
    assert(!p.contains("No Partition Defined") &&
      p.contains("windowspecdefinition(user_id"),
      s"window must be partitioned by user:\n$p")
  }

  test("duplicate spans: no cartesian, df relation pre-aggregated, per-doc window") {
    val p = plan("dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span detection must stay equi-join shaped:\n$p")
    assert(p.contains("partial_count"),
      s"duplicated-hash df must partial-aggregate map-side:\n$p")
    assert(p.contains("windowspecdefinition(doc_id"),
      s"islands window must be per-doc, not global:\n$p")
  }

  test("hyperplane LSH: band bucket equi-join, no cartesian, one persisted vector frame") {
    val p = plan("dedup_hyperplane_lsh")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be the banded bucket equi-join:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"verify joins must reuse the persisted (vec_id, v, norm) frame:\n$p")
    ops.Caches.releaseCaches()
  }

  test("entity resolution: blocked equi-join (never registry × records), ranked per dirty id") {
    val p = plan("er_fuzzy_resolve")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate pairing must go through the blocking key:\n$p")
    assert(p.contains("windowspecdefinition(dirty_id"),
      s"best-match ranking must be per dirty record:\n$p")
  }

  test("snapshot diff: ONE (tbl, pk) shuffle computes both images; cut broadcast") {
    val p = plan("cdc_snapshot_diff")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"old+new images must come from one aggregation (got $hashExchanges hash exchanges):\n$p")
    assert(p.contains("partial_max_by"), s"map-side partial max_by missing:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("FullOuter"),
      s"snapshot diff must not materialize-and-join two states:\n$p")
  }

  test("time-weighted avg: horizon broadcast back, lead window on the (tbl, pk) key") {
    val p = plan("cdc_time_weighted_avg")
    assert(p.contains("BroadcastHashJoin"),
      s"per-table horizon must broadcast, not shuffle-join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"changelog must not shuffle for the horizon:\n$p")
    assert(p.contains("windowspecdefinition(tbl"),
      s"exposure intervals must ride the (tbl, pk) window:\n$p")
  }

  test("prefix-filter join: candidates via posting equi-join, never all-pairs") {
    val p = plan("dedup_prefix_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"prefix postings must pair through the h equi-join:\n$p")
    assert(p.contains("InMemoryTableScan"),
      s"verify must reuse the one persisted (doc_id, h) frame:\n$p")
    ops.Caches.releaseCaches()
  }

  test("sliding windows: one Expand (factor 2), no self-join") {
    val p = plan("events_sliding_users")
    assert(p.linesIterator.count(_.contains("Expand [")) == 1,
      s"sliding assignment must be a single Expand:\n$p")
    assert(!p.contains("Join"), s"sliding windows must not self-join:\n$p")
  }

  test("exact quantiles ship the scale path: no percentile buffer, no ntile sort") {
    assert(!plan("events_percentiles").contains("percentile("),
      "events_percentiles must use two-pass selection, not the O(group)-buffer aggregate")
    assert(!plan("events_value_deciles").contains("ntile"),
      "events_value_deciles must use two-pass selection, not a per-type ntile sort")
    assert(!plan("text_quality_gate").contains("percentile("),
      "text_quality_gate's threshold must come from two-pass selection")
  }

  test("chunking: map-only lineage — no hash shuffle, no join, one generate") {
    val p = plan("text_chunking")
    assert(!p.contains("Exchange hashpartitioning"),
      s"chunking must not shuffle (only the output sort's range exchange):\n$p")
    assert(!p.contains("Join"), s"chunking must not join:\n$p")
    assert(p.linesIterator.count(_.contains("Generate ")) == 1,
      s"exactly one explode (the stride starts):\n$p")
  }

  test("pagerank: rounds pre-materialize; the returned frame adds no hash shuffle") {
    // the iterative rounds run eagerly (pinned localCheckpoints, each an
    // exchange-free pass over the dst-pinned edge cache), so the frame
    // handed back must be a plain read of the checkpointed rank RDD —
    // only the output sort's range exchange on top
    val p = plan("graph_pagerank")
    assert(p.contains("ExistingRDD"),
      s"final ranks must read the materialized round output:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"no hash shuffle on top of the materialized ranks:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere in pagerank:\n$p")
  }

  test("hits/communities: rounds pre-materialize; returned frames add no hash shuffle") {
    for (q <- Seq("graph_hits", "graph_communities")) {
      val p = plan(q)
      assert(p.contains("ExistingRDD"),
        s"$q must read materialized round output:\n$p")
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must add no hash shuffle on top of the materialized rounds:\n$p")
    }
  }

  test("pivot: conditional-aggregate pass with the value list given — no Expand, one scan each") {
    val p = plan("q_pivot_revenue")
    assert(!p.contains("Expand ["),
      s"pivot with explicit values must compile to conditional aggregates, not Expand:\n$p")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 3,
      s"each of orders/customer/nation must scan exactly once:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation must broadcast:\n$p")
  }

  test("pareto: revenue partial-aggregates per supplier; rank/cum/total ride the Ranks device") {
    val p = plan("supplier_pareto")
    // rank + cumulative revenue + grand total are offset literals over
    // the device frame — the plan must carry NO window at all, and the
    // per-supplier aggregate must partial-aggregate map-side (it prints
    // inside the device's cached subtree)
    assert(!p.contains("windowspecdefinition"),
      s"pareto must not rank through a window:\n$p")
    assert(p.contains("partial_sum"), s"per-supplier partials missing:\n$p")
    assert(p.contains("_grank_rnw") || p.contains("InMemoryTableScan"),
      s"rank must come from the device frame:\n$p")
  }

  test("join view: carry-forward windows and lag ride ONE (jk) sort order") {
    val p = plan("cdc_join_view")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"maintenance must never cross-join:\n$p")
    // all four carried columns + the lag pack into at most two jk-keyed
    // Window OPERATORS (carry chain + lag-over-c), and the maintained
    // side plus the full-recompute side each shuffle on jk exactly once
    val wops = p.linesIterator.count(l => l.contains("Window [") && l.contains("windowspecdefinition(jk"))
    assert(wops <= 2, s"carried sides must share jk window operators (got $wops):\n$p")
    val jkExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning(jk"))
    assert(jkExchanges <= 2, s"one jk shuffle per side at most (got $jkExchanges):\n$p")
  }

  test("LSH index probe: bucket-pruned index scan, zero corpus-side signature recompute") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val path = graft.Scratch.dir("graft-lshidx-spec") + "/index"
    graft.ops.Dedup.writeLshIndex(docs, path)
    // a SMALL probe batch (2-3 docs): its band hashes land in a strict
    // subset of the 16 buckets, so pruning is observable in the plan
    val batch = docs.filter(col("doc_id") % 97 === 1)
      .select((col("doc_id") + 5000000L).as("doc_id"),
        concat(col("text"), lit(" zz qq zz")).as("text"))
    val probe = graft.ops.Dedup.lshIndexProbe(spark, path, batch, 0.5)
    val p = probe.queryExecution.executedPlan.toString
    // bucket partition filter present on the index scan
    val scanLine = p.linesIterator.find(l =>
      l.contains("FileScan parquet") && l.contains("graft-lshidx-spec"))
    assert(scanLine.exists(l => l.contains("PartitionFilters") &&
      l.contains("bucket") && l.contains("INSET")),
      s"index scan must carry a bucket partition filter:\n$p")
    // ...and it PRUNES: fewer buckets hit than exist
    val inset = "INSET ([0-9, ]+)".r.findFirstMatchIn(scanLine.get).map(_.group(1))
    assert(inset.exists(_.split(',').length < graft.ops.Dedup.indexBuckets),
      s"tiny batch must hit a strict subset of buckets:\n${scanLine.get}")
    // the LIVE plan (everything outside the batch's cached subtrees, which
    // print under InMemoryRelation) computes NO signatures: no shingle
    // explode, no minhash partial aggregation — the corpus side's
    // signatures are READ from the index, never recomputed
    val live = p.linesIterator.takeWhile(!_.contains("InMemoryRelation")).toSeq
    assert(live.exists(_.contains("FileScan parquet")),
      s"index FileScan must sit in the live plan:\n$p")
    assert(!live.exists(l => l.contains("partial_min") || l.contains("Generate explode")),
      s"corpus-side signature recompute detected in the live plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"probe batch must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"index side must stream past the broadcast probe:\n$p")
    graft.ops.Caches.releaseCaches()
  }

  test("k-anonymity: one Expand serves the whole rollup ladder") {
    val p = plan("quality_k_anonymity")
    assert(p.linesIterator.count(_.contains("Expand [")) == 1,
      s"generalization ladder must be one rollup Expand:\n$p")
    assert(p.contains("partial_count"), s"map-side partials missing:\n$p")
    assert(!p.contains("Join"), s"ladder must not union/join per-level aggregates:\n$p")
  }

  test("skyline: size-census window, census broadcast back (no pairwise join, no part-grained window)") {
    val p = plan("part_skyline")
    // the cumulative min runs over the |distinct p_size| census; the
    // census then broadcasts back to the part scan — a SortMergeJoin or
    // cartesian here would mean the census pre-aggregation was lost
    assert(p.contains("BroadcastHashJoin"), s"size census must broadcast back:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"skyline must not pairwise-join parts:\n$p")
    assert(p.linesIterator.count(_.contains("Window")) >= 1, s"census window minima missing:\n$p")
    assert(p.contains("partial_min"), s"per-size census must partial-aggregate:\n$p")
  }

  test("EWMA: banded self-join stays on the bounded hourly frame") {
    val p = plan("events_ewma")
    // the raw events scan partial-aggregates BEFORE any join: the join
    // inputs are the hourly frames, so map-side partial agg must appear
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"hourly partial aggregation missing:\n$p")
  }

  test("association rules: brand counts broadcast, pair join shuffles on the order key") {
    val p = plan("lineitem_association_rules")
    assert(p.linesIterator.exists(_.contains("BroadcastHashJoin")),
      s"single-brand counts must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
  }

  test("hybrid verify: no cartesian, vector table joined by candidate ids only") {
    val p = plan("dedup_hybrid_verify")
    assert(!p.contains("CartesianProduct"), s"no cartesian in the hybrid audit:\n$p")
  }

  test("HLL: one partial-agged register build, constant-size grid join") {
    val p = plan("sketch_hll_distinct")
    assert(p.contains("partial_max") || p.contains("Partial"),
      s"register MAX must partial-aggregate map-side:\n$p")
  }

  test("conversion latency: sketch path, no exact percentile aggregate") {
    val p = plan("events_conversion_latency")
    assert(!p.toLowerCase.contains("percentile"),
      s"latency quantiles must come from the bounded histogram sketch:\n$p")
  }

  // ---- exchange-free iterative graph rounds (the round-9 headline):
  // one round built over the production pinnedBy cache + materialized
  // |V|-bounded frames must plan with ZERO shuffle exchanges — a
  // refactor that re-introduces a union into the self-vote fold, drops
  // a broadcast hint, or loses the cache partitioning flips these red.

  import org.apache.spark.sql.functions.{broadcast, col, lit, sum}
  import graft.ops.Graph

  private def symEdges = {
    import spark.implicits._
    Seq((10L, 20L, 2L), (20L, 10L, 2L), (10L, 30L, 1L),
        (30L, 10L, 1L), (20L, 30L, 1L), (30L, 20L, 1L)).toDF("src", "dst", "w")
  }

  /** Shuffle exchanges in the query's OWN plan — tree traversal (string
    * matching would also count the pinning exchange printed inside the
    * InMemoryRelation cache-build subtree, which is exactly the shuffle
    * the cache exists to pay once). Descends through the AQE wrapper to
    * the initial plan: the contract is that EnsureRequirements inserts
    * no shuffle at all, not that AQE optimizes one away.
    */
  private def countHashExchanges(df: org.apache.spark.sql.DataFrame): (Int, String) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case s: ShuffleExchangeLike   => 1 + s.children.map(walk).sum
      case other                    => other.children.map(walk).sum
    }
    val plan = df.queryExecution.executedPlan
    (walk(plan), plan.toString)
  }

  test("hard negatives: anchors broadcast, corpus streams once, no cartesian") {
    val p = plan("emb_hard_negatives")
    assert(!p.contains("CartesianProduct"), s"no all-pairs shape:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the anchor set must broadcast into the corpus scan:\n$p")
  }

  test("trailing window: one exchange on the user key, RANGE frame (no self-join)") {
    val p = plan("events_trailing_window")
    assert(!p.contains("Join"), s"the trailing interval must not self-join:\n$p")
    val hashExchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1, s"one shuffle on user_id only, got $hashExchanges:\n$p")
  }

  test("query expansion: both BM25 passes read the SAME checkpointed tf/dl corpus frames") {
    val df = SparkEntry.queries("rag_query_expansion")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // tf/dl are eagerly localCheckpointed at build time (plan-cutting —
    // the fix for the 47-job lineage re-analysis), so every downstream
    // consumer scans the materialized RDD and the final plan contains
    // ZERO corpus re-tokenization (no Generate over the token arrays)
    assert(p.linesIterator.count(_.contains("Scan ExistingRDD")) >= 3,
      s"tf/dl/exp must come from the checkpointed frames in both passes:\n$p")
    assert(!p.contains("Generate"),
      s"no tokenize lineage may survive into the scoring plan:\n$p")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("LP round: zero shuffle exchanges — broadcast label map over the dst-pinned cache") {
    val e = Graph.pinnedBy(symEdges, "dst")
    val labels = Graph.pinned(
      e.select(col("src").as("node")).distinct().withColumn("label", col("node")))
    val (n, p) = countHashExchanges(Graph.lpRound(e, labels))
    assert(n == 0, s"LP round must be exchange-free over the pinned cache, got $n:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"label map must broadcast into the cache:\n$p")
  }

  test("pagerank round: zero shuffle exchanges — rank map broadcast, per-dst sum on the cache") {
    val raw = symEdges
    val outW = raw.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val e = Graph.pinnedBy(raw.join(broadcast(outW), "src")
      .select(col("src"), col("dst"), col("w"), col("out_w")), "dst")
    val nodes = Graph.pinned(raw.select(col("src").as("node")).distinct())
    val rank = Graph.pinned(nodes.withColumn("rank", lit(1000000L)))
    val (n, p) = countHashExchanges(Graph.pagerankRound(e, nodes, rank, 5L))
    assert(n == 0, s"pagerank round must be exchange-free over the pinned cache, got $n:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"rank/contrib maps must broadcast:\n$p")
  }

  test("HITS half-round: zero shuffle exchanges — score map broadcast into the groupKey-pinned copy") {
    import spark.implicits._
    val e = Graph.pinnedBy(
      Seq((1L, 10L, 2L), (1L, 20L, 1L), (2L, 10L, 1L)).toDF("c", "p", "w"), "p")
    val hub = Graph.pinned(Seq((1L, 500000L), (2L, 500000L)).toDF("c", "h"))
    val (n, p) = countHashExchanges(Graph.hitsVotes(e, hub, "c", "p", "h"))
    assert(n == 0, s"HITS half-round must be exchange-free, got $n:\n$p")
  }

  test("dedup riders scan the cluster parquet artifact — no shingle/minhash rebuild") {
    // the round-10 17.7s -> 1.0s rider win: canonicalization, leakage
    // split and token accounting read the once-per-process cluster
    // artifact instead of re-running LSH+CC per consumer. A refactor
    // that silently falls back to from-scratch clustersFor would stay
    // oracle-green (same rows) and only the bench would notice — so the
    // fast path is a CI contract: the executed plan must contain a
    // parquet scan of the artifact directory and none of the signature
    // lineage (posexplode over band arrays, s0.. columns).
    for (q <- Seq("dedup_canonical", "dedup_leakage_split", "dedup_effective_tokens")) {
      val p = plan(q)
      assert(p.contains("graft_clusters"),
        s"$q must read the persisted cluster artifact:\n$p")
      assert(!p.contains("posexplode"),
        s"$q must not rebuild the LSH band lineage:\n$p")
      assert(!p.contains("s0#"),
        s"$q must not rebuild minhash signatures:\n$p")
    }
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("kNN graph: corpus broadcast, no cartesian, ranking window rides the anchor repartition") {
    val df = SparkEntry.queries("emb_knn_graph")(spark, dir)
    val (n, p) = countHashExchanges(df)
    assert(!p.contains("CartesianProduct"), s"no all-pairs cartesian shape:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the corpus must broadcast into the streamed anchor side:\n$p")
    // one explicit-width anchor repartition; the window's required
    // clustering is satisfied by the BNLJ's streamed-side partitioning,
    // so no second hash exchange exists (the global output sort is a
    // range exchange, also counted by the walker)
    assert(n <= 2, s"anchor repartition + output sort only, got $n:\n$p")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("kNN riders scan the knn parquet artifact — no cosine rebuild") {
    // same device (and same failure mode) as the cluster-artifact
    // contract: a refactor that silently falls back to the from-scratch
    // |corpus|^2 build would stay oracle-green and only the bench would
    // notice — the executed plan must read the artifact and contain no
    // dot-product lineage
    for (q <- Seq("emb_knn_hubness", "emb_knn_agreement", "emb_knn_outliers")) {
      val p = plan(q)
      assert(p.contains("graft_knn"),
        s"$q must read the persisted kNN artifact:\n$p")
      assert(!p.contains("dot_product_d"),
        s"$q must not recompute cosines:\n$p")
    }
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("min-plus BFS round: distance frame broadcasts into the pinned cache, one exchange (the min groupBy)") {
    // shared by bfsReach (node) and closeness (node, seed): the union
    // with the frontier extension discards partitioning, so the round
    // pays exactly ONE exchange — the min-relaxation groupBy — and the
    // edge cache never re-shuffles
    import spark.implicits._
    val e = Graph.pinnedBy(Graph.symmetrize(
      Seq((10L, 20L), (20L, 30L)).toDF("s", "d")), "src")
    val dist = Graph.pinned(Seq((10L, 10L, 0L)).toDF("node", "seed", "hops"))
    val (n, p) = countHashExchanges(Graph.minPlusRound(e, dist, Seq("node", "seed")))
    assert(n == 1, s"labeled min-plus round must shuffle once (the min groupBy), got $n:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"distance frame must broadcast:\n$p")
  }

  test("wedge census: the self-join co-locates on the pinned dst partitioning (one exchange)") {
    import spark.implicits._
    // force the merge-join path: the contract is cache co-location, not
    // a small-input broadcast rescue
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val eo = Graph.pinned(Seq((10L, 20L), (10L, 30L), (20L, 30L)).toDF("s", "d"))
      val e = Graph.pinnedBy(Graph.symmetrize(eo), "dst")
      val (n, p) = countHashExchanges(Graph.commonNeighborPairs(e))
      assert(n == 1,
        s"wedge self-join must ride the cache; only the (a,b) census shuffles — got $n:\n$p")
      assert(!p.contains("CartesianProduct"), s"no cartesian in the wedge join:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** WindowExec nodes with an EMPTY partition spec — the single-task
    * global sort every scale review hunts for. Census-device operators
    * are allowed them only over alphabet-/bucket-bounded frames; these
    * contracts pin the COUNT so a refactor that re-ranks raw rows
    * globally (the easy wrong version) flips the suite red.
    */
  private def countGlobalWindows(df: org.apache.spark.sql.DataFrame): (Int, String) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.window.WindowExec
    // unlike the exchange contract, DO descend into cache-build subtrees
    // (a persist must not hide a global sort) — but count each cached
    // relation once, however many scans reference it
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case c: InMemoryTableScanExec =>
        if (seen.add(c.relation.cachedPlan)) walk(c.relation.cachedPlan) else 0
      case w: WindowExec =>
        (if (w.partitionSpec.isEmpty) 1 else 0) + w.children.map(walk).sum
      case other => other.children.map(walk).sum
    }
    val plan = df.queryExecution.executedPlan
    (walk(plan), plan.toString)
  }

  test("rank-sum + trimmed means: every window is segment-partitioned (census device, no global sort)") {
    for (q <- Seq("events_mann_whitney", "events_trimmed_mean")) {
      val (n, p) = countGlobalWindows(SparkEntry.queries(q)(spark, dir))
      assert(n == 0, s"$q must rank via the partitioned census, got $n global windows:\n$p")
      assert(!p.contains("Join"), s"$q is one lineage, no join:\n$p")
    }
  }

  test("peak concurrency: ONE global window, over the bucket-offset frame only") {
    val df = SparkEntry.queries("events_peak_concurrency")(spark, dir)
    val (n, p) = countGlobalWindows(df)
    assert(n == 1, s"only the |buckets|-bounded offset cumsum may be global, got $n:\n$p")
    assert(!p.contains("CartesianProduct"), s"peak/argmin lookups stay broadcast:\n$p")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("shuffle audit: ONE global window (the 64-row range-edge lag); data lag is bucket-partitioned") {
    val (n, p) = countGlobalWindows(SparkEntry.queries("text_shuffle_audit")(spark, dir))
    assert(n == 1, s"only the range-edge stitch may order globally, got $n:\n$p")
  }

  test("rank agreement: global cumsums only over the signal censuses; censuses broadcast back") {
    val (n, p) = countGlobalWindows(SparkEntry.queries("text_rank_agreement")(spark, dir))
    assert(n == 2, s"exactly the two alphabet-bounded census cumsums, got $n:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"census frames must broadcast back to the docs, not shuffle-join:\n$p")
  }

  test("silhouette: label-dim stats broadcast; no global window, no cartesian") {
    val (n, p) = countGlobalWindows(SparkEntry.queries("emb_silhouette")(spark, dir))
    assert(n == 0, s"silhouette has no ranking at all, got $n global windows:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"stats frame must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"corpus must stream once against the schema-bounded stats:\n$p")
  }

  test("bootstrap CI: pinned fan-out width, explode feeds PARTIAL aggregation") {
    val p = plan("events_bootstrap_ci")
    // the ×64 fan-out must not inherit the one-file scan's width
    assert(p.contains("RoundRobinPartitioning"),
      s"explicit repartition before the replicate fan-out lost:\n$p")
    // exploded (row, replicate) rows combine map-side: the shuffle after
    // the explode carries (type, b) partials, never the exploded stream
    assert(p.contains("partial_sum"),
      s"replicate sums must partial-aggregate before the exchange:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"only broadcast joins of scalar frames expected:\n$p")
  }

  test("gains curve: deciles from the device over the PRE-AGGREGATED user frame, one scan") {
    // tree traversal (the price-index convention): the user frame is
    // aggregated once, cached inside the Ranks device, and every events
    // read goes through that ONE cache — the outer plan reads no file
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): (Int, Int) = p match {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case _: FileSourceScanExec    => (1, 0)
      case _: InMemoryTableScanExec => (0, 1)
      case other =>
        other.children.map(walk).foldLeft((0, 0)) {
          case ((f, m), (f2, m2)) => (f + f2, m + m2) }
    }
    val df = SparkEntry.queries("events_gains_curve")(spark, dir)
    val (files, mem) = walk(df.queryExecution.executedPlan)
    assert(files == 0 && mem == 1,
      s"gains curve must read the ONE cached device frame, got $files file scans / $mem cache scans:\n${df.queryExecution.executedPlan}")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_count"),
      s"per-user score must partial-aggregate map-side:\n$p")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("price index: (month, part) frame cached once for its three consumers, base broadcast") {
    // tree traversal, not string counting: the plan STRING prints the
    // cache-build FileScan inside every InMemoryRelation (round-10 trap)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): (Int, Int) = p match {
      case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
      case _: FileSourceScanExec    => (1, 0)
      case _: InMemoryTableScanExec => (0, 1)
      case other =>
        other.children.map(walk).foldLeft((0, 0)) {
          case ((f, m), (f2, m2)) => (f + f2, m + m2) }
    }
    val df = SparkEntry.queries("lineitem_price_index")(spark, dir)
    val (fileScans, memScans) = walk(df.queryExecution.executedPlan)
    val p = df.queryExecution.executedPlan.toString
    assert(memScans >= 2,
      s"base probe and index join must read the CACHED (month, part) frame:\n$p")
    assert(fileScans == 0,
      s"no direct lineitem scan outside the cache build, got $fileScans:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the month-bounded base basket must broadcast:\n$p")
    graft.ops.Caches.releaseCaches()
  }

  test("attribution games: the corpus reduces in one (shapley) / two (markov) scans; the games run on literals") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def fileScans(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.initialPlan)
      case _: FileSourceScanExec    => 1
      case other                    => other.children.map(fileScans).sum
    }
    // shapley collects the ≤16-row mask census during construction (one
    // scan) and plays the game on the driver: the RESULT plan must be a
    // pure literal frame — a DataFrame re-formulation of the game
    // re-derived the corpus lineage once per v(S) consumer (4 scans)
    val sh = SparkEntry.queries("events_shapley_attribution")(spark, dir)
    assert(fileScans(sh.queryExecution.executedPlan) == 0,
      s"the Shapley game must run on the driver census, not re-scan:\n${
        sh.queryExecution.executedPlan}")
    // markov: the transition census (chain edges fused with START edges
    // in one explode) + the bare-conversion user fold = two scans; the
    // Cramer solve itself touches no data at all
    val tr = graft.ops.Analytics.journeyTransitions(
      SparkEntry.t(spark, dir, "events"))
    assert(fileScans(tr.queryExecution.executedPlan) <= 2,
      s"journey census must not re-scan per edge kind:\n${tr.queryExecution.executedPlan}")
  }

  test("blocking recall: volumes from grouped-count joins — raw registry never pair-joins") {
    val p = plan("er_blocking_recall")
    // every join input is a grouped count (or a scalar): a raw dirty ×
    // registry pairing would appear as a join BELOW any aggregate
    assert(!p.contains("CartesianProduct"), s"no cartesian anywhere:\n$p")
    assert(!p.contains("levenshtein"),
      s"the audit never verifies pairs — counts only:\n$p")
    assert(p.contains("partial_count"),
      s"per-key block counts must partial-aggregate:\n$p")
  }

  test("global ranking retired: data-grained frames rank via the Ranks device, not a single-task window") {
    // every partitionless WindowExec left in these plans runs over a
    // bounded census (deciles, size domain, a post-LIMIT top-N) — the
    // EXACT counts are pinned so a refactor that re-ranks a
    // users-/parts-/suppliers-grained frame globally (the easy wrong
    // version: Window.orderBy with no partition) flips this red.
    val expected = Seq(
      "events_gains_curve" -> 2,       // decile cumsum + decile totals (10 rows)
      "events_qini_curve" -> 1,        // decile cumsum (10 rows)
      "supplier_pareto" -> 0,          // rank + cum + total all from the device
      "lineitem_abc_xyz" -> 0,         // cum + total from the device
      "lineitem_revenue_gini" -> 0,    // rank + count from the device
      "events_rank_anova" -> 0,        // value-census cumsum from the device
      "quality_fanout_profile" -> 0,   // fanout-census cumsum from the device
      "part_skyline" -> 1,             // |distinct p_size| census (domain ~50)
      "text_quality_gate_sketch" -> 2) // nBins-bounded histogram census (cumsum + total)
    for ((q, n) <- expected) {
      val (got, p) = countGlobalWindows(SparkEntry.queries(q)(spark, dir))
      assert(got == n, s"$q: expected $n bounded global windows, got $got:\n$p")
      graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
    }
  }

  test("CDC conflation decision pair: every window keyed (tbl, pk) — no global sort anywhere") {
    // the round-12 pair prices the R6 throttle from burst islands and
    // per-key savings; both are (tbl, pk)-keyed windows + grouped
    // censuses, so ZERO empty-partition WindowExec nodes may appear
    for (q <- Seq("cdc_hot_keys", "cdc_conflation_savings")) {
      val (n, p) = countGlobalWindows(SparkEntry.queries(q)(spark, dir))
      assert(n == 0, s"$q must keep every window keyed, got $n global windows:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: no cartesian:\n$p")
      graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
    }
  }

  test("ANN kNN maintenance: the scored pass partition-prunes to the probed cells") {
    // the round-12 directive-#1 contract: the candidate scan of the
    // cell-partitioned vector layout must carry a partition filter on
    // `cell` (probed cells only) — a refactor that streams the full
    // vector table per batch (the exact path's |B|·|C| shape) loses the
    // filter and flips this red
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import spark.implicits._
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(4)(d => math.sin(i * 1.3 + d))) }.toDF("vec_id", "embedding")
    val (_, cells, _) = graft.ops.Similarity.buildIvfKnnMaintPrefix(
      spark, emb, 5, 8, graft.Scratch.dir("ann-plan"))
    val probes = Seq((100L, Array(1.0, 0.5, 0.25, 0.125), 1.0, 0),
        (100L, Array(1.0, 0.5, 0.25, 0.125), 1.0, 3))
      .toDF("bid", "bv", "bn", "cell")
    val cand = graft.ops.Similarity.annCandidates(spark, cells, probes, Seq(0, 3))
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.initialPlan)
      case f: FileSourceScanExec    => Seq(f)
      case o                        => o.children.flatMap(scans)
    }
    val cellScans = scans(cand.queryExecution.executedPlan)
    assert(cellScans.nonEmpty, s"no file scan found:\n${cand.queryExecution.executedPlan}")
    cellScans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"cells scan must partition-filter on the probed cells:\n$f")
    }
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("ktruss: final support pass is ROUND-INDEPENDENT (checkpoint cut), equi-join only") {
    // each peel round localCheckpoints the shrinking edge frame (the
    // fixed-round eligibility rule): the returned plan must read the
    // LAST round's checkpoint leaf, so its exchange count is identical
    // whether the peel ran 1 round or 3 — a lost cut would re-derive
    // every earlier round's triangle lineage and the count would grow
    val li = SparkEntry.t(spark, dir, "lineitem")
    val (n3, p3) = countHashExchanges(graft.ops.Graph.kTruss(li, 2, 3, 3))
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
    val (n1, p1) = countHashExchanges(graft.ops.Graph.kTruss(li, 2, 3, 1))
    assert(p3.contains("Scan ExistingRDD"),
      s"round frame must be checkpoint-pinned:\n$p3")
    assert(!p3.contains("CartesianProduct"), s"triangle enumeration must stay equi-join:\n$p3")
    assert(n3 == n1,
      s"final support pass must not depend on round count: rounds=3 -> $n3 exchanges, rounds=1 -> $n1:\n$p3\n--- rounds=1:\n$p1")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }

  test("vocab ranks: top-K selects via partial top-K; the ordinal window sees survivors only") {
    for (q <- Seq("text_token_ids", "text_vocab_coverage")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q must partial-top-K the vocabulary, not globally sort it:\n$p")
    }
  }

  test("graph seed/hub selection: sort+limit (TakeOrderedAndProject), zero global windows") {
    for (q <- Seq("graph_bfs_reach", "graph_closeness", "graph_ego_density")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val (got, p) = countGlobalWindows(df)
      assert(got == 0, s"$q: seed selection must be top-N, got $got global windows:\n$p")
      graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
    }
  }

  test("round-12 statistics ops: zero global windows, census joins broadcast, top-K partial") {
    // every one of these reduces the raw scan to a census-/alphabet-
    // bounded frame in ONE pass; nothing downstream may globally sort or
    // shuffle-join raw rows
    for (q <- Seq("events_sequence_support", "events_theil_sen",
        "quality_cramers_v", "text_kn_probability", "supplier_hhi")) {
      val df = SparkEntry.queries(q)(spark, dir)
      val (got, p) = countGlobalWindows(df)
      assert(got == 0, s"$q: expected zero global windows, got $got:\n$p")
      graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
    }
    // the KN top-50 must be a partial top-K, never a global sort
    val kn = plan("text_kn_probability")
    assert(kn.contains("TakeOrderedAndProject"),
      s"text_kn_probability must TakeOrderedAndProject the top-50:\n$kn")
    // Theil–Sen's pairwise self-join expands the bounded DAY census, and
    // only behind a broadcast — an SMJ here would mean it pairs raw rows
    val ts = plan("events_theil_sen")
    assert(!ts.contains("SortMergeJoin"),
      s"events_theil_sen: day-pair join must broadcast the census:\n$ts")
    // HHI: the supplier dim broadcasts; lineitem must never shuffle-join
    val hhi = plan("supplier_hhi")
    assert(hhi.contains("BroadcastHashJoin") && !hhi.contains("SortMergeJoin"),
      s"supplier_hhi: dim joins must broadcast:\n$hhi")
    graft.ops.Caches.releaseCaches(); spark.catalog.clearCache()
  }
}
