package graft

import graft.ops.{Graph, Retrieval, Sketches, Similarity, Curation}

/** Invariants of the round-7 operators: fixed-point PageRank, token
  * chunking, zone-map pruning, KMV join-cardinality, nDCG.
  */
class GraphAndAuditOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ---- pagerank ----

  private def liDf(rows: (Long, Long)*) =
    rows.toDF("l_orderkey", "l_partkey")

  test("pagerank: conserves rank mass up to integer truncation") {
    val li = liDf(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 20L, 3L -> 10L, 3L -> 30L)
    val pr = Graph.pagerank(li, 6).collect()
    val total = pr.map(_.getLong(1)).sum
    // each iteration truncates < 1 picorank per (edge contribution +
    // teleport + damping divide): loss is bounded by a few units per node
    // per round, nowhere near a rank unit
    assert(math.abs(total - Graph.Scale) < pr.length * 6 * 3 + 100,
      s"mass not conserved: $total vs ${Graph.Scale}")
    assert(pr.forall(_.getLong(1) > 0L), "every connected node keeps positive rank")
  }

  test("pagerank: the hub of a weighted star outranks the leaves") {
    // part 10 co-occurs with everything; 20/30/40 only with 10
    val li = liDf(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 30L, 3L -> 10L, 3L -> 40L)
    val pr = Graph.pagerank(li, 6).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pr(10L) > pr(20L) && pr(10L) > pr(30L) && pr(10L) > pr(40L),
      s"hub must dominate: $pr")
    // symmetric leaves tie exactly — integer arithmetic, no float noise
    assert(pr(20L) == pr(30L) && pr(30L) == pr(40L), s"leaf ranks must be identical: $pr")
  }

  test("labelPropagation: a star converges to one community anchored at the hub") {
    val li = liDf(1L -> 10L, 1L -> 20L, 2L -> 10L, 2L -> 30L, 3L -> 10L, 3L -> 40L)
    val got = Graph.labelPropagation(li, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(10L), s"star must collapse to the hub's label: $got")
  }

  test("labelPropagation: disconnected cliques keep separate communities") {
    // two triangles with no shared order
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 7L, 2L -> 8L, 2L -> 9L)
    val got = Graph.labelPropagation(li, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(7L) == got(8L) && got(8L) == got(9L))
    assert(got(1L) != got(7L), s"cliques must not merge: $got")
  }

  test("triangleStats: one clique triangle counted once, support filter prunes weak edges") {
    // parts 1,2,3 co-bought in TWO orders (support-2 triangle); part 9
    // co-occurs with 1 only once → below support, contributes nothing
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 1L, 2L -> 2L, 2L -> 3L,
      3L -> 1L, 3L -> 9L)
    val r = Graph.triangleStats(li, 2).collect()(0)
    assert(r.getAs[Long]("n_nodes") == 3L && r.getAs[Long]("n_edges") == 3L)
    assert(r.getAs[Long]("n_triangles") == 1L)
    assert(r.getAs[Long]("n_wedges") == 3L)
    assert(r.getAs[Double]("clustering") == 1.0, s"closed triad: $r")
  }

  test("kCore: a pendant chain peels away, the clique survives with full degree") {
    // support-2 core: triangle 1-2-3 plus pendant 9 hanging off 1.
    // Pendant has degree 1 < 2 → peeled in round 1; after its removal
    // node 1's in-core degree is 2, so the triangle is the stable 2-core.
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 1L, 2L -> 2L, 2L -> 3L,
      3L -> 1L, 3L -> 9L, 4L -> 1L, 4L -> 9L)
    val got = Graph.kCore(li, 2, 2, 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), s"2-core must be the triangle: $got")
  }

  test("kTruss: 4-truss keeps the K4, sheds pendant edges and lone triangles; 3-truss keeps both") {
    // one 2-part order per planted edge (minSupport 1): K4 on 1-4, a
    // pendant edge 4-5, a lone triangle 5-6-7. Every K4 edge sits in 2
    // triangles (support 2), lone-triangle edges in 1, the pendant in 0.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L))
    val li = edges.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i.toLong, a), (i.toLong, b)) }.toDF("l_orderkey", "l_partkey")
    val k4 = Graph.kTruss(li, 1, 4, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(k4.toSet == Set((1L, 2L, 2L, true), (1L, 3L, 2L, true), (1L, 4L, 2L, true),
      (2L, 3L, 2L, true), (2L, 4L, 2L, true), (3L, 4L, 2L, true)),
      s"4-truss must be exactly the K4 with support 2: ${k4.toSeq}")
    val k3 = Graph.kTruss(li, 1, 3, 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k3 == edges.toSet - ((4L, 5L)),
      s"3-truss keeps every triangle edge, drops only the pendant: $k3")
  }

  test("bfsReach: hop distances fan out from the hub, disconnected nodes absent") {
    // path 1-2-3-4 (each edge in two orders for support 2) plus an
    // isolated support-2 edge 8-9; seed = the single highest-degree node
    val li = liDf(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 2L, 3L -> 3L,
      4L -> 2L, 4L -> 3L, 5L -> 3L, 5L -> 4L, 6L -> 3L, 6L -> 4L,
      7L -> 8L, 7L -> 9L, 8L -> 8L, 8L -> 9L)
    val got = Graph.bfsReach(li, 2, 1, 4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // degrees: 2 and 3 tie at 2 → smallest id (2) seeds
    assert(got == Map(2L -> 0L, 1L -> 1L, 3L -> 1L, 4L -> 2L),
      s"distances from hub 2, island unreached: $got")
  }

  test("closeness: path center beats endpoint; isolated-pair seed guards the divide") {
    // same path 1-2-3-4 + island {8,9} as the bfsReach spec, 2 seeds:
    // degree order is 2,3 (deg 2) then 1,4,8,9 (deg 1) — seeds {2, 3}
    val li = liDf(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 2L, 3L -> 3L,
      4L -> 2L, 4L -> 3L, 5L -> 3L, 5L -> 4L, 6L -> 3L, 6L -> 4L,
      7L -> 8L, 7L -> 9L, 8L -> 8L, 8L -> 9L)
    val got = Graph.closeness(li, 2, 2, 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.get(3))).toMap
    // from 2: dists {2:0, 1:1, 3:1, 4:2} → n=4, Σ=4, 1e6·3/4 = 750000
    assert(got(2L) == (4L, 4L, 750000L), s"$got")
    // from 3: dists {3:0, 2:1, 4:1, 1:2} → same mass by symmetry
    assert(got(3L) == (4L, 4L, 750000L), s"$got")
    // single seed on the 8-9 island: Σhops = 1 → 1e6·1/1
    val island = Graph.closeness(liDf(7L -> 8L, 7L -> 9L, 8L -> 8L, 8L -> 9L), 2, 1, 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.get(3))).toMap
    assert(island(8L) == (2L, 1L, 1000000L), s"$island")
  }

  test("linkPredict: predicts the open triad's missing edge, skips existing edges") {
    // path 1-2-3: nodes 1 and 3 share neighbor 2 but are not adjacent →
    // the one predicted link, cn=1, jaccard = 1/(1+1-1) = 1.0
    val li = liDf(1L -> 1L, 1L -> 2L, 2L -> 1L, 2L -> 2L, 3L -> 2L, 3L -> 3L,
      4L -> 2L, 4L -> 3L)
    val got = Graph.linkPredict(li, 2, 10).collect()
    assert(got.length == 1, s"exactly one candidate pair: ${got.toSeq}")
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 3L && got(0).getLong(2) == 1L)
    assert(got(0).getDouble(3) == 1.0, s"jaccard of the open triad: ${got(0)}")
  }

  test("ego density: a clique hub scores 1.0, a star hub 0.0") {
    // order 1: clique {1,2,3}; orders 2-3: star center 5 with leaves 10, 11
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 5L, 2L -> 10L, 3L -> 5L, 3L -> 11L)
    val got = Graph.egoDensity(li, 1, 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Double]("local_cc") == 1.0, s"clique member: ${got(1L)}")
    assert(got(5L).getAs[Double]("local_cc") == 0.0 &&
      got(5L).getAs[Long]("n_wedges") == 1L, s"star center: ${got(5L)}")
    // degree-1 leaves have zero wedges — guarded NULL, not a division error
    assert(got(10L).isNullAt(got(10L).fieldIndex("local_cc")))
  }

  test("weak ties: triangle edges are embedded, spokes are weak") {
    // order 1 buys a triangle {1,2,3}; orders 2 and 3 form two spokes
    // off part 5 (5-10, 5-11) with no closure
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 5L, 2L -> 10L, 3L -> 5L, 3L -> 11L)
    val got = Graph.weakTies(li, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 2L, 1L -> 3L),
      s"expected 2 weak spokes and 3 embeddedness-1 triangle edges: $got")
  }

  test("walk corpus: every hop follows an edge; walks are complete and replayable") {
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 2L, 2L -> 4L, 3L -> 3L, 3L -> 4L)
    def run() = Graph.walkCorpus(li, 1, 2, 3, 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val rows = run()
    val walks = rows.groupBy(_._1)
    assert(walks.size == 6, s"2 seeds x 3 walks: ${walks.keySet}")
    // order 1 is a 3-basket: {1,2,3} forms a clique, not a path
    val edges = Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .flatMap { case (a, b) => Set((a, b), (b, a)) }
    walks.values.foreach { w =>
      val seq = w.sortBy(_._2).map(_._3)
      assert(seq.length == 5, s"each walk has steps+1 rows: $seq")
      seq.zip(seq.tail).foreach(hop => assert(edges(hop), s"non-edge hop $hop in $seq"))
    }
    assert(run().toSeq == rows.toSeq, "hash-seeded walks must replay identically")
    // walk_id packs node*1000 + index: fan-out past the multiplier must
    // be rejected, not silently collide ids across seeds
    val e = intercept[IllegalArgumentException](Graph.walkCorpus(li, 1, 2, 1001, 1))
    assert(e.getMessage.contains("walksPerSeed <= 1000"))
  }

  // ---- HITS ----

  /** rows = (custkey, orderkey, partkey) purchases. */
  private def hitsFixtures(rows: (Long, Long, Long)*) = {
    val orders = rows.map { case (c, o, _) => (o, c) }.distinct.toDF("o_orderkey", "o_custkey")
    val li = rows.map { case (_, o, p) => (o, p) }.toDF("l_orderkey", "l_partkey")
    (orders, li)
  }

  test("hits: L1 mass conserved per side up to per-row truncation") {
    val (o, li) = hitsFixtures(
      (1L, 101L, 10L), (1L, 101L, 20L), (2L, 102L, 10L), (3L, 103L, 10L), (3L, 103L, 30L))
    val rows = Graph.hits(o, li, 4).collect()
    val bySide = rows.groupBy(_.getString(0))
    assert(bySide.keySet == Set("authority", "hub"), s"both sides present: $bySide")
    for ((name, side) <- bySide) {
      val tot = side.map(_.getLong(2)).sum
      // each renorm truncates < 1 unit per row
      assert(tot <= Graph.Scale && tot > Graph.Scale - side.length - 1,
        s"$name mass not conserved: $tot vs ${Graph.Scale}")
    }
  }

  test("hits: the universally bought part tops authorities; the broad buyer tops hubs") {
    val (o, li) = hitsFixtures(
      (1L, 101L, 10L), (1L, 101L, 20L), (2L, 102L, 10L), (3L, 103L, 10L), (3L, 103L, 30L))
    val rows = Graph.hits(o, li, 4).collect()
    val auth = rows.filter(_.getString(0) == "authority")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val hub = rows.filter(_.getString(0) == "hub")
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(auth(10L) > auth(20L) && auth(10L) > auth(30L),
      s"part 10 (bought by all) must dominate: $auth")
    // customers 1 and 3 buy {popular, niche} symmetrically; 2 buys only
    // the popular part — fewer endorsements, lower hub score
    assert(hub(1L) == hub(3L) && hub(1L) > hub(2L), s"broad buyers must tie and lead: $hub")
  }

  // ---- hybrid retrieval ----

  test("hybridRrf: fused score is exactly the RRF of the component ranks") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val rows = Retrieval.hybridRrf(docs, emb, 20, 10).collect()
    assert(rows.map(_.getString(0)).distinct.length == 4, "all four queries retrieve")
    rows.foreach { r =>
      def term(i: Int): Double =
        if (r.isNullAt(i)) 0.0 else 1.0 / (60.0 + r.getLong(i))
      val expect = BigDecimal(term(2) + term(3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == expect, s"rrf mismatch: $r")
      assert(!(r.isNullAt(2) && r.isNullAt(3)), s"row from neither ranking: $r")
    }
    // per query, rank order follows rrf descending
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(5)).map(_.getDouble(4))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, "rrf must descend")
    }
  }

  // ---- chunking ----

  test("chunkDocs: stride starts, tail coverage, fingerprint determinism") {
    val text100 = (1 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text100), (2L, "a b"), (3L, "   ")).toDF("doc_id", "text")
    val out = Curation.chunkDocs(docs, 64, 48).collect()
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq((0L, 1L, 64L), (1L, 49L, 52L), (2L, 97L, 4L)),
      "chunk grid must be starts 1/49/97 with the short tail kept")
    // full token coverage: every token index falls in >= 1 chunk
    val covered = d1.flatMap(r => r.getLong(2) to (r.getLong(2) + r.getLong(3) - 1)).toSet
    assert(covered == (1L to 100L).toSet, "chunks must cover the whole document")
    assert(out.filter(_.getLong(0) == 2L).map(_.getLong(3)).toSeq == Seq(2L),
      "short doc = one short chunk")
    assert(!out.exists(_.getLong(0) == 3L), "token-less doc has no chunks")
    // identical chunk text => identical fingerprint (dedup key contract)
    val again = Curation.chunkDocs(docs, 64, 48).collect()
    assert(out.map(_.getLong(4)).toSeq == again.map(_.getLong(4)).toSeq)
  }

  // ---- zone-map pruning ----

  test("zonePrune: scanned bounds matched, and clustering prunes the point lookup") {
    // through the registered query so the scan-edge ts normalization
    // (nanos-Long vs NTZ fixture generations) is SparkEntry.t()'s problem
    val out = SparkEntry.queries("files_zone_prune")(spark, dir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val (files, read, scanned, matched) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(read <= files, s"files_read > n_files: $r")
      assert(scanned >= matched, s"zone maps may over-read, never under-read: $r")
    }
    val byKey = out.map(r => (r.getString(0), r.getString(1)) -> r.getLong(4)).toMap
    // ingest-time layout spreads every user across all files; the
    // clustering layouts must scan no more than it for the point lookup
    assert(byKey(("zorder", "user_point")) <= byKey(("time", "user_point")))
    assert(byKey(("hilbert", "user_point")) <= byKey(("time", "user_point")))
  }

  // ---- KMV join cardinality ----

  test("kmvJoinCardinality: exact when the sketches are not full") {
    val orders = Seq.tabulate(40)(i => (i.toLong % 10L)).toDF("o_custkey")
    val customer = Seq.tabulate(6)(i => (i.toLong, if (i % 2 == 0) "S" else "T"))
      .toDF("c_custkey", "c_mktsegment")
    val r = Sketches.kmvJoinCardinality(orders, customer, 256, "S").collect()(0)
    // keys 0,2,4 selected; each appears 4x in orders => exact join = 12
    assert(r.getAs[Long]("exact_join_rows") == 12L)
    assert(r.getAs[Double]("est_join_rows") == 12.0, s"sub-k sketch must be exact: $r")
    assert(r.getAs[Double]("est_intersection") == 3.0)
    assert(r.getAs[Double]("rel_error") == 0.0)
  }

  // ---- nDCG ----

  test("ivfNdcgAudit: probing every cell reproduces the exact ranking (nDCG = 1)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Similarity.ivfNdcgAudit(emb, 4, 5, 4, 4).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getAs[Double]("ndcg") - 1.0) < 1e-4,
        s"nprobe = nlist is exhaustive search; nDCG must be 1: $r")
    }
    ops.Caches.releaseCaches()
  }

  test("local clustering: hand graph — triangle node 1/3, closed pair 1.0, pendant undefined") {
    // basket 1 = {1,2,3} (a triangle), basket 2 = {1,4} (pendant 4):
    // deg 1=3, 2=2, 3=2, 4=1; T=1 for nodes 1..3 →
    // c(1) = 2/(3·2) = 333333 ppm (bucket 3), c(2) = c(3) = 1e6
    // (bucket 9), node 4 deg<2 → bucket −1
    val li = liDf(1L -> 1L, 1L -> 2L, 1L -> 3L, 2L -> 1L, 2L -> 4L)
    val got = Graph.localClustering(li, 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(-1L -> ((1L, 0L)), 3L -> ((1L, 333333L)),
      9L -> ((2L, 2000000L))), got)
    ops.Caches.releaseCaches()
  }
}
