package graft

import graft.ops.Dedup

/** Property sweep for the star-contraction components' STRUCTURAL
  * fixpoint test (round 9: "no node is both a center and a member"
  * decided on the round output, replacing the confirming round).
  * Star-contraction and min-label propagation must produce identical
  * (doc_id, cluster, cluster_size) frames on every graph shape — the
  * deterministic-seed sweep covers mixtures of chains, cliques, stars,
  * duplicate and reversed edges, and graphs denser than anything the
  * LSH pair generator emits.
  */
class CcPropertySpec extends SparkSpec {

  import spark.implicits._

  private def compare(edges: Seq[(Long, Long)], tag: String): Unit = {
    val pairs = edges.toDF("doc_a", "doc_b")
    val byStars = Dedup.connectedComponentsStars(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byLabels = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(byStars == byLabels, s"[$tag] star vs min-label diverged")
  }

  test("random-graph sweep: star fixpoint equals min-label on 12 seeded graphs") {
    // xorshift-ish deterministic generator; density and node-id spread
    // vary per seed so components range from singleton pairs to one
    // giant blob with internal chains
    (1 to 12).foreach { seed =>
      var x = seed.toLong * 2654435761L + 1
      def next(bound: Int): Long = {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        java.lang.Math.floorMod(x, bound.toLong)
      }
      val nodes = 10 + seed * 7
      val nEdges = 5 + seed * 11
      val edges = (0 until nEdges).map(_ => (next(nodes), next(nodes)))
        .filter { case (a, b) => a != b }
      compare(edges, s"seed=$seed nodes=$nodes edges=${edges.size}")
    }
  }

  test("no-confirming-round contract: a star input converges in exactly 1 round") {
    // the round maps a min-centered star set to itself and the
    // structural check detects it immediately — the rounds+1 → rounds
    // device this spec pins against regression
    val pairs = ((1L to 8L).map(i => (0L, i)) ++ Seq((20L, 21L), (20L, 22L)))
      .toDF("doc_a", "doc_b")
    val (out, rounds) = Dedup.connectedComponentsStarsWithRounds(pairs)
    assert(rounds == 1, s"star-set input should converge in 1 round, took $rounds")
    assert(out.collect().length == 12)
  }

  test("two-center counterexample: path 1-4-3-5-2 must not converge early") {
    // round 1 of this path yields {(1,3),(1,4),(2,3),(2,5)} — disjoint
    // a/b sets (passes the a-as-b test alone) but node 3 sits under TWO
    // centers; the fixpoint test must also require each b exactly once,
    // else the loop splits one component of 5 into two clusters of 3
    val pairs = Seq((1L, 4L), (3L, 4L), (3L, 5L), (2L, 5L)).toDF("doc_a", "doc_b")
    val (out, rounds) = Dedup.connectedComponentsStarsWithRounds(pairs)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == (1L to 5L).map(i => (i, 1L, 5L)),
      s"expected one component of 5 centered at 1, got $rows (rounds=$rounds)")
    compare(Seq((1L, 4L), (3L, 4L), (3L, 5L), (2L, 5L)), "path-1-4-3-5-2")
  }

  test("adversarial shapes: chains, bridged cliques, dup/reversed edges, empty") {
    // worst case for min-label (min at the far end of a long chain),
    // easy case it must not break for stars
    compare((0L until 40L).map(i => (i + 1, i)), "chain-41-reversed")
    // two cliques bridged by one edge + duplicate and reversed copies
    val k1 = for (a <- 0L until 6L; b <- 0L until 6L if a < b) yield (a, b)
    val k2 = for (a <- 100L until 106L; b <- 100L until 106L if a < b) yield (b, a)
    compare(k1 ++ k2 ++ Seq((5L, 100L), (100L, 5L), (5L, 100L)), "bridged-cliques")
    // hub star with reversed spokes (already a fixpoint shape: 1 round)
    compare((1L to 12L).map(i => (i, 0L)), "star-reversed-spokes")
    compare(Seq.empty[(Long, Long)], "empty")
    compare(Seq((7L, 3L)), "single-edge")
  }
}
