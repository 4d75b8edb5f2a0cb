package graft

import graft.ops.Graph

/** Property sweep for label propagation's self-vote FOLD (round 9): the
  * exchange-free round folds the unit self-vote arithmetically — +1 on
  * a vote row matching the node's own label, and a `best >= self-key`
  * comparison when the own label drew no neighbor votes — instead of
  * unioning a (node, own-label, 1) row before the vote aggregation.
  * The fold must be EXACTLY the unioned semantics on every graph shape,
  * tie included (key equality implies the same label, so `>=` cannot
  * flip a winner). The sweep checks the Spark implementation against a
  * driver-side reference that literally unions the self-vote, across
  * seeded random basket graphs and 1..4 rounds, plus the tie-heavy
  * shapes (sparse pairs, symmetric stars) where self-vote keys collide
  * with neighbor-vote keys most often.
  */
class LpPropertySpec extends SparkSpec {

  import spark.implicits._

  /** Reference semantics: co-purchase edges from baskets, then `rounds`
    * synchronous rounds of the UNIONED formulation — neighbor votes by
    * edge weight plus a weight-1 self-vote row, argmax of
    * cnt·1e8 − label per node.
    */
  private def reference(baskets: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    val li = baskets.distinct
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val w = collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
    for ((_, parts) <- byOrder; a <- parts; b <- parts if a != b) w((a, b)) += 1L
    val nodes = w.keys.map(_._1).toSeq.distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      val votes = collection.mutable.Map.empty[(Long, Long), Long].withDefaultValue(0L)
      for (((s, d), wt) <- w) votes((d, lab(s))) += wt
      for (n <- nodes) votes((n, lab(n))) += 1L // the unioned self-vote
      lab = votes.toSeq.groupBy(_._1._1).map { case (dst, vs) =>
        dst -> vs.map { case ((_, l), c) => (c * 100000000L - l, l) }.max._2
      }
    }
    lab
  }

  test("random basket sweep: folded self-vote equals the unioned reference") {
    (1 to 10).foreach { seed =>
      var x = seed.toLong * 2654435761L + 7
      def next(bound: Int): Long = {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        java.lang.Math.floorMod(x, bound.toLong)
      }
      val nOrders = 3 + seed
      val baskets = (0 until (6 + seed * 5)).map(_ => (next(nOrders), 1 + next(12)))
      val rounds = 1 + (seed % 4)
      val got = Graph.labelPropagation(baskets.toDF("l_orderkey", "l_partkey"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = reference(baskets, rounds)
      assert(got == want, s"[seed=$seed rounds=$rounds] fold diverged from union: " +
        s"got ${got.toSeq.sorted}, want ${want.toSeq.sorted}")
    }
  }

  test("tie-heavy shapes: sparse pairs and symmetric stars") {
    // a lone pair: each node's neighbor vote (cnt 1) ties its self-vote
    // key structure maximally — smallest label must win on both sides
    val pair = Seq((1L, 10L), (1L, 20L))
    // a 4-leaf star: every leaf's sole neighbor vote vs its own label
    val star = Seq((1L, 5L), (1L, 6L), (2L, 5L), (2L, 7L), (3L, 5L), (3L, 8L))
    for (baskets <- Seq(pair, star); rounds <- 1 to 4) {
      val got = Graph.labelPropagation(baskets.toDF("l_orderkey", "l_partkey"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(baskets, rounds), s"[$baskets rounds=$rounds]")
    }
  }
}
