package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics beside [[Dedup]]'s connected components —
  * here weighted PageRank, the importance measure a catalog/recommender
  * pipeline runs over a co-occurrence graph.
  *
  * Everything is FIXED-POINT integer arithmetic (ranks in units of
  * 1e-12, "picoranks"): each iteration is only BIGINT multiply /
  * truncating divide / order-free SUM, so the result is bit-identical
  * across engines and partitionings — no float summation order, no
  * rounding-boundary hazards, and the DuckDB oracle unrolls the same
  * iterations as chained CTEs (the [[Layout.hilbertFileStatsSql]]
  * device). Truncating division on non-negative operands is identical in
  * Spark (`DIV`) and DuckDB (`//`).
  *
  * Scale shape: one iteration = one join of the rank frame to the
  * pre-partitioned edge frame + one partial-agged groupBy on dst — the
  * same shuffle-on-key pattern as connected components, O(|E|) per
  * round with map-side combine. The edge frame is built once and
  * persisted; rank frames are O(|V|). Dangling mass never arises: the
  * co-purchase graph is symmetric, so every node has out-edges.
  */
object Graph {

  /** Rank mass scale: 1.0 of total rank = 1e12 picoranks. */
  val Scale: Long = 1000000000000L

  /** Distinct (order, part) pairs → symmetric directed co-purchase
    * edges weighted by the number of shared orders. Self-join fan-out is
    * bounded by basket width (not corpus size), the same bound
    * [[Analytics.basketPairs]] documents.
    */
  private def coPurchaseEdges(lineitem: DataFrame): DataFrame = {
    val li = lineitem.select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") =!= col("b.pk"))
      .groupBy(col("a.pk").as("src"), col("b.pk").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank (damping 0.85) over the part co-purchase graph,
    * `iterations` fixed rounds from a uniform start. Output: every node
    * with its final picorank (the exact integer the oracle must
    * reproduce) and its rank share.
    */
  def pagerank(lineitem: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1: $iterations")
    val edges = Caches.tracked(coPurchaseEdges(lineitem).persist())
    val outW = edges.groupBy(col("src")).agg(sum(col("w")).as("out_w"))
    val e = Caches.tracked(edges.join(outW, "src")
      .select(col("src"), col("dst"), col("w"), col("out_w")).persist())
    val nodes = Caches.tracked(edges.select(col("src").as("node")).distinct().persist())
    val n = nodes.count() // scalar probe: |V|, the teleport denominator
    if (n == 0L) // edgeless input (no order holds two distinct parts)
      return nodes.select(col("node"), lit(0L).as("rank_e12"), lit(0.0).as("share"))
    val tele = (Scale * 15L) / (100L * n)
    var rank = nodes.withColumn("rank", lit(Scale / n))
    for (_ <- 1 to iterations) {
      val contrib = e.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("CAST((rank * w) DIV out_w AS BIGINT)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      rank = Caches.tracked(nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(tele) + expr("CAST((85 * coalesce(s, 0)) DIV 100 AS BIGINT)")).as("rank"))
        .persist())
    }
    // share left UNROUNDED: rank < 2^53 converts to double exactly and
    // the division by 1e12 is correctly rounded in both engines, so the
    // doubles are bit-identical — rounding would only add a boundary
    rank.select(col("node"), col("rank").as("rank_e12"),
        (col("rank").cast("double") / lit(Scale.toDouble)).as("share"))
      .orderBy("node")
  }

  /** Synchronous weighted label propagation — community detection over
    * the same co-purchase graph. Every node starts labeled with its own
    * id; each round it adopts the label with the largest incident edge
    * mass among its neighbors' current labels plus a weight-1 self-vote
    * (the self-vote anchors converged regions; ties break to the
    * SMALLEST label, making sync rounds fully deterministic). Fixed
    * `rounds` rounds — like the PageRank above, everything is BIGINT
    * (vote mass × 1e8 − label composite argmax), so both engines agree
    * bit-for-bit and the oracle unrolls the rounds as CTEs.
    *
    * Scale shape: one round = edge-frame join + two partial-agged
    * groupBys on (dst, label) then dst — the CC/PageRank shuffle
    * pattern, O(|E|) per round. Labels assumed < 1e8 (fixture part keys
    * are ≪; a larger id space widens the composite multiplier).
    */
  def labelPropagation(lineitem: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val edges = Caches.tracked(coPurchaseEdges(lineitem).persist())
    val nodes = Caches.tracked(edges.select(col("src").as("node")).distinct().persist())
    var labels = nodes.withColumn("label", col("node"))
    for (_ <- 1 to rounds) {
      val votes = edges.join(labels, col("src") === col("node"))
        .select(col("dst"), col("label"), col("w"))
        .unionByName(labels.select(col("node").as("dst"), col("label"), lit(1L).as("w")))
        .groupBy(col("dst"), col("label")).agg(sum(col("w")).as("cnt"))
      labels = Caches.tracked(votes
        .groupBy(col("dst"))
        .agg(max_by(col("label"), col("cnt") * lit(100000000L) - col("label")).as("label"))
        .select(col("dst").as("node"), col("label"))
        .persist())
    }
    labels.select(col("node"), col("label").as("community")).orderBy("node")
  }

  def labelPropagationSql(rounds: Int): String = {
    val steps = (1 to rounds).map { i =>
      s"""v$i AS (
         |  SELECT dst, label, sum(w) AS cnt FROM (
         |    SELECT e.dst, l${i - 1}.label, e.w FROM e JOIN l${i - 1} ON e.src = l${i - 1}.node
         |    UNION ALL
         |    SELECT node AS dst, label, CAST(1 AS BIGINT) AS w FROM l${i - 1})
         |  GROUP BY dst, label),
         |l$i AS (
         |  SELECT dst AS node, arg_max(label, cnt * 100000000 - label) AS label
         |  FROM v$i GROUP BY dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |ed AS (
       |  SELECT a.pk AS src, b.pk AS dst, CAST(count(*) AS BIGINT) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |  GROUP BY a.pk, b.pk),
       |e AS (SELECT src, dst, w FROM ed),
       |nodes AS (SELECT DISTINCT src AS node FROM ed),
       |l0 AS (SELECT node, node AS label FROM nodes),
       |$steps
       |SELECT node, label AS community FROM l$rounds ORDER BY node""".stripMargin
  }

  def pagerankSql(iterations: Int): String = {
    val steps = (1 to iterations).map { i =>
      s"""c$i AS (
         |  SELECT e.dst, sum((r${i - 1}.rank * e.w) // e.out_w) AS s
         |  FROM r${i - 1} JOIN e ON r${i - 1}.node = e.src GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.node,
         |         CAST((1000000000000 * 15) // (100 * nn.n)
         |              + (85 * coalesce(c$i.s, 0)) // 100 AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN c$i ON n.node = c$i.dst, nn)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
       |ed AS (
       |  SELECT a.pk AS src, b.pk AS dst, CAST(count(*) AS BIGINT) AS w
       |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
       |  GROUP BY a.pk, b.pk),
       |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM ed GROUP BY src),
       |e AS (SELECT ed.src, ed.dst, ed.w, ow.out_w FROM ed JOIN ow ON ed.src = ow.src),
       |nodes AS (SELECT DISTINCT src AS node FROM ed),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, 1000000000000 // nn.n AS rank FROM nodes, nn),
       |$steps
       |SELECT node, rank AS rank_e12,
       |       CAST(rank AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS share
       |FROM r$iterations ORDER BY node""".stripMargin
  }
}
