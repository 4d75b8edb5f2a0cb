package graft

import graft.ops.{Analytics, Similarity, TimeSeries}
import org.apache.spark.sql.functions._

/** Specs for the round-7 iterative / statistical additions: changepoint
  * detection recovers a planted level shift, association rules match a
  * hand-computed toy basket, and power iteration recovers a planted
  * dominant direction.
  */
class IterativeOpsSpec extends SparkSpec {

  import spark.implicits._

  test("changepoint recovers a planted level shift") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 40 hours: mean 10 for hours 0-19, mean 50 for hours 20-39
    val events = (0 until 40).flatMap { h =>
      val v = if (h < 20) 10.0 else 50.0
      Seq((h.toLong * 2, h, v), (h.toLong * 2 + 1, h, v + 2.0))
    }.map { case (id, h, v) =>
      (id, java.sql.Timestamp.from(base.plusSeconds(h * 3600L)), 1L, "click", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = TimeSeries.changepointHourly(events).collect().head
    assert(r.getAs[Long]("n_before") === 20L)
    assert(r.getAs[Long]("n_after") === 20L)
    assert(math.abs(r.getAs[Double]("mean_before") - 11.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean_after") - 51.0) < 1e-6)
    assert(r.getAs[Double]("variance_reduction") > 0)
  }

  test("association rules match hand-computed support/confidence/lift") {
    // 4 baskets over brands A, B, C: {A,B}, {A,B}, {A,C}, {B}
    val lineitem = Seq(
      (1L, 101L), (1L, 102L), (2L, 101L), (2L, 102L),
      (3L, 101L), (3L, 103L), (4L, 102L))
      .toDF("l_orderkey", "l_partkey")
    val part = Seq((101L, "A"), (102L, "B"), (103L, "C"))
      .toDF("p_partkey", "p_brand")
    val rules = Analytics.associationRules(lineitem, part, 1L, 50)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
      .toMap
    // A→B: n_ab=2, support=2/4, conf=2/3, lift=(2*4)/(3*3)
    val (nab, sup, conf, lift) = rules(("A", "B"))
    assert(nab === 2L && sup === 0.5)
    assert(math.abs(conf - 2.0 / 3) < 1e-6)
    assert(math.abs(lift - 8.0 / 9) < 1e-6)
    // C→A: conf = 1.0, lift = 4/3
    assert(rules(("C", "A"))._3 === 1.0)
  }

  test("power iteration recovers a planted dominant direction") {
    // vectors clustered along e1 with noise in e2..e4
    val vecs = (0 until 200).map { i =>
      val sign = if (i % 2 == 0) 1.0f else -1.0f
      (i.toLong, Array(sign * 10.0f, (i % 3 - 1) * 0.5f, (i % 5 - 2) * 0.3f, 0.1f),
        0)
    }.toDF("vec_id", "embedding", "label")
    val out = Similarity.powerIterationTop(vecs, 4, 4).collect()
    assert(out.length === 4)
    val dir = out.map(_.getAs[Double]("direction"))
    // dominant mass on dim 1
    assert(math.abs(dir(0)) > 0.99, s"direction ${dir.toSeq}")
    // unit norm
    assert(math.abs(dir.map(d => d * d).sum - 1.0) < 1e-3)
    // rayleigh λ = Σᵢ(xᵢ·ŵ)² ≈ 200 vectors · (±10)² = 20 000
    val ray = out.head.getAs[Double]("rayleigh")
    assert(ray > 19000 && ray < 21000, s"rayleigh $ray")
  }
}
