package graft

import graft.ops.{Analytics, Dedup, Graph, TimeSeries}
import org.apache.spark.sql.functions._

/** Specs for the later round-7 audits: hybrid/bitext dedup invariants,
  * ABC-XYZ partition totals, peak recovery, and modularity/assortativity
  * on planted graphs.
  */
class AuditOpsSpec extends SparkSpec {

  import spark.implicits._

  private val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("t-closeness: class equal to the global mix scores 0; concentrated and split classes hit exact TVD") {
    // bands: acctbal/1000 → band 0 or 1. Global = 9×b0 + 3×b1 (p = .75/.25).
    // class C mirrors it exactly → t_ppm 0; A is 50/50 and B all-b0 → both
    // TVD .25 = 250000 ppm by the cross-multiplied integers (s=24, 2kN=96).
    val cust = (Seq.fill(2)((1, 500.0)) ++ Seq.fill(2)((1, 1500.0)) ++
      Seq.fill(4)((2, 500.0)) ++ Seq.fill(3)((3, 500.0)) ++ Seq((3, 1500.0)))
      .zipWithIndex.map { case ((n, bal), i) => (i.toLong, n, "X", bal) }
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.ops.Scrub.tCloseness(cust, 200000L).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      (1, 4L, 2L, 250000L, false),
      (2, 4L, 1L, 250000L, false),
      (3, 4L, 2L, 0L, true)), got.toSeq)
  }

  test("EM match weights: separated populations make the name features discriminative; outputs stay in ppm range") {
    // Brand#1 holds a 3-clone cluster ("red widget", sizes 10/10/11 —
    // every in-cluster pair agrees on all three features) plus three
    // unrelated parts; cross pairs disagree on the name tokens. EM with
    // no labels must end with m > u on both name features (agreement
    // evidence concentrates in the match class) and every published
    // probability inside [0, 1e6].
    val parts = Seq(
      (1L, "red widget", "Brand#1", 10), (2L, "red widget", "Brand#1", 10),
      (3L, "red widget", "Brand#1", 11), (4L, "blue bolt", "Brand#1", 30),
      (5L, "green gear", "Brand#1", 44), (6L, "grey cog", "Brand#1", 7))
      .toDF("p_partkey", "p_name", "p_brand", "p_size")
    val got = graft.ops.EntityResolution.emWeights(parts, 4).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(6))))
      .toMap
    assert(got.keySet == Set("name_tok1", "name_tok2", "size_within1"))
    got.values.foreach { case (m, u, _, nPairs) =>
      assert(m >= 0L && m <= 1000000L && u >= 0L && u <= 1000000L)
      assert(nPairs == 15L) // C(6,2) in-block pairs
    }
    Seq("name_tok1", "name_tok2").foreach { f =>
      val (m, u, wAgree, _) = got(f)
      assert(m > u, s"$f: m=$m u=$u — agreement must be match evidence")
      assert(wAgree > 1000000L, s"$f: w_agree=$wAgree must exceed 1 (ppm)")
    }
  }

  test("EM match weights: deterministic across repartitionings of the input") {
    val parts = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val a = graft.ops.EntityResolution.emWeights(parts, 4).collect().toSeq
    val b = graft.ops.EntityResolution.emWeights(parts.repartition(7), 4).collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.forall(r => r.getLong(5) >= 0L && r.getLong(5) <= 1000000L))
  }

  test("hybrid verify: accepted implies cosine above threshold; pairs ordered unique") {
    val rows = Dedup.hybridVerify(docs, emb, 0.5).collect()
    rows.foreach { r =>
      val a = r.getAs[Long]("doc_a"); val b = r.getAs[Long]("doc_b")
      assert(a < b)
      val ej = r.getAs[Double]("est_jaccard")
      assert(ej >= 0.0 && ej <= 1.0)
      if (r.getAs[Boolean]("accepted")) assert(r.getAs[Double]("cosine") >= 0.5)
    }
    val keys = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.distinct.length === keys.length)
  }

  test("bitext candidates are strictly cross-language") {
    val rows = Dedup.bitextCandidates(docs, emb, 16, 8, 64, 0.3).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") !== r.getAs[String]("lang_b"))
    }
  }

  test("ABC-XYZ classes partition all parts and shares sum to ~1") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val li = raw.schema("l_shipdate").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("l_shipdate", expr("timestamp_micros(l_shipdate div 1000)"))
      case _ => raw.withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    }
    val m = Analytics.abcXyz(li).collect()
    val nParts = li.select("l_partkey").distinct().count()
    assert(m.map(_.getAs[Long]("n_parts")).sum === nParts)
    val share = m.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(share - 1.0) < 1e-4, s"shares sum to $share")
    // every class label well-formed
    m.foreach { r =>
      assert(Set("A", "B", "C").contains(r.getAs[String]("abc")))
      assert(Set("X", "Y", "Z").contains(r.getAs[String]("xyz")))
    }
  }

  test("peak detection recovers a planted spike") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val events = (0 until 24).flatMap { h =>
      val v = if (h == 12) 100.0 else 10.0
      Seq((h.toLong, java.sql.Timestamp.from(base.plusSeconds(h * 3600L)), 1L, "click", v, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val peaks = TimeSeries.peakDetection(events).collect()
    assert(peaks.length === 1)
    assert(peaks.head.getAs[java.sql.Timestamp]("peak_hour").toInstant ===
      base.plusSeconds(12 * 3600L))
    assert(peaks.head.getAs[Double]("peak_value") === 100.0)
  }

  test("modularity is high on a planted two-clique co-purchase graph") {
    // two disjoint 4-part cliques: orders 1..3 buy parts 1-4, orders 4..6 buy 5-8
    val li = (1 to 3).flatMap(o => (1 to 4).map(p => (o.toLong, p.toLong))) ++
      (4 to 6).flatMap(o => (5 to 8).map(p => (o.toLong, p.toLong)))
    val df = li.toDF("l_orderkey", "l_partkey")
    val r = Graph.modularity(df, 4).collect().head
    assert(r.getAs[Long]("n_communities") === 2L)
    // perfect 2-community split of 2 cliques: Q = 1/2 exactly
    assert(math.abs(r.getAs[Double]("modularity") - 0.5) < 1e-6)
  }

  test("assortativity is defined and in [-1, 1] on the fixture graph") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = Graph.assortativity(li).collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0, s"assortativity $a")
  }

  test("price-volume-mix bridge telescopes: effects sum to delta revenue") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val li = raw.schema("l_shipdate").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("l_shipdate", expr("timestamp_micros(l_shipdate div 1000)"))
      case _ => raw.withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    }
    val r = Analytics.priceVolumeMix(li, 1997, 1998).collect().head
    val delta = r.getAs[Double]("delta_revenue")
    val sum = r.getAs[Double]("price_effect") + r.getAs[Double]("volume_effect") +
      r.getAs[Double]("new_parts_effect") + r.getAs[Double]("discontinued_effect")
    // per-part identity telescopes exactly; only 1e-4 quantization dust
    assert(math.abs(delta - sum) < 1.0, s"delta $delta vs effects $sum")
    assert(math.abs(r.getAs[Double]("residual")) < 1.0)
  }

  test("SLO alerts fire exactly on hours exceeding both burn thresholds") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    // 12 quiet hours (1 error / 10 events), then 2 loud hours (6/10)
    val events = (0 until 14).flatMap { h =>
      val errs = if (h >= 12) 6 else 1
      (0 until 10).map { i =>
        (h.toLong * 100 + i, java.sql.Timestamp.from(base.plusSeconds(h * 3600L + i)),
          1L, if (i < errs) "error" else "view", 1.0, "{}")
      }
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val alerts = ops.TimeSeries.sloBurnRate(events, 250L, 1200L, 1000L).collect()
    // loud hours: rate_1h = 0.6 > 0.3; 6h rate = (6+5·1)/60 ≈ 0.183 at
    // hour 12 (< 0.25) but (6+6+4·1)/60 ≈ 0.267 at hour 13 → only hour 13
    assert(alerts.length === 1, alerts.mkString(","))
    assert(alerts.head.getAs[java.sql.Timestamp]("hour").toInstant ===
      base.plusSeconds(13 * 3600L))
  }
}
