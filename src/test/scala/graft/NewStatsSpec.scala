package graft

import graft.ops.{Analytics, Dedup, Profiling, TextAnalysis, TimeSeries}
import org.apache.spark.sql.functions._

/** Specs for the round-12 statistics additions (Theil–Sen trend,
  * sequential pattern support, Cramér's V, Kneser–Ney, b-bit MinHash):
  * each operator is checked against a hand-computed reference on a
  * crafted frame — engine parity is the oracle gate's job; these pin the
  * DEFINITIONS (exact slopes, support semantics, χ² extremes, the KN
  * rational arithmetic, the 1-bit estimator's exact-dup fixpoint).
  */
class NewStatsSpec extends SparkSpec {

  import spark.implicits._

  private def eventsOf(rows: Seq[(Long, Long, String)]) =
    rows.toDF("event_id", "us", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
      .withColumn("user_id", lit(1L))

  test("theil-sen: exact linear daily counts give the exact slope, MK S saturates") {
    // counts per day d = 2 + 3d (d = 0..4): every pair slope is exactly 3
    val rows = for {
      d <- 0L to 4L
      i <- 1L to (2 + 3 * d)
    } yield (d * 100 + i, d * 86400000000L + i, "click")
    val out = TimeSeries.theilSenDaily(eventsOf(rows)).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Long]("slope_x2_ppm") == 6000000L, r)
    assert(r.getAs[Long]("mk_s") == 10L && r.getAs[String]("trend") == "rising")
  }

  test("theil-sen: constant series is exactly flat") {
    val rows = for { d <- 0L to 3L; i <- 1L to 4L }
      yield (d * 10 + i, d * 86400000000L + i, "view")
    val r = TimeSeries.theilSenDaily(eventsOf(rows)).collect()(0)
    assert(r.getAs[Long]("slope_x2_ppm") == 0L)
    assert(r.getAs[Long]("mk_s") == 0L && r.getAs[String]("trend") == "flat")
  }

  test("sequence support: 'a then LATER b' counts non-adjacent order, per user once") {
    // user 1: a(1) b(2) a(3)  → supports a→b (1<2) and b→a (2<3)
    // user 2: b(10) a(11)     → supports b→a only
    val ev = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a"),
      (10L, 2L, "b"), (11L, 2L, "a"))
      .toDF("event_id", "user_id", "event_type")
    val out = Analytics.sequenceSupport(ev)
      .collect().map(r => (r.getAs[String]("consequent"), r.getAs[String]("antecedent"),
        r.getAs[Long]("n_users_ab"), r.getAs[Long]("support_ppm"),
        r.getAs[Long]("confidence_ppm"))).toSet
    assert(out == Set(
      ("b", "a", 1L, 500000L, 500000L),   // a→b: 1 of 2 users, conf 1/2
      ("a", "b", 2L, 1000000L, 1000000L)) // b→a: both users, conf 2/2
      , out.mkString(", "))
  }

  test("cramers V: perfectly coupled columns hit v2 = 1e6, independent columns hit 0") {
    def docsOf(rows: Seq[(String, String)]) = rows.toDF("lang", "source")
    // coupled 2x2: lang determines source; chi2 = N·min(r-1,c-1) = 20
    val coupled = Profiling.cramersV(docsOf(
      Seq.fill(10)(("l1", "s1")) ++ Seq.fill(10)(("l2", "s2")))).collect()(0)
    assert(coupled.getAs[Long]("chi2_ppm") == 20000000L, coupled)
    assert(coupled.getAs[Long]("v2_ppm") == 1000000L)
    assert(coupled.getAs[Long]("dof") == 1L)
    // independent 2x2: every cell at its expected count → chi2 exactly 0
    val indep = Profiling.cramersV(docsOf(
      Seq.fill(5)(("l1", "s1")) ++ Seq.fill(5)(("l1", "s2")) ++
      Seq.fill(5)(("l2", "s1")) ++ Seq.fill(5)(("l2", "s2")))).collect()(0)
    assert(indep.getAs[Long]("chi2_ppm") == 0L && indep.getAs[Long]("v2_ppm") == 0L)
  }

  test("kneser-ney: hand-computed rationals on a 3-doc corpus; observed mass sums to 1") {
    // bigrams: "a b"×2, "a c"×1 → c1(a)=3, N1+(a·)=2, N1+(·b)=N1+(·c)=1, T=2
    // p(b|a) = [(8−3)·2 + 3·2·1]·1e9 // 24 = 666666666
    // p(c|a) = [(4−3)·2 + 3·2·1]·1e9 // 24 = 333333333
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val out = TextAnalysis.knProbability(docs, 50).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        (r.getAs[Long]("p_kn_ppb"), r.getAs[Long]("p_mle_ppb")))).toMap
    assert(out(("a", "b")) == ((666666666L, 666666666L)), out)
    assert(out(("a", "c")) == ((333333333L, 333333333L)), out)
    // all continuation mass lands on observed bigrams here → sums to 1
    // up to the two truncating divisions
    assert(out.values.map(_._1).sum == 999999999L)
  }

  test("b-bit minhash: exact-duplicate pairs are a fixpoint of both estimators; ppm bounds hold") {
    // docs 1 and 2 share identical text → identical shingle sets →
    // identical signatures → the pair must surface with all three
    // measures at exactly 1e6
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, txt), (2L, txt),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val rows = Dedup.bbitMinhashAudit(docs).collect()
    val byPair = rows.map(r => ((r.getLong(0), r.getLong(1)),
      (r.getAs[Long]("jaccard_ppm"), r.getAs[Long]("est_full_ppm"),
        r.getAs[Long]("est_1bit_ppm")))).toMap
    assert(byPair((1L, 2L)) == ((1000000L, 1000000L, 1000000L)), byPair)
    rows.foreach { r =>
      Seq("jaccard_ppm", "est_full_ppm", "est_1bit_ppm").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 1000000L, s"$c=$v out of [0, 1e6]")
      }
    }
    // the planted near-dup twins (doc_id + 1e6, ' zz qq zz' appended)
    // must also be candidates, at high-but-not-perfect exact Jaccard
    assert(byPair.contains((1L, 1000001L)))
    val (j, _, _) = byPair((3L, 1000003L))
    assert(j > 500000L && j < 1000000L, j)
  }

  private def changelogOf(rows: Seq[(Long, Long, Long)]) =
    rows.toDF("pk", "pos", "es")
      .withColumn("tbl", lit("t"))
      .withColumn("ts", expr("timestamp_micros(es * 1000000)"))
      .withColumn("op", lit("u")).withColumn("value", lit(1.0))

  test("hot keys: crafted bursts — island segmentation, hot-key count, exact burst share") {
    // pk 1: three changes 100s apart (one burst of 3) + one isolated
    // pk 2: two isolated changes → never hot
    val cl = changelogOf(Seq(
      (1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 200L), (1L, 4L, 999999L),
      (2L, 5L, 0L), (2L, 6L, 50000L)))
    val r = graft.ops.Metrics.hotKeys(cl, 7200L, 3L).collect()(0)
    assert((r.getAs[Long]("n_keys"), r.getAs[Long]("n_changes"),
      r.getAs[Long]("n_hot_keys"), r.getAs[Long]("n_bursts"),
      r.getAs[Long]("max_burst"), r.getAs[Long]("burst_changes"),
      r.getAs[Long]("burst_share_ppm")) ==
      ((2L, 6L, 1L, 1L, 3L, 3L, 500000L)), r)
  }

  test("conflation savings: crafted windows — survivor timing, exact reduction and staleness") {
    // pk 1 window 0 holds es {0, 100, 200}: survivor ts 200, dropped
    // staleness 200 + 100 = 300s; everything else is alone in its window
    val cl = changelogOf(Seq(
      (1L, 1L, 0L), (1L, 2L, 100L), (1L, 3L, 200L), (1L, 4L, 999999L),
      (2L, 5L, 0L), (2L, 6L, 50000L)))
    val r = graft.ops.Metrics.conflationSavings(cl, 3600L).collect()(0)
    assert((r.getAs[Long]("n_changes"), r.getAs[Long]("n_written"),
      r.getAs[Long]("n_conflated"), r.getAs[Long]("reduction_ppm"),
      r.getAs[Long]("total_staleness_s"), r.getAs[Long]("mean_staleness_s"),
      r.getAs[Long]("max_window_staleness_s")) ==
      ((6L, 4L, 2L, 333333L, 300L, 150L, 300L)), r)
  }
}
