package graft

import graft.ops.Analytics
import org.apache.spark.sql.DataFrame

/** Ordered-funnel and cohort-retention semantics on hand-built event
  * logs: the funnel is sequence-sensitive (stage k counts only users who
  * did stage k AFTER completing stage k-1), retention cells are keyed by
  * Monday-truncated cohort week and exact week offsets.
  */
class AnalyticsOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex.map { case ((u, t, tp), i) => (i.toLong, ts(t), u, tp) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: stages count only in-order completions") {
    val ev = events(
      // user 1: view -> click -> purchase, fully in order
      (1L, "2026-01-05 10:00:00", "view"),
      (1L, "2026-01-05 11:00:00", "click"),
      (1L, "2026-01-05 12:00:00", "purchase"),
      // user 2: clicked BEFORE first view; purchase without an in-order click
      (2L, "2026-01-05 09:00:00", "click"),
      (2L, "2026-01-05 10:00:00", "view"),
      (2L, "2026-01-05 11:00:00", "purchase"),
      // user 3: view only
      (3L, "2026-01-05 10:00:00", "view"))
    val got = Analytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("view", 1L, 3L), ("click", 2L, 1L), ("purchase", 3L, 1L)))
  }

  test("funnel: ties on the completion timestamp do not count (strictly after)") {
    val ev = events(
      (1L, "2026-01-05 10:00:00", "view"),
      (1L, "2026-01-05 10:00:00", "click"))
    val got = Analytics.funnel(ev, Seq("view", "click"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(got == Seq(("view", 1L), ("click", 0L)))
  }

  test("retention: cohort week is the Monday of the first event; offsets are exact weeks") {
    // 2026-01-05 is a Monday
    val ev = events(
      (1L, "2026-01-06 10:00:00", "view"),  // u1 cohort week 2026-01-05
      (1L, "2026-01-20 10:00:00", "view"),  // u1 active again in week 2
      (2L, "2026-01-07 10:00:00", "view"))  // u2 same cohort, week 0 only
    val got = Analytics.retention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("2026-01-05", 0L, 2L), ("2026-01-05", 2L, 1L)))
  }

  test("attribution: last in-window click wins; stale and missing clicks give NULL") {
    val ev = events(
      // user 1: two clicks, the later one (id 1) should be credited
      (1L, "2026-01-05 10:00:00", "click"),   // event_id 0
      (1L, "2026-01-05 10:30:00", "click"),   // event_id 1
      (1L, "2026-01-05 10:45:00", "purchase"),// event_id 2 → click 1, lag 15 min
      // user 2: click 2h before purchase → outside the 1h window
      (2L, "2026-01-05 08:00:00", "click"),   // event_id 3
      (2L, "2026-01-05 10:00:00", "purchase"),// event_id 4 → NULL
      // user 3: purchase with no click at all
      (3L, "2026-01-05 10:00:00", "purchase"))// event_id 5 → NULL
    val got = Analytics.lastTouchAttribution(ev, 3600L).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((2L, 1L, 900L * 1000000L), (4L, -1L, -1L), (5L, -1L, -1L)))
  }

  test("attribution: a click at the same timestamp as the purchase counts (comes first by id)") {
    val ev = events(
      (1L, "2026-01-05 10:00:00", "click"),    // event_id 0
      (1L, "2026-01-05 10:00:00", "purchase")) // event_id 1 → click 0, lag 0
    val got = Analytics.lastTouchAttribution(ev, 3600L).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L, 0L)))
  }

  test("entity resolution: every dirty record resolves to its origin; duplicate names tie to min id") {
    import org.apache.spark.sql.DataFrame
    val registry: DataFrame = Seq(
      (10L, "red widget", "Brand#1"),
      (11L, "blue bolt", "Brand#1"),
      (12L, "blue bolt", "Brand#1"),  // duplicate name in the same block
      (13L, "red widget", "Brand#2")  // same name, different block
    ).toDF("p_partkey", "p_name", "p_brand")
    val got = ops.EntityResolution.resolve(registry, 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // 11 and 12 corrupt to 1-distance readings of "blue bolt"; both match
    // BOTH registry rows (ambiguous) and tie-break to the min id 11
    assert(got(1000010L) == (10L, 1L, 1L))
    assert(got(1000011L) == (11L, 1L, 2L))
    assert(got(1000012L) == (11L, 1L, 2L))
    // blocked: dirty "red widget" of Brand#2 never sees Brand#1's copy
    assert(got(1000013L) == (13L, 1L, 1L))
  }

  test("markov stationary: hand-unrolled fixed-point on a 2-state chain") {
    import spark.implicits._
    // one user, sequence a,a,b,a (by event_id): transitions a→a, a→b, b→a
    // → p(a,a)=p(a,b)=500000 ppm, p(b,a)=1000000 ppm. From x0=(500000,
    // 500000), six truncating-DIV rounds give (664062, 335937) — the
    // same integers DuckDB's // produces (hand-unrolled here).
    val ev = Seq(
      (1L, 1L, "a"), (2L, 1L, "a"), (3L, 1L, "b"), (4L, 1L, "a"))
      .toDF("event_id", "user_id", "event_type")
    val got = Analytics.markovStationary(ev, 6).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 2L, 664062L), ("b", 1L, 335937L)), got.toSeq)
    // truncation leaks at most 1 ppm per state per round; never inflates
    val mass = got.map(_._3).sum
    assert(mass <= 1000000L && mass >= 1000000L - 6 * 2, s"mass=$mass")
  }

  test("shapley attribution: hand game — solo channel 3/4, assist 1/4, untouched 0; efficiency holds") {
    import spark.implicits._
    // u1: click → purchase (solo click conversion); u2: click, view →
    // purchase (view only ever converts alongside click); u3: view, no
    // purchase. φ·24: click 36, view 12, error/signup 0; total 48 = 24·v(full)
    val ev = Seq(
      (0L, 1L, "click"), (1L, 1L, "purchase"),
      (0L, 2L, "click"), (1L, 2L, "view"), (2L, 2L, "purchase"),
      (0L, 3L, "view"))
      .zipWithIndex.map { case ((us, u, et), i) => (us, u, et, i.toLong) }
      .toDF("us", "user_id", "event_type", "event_id")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(us)")).drop("us")
    val got = Analytics.shapleyAttribution(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(got("click") == ((36L, 48L, 750000L)), got)
    assert(got("view") == ((12L, 48L, 250000L)), got)
    assert(got("error") == ((0L, 48L, 0L)) && got("signup") == ((0L, 48L, 0L)), got)
  }

  test("markov attribution: hand chain solves exactly; absent state degrades to NULL, loudly") {
    import spark.implicits._
    def ev(rows: (Long, Long, String)*) = rows.toSeq.zipWithIndex
      .map { case ((us, u, et), i) => (us, u, et, i.toLong) }
      .toDF("us", "user_id", "event_type", "event_id")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(us)")).drop("us")
    // u1: click → CONV; u2: view → NULL; u3: error → signup → CONV
    // p(START) = 2/3; removing click/error/signup each kills one
    // converting path (p → 1/3), removing view changes nothing
    val got = Analytics.markovAttribution(ev(
      (0L, 1L, "click"), (1L, 1L, "purchase"),
      (0L, 2L, "view"),
      (0L, 3L, "error"), (1L, 3L, "signup"), (2L, 3L, "purchase"))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got("click") == ((666666L, 333333L, 333333L, 333333L)), got)
    assert(got("error") == ((666666L, 333333L, 333333L, 333333L)), got)
    assert(got("signup") == ((666666L, 333333L, 333333L, 333333L)), got)
    assert(got("view") == ((666666L, 666666L, 0L, 0L)), got)
    // a never-seen channel state makes the full system singular: the
    // guard yields NULL rows instead of a silent wrong solve
    val degen = Analytics.markovAttribution(ev(
      (0L, 1L, "click"), (1L, 1L, "purchase"))).collect()
    assert(degen.forall(r => r.isNullAt(1) && r.isNullAt(3)), degen.toSeq)
    // an event type OUTSIDE the modeled alphabet must fail loudly, not
    // silently vanish from the row sums
    val ex = intercept[IllegalArgumentException] {
      Analytics.markovAttribution(ev(
        (0L, 1L, "mystery_type"), (1L, 1L, "purchase")))
    }
    assert(ex.getMessage.contains("mystery_type"), ex.getMessage)
  }

  test("gains curve: top deciles capture the planted converters, lift is exact") {
    import spark.implicits._
    // user u emits u events (score = u); users 16..20 convert → deciles
    // of 2 users each: decile 1 = {20,19}, decile 3 = {16,15}
    val rows = (1 to 20).flatMap { u =>
      (0 until u).map(i => ((u * 100 + i).toLong, u.toLong,
        if (u >= 16 && i == 0) "purchase" else "view"))
    }
    val ev = rows.toDF("event_id", "user_id", "event_type")
    val got = Analytics.gainsCurve(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(5),
        r.getLong(6), r.getLong(7))).toMap
    // decile 1: 2 users, 2 pos, cum 2 → gains 400000, lift (2/2)/(5/20) = 4
    assert(got(1L) == ((2L, 2L, 2L, 400000L, 4000L)), got)
    assert(got(3L) == ((2L, 1L, 5L, 1000000L, 3333L)), got)
    assert(got(10L)._3 == 5L && got(10L)._4 == 1000000L && got(10L)._5 == 1000L, got)
  }

  test("qini curve: planted treated-only uplift accumulates, universal conversion reads exactly zero") {
    import spark.implicits._
    def evFrom(conv: Long => Boolean) = (1 to 20).flatMap { u =>
      val views = (0 until (if (conv(u.toLong)) u - 1 else u))
        .map(i => (u.toLong * 1000000L + i, u.toLong, "view", 0.0))
      val purch = if (conv(u.toLong))
        Seq((u.toLong * 1000000L + 999L, u.toLong, "purchase", 200.0)) else Seq()
      views ++ purch
    }.zipWithIndex.map { case ((us, u, et, v), i) => (us, u, et, v, i.toLong) }
      .toDF("us", "user_id", "event_type", "value", "event_id")
      .withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(us)")).drop("us")
    // only TREATED (even) high scorers convert → qini climbs 1000/decile
    // for three deciles then holds
    val up = Analytics.qiniCurve(evFrom(u => u % 2 == 0 && u >= 16), 150.0)
      .collect().map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(up(1L) == 1000L && up(2L) == 2000L && up(3L) == 3000L, up)
    assert(up(10L) == 3000L, up)
    // everyone converts → uplift exactly zero at every depth
    val nul = Analytics.qiniCurve(evFrom(_ => true), 150.0)
      .collect().map(_.getLong(5))
    assert(nul.forall(_ == 0L), nul.toSeq)
  }

  test("price index: hand basket — Laspeyres flat, Paasche reflects the shifted mix") {
    import spark.implicits._
    // month0: p1 $100×10, p2 $200×5; month1: p1 $110×8, p2 $180×6 and a
    // part traded only in month1 (excluded from the matched sample)
    def ts(m: Int) = s"2024-0${m + 1}-15 00:00:00"
    val li = Seq(
      (1L, 1000.0, 10.0, ts(0)), (2L, 1000.0, 5.0, ts(0)),
      (1L, 880.0, 8.0, ts(1)), (2L, 1080.0, 6.0, ts(1)),
      (3L, 500.0, 1.0, ts(1)))
      .toDF("l_partkey", "l_extendedprice", "l_quantity", "sd")
      .withColumn("l_shipdate",
        org.apache.spark.sql.functions.expr("CAST(sd AS TIMESTAMP)")).drop("sd")
    val got = Analytics.priceIndex(li).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // L(m1) = (11000·10+18000·5)/(10000·10+20000·5) = 1.0;
    // P(m1) = (11000·8+18000·6)/(10000·8+20000·6) = 0.98
    assert(got.toSeq == Seq((2L, 1000000L, 1000000L), (2L, 1000000L, 980000L)), got.toSeq)
  }

  test("return shrinkage: small samples pull hard toward the prior, large ones barely move") {
    import spark.implicits._
    // brand A: 5/10 returns; brand B: 100/1000 → alpha = 105e6 // 1010
    val li = ((1 to 10).map(i => (1L, if (i <= 5) "R" else "N")) ++
      (1 to 1000).map(i => (2L, if (i <= 100) "R" else "N")))
      .toDF("l_partkey", "l_returnflag")
    val part = Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
    val got = Analytics.returnShrinkage(li, part, 200L).collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // alpha_ppm = 103960; A: (5e6 + 200·103960) // 210 = 122819;
    // B: (100e6 + 20792000) // 1200 = 100660
    assert(got("A") == ((500000L, 122819L, -377181L)), got)
    assert(got("B") == ((100000L, 100660L, 660L)), got)
  }

  test("anneal selection: k is the exact 20% floor, token share sums the top-k docs") {
    import spark.implicits._
    // 10 docs, one source; quality varies with length/stopwords
    val texts = (1 to 10).map(i => (s"the data value " * i).trim)
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "s0") }
      .toDF("doc_id", "text", "source")
    val got = graft.ops.TextAnalysis.annealSelection(docs, 20).collect()(0)
    assert((got.getLong(1), got.getLong(2)) == ((10L, 2L)), got)
    // independent reference: top-2 docs by (quality desc, doc_id)
    val q = graft.ops.TextAnalysis.qualityScoreWith(docs, Seq("source"))
      .select("doc_id", "quality", "n_tokens").collect()
      .map(r => (r.getDouble(1), r.getLong(0), r.getLong(2)))
      .sortBy { case (qual, id, _) => (-qual, id) }
    val expectSel = q.take(2).map(_._3).sum
    val expectTotal = q.map(_._3).sum
    assert(got.getLong(3) == expectTotal && got.getLong(4) == expectSel, got)
    assert(got.getLong(5) == 1000000L * expectSel / expectTotal, got)
    assert(got.getDouble(6) == q(1)._1, s"boundary = 2nd-ranked quality: $got")
  }

  test("blocking recall: deletions break exactly one segment each, union recovers both") {
    import spark.implicits._
    // e1 "abcd": del_pos 2 → "acd" (prefix broken, suffix intact);
    // e2 "wxyz": del_pos 3 → "wxz" (prefix intact, suffix broken)
    val part = Seq((1L, "abcd", "b"), (2L, "wxyz", "b"))
      .toDF("p_partkey", "p_name", "p_brand")
    val got = graft.ops.EntityResolution.blockingRecall(part).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("brand") == ((2L, 1000000L, 4L)), got)
    assert(got("brand_prefix") == ((1L, 500000L, 1L)), got)
    assert(got("brand_suffix") == ((1L, 500000L, 1L)), got)
    assert(got("prefix_suffix_union") == ((2L, 1000000L, 2L)), got)
  }
}
