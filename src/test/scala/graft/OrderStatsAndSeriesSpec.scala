package graft

import graft.ops.{Multimodal, OrderStats, Sketches, TimeSeries}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for the round-7 order-statistics / time-series / sketch / MMR
  * additions: each operator is checked against an independent reference
  * computation (brute-force dominance scan, the recursive EWMA
  * definition, a driver-side greedy MMR, the exact VAD formula) — the
  * oracle gate then covers engine parity separately.
  */
class OrderStatsAndSeriesSpec extends SparkSpec {

  import spark.implicits._

  test("KS drift: hand-computed sup-CDF distance, argmax bin, identical halves score 0") {
    def ev(rows: (Long, Double)*) = rows.toSeq.toDF("h", "value")
      .withColumn("ts", expr("timestamp_micros(h * 3600000000)")).drop("h")
    // first half (hour 0) bins [0,0,1,1], second half (hour 2) [1,1,1,1]
    // mid = hour 1 → Fa=(2,4), Fb=(0,4), Na=Nb=4 → max|Fa·Nb−Fb·Na| = 8
    // at bin 0 → KS = 8/16 = 500000 ppm
    val drift = OrderStats.ksDrift(
      ev((0L, 0.5), (0L, 0.7), (0L, 1.2), (0L, 1.9),
         (2L, 1.1), (2L, 1.3), (2L, 1.5), (2L, 1.8)), 1000, 50000L).collect()(0)
    assert((drift.getLong(0), drift.getLong(1), drift.getLong(2), drift.getLong(3),
      drift.getLong(4), drift.getBoolean(5)) == ((4L, 4L, 2L, 500000L, 0L, true)), drift)
    // same distribution in both halves → KS 0, not drifted
    val same = OrderStats.ksDrift(
      ev((0L, 0.5), (0L, 1.5), (2L, 0.6), (2L, 1.6)), 1000, 50000L).collect()(0)
    assert(same.getLong(3) == 0L && !same.getBoolean(5), same)
    // values beyond the cap fold into the top bin on both sides
    val capped = OrderStats.ksDrift(
      ev((0L, 5000.0), (2L, 9000.0)), 3, 50000L).collect()(0)
    assert(capped.getLong(2) == 1L && capped.getLong(4) == 3L, capped)
  }

  test("conformal coverage: hand series — radius is the exact order statistic, coverage counts the planted spikes") {
    // 72 hours at 10 events/hour with spikes: hour 30 → 13, hour 60 → 12.
    // Seasonal-naive rows = hours 24..71 (48): residuals all 0 except
    // hour 30 (3), hour 54 (|10−13| = 3), hour 60 (2). cal = hours
    // 24..55 (n_cal 32: 30 zeros + two 3s), k = ceil(.9·33) = 30 →
    // q = 0. test = hours 56..71: only hour 60 misses → 15/16 covered.
    val rows = (0 until 72).flatMap { h =>
      val c = if (h == 30) 13 else if (h == 60) 12 else 10
      (0 until c).map(j => (h.toLong * 3600000000L + j * 60000000L))
    }
    val ev = rows.toDF("us").withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val r = TimeSeries.conformalCoverage(ev, 100000L).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6)) == ((32L, 16L, 30L, 0L, 15L, 937500L, true)), r)
  }

  test("holt backtest: learns a linear trend and beats naive; constant series degenerates") {
    def series(vals: Seq[Double]) =
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("day", "value")
        .withColumn("ts", expr("timestamp_micros(day * 86400000000)")).drop("day")
    // perfect linear trend: naive is off by exactly 1.0/day forever,
    // Holt's trend state converges onto the slope
    val linear = TimeSeries.holtBacktest(series((1 to 30).map(_.toDouble))).collect()(0)
    assert(linear.getAs[Long]("n_forecasts") == 29L)
    assert(linear.getAs[Long]("naive_mae_milli") == 1000L)
    assert(linear.getAs[Boolean]("holt_beats_naive"),
      s"Holt must beat naive on a pure trend: $linear")
    assert(linear.getAs[Long]("mase_e6") < 1000000L)
    // constant series: both forecasters are exact; MASE undefined
    val const = TimeSeries.holtBacktest(series(Seq.fill(10)(5.0))).collect()(0)
    assert(const.getAs[Long]("holt_mae_milli") == 0L)
    assert(const.isNullAt(const.fieldIndex("mase_e6")))
    assert(!const.getAs[Boolean]("holt_beats_naive"))
  }

  test("propensity strata: the fixed cuts populate >= 2 strata in BOTH arms on the gate fixture") {
    // the stratum cut points (29/33/37) are tuned to the current
    // fixture generation's per-user pre-period counts. A fixture
    // regeneration (the round-6 drift lesson) could silently collapse
    // every user into one stratum — the ATT row then degenerates to a
    // plain mean difference while the oracle gate stays green (both
    // engines use the same cuts). This spec makes that drift LOUD:
    // stratification only removes covariate imbalance if >= 2 strata
    // carry users in both arms.
    val rows = SparkEntry.queries("events_propensity_strata")(
      spark, "/root/testdata/sf0.01").collect()
    val populated = rows.filter(r => r.getString(0).startsWith("act_") &&
      r.getLong(1) > 0L && r.getLong(2) > 0L)
    assert(populated.length >= 2,
      s"fixture drift: <2 strata populated in both arms — re-derive the cuts. " +
        s"Got: ${rows.mkString("; ")}")
    graft.ops.Caches.releaseCaches()
  }

  test("cuped: a fully predictive covariate equalizes adjusted means, rho2 = 1") {
    // post count = 2 x pre count for every user: theta = 2, rho2 = 1, and
    // the arms' different raw post means are entirely explained by their
    // pre-period imbalance — adjusted means coincide exactly
    val rows = (1 to 4).flatMap { u =>
      val pre = (0 until u).map(j => (u.toLong, u * 10L + j))
      val post = (0 until 2 * u).map(j => (u.toLong, 2000000L + u * 10L + j))
      pre ++ post
    }
    val ev = rows.toDF("user_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = OrderStats.cupedAdjustment(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Double]("rho2") == 1.0 && got(0L).getAs[Double]("theta") == 2.0)
    assert(got(0L).getAs[Double]("mean_post") == 6.0 &&
      got(1L).getAs[Double]("mean_post") == 4.0, s"raw means differ by design: $got")
    assert(got(0L).getAs[Double]("mean_post_adj") == 5.0 &&
      got(1L).getAs[Double]("mean_post_adj") == 5.0,
      s"adjustment must remove the pre-period imbalance: $got")
  }

  test("typeCorrelation: proportional series hit 1.0; absent hours zero-fill") {
    // hours 0..2 — a: (1,2,3), b: (2,4,6), c only fires in hour 0: (3,0,0)
    def at(h: Long, tpe: String, k: Int) =
      (0 until k).map(_ => (h * 3600000000L, tpe))
    val rows = at(0, "a", 1) ++ at(1, "a", 2) ++ at(2, "a", 3) ++
      at(0, "b", 2) ++ at(1, "b", 4) ++ at(2, "b", 6) ++ at(0, "c", 3)
    val ev = rows.toDF("us", "event_type")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = TimeSeries.typeCorrelation(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("a", "b")) == 1.0, s"proportional series must correlate exactly: $got")
    // with c zero-filled to (3,0,0): corr(a,c) = -3/sqrt(12) ≈ -0.866025;
    // an inner join on co-active hours would have left a single point
    assert(got(("a", "c")) == -0.866025, s"zero-fill must shape corr(a,c): $got")
    assert(got(("b", "c")) == -0.866025)
  }

  test("skyline equals the brute-force dominance scan") {
    val parts = Seq(
      (1L, "a", 1, 10.0), (2L, "b", 1, 8.0), (3L, "c", 2, 7.0),
      (4L, "d", 2, 9.0), (5L, "e", 3, 7.0), (6L, "f", 3, 6.5),
      (7L, "g", 4, 6.5), (8L, "h", 5, 12.0), (9L, "i", 1, 8.0))
      .toDF("p_partkey", "p_name", "p_size", "p_retailprice")
    val got = OrderStats.skylineParts(parts)
      .select("p_partkey").as[Long].collect().toSet
    // brute force: p survives iff no q dominates it
    val rows = parts.select("p_partkey", "p_size", "p_retailprice")
      .as[(Long, Int, Double)].collect()
    val expect = rows.filter { case (k, s, p) =>
      !rows.exists { case (k2, s2, p2) =>
        k2 != k && s2 <= s && p2 <= p && (s2 < s || p2 < p)
      }
    }.map(_._1).toSet
    assert(got === expect)
    // ties on both dims survive together: (1,8.0) twice → both present
    assert(got.contains(2L) && got.contains(9L))
  }

  test("EWMA matches the recursive alpha=1/2 definition within truncation") {
    val events = (0 until 48).map { h =>
      (h.toLong, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(h * 3600L)),
        1L, "click", (h % 7).toDouble + 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = TimeSeries.ewmaHourly(events)
      .select("ewma").as[Double].collect()
    // reference: E_1 = x_1; E_t = (x_t + E_{t-1}) / 2
    val xs = (0 until 48).map(h => (h % 7).toDouble + 1.0)
    val ref = xs.tail.scanLeft(xs.head)((e, x) => (x + e) / 2)
    // before 20 lags the truncated window renormalizes the start boundary
    // differently from the recursion (which double-weights x_1) — compare
    // once both formulations have absorbed the boundary
    got.zip(ref).zipWithIndex.drop(TimeSeries.EwmaLags + 1).foreach { case ((g, r), i) =>
      assert(math.abs(g - r) < 1e-4, s"hour $i: got $g ref $r")
    }
  }

  test("gap fill produces a dense grid with carried-forward values") {
    val base = java.time.Instant.parse("2024-01-01T00:00:00Z")
    val events = Seq(0, 1, 4, 5).map { h =>
      (h.toLong, java.sql.Timestamp.from(base.plusSeconds(h * 3600L)),
        1L, "click", 10.0 * (h + 1), "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = TimeSeries.gapFillHourly(events)
      .select("n_events", "value_ffill", "is_filled")
      .as[(Long, Double, Boolean)].collect()
    assert(got.length === 6) // hours 0..5, gaps at 2 and 3
    assert(got.map(_._1).toSeq === Seq(1L, 1L, 0L, 0L, 1L, 1L))
    assert(got(2)._2 === 20.0 && got(3)._2 === 20.0) // carried from hour 1
    assert(got.map(_._3).toSeq === Seq(false, false, true, true, false, false))
  }

  test("HLL estimate is exact-ish on small cardinalities and register-bounded") {
    val events = (0 until 2000).map(i =>
      (i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(i)),
        (i % 700).toLong, if (i % 2 == 0) "click" else "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val rows = Sketches.hllDistinctUsers(events).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("hll_estimate")
      // m=64 registers → ~13% standard error; accept 3 sigma
      assert(math.abs(est - exact) / exact < 0.4, s"est $est exact $exact")
    }
  }

  test("MMR round 1 is the relevance top-1 and later rounds penalize similarity") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val got = ops.Similarity.mmrRerank(emb, 2, 10, 3, 7, 10).collect()
    assert(got.length === 6)
    val byQuery = got.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rows) =>
      val rounds = rows.map(_.getAs[Long]("round")).sorted.toSeq
      assert(rounds === Seq(1L, 2L, 3L))
      // no vec selected twice
      assert(rows.map(_.getAs[Long]("vec_id")).distinct.length === 3)
    }
    // round-1 picks = bruteForce rank 1
    val top1 = ops.Similarity.bruteForceTopK(emb, 2, 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    got.filter(_.getAs[Long]("round") == 1L).foreach { r =>
      assert(top1(r.getAs[Long]("query_id")) === r.getAs[Long]("vec_id"))
    }
  }

  test("audio VAD run features match a direct recomputation from the formula") {
    val docs = Seq((7L, "x", "en", "s", 1L), (100L, "y", "en", "s", 1L),
      (255L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.audioVad(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_frames"), r.getAs[Long]("n_voiced"),
          r.getAs[Long]("longest_run"))).toMap
    Seq(7L, 100L, 255L).foreach { id =>
      val n = (256 + id % 257).toInt
      val samples = (0 until n).map(i => ((i * 37 + id * 101) % 4096 - 2048).toInt)
      val nf = n / Multimodal.VadFrame
      val voicedFlags = (0 until nf).map { f =>
        samples.slice(f * 64, f * 64 + 64).map(math.abs(_).toLong).sum >
          Multimodal.VadThreshold
      }
      val runs = voicedFlags.foldLeft(List(0L)) { (acc, v) =>
        if (v) (acc.head + 1) :: acc.tail else 0L :: acc
      }
      assert(got(id) === ((nf.toLong, voicedFlags.count(identity).toLong, runs.max)))
    }
  }

  test("audio clipping census matches a direct recomputation from the formula") {
    val docs = Seq((7L, "x", "en", "s", 1L), (100L, "y", "en", "s", 1L),
      (255L, "z", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.audioClipping(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_samples"), r.getAs[Long]("peak"),
          r.getAs[Long]("n_clipped"), r.getAs[Long]("longest_run"),
          r.getAs[Long]("clipped_ppm")))).toMap
    Seq(7L, 100L, 255L).foreach { id =>
      val n = (256 + id % 257).toInt
      val amp = (0 until n).map(i => math.abs((i * 37 + id * 101) % 4096 - 2048).toLong)
      val clipped = amp.map(_ >= Multimodal.ClipThreshold)
      val runs = clipped.foldLeft(List(0L)) { (acc, v) =>
        if (v) (acc.head + 1) :: acc.tail else 0L :: acc
      }
      assert(got(id) === ((n.toLong, amp.max, clipped.count(identity).toLong,
        runs.max, 1000000L * clipped.count(identity) / n)), s"doc $id")
    }
    // the census must be non-vacuous: at least one of the three clips
    // has near-rail samples under the synthesis formula
    assert(got.values.exists(_._3 > 0L))
  }

  test("ab test arms partition all users and rates are consistent") {
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    // normalize whichever physical ts type this fixture generation uses
    val events = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
    val r = OrderStats.abTestConversion(events).collect().head
    val nUsers = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") === nUsers)
    assert(r.getAs[Double]("rate_a") >= 0 && r.getAs[Double]("rate_a") <= 1)
  }

  test("srm check: balanced split passes, broken assignment flags; ALL folds segments") {
    def ev(users: Seq[Long]) = users.zipWithIndex.map { case (u, i) =>
      (i.toLong, u, "click", 1.0, s"p$i")
    }.toDF("event_id", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(event_id * 1000000)"))
    // users 0..99: exact 50/50 by parity — no SRM anywhere
    val ok = OrderStats.srmCheck(ev(0L until 100L)).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ok("ALL").getAs[Long]("n_a") == 50L && ok("ALL").getAs[Long]("n_b") == 50L)
    assert(!ok("ALL").getAs[Boolean]("srm"))
    assert(ok("click").getAs[Long]("chi2_ppm") == 0L)
    // 90 even users vs 10 odd: chi2 = 80^2/100 = 64 >> 3.84 — flagged
    val skewed = OrderStats.srmCheck(ev(
      (0L until 180L by 2L) ++ (1L until 20L by 2L))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(skewed("ALL").getAs[Boolean]("srm"), s"${skewed("ALL")}")
    assert(skewed("ALL").getAs[Long]("chi2_ppm") == 64000000L)
  }

  test("propensity strata: within-stratum diffs, empty-arm guard, negative ATT exact") {
    // mid = 500s. user 1 (treat) and user 2 (ctrl): 1 pre event each →
    // act_00_29; post outcomes 2.0 vs 5.0 → diff -3000 milli. user 31
    // (treat): 30 pre events → act_30_33 with NO control — diff NULL,
    // weight 0. ATT = -3000 exactly (the floor-shift must be exact on a
    // negative numerator).
    val rows =
      Seq((1L, 0L, 0.0), (1L, 1000L, 2.0), (2L, 1L, 0.0), (2L, 1000L, 5.0)) ++
        (0L until 30L).map(i => (31L, i, 0.0)) :+ ((31L, 1000L, 4.0))
    val ev = rows.toDF("user_id", "sec", "value")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)")).drop("sec")
    val got = OrderStats.propensityStrata(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = got("act_00_29")
    assert(s1.getLong(1) == 1L && s1.getLong(2) == 1L)
    assert(s1.getLong(3) == 2000L && s1.getLong(4) == 5000L && s1.getLong(5) == -3000L)
    val s2 = got("act_30_33")
    assert(s2.getLong(1) == 1L && s2.getLong(2) == 0L)
    assert(s2.getLong(3) == 4000L && s2.isNullAt(4) && s2.isNullAt(5),
      s"empty control arm must NULL the mean and diff: $s2")
    val att = got("att_weighted")
    assert(att.getLong(1) == 2L && att.getLong(2) == 1L)
    assert(att.getLong(5) == -3000L,
      s"matched-weight ATT ignores the unmatched stratum and stays exact: $att")
  }

  test("trailing range window counts exactly the events in (t-1h, t] per user") {
    // user 1: events at 0, 30min, 61min, 200min — the 61min event sees
    // the 30min one (31min gap) but NOT the t=0 one (61min > 1h);
    // equal-timestamp peers (user 2) see each other both ways
    val rows = Seq(
      (1L, 1L, 0L, 1.0), (2L, 1L, 1800L, 2.0), (3L, 1L, 3660L, 4.0),
      (4L, 1L, 12000L, 8.0), (5L, 2L, 100L, 1.5), (6L, 2L, 100L, 2.5))
      .toDF("event_id", "user_id", "sec", "value")
      .withColumn("ts", expr("timestamp_micros(sec * 1000000)")).drop("sec")
    val got = graft.ops.Analytics.trailingWindow(rows, 3600L * 1000000L).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == (1L, 1000L))
    assert(got(2L) == (2L, 3000L), s"30min event sees t=0: $got")
    assert(got(3L) == (2L, 6000L), s"61min event sees 30min but not t=0: $got")
    assert(got(4L) == (1L, 8000L), s"isolated event sees only itself: $got")
    assert(got(5L) == (2L, 4000L) && got(6L) == (2L, 4000L),
      s"equal-ts peers share the frame: $got")
  }

  test("autocorrelation: period-2 series flips sign by lag parity; gap hours zero-fill") {
    // hours 0..5 with counts 1,3,1,3,1,3 → acf(1) = -1, acf(2) = +1
    def at(h: Long, k: Int) = (0 until k).map(_ => h * 3600000000L)
    val ev = (Seq(0L, 2L, 4L).flatMap(at(_, 1)) ++ Seq(1L, 3L, 5L).flatMap(at(_, 3)))
      .toDF("us").withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = TimeSeries.autocorrelation(ev, Seq(1, 2)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == (5L, -1.0), s"alternating series anti-correlates at lag 1: $got")
    assert(got(2L) == (4L, 1.0), s"and repeats exactly at lag 2: $got")
    // a dense-grid zero: counts 2,0,2 over hours 0..2 (hour 1 has no
    // events). Sparse alignment would pair (2,2) once and leave acf(1)
    // undefined; the dense grid pairs (2,0) and (0,2) → acf(1) = -1
    val gap = (at(0L, 2) ++ at(2L, 2))
      .toDF("us").withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val g2 = TimeSeries.autocorrelation(gap, Seq(1)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(g2(1L) == (2L, -1.0), s"missing hour must enter as a true zero: $g2")
    graft.ops.Caches.releaseCaches()
  }

  test("FDR gate: crit table reproduces the srm constant and rejects only the imbalanced segment") {
    // crit(m=1, k=1) is χ²₁ at α=.05 — must match srmCheck's
    // independently embedded 3841459 (cross-check of the probit path)
    assert(OrderStats.fdrCritPpm(0) == 3841459L, OrderStats.fdrCritPpm(0))
    // the BH schedule relaxes with rank: crit(m, k) strictly decreases in k
    val m5 = (1 to 5).map(k => OrderStats.fdrCritPpm((5 - 1) * OrderStats.FdrMMax + k - 1))
    assert(m5 == m5.sorted.reverse && m5.distinct.size == 5, m5)
    // 100 users: segA (users 0..49) converts only on arm 0 — χ² = 50
    // exactly; segB (users 50..99) converts 5/5 per arm — χ² = 0
    val rows =
      (0 until 100).map { u =>
        (u.toLong * 1000000L, u.toLong, if (u < 50) "segA" else "segB", u.toLong)
      } ++
      (0 until 50 by 2).map { u =>          // segA arm-0 conversions
        ((1000L + u) * 1000000L, u.toLong, "purchase", 1000L + u)
      } ++
      (50 until 60).map { u =>              // segB balanced conversions
        ((1000L + u) * 1000000L, u.toLong, "purchase", 1000L + u)
      }
    val ev = rows.toDF("us", "user_id", "event_type", "event_id")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = OrderStats.fdrGate(ev).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = got("segA")
    assert((a.getLong(1), a.getLong(2), a.getLong(3), a.getLong(4)) ==
      ((25L, 25L, 25L, 0L)), a)
    assert(a.getLong(5) == 50000000L && a.getLong(7) == 1L && a.getBoolean(9), a)
    val b = got("segB")
    assert(b.getLong(5) == 0L && !b.getBoolean(9), b)
    assert(a.getLong(6) == 2L, "m counts both segments")
  }

  test("CUSUM: the prefix-min closed form matches the hand-run recurrence, alarms where S/n_ref clears h") {
    // ref half: 4 events of value 10 → n_ref=4, s_ref=4000 centi.
    // post half (slack 10.00): D = 4·xc − 8000 → −4000, −4000, +32000,
    // −4000; P = −4000, −8000, 24000, 20000; S = P − min(P≤, 0) =
    // 0, 0, 32000, 28000 → S/n_ref = 0, 0, 8000, 7000 centi.
    val vals = Seq(10.0, 10.0, 10.0, 10.0, 10.0, 10.0, 100.0, 10.0)
    val ev = vals.zipWithIndex.map { case (v, i) => (i.toLong * 1000000L, i.toLong, "t", v) }
      .toDF("us", "event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val r = TimeSeries.cusumDrift(ev, 1000L, 5000L).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((4L, 4L, 2L)), r)
    assert(r.getTimestamp(4).getTime == 6000L, s"first alarm at the spike event: $r")
    assert(r.getLong(5) == 8000L, r)
    // no-drift series: S stays at 0, no alarms, null first-alarm ts
    val flat = (0 until 8).map(i => (i.toLong * 1000000L, i.toLong, "t", 10.0))
      .toDF("us", "event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val f = TimeSeries.cusumDrift(flat, 1000L, 5000L).collect()(0)
    assert(f.getLong(3) == 0L && f.isNullAt(4) && f.getLong(5) == 0L, f)
  }

  test("seasonal strength: a pure weekly pattern scores exactly 1e6, residual SS zero") {
    // one event per day, value = (d % 7 + 1)·10: any 7-day MA window is
    // constant → detrended = exact weekly pattern → residual 0
    val ev = (0 until 21).map { d =>
      (d.toLong * 86400000000L + 1000L, d.toLong, "t", (d % 7 + 1) * 10.0)
    }.toDF("us", "event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val r = TimeSeries.seasonalStrength(ev).collect()(0)
    assert(r.getLong(0) == 15L, s"days 3..17 carry full MA windows: $r")
    assert(r.getLong(2) == 0L, s"residual SS must vanish: $r")
    assert(r.getLong(3) == 1000000L, r)
    assert(r.getLong(1) > 0L, r)
    graft.ops.Caches.releaseCaches()
  }

  test("event study: pre-period diffs zero out against the baseline, post shows the planted lift") {
    // days 0-2: 3 treat + 1 ctrl (diff 2); days 3-5: 6 treat + 1 ctrl
    // (diff 5). mid = day 2 → baseline 2000 milli → post effect 3000
    val rows = (0 until 6).flatMap { d =>
      val treat = if (d <= 2) 3 else 6
      (0 until treat).map(i => (d.toLong * 86400000000L + i, 0L, "view")) :+
        ((d.toLong * 86400000000L + 500L, 1L, "view"))
    }
    val ev = rows.zipWithIndex
      .map { case ((us, u, et), i) => (us, u, et, i.toLong) }
      .toDF("us", "user_id", "event_type", "event_id")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = OrderStats.eventStudy(ev).collect()
      .map(r => r.getTimestamp(0).getTime / 86400000L ->
        (r.getLong(3), r.getBoolean(4), r.getLong(5))).toMap
    assert(got(0L) == ((2L, false, 0L)) && got(2L) == ((2L, false, 0L)), got)
    assert(got(3L) == ((5L, true, 3000L)) && got(5L) == ((5L, true, 3000L)), got)
  }

  test("regression discontinuity: planted jump at the cut, flat placebo") {
    // user u emits u 'view' events (+1 purchase for u in {5,6}): running
    // var x = u (or u+1 with the purchase); cut 5, bw 2, minValue 150
    val rows = (1 to 8).flatMap { u =>
      val views = (0 until (if (u == 5 || u == 6) u - 1 else u))
        .map(i => (u.toLong * 1000000L + i, u.toLong, "view", 0.0))
      val purch = if (u == 5 || u == 6)
        Seq((u.toLong * 1000000L + 999L, u.toLong, "purchase", 200.0)) else Seq()
      views ++ purch
    }
    val ev = rows.zipWithIndex
      .map { case ((us, u, et, v), i) => (us, u, et, v, i.toLong) }
      .toDF("us", "user_id", "event_type", "value", "event_id")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = OrderStats.regressionDiscontinuity(ev, 5L, 2L, 150.0).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4), r.getLong(8))).toMap
    // cut: left = users {3,4} (0 conv), right = {5,6} (2 conv) → jump 1e6
    assert(got("cut") == ((2L, 2L, 1000000L)), got)
    assert(got("placebo") == ((2L, 2L, 0L)), got)
  }

  test("sequential probe: an overwhelming planted effect crosses Pocock at the first look") {
    val rows = (0 until 40).flatMap { u =>
      Seq((u.toLong, u.toLong, "view", 0.0)) ++
        (if (u % 2 == 0) Seq((100L + u, u.toLong, "purchase", 200.0)) else Seq())
    } :+ ((1000000L, 0L, "view", 0.0))
    val ev = rows.zipWithIndex
      .map { case ((us, u, et, v), i) => (us, u, et, v, i.toLong) }
      .toDF("us", "user_id", "event_type", "value", "event_id")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = OrderStats.sequentialProbe(ev).collect()
    // all 40 users and all 20 arm-0 conversions precede look 1:
    // chi2 = n = 40 → 4e7 ppm > the 5.82e6 boundary at every look
    got.foreach { r =>
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
        ((20L, 20L, 20L, 0L)), r)
      assert(r.getLong(6) == 40000000L && r.getBoolean(7), r)
      assert(r.getLong(8) == 1L, s"first crossed look must be 1: $r")
    }
    assert(got.length == 5)
  }

  test("bootstrap CI: thresholds are the Poisson CDF, constant data collapses the band, partition-invariant") {
    val t = OrderStats.bootPoissonThresholds
    assert(t == t.sorted && t.distinct.size == 5, t)
    // t0/P = e^−1, t4/P = CDF(4) ≈ 0.99634
    val hs = graft.functions.PortableHash.P.toDouble
    assert(math.abs(t(0).toDouble / hs - math.exp(-1.0)) < 1e-9)
    assert(math.abs(t(4).toDouble / hs - 0.9963401531726563) < 1e-9)
    // constant values: every replicate mean is exactly the value
    val ev = (0 until 200).map(i => (i.toLong, i.toLong, "t", 42.0))
      .toDF("us", "event_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val r = OrderStats.bootstrapCi(ev).collect()(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) ==
      ((200L, 42000L, 64L, 42000L, 42000L)), r)
    // hash-deterministic: identical output under any partitioning
    val r7 = OrderStats.bootstrapCi(ev.repartition(7)).collect()(0)
    assert(r.toSeq == r7.toSeq, s"partition-dependent bootstrap: $r vs $r7")
  }

  test("split gain: a perfectly separating feature gains the full parent impurity, a constant one gains zero") {
    // 40 users: 0..19 enter as 'buyer' and convert; 20..39 as 'lurker',
    // never convert. entry_type and type_breadth separate perfectly;
    // activity and first_hour collapse to one bucket each.
    val rows =
      (0 until 40).map { u =>
        (u.toLong * 1000000L, u.toLong, if (u < 20) "buyer" else "lurker", u.toLong)
      } ++
      (0 until 20).map { u =>
        ((1000L + u) * 1000000L, u.toLong, "purchase", 1000L + u)
      }
    val ev = rows.toDF("us", "user_id", "event_type", "event_id")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = OrderStats.splitGain(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    // parent: n=40, pos=20 → 1e6·(1600−400−400)/1600 = 500000 ppm
    assert(got("entry_type") == ((2L, 500000L, 500000L)), got)
    assert(got("type_breadth") == ((2L, 500000L, 500000L)), got)
    assert(got("activity") == ((1L, 500000L, 0L)), got)
    assert(got("first_hour") == ((1L, 500000L, 0L)), got)
  }
}
