package graft

import graft.functions.Tokenize
import graft.ops.{Analytics, Profiling}
import org.apache.spark.sql.functions._

/** Laws for the profiling / anomaly / tokenizer-induction ops on
  * hand-built frames (the fixtures have no NULLs, so null handling is
  * exercised here).
  */
class ProfilingAndAnomalySpec extends SparkSpec {

  test("tableProfile: nulls excluded from counts, min/max; distinct exact") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(2.0), Some("a")),
      (Some(1L), None, Some("b")),
      (Some(3L), Some(5.0), None),
      (None, Some(2.0), Some("a"))
    ).toDF("k", "v", "s")
    val got = Profiling.tableProfile(df, Seq("k", "v"), Seq("s")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("k").getLong(1) == 3 && got("k").getLong(2) == 2) // nonnull, distinct
    assert(got("k").getDouble(3) == 1.0 && got("k").getDouble(4) == 3.0)
    assert(got("v").getLong(1) == 3 && got("v").getLong(2) == 2)
    assert(got("s").getLong(1) == 3 && got("s").getLong(2) == 2)
    assert(got("s").getString(5) == "a" && got("s").getString(6) == "b")
    assert(got("k").isNullAt(5) && got("s").isNullAt(3)) // cross-type slots null
  }

  test("expectations: planted violations counted per rule; NULL fails range/set rules") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1L, Some(10L), Some(5.0), Some("1-URGENT"), Some(ts("1996-01-01"))),   // clean
      (1L, Some(11L), Some(6.0), Some("5-LOW"), Some(ts("1997-01-01"))),      // dup orderkey
      (2L, None, Some(-1.0), Some("EXPRESS"), Some(ts("1980-01-01"))),        // null fk, neg, bad set, out of range
      (3L, Some(12L), None, None, None)                                       // nulls fail range/set/positive
    ).toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, 1L, Some(0.05), Some(3.0)),
      (1L, 1L, Some(1.5), Some(0.0)),  // dup pk, discount > 1, qty not positive
      (2L, 1L, None, Some(2.0))        // null discount fails the interval rule
    ).toDF("l_orderkey", "l_linenumber", "l_discount", "l_quantity")
    val got = graft.ops.Profiling.expectations(orders, li).collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got("o_orderkey_unique") == ((1L, false)))
    assert(got("o_custkey_not_null") == ((1L, false)))
    assert(got("o_totalprice_positive") == ((2L, false)), s"neg AND null fail: $got")
    assert(got("o_orderpriority_in_set") == ((2L, false)))
    assert(got("o_orderdate_in_range") == ((2L, false)))
    assert(got("li_pk_unique") == ((1L, false)))
    assert(got("li_discount_unit_interval") == ((2L, false)))
    assert(got("li_quantity_positive") == ((1L, false)))
  }

  test("labelBalance: uniform labels score chi2 zero; skew raises it; shares sum to ~1e6") {
    import spark.implicits._
    def balance(labels: Seq[Int]) = graft.ops.Profiling.labelBalance(
      labels.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("vec_id", "label"))
      .collect()
    val uniform = balance(Seq.fill(6)(0) ++ Seq.fill(6)(1) ++ Seq.fill(6)(2))
    assert(uniform.forall(_.getAs[Long]("chi2_ppm") == 0L), "uniform must score zero")
    assert(uniform.map(_.getAs[Long]("share_ppm")).sum > 999998L)
    val skewed = balance(Seq.fill(16)(0) ++ Seq.fill(1)(1) ++ Seq.fill(1)(2))
    assert(skewed.head.getAs[Long]("chi2_ppm") > 10000000L,
      s"a 16:1:1 skew must exceed chi2 10: ${skewed.head}")
  }

  test("botRegularity: metronome flags regular, bursty human does not, short user excluded") {
    import spark.implicits._
    // user 1: 10 events at an exact 1000µs cadence; user 2: 9 unit gaps
    // then one huge burst gap; user 3: below the minGaps cut
    val rows =
      (0 until 10).map(i => (100L + i, 1L, i * 1000L)) ++
      ((0 until 9).map(i => (200L + i, 2L, i.toLong)) :+ (209L, 2L, 100008L)) ++
      (0 until 3).map(i => (300L + i, 3L, i * 5L))
    val ev = rows.toDF("event_id", "user_id", "us")
      .withColumn("ts", expr("timestamp_micros(us)")).drop("us")
    val got = Analytics.botRegularity(ev, 8).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet == Set(1L, 2L), s"short user must be excluded: ${got.keySet}")
    assert(got(1L).getAs[Boolean]("is_regular") && got(1L).getAs[Long]("cv2_e6") == 0L,
      "a metronomic cadence has zero CV²")
    assert(!got(2L).getAs[Boolean]("is_regular"), "a bursty timeline must not flag")
    assert(got(1L).getAs[Long]("gap_mean_us") == 1000L)
    assert(got(1L).getAs[Long]("n_events") == 10L)
  }

  test("zscore outliers: a planted far outlier is flagged, tight cluster is not") {
    import spark.implicits._
    // 100 values at ~10 ± 1 plus one at 1000: only the spike exceeds 3 sigma
    val rows = (1 to 100).map(i => ("a", 10.0 + (i % 3) - 1)) :+ (("a", 1000.0))
    val df = rows.toDF("event_type", "value")
    val got = Analytics.zscoreOutliers(df).collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 101 && got(0).getLong(2) == 1)
  }

  test("bigrams: adjacency preserved in order; singleton and empty docs yield none") {
    import spark.implicits._
    val df = Seq("w1 w2 w3 w2", "solo", " ").toDF("text")
    val got = df.select(Tokenize.bigrams(Tokenize.tokens(col("text"))).as("b"))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("w1 w2", "w2 w3", "w3 w2"))
    assert(got(1).isEmpty && got(2).isEmpty)
  }

  test("bpeMerges: counts aggregate across docs, top-N cut is deterministic") {
    import spark.implicits._
    val df = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.bpeMerges(df, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.head == ("x y", 3L)) // "x y" twice in doc1 + once in doc2
  }

  test("fdAudit: g3 counts the non-plurality rows; a key FD reports zero") {
    import spark.implicits._
    val df = Seq(
      (1L, 1, "x"), (1L, 2, "x"), (1L, 3, "y"), // k=1: plurality x (2 of 3)
      (2L, 4, "z"))                             // k=2: single value
      .toDF("k", "row_id", "v")
    val got = Profiling.fdAudit(Seq(
        Profiling.FdCandidate("t.k->v", df, Seq("k"), "v"),
        Profiling.FdCandidate("t.k,row_id->v", df, Seq("k", "row_id"), "v")))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // k→v: 2 groups, 4 rows, keep 2+1=3, violations 1, ppm 250000
    assert(got("t.k->v") == (2L, 4L, 3L, 1L, 250000L), got)
    // the key FD holds exactly
    assert(got("t.k,row_id->v") == (4L, 4L, 4L, 0L, 0L), got)
  }
}
