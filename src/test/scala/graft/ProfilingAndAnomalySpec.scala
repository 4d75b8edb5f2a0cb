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
}
