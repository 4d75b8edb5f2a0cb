package graft

import graft.ops.ExactQuantiles
import org.apache.spark.sql.functions._

/** The two-pass histogram-refinement selection must reproduce the
  * single-node `percentile` / `ntile` semantics EXACTLY — including
  * ties, heavy duplication (many values in one histogram bucket),
  * degenerate groups (constant value, single row), and NULLs.
  */
class ExactQuantilesSpec extends SparkSpec {

  import spark.implicits._

  test("valuesAtRanks: exact order statistics on a known tiny group") {
    val df = Seq(("a", 5.0), ("a", 1.0), ("a", 3.0), ("a", 2.0), ("a", 4.0))
      .toDF("g", "v")
    val got = ExactQuantiles.valuesAtRanks(df, "g", "v", _ => Seq(0L, 2L, 4L))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(got == Map(0L -> 1.0, 2L -> 3.0, 4L -> 5.0))
  }

  test("percentiles: equals the builtin percentile() on ties, dups and nulls") {
    // deterministic pseudo-random values, HEAVY ties (v mod 13) so bucket
    // boundaries land inside runs of equal values, plus one null row
    val rows = (0 until 997).map { i =>
      val g = s"t${i % 3}"
      val v: java.lang.Double = if (i == 500) null else ((i * 7919) % 13).toDouble
      (g, v)
    }
    val df = rows.toDF("g", "v")
    val ps = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val got = ExactQuantiles.percentiles(df, "g", "v", ps, buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val exp = df.groupBy($"g")
      .agg(round(expr("percentile(v, 0.5)"), 4).as("p50"),
        round(expr("percentile(v, 0.9)"), 4).as("p90"),
        round(expr("percentile(v, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got == exp)
    graft.ops.Caches.releaseCaches()
  }

  test("percentiles: degenerate groups — constant value and a single row") {
    val df = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0), ("s", 42.0)).toDF("g", "v")
    val got = ExactQuantiles.percentiles(df, "g", "v", Seq("p50" -> 0.5, "p95" -> 0.95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got == Map("c" -> ((7.0, 7.0)), "s" -> ((42.0, 42.0))))
    graft.ops.Caches.releaseCaches()
  }

  test("deciles: equals the windowed ntile(10) audit on pseudo-random data") {
    val rows = (0 until 1003).map { i =>
      (s"t${i % 2}", ((i * 104729) % 1000).toDouble / 10.0, i.toLong)
    }
    val df = rows.toDF("event_type", "value", "event_id")
    val got = ExactQuantiles.deciles(df, "event_type", "value", buckets = 16)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val exp = graft.ops.Analytics.valueDeciles(df)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got == exp)
    graft.ops.Caches.releaseCaches()
  }

  test("quality gate: two-pass threshold equals the naive percentile() gate on the fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val naive = graft.ops.Curation.qualityGate(docs, 0.6).collect().toSeq
    val twoPass = graft.ops.Curation.qualityGateTwoPass(docs, 0.6).collect().toSeq
    assert(naive == twoPass, s"gates disagree: ${naive.diff(twoPass)}")
    graft.ops.Caches.releaseCaches()
  }

  test("group-cardinality guard: high-cardinality groupings fail fast, naming the sketch path") {
    // one group per row, past the maxGroups ceiling — must fail BEFORE
    // any |groups|-sized driver collect, with a message that routes the
    // caller to the executor-side sketch alternative
    val wide = spark.range(ExactQuantiles.maxGroups + 1)
      .selectExpr("CAST(id AS STRING) AS g", "CAST(id AS DOUBLE) AS v")
    val e = intercept[IllegalArgumentException] {
      ExactQuantiles.valuesAtRanks(wide, "g", "v", _ => Seq(0L))
    }
    assert(e.getMessage.contains("low-cardinality"), e.getMessage)
    assert(e.getMessage.contains("Sketches"), e.getMessage)
  }

  test("deciles: groups smaller than 10 emit only the populated tiles") {
    val df = Seq(("g", 3.0), ("g", 1.0), ("g", 2.0)).toDF("event_type", "value")
      .withColumn("event_id", col("value").cast("long"))
    val got = ExactQuantiles.deciles(df, "event_type", "value")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq((1, 1L, 1.0, 1.0), (2, 1L, 2.0, 2.0), (3, 1L, 3.0, 3.0)))
    graft.ops.Caches.releaseCaches()
  }
}
