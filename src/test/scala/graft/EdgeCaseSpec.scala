package graft

import graft.cdc.Watermark
import graft.functions.PortableHash
import graft.model.ChangeEvent
import graft.ops.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Regressions for the code-review fixes: empty inputs and 64-bit keys. */
class EdgeCaseSpec extends SparkSpec {

  import spark.implicits._

  test("empty payload produces zero frames (no descending-sequence ghosts)") {
    val r = Multimodal.sampleFrames(
      Multimodal.payloads(Seq((1L, "")).toDF("doc_id", "text")), 32, 8).collect()(0)
    assert(r.getAs[Long]("n_frames") == 0L)
    assert(r.getAs[String]("frame_hex") == "")
  }

  test("empty changelog reports position 0, not an NPE") {
    assert(Watermark.latestPosition(Seq.empty[ChangeEvent].toDF()) == 0L)
  }

  test("router partition stays in [0, n) for snowflake-sized 64-bit keys") {
    val keys = Seq(0L, 1L, Int.MaxValue.toLong, 3470000000L, 1234567890123456789L, Long.MaxValue)
    val got = keys.toDF("pk")
      .select(PortableHash.routerPartition(col("pk"), 64).as("p"))
      .collect().map(_.getLong(0))
    assert(got.forall(p => p >= 0 && p < 64), s"out-of-range partitions: ${got.toSeq}")
  }

  test("resize with maxSide >= image side is the identity (step 1 keeps every pixel)") {
    // doc 0: 8x8 image, maxSide 16 → step 1, output = input raster
    val r = Multimodal.resize(Seq((0L, "x")).toDF("doc_id", "text"), 16).collect()(0)
    assert(r.getAs[Int]("w_out") == r.getAs[Int]("w_in"))
    assert(r.getAs[Int]("h_out") == r.getAs[Int]("h_in"))
    val full = (for (y <- 0 until 8; x <- 0 until 8) yield (x * 31 + y * 17) % 256)
    assert(r.getAs[Long]("px_sum_out") == full.map(_.toLong).sum)
    // maxSide 1 collapses to a single pixel: the (0,0) sample
    val one = Multimodal.resize(Seq((0L, "x")).toDF("doc_id", "text"), 1).collect()(0)
    assert(one.getAs[Int]("w_out") == 1 && one.getAs[Int]("h_out") == 1)
    assert(one.getAs[Long]("px_sum_out") == 0L) // pixel(0,0) = 0 for doc 0
  }

  test("wide materialize over an empty changelog is empty, not a crash") {
    import graft.cdc.ChangelogApply
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("tbl", StringType), StructField("pk", LongType),
        StructField("op", StringType), StructField("ts", TimestampType),
        StructField("pos", LongType), StructField("k", LongType),
        StructField("value", DoubleType))))
    assert(ChangelogApply.materializeWide(empty, Seq("k", "value")).count() == 0L)
    assert(ChangelogApply.changedFieldSet(empty, Seq("k", "value")).count() == 0L)
  }

  test("schema registry rejects conflicting field types and unknown tables") {
    import graft.cdc.SchemaRegistry
    import org.apache.spark.sql.types._
    intercept[IllegalArgumentException] {
      SchemaRegistry(Map(
        "a" -> StructType(Seq(StructField("x", LongType))),
        "b" -> StructType(Seq(StructField("x", StringType))))).unifiedFields
    }
    intercept[NoSuchElementException] {
      SchemaRegistry.of(Seq("t0"), StructType(Seq(StructField("x", LongType))))
        .schemaFor("missing")
    }
  }

  test("malformed GTID sets are rejected eagerly") {
    import graft.model.LogPosition.GtidSet
    intercept[IllegalArgumentException] { GtidSet.parse("justauuid") }
    intercept[IllegalArgumentException] { GtidSet.parse("u:1-2-3") }
    assert(GtidSet.parse("").txnCount == 0L)
    assert(GtidSet.parse("  ").txnCount == 0L)
  }

  test("empty and whitespace-only docs survive the text operators") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "one two three four")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // empty and whitespace normalize identically (empty token stream)
    assert(fp(1L) == fp(2L) && fp(1L) != fp(3L))
    val q = TextAnalysis.qualityScore(docs).collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(q(1L) == 0.0 && q(3L) > 0.0)
    val tc = TextAnalysis.tokenCounts(docs).collect().map(r => r.getLong(0) -> r.getAs[Long]("ws_tokens")).toMap
    assert(tc(1L) == 0L && tc(2L) == 0L && tc(3L) == 4L)
  }

  test("scd2 over an empty changelog is empty, not a crash") {
    assert(graft.cdc.ChangelogApply.scd2(Seq.empty[ChangeEvent].toDF()).collect().isEmpty)
  }

  test("bloom contamination with an empty benchmark flags nothing") {
    // no doc_id % 97 == 0 docs → empty filter → no candidates, no NPE
    val docs = Seq((1L, "shared span of words here"), (2L, "shared span of words here"))
      .toDF("doc_id", "text")
    assert(graft.ops.Dedup.bloomContamination(docs, 97, 1).collect().isEmpty)
  }

  test("zscore on a constant series finds no outliers (variance 0, no division)") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0)).toDF("event_type", "value")
    val got = graft.ops.Analytics.zscoreOutliers(df).collect()
    assert(got.length == 1 && got(0).getAs[Long]("n_outliers") == 0L)
    assert(got(0).getAs[Double]("outlier_rate") == 0.0)
  }

  test("bpe merges on an empty corpus is empty; single-token docs contribute nothing") {
    val docs = Seq((1L, "solo"), (2L, "")).toDF("doc_id", "text")
    assert(graft.ops.TextAnalysis.bpeMerges(docs, 5).collect().isEmpty)
  }

  test("gdpr purge checksum hashes integral cents — decimal tie values cannot diverge") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // 2.675 is the classic tie-landing double: it stores as 2.6749999…,
    // so a DECIMAL(18,2) HALF_UP cast of its SHORTEST printed form rounds
    // up ("2.68") while binary-double scaling rounds down ("2.67") — the
    // exact Spark/DuckDB divergence the old checksum carried. The integral
    // key floor(value*100) is 267 in both engines, always.
    val cl = Seq(
      ("t0", 1L, "I", ts, 10L, 2.675),
      ("t0", 2L, "I", ts, 11L, 0.125), // *100 = 12.5 exactly: floor 12
      ("t0", 17L, "I", ts, 12L, 9.995) // pk % 131 == 17 → purged, never hashed
    ).toDF("tbl", "pk", "op", "ts", "pos", "value")
    // floor of the STORED double, not HALF_UP of its printed form
    val cents = cl.orderBy("pos")
      .select(floor(col("value") * 100).cast("long")).collect().map(_.getLong(0)).toSeq
    assert(cents == Seq(267L, 12L, 999L))
    val row = graft.ops.Scrub.gdprPurge(cl).collect()(0)
    def h(s: String): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(hex.take(15), 16)
    }
    // retained_checksum exports mod a sub-2^53 prime (round-8 change) as BIGINT
    val expected = ((h("1|10|267") + h("2|11|12")) % BigInt(9007199254740881L)).toLong
    assert(row.getAs[Long]("retained_checksum") == expected)
    assert(row.getAs[Long]("n_state_purged") == 1L)
    assert(row.getAs[Long]("n_events_redacted") == 1L)
  }

  test("rfm: a metric landing EXACTLY on a quartile cut scores below it (integer compare)") {
    // four single-order customers, monetary 10 / 30 / 30 / 50; the
    // interpolated median is (30+30)/2 = 30 — customers AT 30 must not
    // count as above it, and the comparison is BIGINT cross-multiplied
    // (4·cents vs (4−fq)·lo + fq·hi), so no rounding boundary exists
    val d = java.sql.Date.valueOf("2024-01-01")
    val orders = Seq((1L, 10.0), (2L, 30.0), (3L, 30.0), (4L, 50.0))
      .map { case (ck, v) => (ck, ck, d, v) }
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val seg = graft.ops.OrderStats.rfmSegments(orders).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_customers")).toMap
    // rec all 0, freq all 1 → r_score 4, f_score 1; m_score: cents cuts
    // q1 = (1000+3·3000)/4, q2 = 3000, q3 = (3·3000+5000)/4 → scores
    // 10→1, 30→2 (above q1, NOT above q2=itself), 50→4
    assert(seg == Map(411L -> 1L, 412L -> 2L, 414L -> 1L))
  }

  test("mad outliers: a deviation exactly at 3·1.4826·MAD is NOT an outlier") {
    // hourly means ±222.39, ±50, 0 → med 0, MAD 50; 222.39 = 4.4478·50
    // lands exactly on the threshold (22239·mad4 == 10000·adev2): the
    // strict integer compare must exclude it on both engines. Nudging one
    // tail to 222.40 crosses the boundary and flags exactly that hour.
    def ev(vals: Seq[Double]) = vals.zipWithIndex.map { case (v, h) =>
      ("a", new java.sql.Timestamp(h * 3600L * 1000L), v)
    }.toDF("event_type", "ts", "value")
    val atBoundary = graft.ops.TimeSeries.madOutliers(
      ev(Seq(-222.39, -50.0, 0.0, 50.0, 222.39))).collect()(0)
    assert(atBoundary.getAs[Long]("n_outliers") == 0L)
    assert(atBoundary.getAs[Double]("mad") == 50.0)
    val pastBoundary = graft.ops.TimeSeries.madOutliers(
      ev(Seq(-222.39, -50.0, 0.0, 50.0, 222.40))).collect()(0)
    assert(pastBoundary.getAs[Long]("n_outliers") == 1L)
  }

  test("zscore over an all-NULL event type reports a NULL rate, not a crash or 0/0") {
    val df = Seq(("a", Option(5.0)), ("a", Option(7.0)), ("b", Option.empty[Double]),
      ("b", Option.empty[Double])).toDF("event_type", "value")
    val got = graft.ops.Analytics.zscoreOutliers(df).collect()
      .map(r => r.getString(0) -> r).toMap
    // n counts non-null values: the all-NULL type has n_events = 0 and a
    // NULL rate in BOTH engines (Spark guard + oracle nullif)
    assert(got("b").getAs[Long]("n_events") == 0L)
    assert(got("b").isNullAt(got("b").fieldIndex("outlier_rate")))
    assert(got("a").getAs[Long]("n_events") == 2L)
  }
}
