package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Histogram quantile sketch invariants: order, range, degenerate-group
  * exactness, and the one-bin-width error bound on gap-free data.
  */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  private val ps = Seq(("p50", 0.5), ("p95", 0.95), ("p99", 0.99))

  test("estimates are monotone in p and bounded by the group's value range") {
    val gen = Gen.listOfN(80, Gen.chooseNum(-1000.0, 1000.0))
    (0 until 5).foreach { i =>
      val vs = gen(Gen.Parameters.default, Seed(42L + i)).get
      val df = vs.map(("g", _)).toDF("g", "v")
      val r = Sketches.histogramQuantiles(df, "g", "v", 16, ps).collect()(0)
      val (p50, p95, p99) = (r.getAs[Double]("p50"), r.getAs[Double]("p95"), r.getAs[Double]("p99"))
      assert(p50 <= p95 && p95 <= p99, s"seed $i not monotone: $p50 $p95 $p99")
      assert(p50 >= vs.min - 1e-4 && p99 <= vs.max + 1e-4, s"seed $i out of range")
    }
  }

  test("a constant column collapses to the constant for every p") {
    val df = Seq.fill(50)(("g", 42.5)).toDF("g", "v")
    val r = Sketches.histogramQuantiles(df, "g", "v", 64, ps).collect()(0)
    assert(r.getAs[Double]("p50") == 42.5)
    assert(r.getAs[Double]("p99") == 42.5)
  }

  test("gap-free ladder: sketch within one bin width of the exact percentile") {
    val n = 1000
    val nBins = 64
    val df = (0 until n).map(i => ("g", i.toDouble)).toDF("g", "v")
    val sk = Sketches.histogramQuantiles(df, "g", "v", nBins, ps).collect()(0)
    val ex = df.agg(
      expr("percentile(v, 0.5)"), expr("percentile(v, 0.95)"), expr("percentile(v, 0.99)"))
      .collect()(0)
    val width = (n - 1).toDouble / nBins
    Seq("p50", "p95", "p99").zipWithIndex.foreach { case (c, i) =>
      assert(math.abs(sk.getAs[Double](c) - ex.getDouble(i)) <= width + 1e-4,
        s"$c sketch ${sk.getAs[Double](c)} vs exact ${ex.getDouble(i)}")
    }
  }

  test("streaming quantile sketch: hand histogram through real micro-batches, overflow clamps to the top bin") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import java.sql.Timestamp
    def ts(minutes: Long) = new Timestamp(minutes * 60000L)
    val ms = MemoryStream[(Timestamp, String, Double)](spark, numPartitions = 1)
    val q = Sketches.streamingQuantileSketch(
        ms.toDF().toDF("ts", "event_type", "value"), 50, 500.0)
      .writeStream.outputMode("append")
      .format("memory").queryName("qsk_out")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      // hour 0, type t: values 5,15,...,95 — one per 10-wide bin 0..9;
      // type x: 9999 clamps into bin 49
      ms.addData((0 until 10).map(i => (ts(i * 5 + 1), "t", i * 10 + 5.0)): _*)
      ms.addData((ts(40), "x", 9999.0))
      q.processAllAvailable()
      ms.addData((ts(200), "t", 1.0)) // watermark past hour 0 + 2h
      q.processAllAvailable()
      val rows = spark.table("qsk_out").collect()
        .filter(_.getTimestamp(0).getTime == 0L)
        .map(r => r.getString(1) -> r).toMap
      val t = rows("t")
      // target(0.5) = 5 → bin 4, prev 4, c 1 → 10·(4 + 1/1) = 50.0;
      // p95/p99: target 10 → bin 9 → 100.0; nothing clamped
      assert(t.getLong(2) == 10L, t)
      assert((t.getDouble(3), t.getDouble(4), t.getDouble(5)) == ((50.0, 100.0, 100.0)), t)
      assert(t.getLong(6) == 0L, t)
      val x = rows("x")
      assert(x.getLong(2) == 1L && x.getDouble(3) == 500.0 && x.getLong(6) == 1L,
        s"overflow must clamp into the top bin: $x")
    } finally { q.stop(); graft.ops.Caches.releaseStreamingState(spark) }
  }
}
