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
}
