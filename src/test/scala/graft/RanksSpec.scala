package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranks

/** The distributed global-order device must be bit-identical to the
  * partitionless window it replaces — rank, ntile and running sums are
  * checked against `Window.orderBy(...)` on frames deliberately larger
  * than the device width, with duplicate keys (ties share a range
  * partition), skew, decimals and both sort directions. The window
  * forms here are the SPEC ORACLE only; production code uses the
  * device (PlanShapeSpec pins that).
  */
class RanksSpec extends SparkSpec {
  import spark.implicits._

  // 997 rows over a 40-value key domain: heavy ties, more rows than any
  // width, and a value column with mixed signs for the running sums
  private lazy val df = spark.range(997).toDF("id")
    .withColumn("k", pmod(col("id") * 37 + 11, lit(40L)))
    .withColumn("v", (pmod(col("id") * 53, lit(200L)) - 60L))
    .withColumn("d", (col("v") * 7).cast("decimal(18,2)"))

  test("global row_number matches the partitionless window (asc and desc)") {
    for (ord <- Seq(Seq(col("k").asc, col("id").asc), Seq(col("k").desc, col("id").asc))) {
      val want = df.withColumn("rn", row_number().over(Window.orderBy(ord: _*)).cast("long"))
      val got = Ranks.overGlobalOrder(df, ord, rankCol = Some("rn"), width = 7)
      assert(got.select("id", "rn").except(want.select("id", "rn")).isEmpty &&
        want.select("id", "rn").except(got.select("id", "rn")).isEmpty,
        s"rank diverged for order $ord")
      graft.ops.Caches.releaseCaches()
    }
  }

  test("ntile matches Spark's NTILE, including rows % n padding and rows < n") {
    for ((n, rows) <- Seq((10, 997L), (7, 997L), (13, 6L))) {
      val sub = df.limit(rows.toInt)
      val ord = Seq(col("v").desc, col("id").asc)
      val want = sub.withColumn("b", ntile(n).over(Window.orderBy(ord: _*)).cast("long"))
      val got = Ranks.overGlobalOrder(sub, ord, ntileCol = Some((n, "b")), width = 5)
      assert(got.select("id", "b").except(want.select("id", "b")).isEmpty &&
        want.select("id", "b").except(got.select("id", "b")).isEmpty,
        s"ntile($n) over $rows rows diverged")
      graft.ops.Caches.releaseCaches()
    }
  }

  test("running sums (long and decimal) match the inclusive ROWS window; totals and count are exact") {
    val ord = Seq(col("k").asc, col("id").asc)
    val w = Window.orderBy(ord: _*).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("cv", sum(col("v")).over(w))
      .withColumn("cd", sum(col("d")).over(w))
    val got = Ranks.overGlobalOrder(df, ord,
      cumSums = Seq("cv" -> col("v"), "cd" -> col("d")),
      totals = Seq("tv" -> col("v")), countCol = Some("n"), width = 6)
    val joined = got.alias("g").join(want.alias("w"), Seq("id"))
      .select(col("g.cv") === col("w.cv"), col("g.cd").cast("decimal(38,2)") === col("w.cd").cast("decimal(38,2)"))
      .collect()
    assert(joined.forall(r => r.getBoolean(0) && r.getBoolean(1)), "running sums diverged")
    val head = got.select("tv", "n").head
    assert(head.getLong(0) == df.agg(sum(col("v"))).head.getLong(0), "grand total wrong")
    assert(head.getLong(1) == 997L, "count literal wrong")
    graft.ops.Caches.releaseCaches()
  }

  test("the device itself plans zero WindowExec nodes and keeps the pinned width") {
    val got = Ranks.overGlobalOrder(df, Seq(col("k").asc, col("id").asc),
      rankCol = Some("rn"), cumSums = Seq("cv" -> col("v")), width = 6)
    val p = got.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"device leaked a window:\n$p")
    // the range exchange lives inside the persisted subtree
    val cached = got.queryExecution.withCachedData.toString
    assert(cached.contains("RepartitionByExpression") || cached.contains("rangepartitioning"),
      s"range split missing:\n$cached")
    graft.ops.Caches.releaseCaches()
  }
}
