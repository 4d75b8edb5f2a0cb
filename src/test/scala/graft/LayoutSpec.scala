package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves x into even and y into odd bit positions") {
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
    val got = df.collect().map(_.getLong(0)).toSeq
    // x=0b11,y=0 -> 0b0101 = 5; y=0b11,x=0 -> 0b1010 = 10; both -> 15;
    // full 16-bit range fills all 32 bits
    assert(got == Seq(5L, 10L, 15L, 0xFFFFFFFFL))
  }

  test("z-order files bound BOTH dims; a single-dim sort does not") {
    // 64x64 grid: ids 0..63 x days 0..63
    val grid = spark.range(64 * 64).select(
      (col("id") % 64).as("user_id"),
      to_timestamp(floor(col("id") / 64).cast("long") * 86400 + 1).as("ts"))
    val stats = Layout.zorderFileStats(grid, 16).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 64 * 64)
    // every file must span at most half the range on EACH dimension —
    // 16 z-order files cut the square into a 4x4 macro-grid
    stats.foreach { r =>
      assert(r.getAs[Long]("max_user") - r.getAs[Long]("min_user") <= 16,
        s"user span too wide in file ${r.getAs[Long]("file_id")}")
      assert(r.getAs[Long]("max_day") - r.getAs[Long]("min_day") <= 16,
        s"day span too wide in file ${r.getAs[Long]("file_id")}")
    }
    // sanity: a day-sorted layout with the same file count has files
    // spanning the FULL user range (no pruning on the second dim)
    val daySorted = grid
      .withColumn("file_id", ntile(16).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("ts"))))
      .groupBy("file_id")
      .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      .collect()
    assert(daySorted.forall(r => r.getAs[Long]("hi") - r.getAs[Long]("lo") == 63))
  }

  test("constant dimension degrades gracefully (scale guard, single file band)") {
    val df = spark.range(100).select(lit(7L).as("user_id"),
      to_timestamp(col("id") * 86400 + 1).as("ts"))
    val stats = Layout.zorderFileStats(df, 16).collect()
    assert(stats.map(_.getAs[Long]("n_rows")).sum == 100)
    assert(stats.forall(r => r.getAs[Long]("min_user") == 7L && r.getAs[Long]("max_user") == 7L))
  }

  test("compaction plan: quantized cumsum groups respect the target within one file") {
    import spark.implicits._
    val files = Seq((0L, 500L), (1L, 500L), (2L, 500L), (3L, 500L),
      (4L, 3000L), (5L, 100L), (6L, 100L)).toDF("file_id", "n_rows")
    val got = Layout.compactionPlan(files, 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // groups: [0,1] (1000), [2,3] (1000), [4] (3000 oversized alone), [5,6] tail
    assert(got.map(_._3).sum == 5200L)
    val byGroup = got.map(r => r._1 -> r).toMap
    assert(byGroup(0L)._4 == 0L && byGroup(0L)._5 == 1L && byGroup(0L)._3 == 1000L)
    assert(byGroup(1L)._4 == 2L && byGroup(1L)._5 == 3L)
    assert(byGroup(2L)._4 == 4L && byGroup(2L)._5 == 4L) // big file alone
    // file ranges never interleave across groups
    val sorted = got.sortBy(_._1)
    sorted.sliding(2).foreach { case Array(a, b) => assert(a._5 < b._4) case _ => }
  }

  test("partition balance: loads sum to the corpus; hash flattens a clustered key") {
    import spark.implicits._
    // user ids clustered in a narrow band plus one far outlier: equi-width
    // ranges put almost everything in one bucket; the hash spreads it
    val df = ((1 to 900).map(i => 1000L + i) :+ 100000L)
      .map(u => (u, "e")).toDF("user_id", "event_type")
    val got = Layout.partitionBalance(df, 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val (hash, range) = got.partition(_._1 == "hash")
    assert(hash.map(_._3).sum == 901L && range.map(_._3).sum == 901L)
    val rangeMax = range.map(_._4).max
    val hashMax = hash.map(_._4).max
    assert(rangeMax > 7.0, s"clustered range load should hit ~8x, got $rangeMax")
    assert(hashMax < 2.0, s"hash load should stay near 1x, got $hashMax")
  }

  /** Plain-Scala Hilbert xy2d (the classic reflect/swap walk) — the
    * reference the columnar unrolling must reproduce bit-for-bit. */
  private def hilbertRef(xi: Long, yi: Long): Long = {
    val n = 1L << 16
    var x = xi; var y = yi; var d = 0L; var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("columnar Hilbert walk matches the reference implementation") {
    import spark.implicits._
    // corners, edges, and a deterministic pseudo-random scatter
    val coords = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (1L, 0L), (0L, 1L), (32768L, 32767L)) ++
      (0 until 200).map(i => ((i * 48271L) % 65536L, (i * 69621L) % 65536L))
    val got = Layout.hilbertD(coords.toDF("x", "y"), "x", "y", "hd")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    coords.foreach { case (x, y) =>
      assert(got((x, y)) == hilbertRef(x, y), s"mismatch at ($x, $y)")
    }
    // the four quadrant anchors in curve order
    assert(got((0L, 0L)) == 0L)
    assert(got((65535L, 0L)) == (1L << 32) - 1) // curve ends at (n-1, 0)
  }

  test("Hilbert locality: unit curve steps move exactly one grid cell") {
    // d→(x,y) inverse for spot-checking adjacency along the curve
    def d2xy(di: Long): (Long, Long) = {
      val n = 1L << 16
      var x = 0L; var y = 0L; var t = di; var s = 1L
      while (s < n) {
        val rx = (t / 2) % 2
        val ry = (t ^ rx) % 2
        if (ry == 0) {
          if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
          val tmp = x; x = y; y = tmp
        }
        x += s * rx; y += s * ry
        t /= 4
        s *= 2
      }
      (x, y)
    }
    (0 until 500).foreach { i =>
      val d = (i * 2654435761L) % ((1L << 32) - 1)
      val (x1, y1) = d2xy(d); val (x2, y2) = d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-unit step at d=$d: ($x1,$y1)->($x2,$y2)")
      // and the forward walk inverts the inverse
      assert(hilbertRef(x1, y1) == d)
    }
  }

  test("clustering depth: ingest layout is user-shallow by luck, day-deep by construction") {
    // 8 events over 8 hours of ONE day, user_id = i % 4: the 4 time files
    // hold users {0,1},{2,3},{0,1},{2,3} → user intervals overlap in
    // pairs (max depth 2); every file's day interval is the same single
    // day → day depth = 4 files across the whole covered span
    val ev = spark.range(8).select(
      (col("id") % 4).as("user_id"),
      to_timestamp(col("id") * 3600 + 1).as("ts"))
    val got = Layout.clusteringDepth(ev, 4).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("max_depth"), r.getAs[Long]("avg_depth_ppm"))).toMap
    assert(got(("time", "day")) == (4L, 4000000L),
      s"all four files overlap on the single day: $got")
    assert(got(("time", "user_id"))._1 == 2L,
      s"interleaved users overlap the time files in pairs: $got")
    // 6 rows (3 layouts x 2 dims), every covered segment has depth >= 1
    assert(got.size == 6)
    assert(got.values.forall { case (mx, ppm) => mx >= 1L && ppm >= 1000000L })
    graft.ops.Caches.releaseCaches()
  }
}
