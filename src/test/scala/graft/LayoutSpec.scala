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
}
