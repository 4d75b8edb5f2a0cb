package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization for scan pruning — the write-path lever that
  * decides how much of a 100 TB table a selective query has to READ.
  *
  * A file (or row-group) is skippable when the engine's min/max column
  * stats exclude the predicate. Sorting by one column gives perfect
  * pruning on that column and none on any other; interleaving the bits
  * of two columns (a Z-order / Morton curve) bounds BOTH dimensions'
  * value ranges within every file, so predicates on either column — or
  * both — skip most files. This is the same layout device as
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, expressed as plain columnar
  * arithmetic so it stays inside whole-stage codegen and is
  * oracle-checkable.
  */
object Layout {

  /** Morton interleave of the low 16 bits of `x` (even positions) and
    * `y` (odd positions) into one 32-bit z-value.
    */
  def zValue(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  def zValueSql(x: String, y: String): String =
    // list_sum promotes to HUGEINT — cast back so shifts/grouping stay BIGINT
    s"CAST(list_sum([((($x) >> i) & 1) * (1::BIGINT << (2 * i)) + ((($y) >> i) & 1) * (1::BIGINT << (2 * i + 1)) FOR i IN range(0, 16)]) AS BIGINT)"

  /** Scale an integral dim onto the full 16-bit range by its global
    * min/max — integer arithmetic only (`div`), so both engines agree
    * exactly. This is the range-normalization every z-order writer does
    * before interleaving; without it the curve degenerates (a dim using
    * 8 of 16 bits zeroes half the interleaved positions and collapses
    * the file assignment).
    */
  private def scale16(c: Column, lo: Column, hi: Column): Column =
    when(hi === lo, lit(0L))
      // floor(a/b) == a div b for the non-negative operands here, and the
      // products stay far below 2^53 so the double quotient is exact
      .otherwise(floor(((c - lo) * lit(65535L)) / (hi - lo)).cast("long"))

  /** Z-order layout audit over events: rows are assigned to `nFiles`
    * files by the top bits of z(user_id, day), and the output is each
    * file's min/max stats on BOTH dimensions — the pruning metadata a
    * lakehouse writer would persist. Narrow per-file ranges on both
    * columns are the whole point: a `user_id = ?` or `day BETWEEN` scan
    * skips files whose bounds exclude it.
    *
    * The global dim bounds are a scalar probe (one partial-agg reduce);
    * the file assignment itself is a pure projection — the real write
    * would `repartitionByRange($"z")` + `sortWithinPartitions($"z")` and
    * stream to the sink, still with no extra shuffle beyond the range
    * exchange the writer needs anyway.
    */
  def zorderFileStats(events: DataFrame, nFiles: Int): DataFrame = {
    require(nFiles > 0 && (nFiles & (nFiles - 1)) == 0, s"nFiles must be a power of two, got $nFiles")
    val shift = 32 - Integer.numberOfTrailingZeros(nFiles)
    // integral days-since-epoch via DATE arithmetic (epoch-seconds would
    // be DOUBLE in DuckDB and fractional under sub-second timestamps)
    val withDay = events.select(col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("day"))
    val b = withDay.agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
      min(col("day")).as("dlo"), max(col("day")).as("dhi")).collect()(0)
    val z = zValue(scale16(col("user_id"), lit(b.getLong(0)), lit(b.getLong(1))),
      scale16(col("day"), lit(b.getLong(2)), lit(b.getLong(3))))
    withDay
      .withColumn("file_id", shiftright(z, shift))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("file_id")
  }

  def zorderFileStatsSql(nFiles: Int): String = {
    val shift = 32 - Integer.numberOfTrailingZeros(nFiles)
    val su = "CASE WHEN b.uhi = b.ulo THEN 0 ELSE ((user_id - b.ulo) * 65535) // (b.uhi - b.ulo) END"
    val sd = "CASE WHEN b.dhi = b.dlo THEN 0 ELSE ((day - b.dlo) * 65535) // (b.dhi - b.dlo) END"
    s"""WITH d AS (
       |  SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events),
       |b AS (
       |  SELECT min(user_id) AS ulo, max(user_id) AS uhi,
       |         min(day) AS dlo, max(day) AS dhi FROM d),
       |z AS (
       |  SELECT user_id, day,
       |         ${zValueSql(su, sd)} >> $shift AS file_id
       |  FROM d, b)
       |SELECT file_id, count(*) AS n_rows,
       |       count(DISTINCT user_id) AS n_users,
       |       min(user_id) AS min_user, max(user_id) AS max_user,
       |       min(day) AS min_day, max(day) AS max_day
       |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin
  }
}
