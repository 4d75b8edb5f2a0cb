package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Hilbert d-value for 16-bit coords in `xCol`/`yCol`, appended as
    * `out`. The classic xy→d walk (16 unrolled steps of quadrant pick +
    * reflect/swap rotation) expressed as stacked projections: each step's
    * (x, y, d) is BOUND through `withColumn` so intermediates are named
    * columns — CollapseProject keeps multiply-referenced non-cheap
    * expressions in separate projections, so the plan stays linear in the
    * step count (a single collapsed expression tree would blow up
    * exponentially) and everything remains whole-stage codegen.
    *
    * Hilbert beats Morton on locality: every unit step along the curve
    * moves exactly one grid cell (no Z-shaped jumps), so equal-size file
    * ranges cover tighter (x, y) rectangles — better min/max pruning on
    * the same stats. The cost is this longer arithmetic at WRITE time
    * only; readers just see better-clustered files.
    */
  def hilbertD(df: DataFrame, xCol: String, yCol: String, out: String): DataFrame = {
    val n = 1L << 16
    var cur = df.withColumn("_hx", col(xCol)).withColumn("_hy", col(yCol))
      .withColumn(out, lit(0L))
    for (k <- 15 to 0 by -1) {
      val s = 1L << k
      cur = cur
        .withColumn("_rx", when(col("_hx").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("_ry", when(col("_hy").bitwiseAND(lit(s)) > 0, lit(1L)).otherwise(lit(0L)))
      // quadrant = (3*rx) XOR ry, spelled as the same CASE both engines run
      val quad = when(col("_rx") === 0 && col("_ry") === 0, lit(0L))
        .when(col("_rx") === 0, lit(1L))
        .when(col("_ry") === 1, lit(2L))
        .otherwise(lit(3L))
      // rotation: reflect when (rx=1, ry=0), then swap — using the PRE-step
      // coords still visible in this projection
      val nx = when(col("_ry") === 0,
        when(col("_rx") === 1, lit(n - 1) - col("_hy")).otherwise(col("_hy")))
        .otherwise(col("_hx"))
      val ny = when(col("_ry") === 0,
        when(col("_rx") === 1, lit(n - 1) - col("_hx")).otherwise(col("_hx")))
        .otherwise(col("_hy"))
      cur = cur.withColumn(out, col(out) + lit(s * s) * quad)
        .withColumn("_nx", nx).withColumn("_ny", ny)
        .withColumn("_hx", col("_nx")).withColumn("_hy", col("_ny"))
        .drop("_nx", "_ny", "_rx", "_ry")
    }
    cur.drop("_hx", "_hy")
  }

  /** Hilbert-curve layout audit — same contract and output schema as
    * [[zorderFileStats]] (file assignment by the top d-value bits,
    * per-file min/max pruning stats on both dims), with the Morton
    * interleave swapped for the Hilbert walk. Run both and compare
    * per-file spans: Hilbert's are tighter on the same data.
    */
  def hilbertFileStats(events: DataFrame, nFiles: Int): DataFrame = {
    require(nFiles > 0 && (nFiles & (nFiles - 1)) == 0, s"nFiles must be a power of two, got $nFiles")
    val shift = 32 - Integer.numberOfTrailingZeros(nFiles)
    val withDay = events.select(col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("day"))
    val b = withDay.agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
      min(col("day")).as("dlo"), max(col("day")).as("dhi")).collect()(0)
    val scaled = withDay
      .withColumn("hx", scale16(col("user_id"), lit(b.getLong(0)), lit(b.getLong(1))))
      .withColumn("hy", scale16(col("day"), lit(b.getLong(2)), lit(b.getLong(3))))
    hilbertD(scaled, "hx", "hy", "hd")
      .withColumn("file_id", shiftright(col("hd"), shift))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("file_id")
  }

  /** Oracle mirror of [[hilbertFileStats]]: the 16 walk steps unroll into
    * chained CTE pairs (quadrant bits, then rotate+accumulate) with the
    * same CASE arithmetic, so every d-value is bit-identical.
    */
  def hilbertFileStatsSql(nFiles: Int): String = {
    val shift = 32 - Integer.numberOfTrailingZeros(nFiles)
    val n = 1L << 16
    val su = "CASE WHEN b.uhi = b.ulo THEN 0 ELSE ((user_id - b.ulo) * 65535) // (b.uhi - b.ulo) END"
    val sd = "CASE WHEN b.dhi = b.dlo THEN 0 ELSE ((day - b.dlo) * 65535) // (b.dhi - b.dlo) END"
    val steps = (15 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s = 1L << k
      s"""r$i AS (
         |  SELECT user_id, day, hx, hy, hd,
         |         CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |         CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM h$i),
         |h${i + 1} AS (
         |  SELECT user_id, day,
         |         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hy ELSE hy END) ELSE hx END AS hx,
         |         CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN ${n - 1} - hx ELSE hx END) ELSE hy END AS hy,
         |         hd + CAST(${s * s} AS BIGINT) * (CASE WHEN rx = 0 AND ry = 0 THEN 0 WHEN rx = 0 THEN 1 WHEN ry = 1 THEN 2 ELSE 3 END) AS hd
         |  FROM r$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (
       |  SELECT user_id, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day FROM events),
       |b AS (
       |  SELECT min(user_id) AS ulo, max(user_id) AS uhi,
       |         min(day) AS dlo, max(day) AS dhi FROM d),
       |h0 AS (
       |  SELECT user_id, day, $su AS hx, $sd AS hy, CAST(0 AS BIGINT) AS hd FROM d, b),
       |$steps,
       |z AS (SELECT user_id, hd >> $shift AS file_id, day FROM h16)
       |SELECT file_id, count(*) AS n_rows,
       |       count(DISTINCT user_id) AS n_users,
       |       min(user_id) AS min_user, max(user_id) AS max_user,
       |       min(day) AS min_day, max(day) AS max_day
       |FROM z GROUP BY file_id ORDER BY file_id""".stripMargin
  }

  /** Small-file compaction planner (the OPTIMIZE bin-packing step): files
    * in id order are assigned to merge groups by quantized cumulative row
    * count — group k covers the cumulative range [k·target, (k+1)·target).
    * Exact greedy packing is inherently sequential (each boundary depends
    * on the previous); the quantized-cumsum assignment is its parallel
    * equivalent, overshooting a group by at most one file. Runs over the
    * file MANIFEST (one row per file), so the single-partition cumulative
    * window is over metadata-sized input even when the table is 100 TB.
    */
  def compactionPlan(fileStats: DataFrame, targetRows: Long): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive: $targetRows")
    import org.apache.spark.sql.expressions.Window
    val before = Window.orderBy(col("file_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    fileStats.select(col("file_id"), col("n_rows"))
      .withColumn("cum_before", coalesce(sum(col("n_rows")).over(before), lit(0L)))
      .withColumn("merge_group", floor(col("cum_before") / lit(targetRows.toDouble)))
      .groupBy(col("merge_group"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("rows_total"),
        min(col("file_id")).as("file_min"), max(col("file_id")).as("file_max"))
      .orderBy("merge_group")
  }

  /** [[compactionPlan]] over the z-order file layout of events — the
    * maintenance pass a lakehouse writer schedules when the audit shows
    * sliver files. */
  def compactionPlanSql(nFiles: Int, targetRows: Long): String =
    s"""WITH fs AS (${zorderFileStatsSql(nFiles)}),
       |cum AS (
       |  SELECT file_id, n_rows,
       |         coalesce(sum(n_rows) OVER (ORDER BY file_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM fs)
       |SELECT CAST(cum_before // $targetRows AS BIGINT) AS merge_group,
       |       count(*) AS n_files,
       |       CAST(sum(n_rows) AS BIGINT) AS rows_total,
       |       min(file_id) AS file_min, max(file_id) AS file_max
       |FROM cum GROUP BY merge_group ORDER BY merge_group""".stripMargin

  /** Partition-balance audit: per-bucket row loads under the two
    * placement strategies a 1000-executor shuffle actually chooses
    * between — multiplicative HASH partitioning (uniform by construction,
    * robust to value clustering) and equi-width RANGE partitioning
    * (cluster-friendly for scans, but skewed whenever the key density
    * is non-uniform). `rel_load` = bucket share × nBuckets; a value far
    * above 1 is the straggler partition that caps cluster throughput.
    * The global key bounds are a scalar probe; everything else is one
    * partial-agged groupBy per strategy.
    */
  def partitionBalance(events: DataFrame, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val b = events.agg(min(col("user_id")).as("lo"), max(col("user_id")).as("hi"),
      count(lit(1)).as("total")).collect()(0)
    val (lo, hi, total) = (b.getLong(0), b.getLong(1), b.getLong(2))
    val hashB = graft.functions.PortableHash.routerPartition(col("user_id"), nBuckets)
    val rangeB = ((col("user_id") - lit(lo)) * lit(nBuckets.toLong)) / (lit(hi) - lit(lo) + lit(1L))
    def loads(method: String, bucket: Column) = events
      .groupBy(bucket.cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .select(lit(method).as("method"), col("bucket"), col("n_rows"),
        round(col("n_rows").cast("double") * lit(nBuckets.toLong) / lit(total), 4).as("rel_load"))
    loads("hash", hashB)
      .unionAll(loads("range", floor(rangeB).cast("long")))
      .orderBy("method", "bucket")
  }

  def partitionBalanceSql(nBuckets: Int): String = {
    val hash = graft.functions.PortableHash.routerPartitionSql("user_id", nBuckets)
    s"""WITH b AS (
       |  SELECT min(user_id) AS lo, max(user_id) AS hi, count(*) AS total FROM events),
       |h AS (
       |  SELECT 'hash' AS method, CAST($hash AS BIGINT) AS bucket FROM events),
       |r AS (
       |  SELECT 'range' AS method,
       |         ((user_id - b.lo) * $nBuckets) // (b.hi - b.lo + 1) AS bucket
       |  FROM events, b),
       |u AS (SELECT * FROM h UNION ALL SELECT * FROM r),
       |g AS (SELECT method, bucket, count(*) AS n_rows FROM u GROUP BY method, bucket)
       |SELECT g.method, g.bucket, g.n_rows,
       |       round(CAST(g.n_rows AS DOUBLE) * $nBuckets / b.total, 4) AS rel_load
       |FROM g, b ORDER BY g.method, g.bucket""".stripMargin
  }

  /** Per-file stats under ingest-time RANGE layout — the default layout
    * every append-only table has before any clustering pass. Same output
    * schema as [[zorderFileStats]] so the three layouts compare directly.
    */
  def timeFileStats(events: DataFrame, nFiles: Int): DataFrame = {
    require(nFiles > 0, s"nFiles must be positive: $nFiles")
    val withCols = events.select(col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("day"),
      unix_micros(col("ts")).as("us"))
    val b = withCols.agg(min(col("us")).as("lo"), max(col("us")).as("hi")).collect()(0)
    val (lo, hi) = (b.getLong(0), b.getLong(1))
    withCols
      // integral equi-width range bucket; operands non-negative so DIV
      // (trunc) and DuckDB // (floor) agree
      .withColumn("file_id", expr(s"CAST(((us - $lo) * $nFiles) DIV (${hi - lo} + 1) AS BIGINT)"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("user_id")).as("n_users"),
        min(col("user_id")).as("min_user"), max(col("user_id")).as("max_user"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("file_id")
  }

  /** Zone-map pruning audit — the read-side payoff the layout ops exist
    * for. Each layout's per-file min/max stats (the zone maps a lakehouse
    * persists in its manifest) are evaluated against a two-predicate
    * workload: a point `user_id = u0` lookup and a 7-day `day BETWEEN`
    * range, with the constants derived from the data bounds so the audit
    * is fixture-independent. `files_read` counts files whose zone
    * OVERLAPS the predicate (what a scan planner cannot skip);
    * `read_amplification` = rows scanned / rows matched is the number a
    * 100 TB table lives or dies by: ingest-time layout answers time-range
    * scans only, z-order/hilbert cut point lookups on BOTH dimensions.
    *
    * Scale shape: the audit itself runs over the three manifests
    * (nFiles rows each), not the data; the only data passes are the three
    * layouts' stats builds plus one bounds + one selectivity probe.
    */
  def zonePrune(events: DataFrame, nFiles: Int): DataFrame = {
    val withDay = events.select(col("user_id"),
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")).cast("long").as("day"))
    val b = withDay.agg(min(col("user_id")).as("ulo"), max(col("user_id")).as("uhi"),
      min(col("day")).as("dlo"), max(col("day")).as("dhi")).collect()(0)
    val u0 = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    val d1 = b.getLong(2) + (b.getLong(3) - b.getLong(2)) / 4
    val d2 = d1 + 6
    val m = withDay.agg(
      sum(when(col("user_id") === u0, 1L).otherwise(0L)).as("m_user"),
      sum(when(col("day").between(d1, d2), 1L).otherwise(0L)).as("m_day")).collect()(0)
    val (mUser, mDay) = (m.getLong(0), m.getLong(1))
    val stats = timeFileStats(events, nFiles).withColumn("layout", lit("time"))
      .unionByName(zorderFileStats(events, nFiles).withColumn("layout", lit("zorder")))
      .unionByName(hilbertFileStats(events, nFiles).withColumn("layout", lit("hilbert")))
    def audit(pred: String, hit: Column, matched: Long): DataFrame =
      stats.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_files"),
          sum(when(hit, 1L).otherwise(0L)).as("files_read"),
          sum(when(hit, col("n_rows")).otherwise(0L)).as("rows_scanned"))
        .select(col("layout"), lit(pred).as("predicate"),
          col("n_files"), col("files_read"), col("rows_scanned"),
          lit(matched).as("rows_matched"),
          (if (matched == 0L) lit(null).cast("double")
           else round(col("rows_scanned").cast("double") / matched.toDouble, 4))
            .as("read_amplification"))
    audit("day_range", col("max_day") >= d1 && col("min_day") <= d2, mDay)
      .unionByName(audit("user_point", lit(u0).between(col("min_user"), col("max_user")), mUser))
      .orderBy("predicate", "layout")
  }

  def zonePruneSql(nFiles: Int): String = {
    val tlSql =
      s"""SELECT file_id, count(*) AS n_rows,
         |       count(DISTINCT user_id) AS n_users,
         |       min(user_id) AS min_user, max(user_id) AS max_user,
         |       min(day) AS min_day, max(day) AS max_day
         |FROM (
         |  SELECT user_id, day,
         |         ((us - tb.lo) * $nFiles) // (tb.hi - tb.lo + 1) AS file_id
         |  FROM dd, tb)
         |GROUP BY file_id""".stripMargin
    s"""WITH dd AS (
       |  SELECT user_id,
       |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |         epoch_us(ts) AS us
       |  FROM events),
       |tb AS (SELECT min(us) AS lo, max(us) AS hi FROM dd),
       |ub AS (SELECT min(user_id) AS ulo, max(user_id) AS uhi,
       |              min(day) AS dlo, max(day) AS dhi FROM dd),
       |p AS (SELECT ulo + (uhi - ulo) // 2 AS u0,
       |             dlo + (dhi - dlo) // 4 AS d1,
       |             dlo + (dhi - dlo) // 4 + 6 AS d2 FROM ub),
       |m AS (SELECT CAST(sum(CASE WHEN user_id = p.u0 THEN 1 ELSE 0 END) AS BIGINT) AS m_user,
       |             CAST(sum(CASE WHEN day BETWEEN p.d1 AND p.d2 THEN 1 ELSE 0 END) AS BIGINT) AS m_day
       |      FROM dd, p),
       |tl AS ($tlSql),
       |zs AS (${zorderFileStatsSql(nFiles)}),
       |hs AS (${hilbertFileStatsSql(nFiles)}),
       |stats AS (
       |  SELECT 'time' AS layout, * FROM tl
       |  UNION ALL SELECT 'zorder' AS layout, * FROM zs
       |  UNION ALL SELECT 'hilbert' AS layout, * FROM hs),
       |aud AS (
       |  SELECT layout, 'day_range' AS predicate,
       |         CAST(count(*) AS BIGINT) AS n_files,
       |         CAST(sum(CASE WHEN max_day >= p.d1 AND min_day <= p.d2 THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
       |         CAST(sum(CASE WHEN max_day >= p.d1 AND min_day <= p.d2 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
       |  FROM stats, p GROUP BY layout
       |  UNION ALL
       |  SELECT layout, 'user_point' AS predicate,
       |         CAST(count(*) AS BIGINT) AS n_files,
       |         CAST(sum(CASE WHEN p.u0 BETWEEN min_user AND max_user THEN 1 ELSE 0 END) AS BIGINT) AS files_read,
       |         CAST(sum(CASE WHEN p.u0 BETWEEN min_user AND max_user THEN n_rows ELSE 0 END) AS BIGINT) AS rows_scanned
       |  FROM stats, p GROUP BY layout)
       |SELECT aud.layout, aud.predicate, aud.n_files, aud.files_read, aud.rows_scanned,
       |       CASE WHEN aud.predicate = 'user_point' THEN m.m_user ELSE m.m_day END AS rows_matched,
       |       CASE WHEN aud.predicate = 'user_point' THEN
       |              (CASE WHEN m.m_user = 0 THEN NULL
       |                    ELSE round(CAST(aud.rows_scanned AS DOUBLE) / m.m_user, 4) END)
       |            ELSE
       |              (CASE WHEN m.m_day = 0 THEN NULL
       |                    ELSE round(CAST(aud.rows_scanned AS DOUBLE) / m.m_day, 4) END)
       |       END AS read_amplification
       |FROM aud, m ORDER BY aud.predicate, aud.layout""".stripMargin
  }

  /** Clustering-depth audit — the lakehouse OPTIMIZE metric the zone
    * maps deserve alongside [[zonePrune]]'s workload view: per layout and
    * per dimension, sweep the per-file [min, max] intervals and report
    * the MAX overlap depth (how many files a worst-case point predicate
    * must read) and the span-weighted AVERAGE depth in ppm (1e6 =
    * perfectly disjoint files). Ingest-time layout is deep on user_id
    * (every file spans all users); space-filling layouts trade a little
    * day-depth for shallow user-depth.
    *
    * Scale shape: the sweep runs over the MANIFESTS (2 boundary rows per
    * file), not the data; boundary deltas are pre-aggregated per point so
    * the running-sum window is tie-free and deterministic; all outputs
    * exact integers (truncating-DIV ppm).
    */
  def clusteringDepth(events: DataFrame, nFiles: Int): DataFrame = {
    // eager localCheckpoint, not persist: the manifest is nFiles×3 rows
    // but its LOGICAL plan carries the 16-step hilbert recurrence — the
    // four sweep aggregations below would each re-analyze it (driver
    // planning gaps dominating wall, the fixed-round rule from the graph
    // rounds). Bounded frame → eligible; cuts the plan to an RDD scan.
    val stats =
      timeFileStats(events, nFiles).withColumn("layout", lit("time"))
        .unionByName(zorderFileStats(events, nFiles).withColumn("layout", lit("zorder")))
        .unionByName(hilbertFileStats(events, nFiles).withColumn("layout", lit("hilbert")))
        .localCheckpoint()
    def depthFor(dim: String, lo: String, hi: String): DataFrame = {
      val bounds = stats.select(col("layout"), col(lo).as("b"), lit(1L).as("d"))
        .unionByName(stats.select(col("layout"), (col(hi) + 1L).as("b"), lit(-1L).as("d")))
        .groupBy(col("layout"), col("b")).agg(sum(col("d")).as("delta"))
      val w = Window.partitionBy(col("layout")).orderBy(col("b"))
      val seg = bounds
        .withColumn("depth", sum(col("delta")).over(w))
        .withColumn("next_b", lead(col("b"), 1).over(w))
        .filter(col("next_b").isNotNull && col("depth") > 0L)
        .withColumn("len", col("next_b") - col("b"))
      seg.groupBy(col("layout"))
        .agg(max(col("depth")).as("max_depth"),
          sum(col("depth") * col("len")).as("mass"), sum(col("len")).as("span"))
        .select(col("layout"), lit(dim).as("dim"), col("max_depth"),
          col("span").as("covered_span"),
          expr("CAST((1000000 * mass) DIV span AS BIGINT)").as("avg_depth_ppm"))
    }
    depthFor("user_id", "min_user", "max_user")
      .unionByName(depthFor("day", "min_day", "max_day"))
      .orderBy(col("dim"), col("layout"))
  }

  def clusteringDepthSql(nFiles: Int): String = {
    def sweep(dim: String, lo: String, hi: String, tag: String): String =
      s"""bnd$tag AS (
         |  SELECT layout, b, CAST(sum(d) AS BIGINT) AS delta FROM (
         |    SELECT layout, $lo AS b, 1 AS d FROM stats
         |    UNION ALL SELECT layout, $hi + 1 AS b, -1 AS d FROM stats) u
         |  GROUP BY layout, b),
         |sw$tag AS (
         |  SELECT layout, b,
         |         sum(delta) OVER (PARTITION BY layout ORDER BY b) AS depth,
         |         lead(b) OVER (PARTITION BY layout ORDER BY b) AS next_b
         |  FROM bnd$tag),
         |seg$tag AS (
         |  SELECT layout, depth, next_b - b AS len
         |  FROM sw$tag WHERE next_b IS NOT NULL AND depth > 0),
         |res$tag AS (
         |  SELECT layout, '$dim' AS dim,
         |         CAST(max(depth) AS BIGINT) AS max_depth,
         |         CAST(sum(len) AS BIGINT) AS covered_span,
         |         CAST((1000000 * sum(depth * len)) // sum(len) AS BIGINT) AS avg_depth_ppm
         |  FROM seg$tag GROUP BY layout)""".stripMargin
    s"""WITH dd AS (
       |  SELECT user_id,
       |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
       |         epoch_us(ts) AS us
       |  FROM events),
       |tb AS (SELECT min(us) AS lo, max(us) AS hi FROM dd),
       |tl AS (
       |  SELECT file_id, count(*) AS n_rows,
       |         count(DISTINCT user_id) AS n_users,
       |         min(user_id) AS min_user, max(user_id) AS max_user,
       |         min(day) AS min_day, max(day) AS max_day
       |  FROM (
       |    SELECT user_id, day,
       |           ((us - tb.lo) * $nFiles) // (tb.hi - tb.lo + 1) AS file_id
       |    FROM dd, tb)
       |  GROUP BY file_id),
       |zs AS (${zorderFileStatsSql(nFiles)}),
       |hs AS (${hilbertFileStatsSql(nFiles)}),
       |stats AS (
       |  SELECT 'time' AS layout, * FROM tl
       |  UNION ALL SELECT 'zorder' AS layout, * FROM zs
       |  UNION ALL SELECT 'hilbert' AS layout, * FROM hs),
       |${sweep("user_id", "min_user", "max_user", "u")},
       |${sweep("day", "min_day", "max_day", "d")}
       |SELECT layout, dim, max_depth, covered_span, avg_depth_ppm
       |FROM (SELECT * FROM resu UNION ALL SELECT * FROM resd) r
       |ORDER BY dim, layout""".stripMargin
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
