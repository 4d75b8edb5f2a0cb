package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing and regularization over the event stream — the
  * monitoring-and-forecasting layer (EWMA control lines, gap-filled
  * series for downstream models that need a dense time grid).
  *
  * Parity strategy: every smoothed value is computed in fixed-point
  * BIGINT (the repo's pagerank/hilbert device) — quantize the hourly
  * means to integral micro-units ONCE (round-then-cast, identical in
  * both engines), then all weighting is exact integer arithmetic, so
  * shuffle order and engine can never move a result by an ulp.
  */
object TimeSeries {

  /** Lags included in the truncated EWMA. 2^-(Lags+1) ≈ 5e-7 is below the
    * 6 dp output rounding, so truncation is invisible against the
    * infinite-horizon definition while keeping the window — and the
    * integer weights — bounded.
    */
  val EwmaLags = 19

  /** Exponentially weighted moving average (α = 1/2) of the hourly mean
    * `value` per event type.
    *
    * Definition (truncated, renormalized): over the last `EwmaLags`+1
    * hourly points x_{t-k} (k = 0..19, clipped at the series start),
    * ewma_t = Σ x_{t-k}·2^{19-k} / Σ 2^{19-k} — integer weights 2^{19-k}
    * are the α=1/2 exponential profile scaled by 2^20, and dividing by
    * the realized weight sum renormalizes the clipped/truncated window
    * (at t ≥ 19 the weights sum to 2^20 − 1, i.e. the standard EWMA up
    * to a 1-ulp-of-weight tail).
    *
    * Scale shape: the raw scan partial-aggregates to one row per
    * (type, hour) — 720·|types| rows here, O(hours·types) always — and
    * the 20-lag banded self-join expands that bounded frame 20×, never
    * the raw events. Both engines sum exact BIGINT products (hourly
    * means quantized to micro-units), so the result is bit-stable under
    * any partitioning.
    */
  def ewmaHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("x"))
      // micro-unit quantization: round BEFORE the long cast (Spark
      // truncates double→long where DuckDB rounds — build-notes pitfall)
      .withColumn("xq", round(col("x") * lit(1e6), 0).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("hb"))).cast("long"))
    val h = Caches.tracked(hourly.persist())
    val t = h.select(col("event_type"), col("hb"), col("rn"), col("x"))
    val i = h.select(col("event_type").as("et2"), col("rn").as("rn2"), col("xq"))
    t.join(i,
        col("event_type") === col("et2") &&
          col("rn2") <= col("rn") && col("rn2") >= col("rn") - lit(EwmaLags.toLong))
      .withColumn("w", expr(s"shiftleft(CAST(1 AS BIGINT), CAST($EwmaLags - (rn - rn2) AS INT))"))
      .groupBy(col("event_type"), col("hb"), col("x"))
      .agg(sum(col("xq") * col("w")).as("num"), sum(col("w")).as("den"))
      .select(col("event_type"),
        timestamp_micros(col("hb") * lit(3600000000L)).as("hour"),
        round(col("x"), 6).as("hourly_mean"),
        round(col("num").cast("double") / col("den").cast("double") / lit(1e6), 6)
          .as("ewma"))
      .orderBy("event_type", "hour")
  }

  val ewmaHourlySql: String =
    s"""WITH hourly AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
       |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
       |  FROM events GROUP BY 1, 2),
       |q AS (
       |  SELECT event_type, hb, x,
       |         CAST(round(x * 1e6, 0) AS BIGINT) AS xq,
       |         row_number() OVER (PARTITION BY event_type ORDER BY hb) AS rn
       |  FROM hourly),
       |j AS (
       |  SELECT t.event_type, t.hb, t.x,
       |         sum(i.xq * (1 << CAST($EwmaLags - (t.rn - i.rn) AS INTEGER))) AS num,
       |         sum(1 << CAST($EwmaLags - (t.rn - i.rn) AS INTEGER)) AS den
       |  FROM q t JOIN q i
       |    ON i.event_type = t.event_type
       |   AND i.rn <= t.rn AND i.rn >= t.rn - $EwmaLags
       |  GROUP BY 1, 2, 3)
       |SELECT event_type, make_timestamp(hb * 3600000000) AS hour,
       |       round(x, 6) AS hourly_mean,
       |       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 1e6, 6) AS ewma
       |FROM j ORDER BY event_type, hour""".stripMargin

  /** Gap-filled hourly event-count/value series per event type: the full
    * [min, max] hour grid per type is materialized (sequence + explode),
    * missing hours carry the most recent present hour's aggregate
    * forward, and `is_filled` marks synthesized rows — the dense-grid
    * contract time-series models need.
    *
    * Forward fill without IGNORE NULLS (not portable): `grp` counts
    * non-null rows up to the current one, so every filled row shares its
    * `grp` with the last present row, and a MAX over (type, grp) — both
    * engines — propagates that row's value.
    *
    * Scale shape: everything after the first partial-agg operates on the
    * O(hours·types) grid, never raw events; the grid explode is
    * per-type sequence() — no shuffle beyond the two grid-sized ones.
    */
  def gapFillHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
    val grid = hourly.groupBy(col("event_type"))
      .agg(min(col("hb")).as("lo"), max(col("hb")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hb"))
    val joined = grid.join(hourly, Seq("event_type", "hb"), "left")
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = joined
      .withColumn("grp", sum(when(col("n_events").isNotNull, 1L).otherwise(0L)).over(wOrd))
    val wGrp = Window.partitionBy(col("event_type"), col("grp"))
    filled
      .select(col("event_type"),
        timestamp_micros(col("hb") * lit(3600000000L)).as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(max(col("value_sum")).over(wGrp), 6).as("value_ffill"),
        col("n_events").isNull.as("is_filled"))
      .orderBy("event_type", "hour")
  }

  /** Robust outlier detection on the hourly mean series per event type:
    * median / MAD (median absolute deviation) with the conventional
    * 1.4826 consistency constant, flagging hours beyond 3 robust sigmas.
    * The z-score variant ([[Analytics]] anomaly query) is skewed by the
    * outliers themselves; MAD is the robust replacement.
    *
    * Scale shape: `percentile` aggregates over the HOURLY frame — the
    * buffer is bounded by hours·types (720·5 here), not corpus size, so
    * the exact median is affordable at any SF (unlike the raw-value
    * percentile audits, which pair with sketches). Parity: hourly means
    * are quantized to micro-units ONCE (the ewma/changepoint device);
    * both medians are then midpoints of integers, held doubled
    * (med2 = lo+hi, mad4 likewise) so they stay exact BIGINTs — no
    * engine ever interpolates free doubles — and the 3·1.4826 outlier
    * gate is the integer cross-multiply 10000·adev2 > 22239·mad4
    * (k = 44478/10000 exactly). Only the display columns divide.
    */
  def madOutliers(events: DataFrame): DataFrame = {
    val hourly = Caches.tracked(events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("x"))
      .withColumn("xq", round(col("x") * lit(1e6), 0).cast("long"))
      .persist())
    // 2·median of integers = lo+hi order stats — exact in the double the
    // percentile interpolation returns, so the BIGINT cast is lossless
    val med = hourly.groupBy(col("event_type"))
      .agg(expr("CAST(2 * percentile(xq, 0.5) AS BIGINT)").as("med2"))
    val dev = hourly.join(broadcast(med), "event_type")
      .withColumn("adev2", abs(col("xq") * 2L - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(max(col("med2")).as("med2"),
        expr("CAST(2 * percentile(adev2, 0.5) AS BIGINT)").as("mad4"),
        count(lit(1)).as("n_hours"))
    dev.select(col("event_type"), col("hb"), col("adev2"))
      .join(broadcast(mad.select(col("event_type"), col("mad4"))), "event_type")
      .groupBy(col("event_type"))
      .agg(sum(when(col("adev2") * 10000L > lit(22239L) * col("mad4"), 1L)
        .otherwise(0L)).as("n_outliers"))
      .join(mad, "event_type")
      .select(col("event_type"), col("n_hours"),
        // + 0.0: a negative median rounding to exactly zero must not
        // export -0.0 on one engine and +0.0 on the other
        (round(col("med2").cast("double") / lit(2000000.0), 6) + lit(0.0))
          .as("median_hourly"),
        round(col("mad4").cast("double") / lit(4000000.0), 6).as("mad"),
        col("n_outliers"),
        round(col("n_outliers").cast("double") / col("n_hours").cast("double"), 6)
          .as("outlier_rate"))
      .orderBy("event_type")
  }

  val madOutliersSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |q AS (
      |  SELECT event_type, hb, CAST(round(x * 1e6, 0) AS BIGINT) AS xq FROM hourly),
      |med AS (
      |  SELECT event_type, CAST(2 * quantile_cont(xq, 0.5) AS BIGINT) AS med2
      |  FROM q GROUP BY event_type),
      |dev AS (
      |  SELECT qq.event_type, qq.hb, abs(qq.xq * 2 - m.med2) AS adev2
      |  FROM q qq JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT d.event_type, max(m.med2) AS med2,
      |         CAST(2 * quantile_cont(d.adev2, 0.5) AS BIGINT) AS mad4,
      |         count(*) AS n_hours
      |  FROM dev d JOIN med m USING (event_type) GROUP BY d.event_type),
      |outl AS (
      |  SELECT d.event_type,
      |         CAST(sum(CASE WHEN d.adev2 * 10000 > 22239 * m.mad4
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |  FROM dev d JOIN mad m USING (event_type)
      |  GROUP BY d.event_type)
      |SELECT m.event_type, m.n_hours,
      |       round(CAST(m.med2 AS DOUBLE) / 2000000.0, 6) + 0.0 AS median_hourly,
      |       round(CAST(m.mad4 AS DOUBLE) / 4000000.0, 6) AS mad,
      |       o.n_outliers,
      |       round(CAST(o.n_outliers AS DOUBLE) / CAST(m.n_hours AS DOUBLE), 6) AS outlier_rate
      |FROM mad m JOIN outl o USING (event_type)
      |ORDER BY m.event_type""".stripMargin

  /** Binary change-point detection on the hourly mean series per event
    * type: the split hour minimizing SSE_left + SSE_right (the first
    * step of binary-segmentation changepoint search), with the
    * before/after means and the variance reduction achieved.
    *
    * Parity: hourly means are quantized to milli-units ONCE; prefix
    * sums and sums-of-squares are exact BIGINT window sums; every
    * per-split cost is a fixed expression over exact integers (the
    * long→double conversions and divisions are correctly rounded,
    * identical in both engines), and the argmin tie-breaks on the
    * earlier hour. No double is ever re-aggregated.
    *
    * Scale shape: O(hours·types) after the first partial-agg; the
    * per-type windows are bounded by the series length, and the argmin
    * is a window top-1, not a sort.
    */
  def changepointHourly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("x"))
      .withColumn("xq", round(col("x") * lit(1e3), 0).cast("long"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("hb"))
    val pre = hourly
      .withColumn("t", row_number().over(wOrd).cast("long"))
      .withColumn("cs", sum(col("xq")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("css", sum(col("xq") * col("xq")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val p = Caches.tracked(pre.persist())
    val totals = p.groupBy(col("event_type"))
      .agg(max(col("t")).as("n"), max(col("cs")).as("cs_n"), max(col("css")).as("css_n"))
    val costs = p.join(broadcast(totals), "event_type")
      .filter(col("t") < col("n"))
      .withColumn("sse_l",
        col("css").cast("double") -
          (col("cs") * col("cs")).cast("double") / col("t").cast("double"))
      .withColumn("sse_r",
        (col("css_n") - col("css")).cast("double") -
          ((col("cs_n") - col("cs")) * (col("cs_n") - col("cs"))).cast("double") /
            (col("n") - col("t")).cast("double"))
      .withColumn("cost", col("sse_l") + col("sse_r"))
    val wMin = Window.partitionBy(col("event_type"))
      .orderBy(col("cost"), col("hb"))
    costs.withColumn("rn", row_number().over(wMin)).filter(col("rn") === 1)
      .select(col("event_type"),
        timestamp_micros((col("hb") + 1) * lit(3600000000L)).as("split_at"),
        col("t").as("n_before"), (col("n") - col("t")).as("n_after"),
        round(col("cs").cast("double") / col("t").cast("double") / lit(1e3), 4)
          .as("mean_before"),
        round((col("cs_n") - col("cs")).cast("double") /
          (col("n") - col("t")).cast("double") / lit(1e3), 4).as("mean_after"),
        round((col("css_n").cast("double") -
          (col("cs_n") * col("cs_n")).cast("double") / col("n").cast("double") -
          col("cost")) / lit(1e6), 4).as("variance_reduction"))
      .orderBy("event_type")
  }

  val changepointHourlySql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
      |         CAST(round((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
      |                     / CAST(count(*) AS DOUBLE)) * 1e3, 0) AS BIGINT) AS xq
      |  FROM events GROUP BY 1, 2),
      |pre AS (
      |  SELECT event_type, hb,
      |         CAST(row_number() OVER w AS BIGINT) AS t,
      |         sum(xq) OVER (PARTITION BY event_type ORDER BY hb
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cs,
      |         sum(xq * xq) OVER (PARTITION BY event_type ORDER BY hb
      |                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS css
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hb)),
      |tot AS (
      |  SELECT event_type, max(t) AS n, max(cs) AS cs_n, max(css) AS css_n
      |  FROM pre GROUP BY event_type),
      |costs AS (
      |  SELECT p.*, o.n, o.cs_n, o.css_n,
      |    (CAST(p.css AS DOUBLE) - CAST(p.cs * p.cs AS DOUBLE) / CAST(p.t AS DOUBLE))
      |    + (CAST(o.css_n - p.css AS DOUBLE)
      |       - CAST((o.cs_n - p.cs) * (o.cs_n - p.cs) AS DOUBLE)
      |         / CAST(o.n - p.t AS DOUBLE)) AS cost
      |  FROM pre p JOIN tot o USING (event_type)
      |  WHERE p.t < o.n),
      |best AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cost, hb) AS rn
      |  FROM costs)
      |SELECT event_type,
      |       make_timestamp((hb + 1) * 3600000000) AS split_at,
      |       t AS n_before, n - t AS n_after,
      |       round(CAST(cs AS DOUBLE) / CAST(t AS DOUBLE) / 1e3, 4) AS mean_before,
      |       round(CAST(cs_n - cs AS DOUBLE) / CAST(n - t AS DOUBLE) / 1e3, 4) AS mean_after,
      |       round((CAST(css_n AS DOUBLE)
      |              - CAST(cs_n * cs_n AS DOUBLE) / CAST(n AS DOUBLE)
      |              - cost) / 1e6, 4) AS variance_reduction
      |FROM best WHERE rn = 1 ORDER BY event_type""".stripMargin

  /** One-sided CUSUM drift detector over per-event values — the
    * SEQUENTIAL companion to [[changepointHourly]] (which finds the one
    * best retrospective split; CUSUM is what a monitor runs forward,
    * alarming as soon as the recent mean exceeds reference + slack).
    *
    * Split: events up to the stream's mid timestamp are the REFERENCE
    * (n_ref, Σx as exact centi-BIGINTs); the post half is scored in
    * arrival order (ts, event_id). The classic recurrence
    * S_n = max(0, S_{n−1} + (x_n − μ_ref − slack)) is order-sequential,
    * but it has the exact closed form S_n = P_n − min(0, min_{k≤n} P_k)
    * over prefix sums P of the increments — so the whole detector is
    * ONE ordered window (prefix sum + running min), no iteration, no
    * state. Increments are scaled by n_ref to stay integral:
    * D_i = n_ref·x_i − Σx_ref − slack·n_ref, and the alarm test
    * S_n > h·n_ref is the same cross-multiplied comparison both engines
    * evaluate in BIGINT.
    *
    * Scale shape: one broadcast of the per-type reference row, one
    * shuffle on event_type for the ordered window (the per-series
    * sessionize shape — series count is the parallelism unit), one
    * final fold. Constants: slack 2500 centi (≈ half the value std) and
    * h 20000 centi give an informative alarm mix on both fixture
    * generations (calibrated, not load-bearing).
    */
  def cusumDrift(events: DataFrame, slackCenti: Long, thresholdCenti: Long): DataFrame = {
    val e = events.select(col("event_type"), expr("unix_micros(ts)").as("us"),
      col("event_id"), expr("CAST(round(value * 100) AS BIGINT)").as("xc"))
    val mid = e.agg(expr("(min(us) + max(us)) div 2").as("mid"))
    val withMid = e.crossJoin(broadcast(mid))
    val ref = withMid.filter(col("us") <= col("mid"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_ref"), sum(col("xc")).as("s_ref"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))
    val wCur = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = withMid.filter(col("us") > col("mid"))
      .join(broadcast(ref), "event_type")
      .withColumn("d",
        col("n_ref") * col("xc") - col("s_ref") - lit(slackCenti) * col("n_ref"))
      .withColumn("pfx", sum(col("d")).over(wCur))
      .withColumn("cusum", col("pfx") - least(min(col("pfx")).over(wCur), lit(0L)))
    scored.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_post"),
        max(col("n_ref")).as("n_ref"),
        sum(when(col("cusum") > lit(thresholdCenti) * col("n_ref"), 1L).otherwise(0L))
          .as("n_alarms"),
        min(when(col("cusum") > lit(thresholdCenti) * col("n_ref"), col("us")))
          .as("first_us"),
        expr("max(cusum div n_ref)").as("max_cusum_centi"))
      .select(col("event_type"), col("n_post"), col("n_ref"), col("n_alarms"),
        timestamp_micros(col("first_us")).as("first_alarm_ts"),
        col("max_cusum_centi"))
      .orderBy("event_type")
  }

  /** Oracle mirror of [[cusumDrift]]: the same centi quantization,
    * n_ref-scaled increments, prefix-sum/running-min closed form and
    * cross-multiplied alarm test. */
  def cusumDriftSql(slackCenti: Long, thresholdCenti: Long): String =
    s"""WITH e AS (
       |  SELECT event_type, epoch_us(ts) AS us, event_id,
       |         CAST(round(value * 100) AS BIGINT) AS xc
       |  FROM events),
       |m AS (SELECT (min(us) + max(us)) // 2 AS mid FROM e),
       |ref AS (
       |  SELECT event_type, count(*) AS n_ref, CAST(sum(xc) AS BIGINT) AS s_ref
       |  FROM e, m WHERE us <= mid GROUP BY event_type),
       |post AS (
       |  SELECT e.event_type, e.us, e.event_id, r.n_ref,
       |         r.n_ref * e.xc - r.s_ref - $slackCenti * r.n_ref AS d
       |  FROM e, m JOIN ref r ON r.event_type = e.event_type
       |  WHERE e.us > m.mid),
       |p AS (
       |  SELECT *, sum(d) OVER w AS pfx
       |  FROM post
       |  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |s AS (
       |  SELECT *, pfx - least(min(pfx) OVER w, 0) AS cusum
       |  FROM p
       |  WINDOW w AS (PARTITION BY event_type ORDER BY us, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, count(*) AS n_post,
       |       CAST(max(n_ref) AS BIGINT) AS n_ref,
       |       CAST(sum(CASE WHEN cusum > $thresholdCenti * n_ref THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_alarms,
       |       make_timestamp(min(CASE WHEN cusum > $thresholdCenti * n_ref
       |                               THEN us END)) AS first_alarm_ts,
       |       CAST(max(cusum // n_ref) AS BIGINT) AS max_cusum_centi
       |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Classical seasonal decomposition of the daily revenue series:
    * trend = centered 7-day moving average (full windows only),
    * seasonal = per-weekday mean of the detrended series, residual =
    * detrended − seasonal. The trend window sums in DECIMAL (exact,
    * association-free — Spark's per-row frame iteration vs DuckDB's
    * segment tree would otherwise differ in the last ulp) and the
    * seasonal means run through micro-unit fixed point, so every output
    * is engine- and shuffle-order-independent.
    *
    * Scale shape: everything after the first partial-agg is
    * O(days) — the 30-row daily frame, two windows, one 7-row groupBy.
    */
  /** Shared prefix of [[seasonalDecompose]] and [[seasonalStrength]]:
    * daily revenue, centered 7-day MA trend (full windows only), the
    * micro-quantized detrended series and the weekday key. */
  private[ops] def detrendedDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).as("v_dec"))
      .withColumn("v", col("v_dec").cast("double"))
    val wMa = Window.orderBy(col("d")).rowsBetween(-3, 3)
    daily
      .withColumn("t_sum", sum(col("v_dec")).over(wMa))
      .withColumn("t_n", count(lit(1)).over(wMa))
      .filter(col("t_n") === 7)
      .withColumn("trend", col("t_sum").cast("double") / lit(7.0))
      .withColumn("detr", col("v") - col("trend"))
      .withColumn("dq", round(col("detr") * lit(1e6), 0).cast("long"))
      .withColumn("wd", col("d") % 7)
  }

  def seasonalDecompose(events: DataFrame): DataFrame = {
    val trended = detrendedDaily(events)
    val t = Caches.tracked(trended.persist())
    val seasonal = t.groupBy(col("wd"))
      .agg((sum(col("dq")).cast("double") / count(lit(1)).cast("double") / lit(1e6))
        .as("seasonal"))
    t.join(broadcast(seasonal), "wd")
      .select(
        timestamp_micros(col("d") * lit(86400000000L)).as("day"),
        round(col("v"), 6).as("revenue"),
        round(col("trend"), 6).as("trend"),
        round(col("seasonal"), 6).as("seasonal"),
        (round(col("detr") - col("seasonal"), 6) + lit(0.0)).as("residual"))
      .orderBy("day")
  }

  val seasonalDecomposeSql: String =
    """WITH daily AS (
      |  SELECT epoch_us(ts) // 86400000000 AS d,
      |         sum(CAST(value AS DECIMAL(18,2))) AS v_dec
      |  FROM events GROUP BY 1),
      |ma AS (
      |  SELECT d, CAST(v_dec AS DOUBLE) AS v,
      |         sum(v_dec) OVER w AS t_sum,
      |         count(*) OVER w AS t_n
      |  FROM daily
      |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      |tr AS (
      |  SELECT d, v, CAST(t_sum AS DOUBLE) / 7.0 AS trend,
      |         v - CAST(t_sum AS DOUBLE) / 7.0 AS detr,
      |         CAST(round((v - CAST(t_sum AS DOUBLE) / 7.0) * 1e6, 0) AS BIGINT) AS dq,
      |         d % 7 AS wd
      |  FROM ma WHERE t_n = 7),
      |seas AS (
      |  SELECT wd, CAST(sum(dq) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1e6 AS seasonal
      |  FROM tr GROUP BY wd)
      |SELECT make_timestamp(t.d * 86400000000) AS day,
      |       round(t.v, 6) AS revenue,
      |       round(t.trend, 6) AS trend,
      |       round(s.seasonal, 6) AS seasonal,
      |       round(t.detr - s.seasonal, 6) + 0.0 AS residual
      |FROM tr t JOIN seas s USING (wd)
      |ORDER BY day""".stripMargin

  /** Seasonal-strength rider on the [[seasonalDecompose]] lineage — the
    * one number that says whether the weekly component is worth
    * modeling: strength = 1 − SS(residual)/SS(detrended) on the
    * micro-quantized detrended series (already ≈ zero-mean by MA
    * construction, so raw sums of squares are the DEFINED statistic —
    * no rational means in the gate).
    *
    * Exactness: weekday means become integers via the +K floor-shift
    * (dq can be negative; DIV truncates where // floors), residual
    * = dq − seasonal_q stays integral, and the squared sums ride
    * DECIMAL(38,0)/HUGEINT (dq² overflows BIGINT at corpus revenue
    * scale). Export truncates to milli² BIGINTs (the wide-decimal dump
    * rule); the ppm ratio computes on the full sums first.
    *
    * Scale shape: the |days|-bounded detrended frame, one weekday
    * fold broadcast back, one scalar fold.
    */
  def seasonalStrength(events: DataFrame): DataFrame = {
    val t = detrendedDaily(events)
    val K = 1000000000000L // shift: |Σdq per weekday| << K·count
    val seas = t.groupBy(col("wd"))
      .agg(expr(s"CAST((sum(dq) + $K * count(1)) DIV count(1) AS BIGINT) - $K")
        .as("sq"))
    t.join(broadcast(seas), "wd")
      .withColumn("rq", col("dq") - col("sq"))
      .agg(count(lit(1)).as("n_days"),
        sum(expr("CAST(dq AS DECIMAL(38,0)) * dq")).as("ssd"),
        sum(expr("CAST(rq AS DECIMAL(38,0)) * rq")).as("ssr"))
      .select(col("n_days"),
        expr("CAST(ssd DIV 1000000 AS BIGINT)").as("ss_detrended_milli2"),
        expr("CAST(ssr DIV 1000000 AS BIGINT)").as("ss_residual_milli2"),
        // floor-shift: ssr can exceed ssd by a rounding hair (integer
        // weekday means near-minimize SS, they don't minimize it), and a
        // negative numerator splits DIV (trunc) from // (floor)
        expr("""CASE WHEN ssd = 0 THEN NULL
               |     ELSE CAST((1000000 * (ssd - ssr) + 10000000 * ssd) DIV ssd
               |               AS BIGINT) - 10000000 END"""
          .stripMargin).as("strength_ppm"))
  }

  val seasonalStrengthSql: String = {
    val K = 1000000000000L
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // 86400000000 AS d,
       |         sum(CAST(value AS DECIMAL(18,2))) AS v_dec
       |  FROM events GROUP BY 1),
       |ma AS (
       |  SELECT d, CAST(v_dec AS DOUBLE) AS v,
       |         sum(v_dec) OVER w AS t_sum,
       |         count(*) OVER w AS t_n
       |  FROM daily
       |  WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |tr AS (
       |  SELECT d,
       |         CAST(round((v - CAST(t_sum AS DOUBLE) / 7.0) * 1e6, 0) AS BIGINT) AS dq,
       |         d % 7 AS wd
       |  FROM ma WHERE t_n = 7),
       |seas AS (
       |  SELECT wd, CAST((sum(dq) + $K * count(*)) // count(*) AS BIGINT) - $K AS sq
       |  FROM tr GROUP BY wd),
       |r AS (
       |  SELECT t.dq, t.dq - s.sq AS rq
       |  FROM tr t JOIN seas s USING (wd)),
       |f AS (
       |  SELECT count(*) AS n_days,
       |         sum(CAST(dq AS HUGEINT) * dq) AS ssd,
       |         sum(CAST(rq AS HUGEINT) * rq) AS ssr
       |  FROM r)
       |SELECT n_days,
       |       CAST(ssd // 1000000 AS BIGINT) AS ss_detrended_milli2,
       |       CAST(ssr // 1000000 AS BIGINT) AS ss_residual_milli2,
       |       CASE WHEN ssd = 0 THEN NULL
       |            ELSE CAST((1000000 * (ssd - ssr) + 10000000 * ssd) // ssd
       |                      AS BIGINT) - 10000000 END AS strength_ppm
       |FROM f""".stripMargin
  }

  val gapFillHourlySql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
      |         count(*) AS n_events,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |  FROM events GROUP BY 1, 2),
      |grid AS (
      |  SELECT event_type, unnest(range(min(hb), max(hb) + 1)) AS hb
      |  FROM hourly GROUP BY event_type),
      |j AS (
      |  SELECT g.event_type, g.hb, h.n_events, h.value_sum
      |  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hb = g.hb),
      |f AS (
      |  SELECT *, sum(CASE WHEN n_events IS NOT NULL THEN 1 ELSE 0 END)
      |              OVER (PARTITION BY event_type ORDER BY hb
      |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      |  FROM j)
      |SELECT event_type, make_timestamp(hb * 3600000000) AS hour,
      |       coalesce(n_events, 0) AS n_events,
      |       round(max(value_sum) OVER (PARTITION BY event_type, grp), 6) AS value_ffill,
      |       n_events IS NULL AS is_filled
      |FROM f ORDER BY event_type, hour""".stripMargin

  /** Local peak detection on the hourly mean series: a peak is an hour
    * strictly above both neighbors AND above the series mean by a
    * prominence factor — lag/lead windows over the bounded hourly
    * frame, fixed-point comparisons only (micro-unit means vs the
    * integer-scaled global mean, cross-multiplied so no division
    * happens before a comparison).
    *
    * Output: the peaks per event type with their neighbor deltas.
    */
  def peakDetection(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("x"))
      .withColumn("xq", round(col("x") * lit(1e6), 0).cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hb"))
    val h = Caches.tracked(hourly
      .withColumn("prv", lag(col("xq"), 1).over(w))
      .withColumn("nxt", lead(col("xq"), 1).over(w))
      .persist())
    // prominence gate: xq > 1.2 * mean  ⇔  10*xq > 12*mean_q  with
    // mean_q = sum(xq)/n held as exact integers (cross-multiplied:
    // 10*xq*n > 12*sum — no division, no rounding boundary)
    val stats = h.groupBy(col("event_type"))
      .agg(sum(col("xq")).as("sxq"), count(lit(1)).as("nh"))
    h.join(broadcast(stats), "event_type")
      .filter(col("prv").isNotNull && col("nxt").isNotNull &&
        col("xq") > col("prv") && col("xq") > col("nxt") &&
        col("xq") * 10L * col("nh") > col("sxq") * 12L)
      .select(col("event_type"),
        timestamp_micros(col("hb") * lit(3600000000L)).as("peak_hour"),
        round(col("x"), 6).as("peak_value"),
        (col("xq") - col("prv")).as("rise_micro"),
        (col("xq") - col("nxt")).as("fall_micro"))
      .orderBy("event_type", "peak_hour")
  }

  val peakDetectionSql: String =
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS x
      |  FROM events GROUP BY 1, 2),
      |q AS (
      |  SELECT event_type, hb, x,
      |         CAST(round(x * 1e6, 0) AS BIGINT) AS xq
      |  FROM hourly),
      |n AS (
      |  SELECT *, lag(xq) OVER w AS prv, lead(xq) OVER w AS nxt
      |  FROM q WINDOW w AS (PARTITION BY event_type ORDER BY hb)),
      |st AS (
      |  SELECT event_type, CAST(sum(xq) AS BIGINT) AS sxq, count(*) AS nh
      |  FROM q GROUP BY event_type)
      |SELECT n.event_type,
      |       make_timestamp(n.hb * 3600000000) AS peak_hour,
      |       round(n.x, 6) AS peak_value,
      |       n.xq - n.prv AS rise_micro,
      |       n.xq - n.nxt AS fall_micro
      |FROM n JOIN st USING (event_type)
      |WHERE n.prv IS NOT NULL AND n.nxt IS NOT NULL
      |  AND n.xq > n.prv AND n.xq > n.nxt
      |  AND n.xq * 10 * st.nh > st.sxq * 12
      |ORDER BY n.event_type, peak_hour""".stripMargin

  /** Multi-window multi-burn-rate SLO alerting (the SRE error-budget
    * pattern): per hour, the error-rate burn over the 1-hour and
    * 6-hour windows relative to an SLO error budget; an alert fires
    * when BOTH exceed their thresholds (short window = fast detection,
    * long window = flap suppression).
    *
    * Parity: windowed counts are exact integer RANGE-frame sums (range
    * on the hour index handles missing hours identically in both
    * engines); burn thresholds compare by integer cross-multiplication
    * — errors·1000 > thr·slo·total with thr·slo·1000 precomputed as an
    * exact integer in Scala — so no division happens before any
    * comparison. Output rates are single exact-integer divisions.
    */
  def sloBurnRate(events: DataFrame, sloMilli: Long,
                  thrShortMilli: Long, thrLongMilli: Long): DataFrame = {
    val hourly = events
      .groupBy(expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
    val w6 = Window.orderBy(col("hb")).rangeBetween(-5, 0)
    // burn_1h > thrS  ⇔  errors/total > thrS·slo
    //               ⇔  errors·1e6 > (thrS·slo in milli²)·total
    val gateS = sloMilli * thrShortMilli // exact milli² units
    val gateL = sloMilli * thrLongMilli
    hourly
      .withColumn("e6", sum(col("errors")).over(w6))
      .withColumn("t6", sum(col("total")).over(w6))
      .filter(col("errors") * 1000000L > lit(gateS) * col("total") &&
        col("e6") * 1000000L > lit(gateL) * col("t6"))
      .select(
        timestamp_micros(col("hb") * lit(3600000000L)).as("hour"),
        col("errors"), col("total"),
        round(col("errors").cast("double") / col("total").cast("double"), 6)
          .as("rate_1h"),
        col("e6").as("errors_6h"), col("t6").as("total_6h"),
        round(col("e6").cast("double") / col("t6").cast("double"), 6).as("rate_6h"))
      .orderBy("hour")
  }

  def sloBurnRateSql(sloMilli: Long, thrShortMilli: Long, thrLongMilli: Long): String = {
    val gateS = sloMilli * thrShortMilli
    val gateL = sloMilli * thrLongMilli
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // 3600000000 AS hb, count(*) AS total,
       |         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
       |  FROM events GROUP BY 1),
       |win AS (
       |  SELECT *,
       |         CAST(sum(errors) OVER w AS BIGINT) AS e6,
       |         CAST(sum(total) OVER w AS BIGINT) AS t6
       |  FROM hourly
       |  WINDOW w AS (ORDER BY hb RANGE BETWEEN 5 PRECEDING AND CURRENT ROW))
       |SELECT make_timestamp(hb * 3600000000) AS hour,
       |       errors, total,
       |       round(CAST(errors AS DOUBLE) / CAST(total AS DOUBLE), 6) AS rate_1h,
       |       e6 AS errors_6h, t6 AS total_6h,
       |       round(CAST(e6 AS DOUBLE) / CAST(t6 AS DOUBLE), 6) AS rate_6h
       |FROM win
       |WHERE errors * 1000000 > $gateS * total
       |  AND e6 * 1000000 > $gateL * t6
       |ORDER BY hour""".stripMargin
  }

  /** Holt double-exponential smoothing (level + trend) over the daily
    * revenue series, α = 1/2 and β = 1/4 — the forecasting layer on top
    * of [[seasonalDecompose]]'s diagnosis. First `HoltDays` days only
    * (both engines window identically if a regeneration lengthens the
    * fixture).
    *
    * The recurrence l_t = (x_t + l_{t-1} + b_{t-1}) div 2,
    * b_t = (l_t − l_{t-1} + 3·b_{t-1}) div 4 runs in EXACT milli-unit
    * integers with sign-split truncating division (Spark DIV and DuckDB
    * // diverge on negatives — floor vs truncate — so both engines
    * compute sign·(|v| div k)). The sequential loop runs on the DRIVER
    * over the collected daily frame — bounded at `HoltDays` rows, the
    * MMR/centroid device; the oracle unrolls the same steps as chained
    * one-row CTEs. fitted_t = (l_{t-1}+b_{t-1})/1e3 is the one-step-
    * ahead forecast; residuals stay UNROUNDED (identical doubles —
    * rounding would only add a tie boundary).
    */
  val HoltDays = 30

  def holtDaily(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .orderBy("d")
      .limit(HoltDays)
    val pts = daily.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    def q(x: Double): Long =
      new java.math.BigDecimal(x * 1e3).setScale(0, java.math.RoundingMode.HALF_UP)
        .longValue()
    def sdiv(v: Long, k: Long): Long = if (v < 0) -((-v) / k) else v / k
    var l = 0L; var b = 0L
    val out = pts.zipWithIndex.map { case ((d, x), i) =>
      val xq = q(x)
      val (fitted, lPrev) = if (i == 0) (None: Option[Double], 0L) else (Some((l + b) / 1e3), l)
      if (i == 0) { l = xq; b = 0L }
      else {
        val lNew = sdiv(xq + l + b, 2L)
        b = sdiv(lNew - l + 3L * b, 4L)
        l = lNew
      }
      (d, x, l / 1e3, b / 1e3, fitted, fitted.map(f => x - f))
    }
    out.toSeq.toDF("d", "revenue", "level", "trend", "fitted", "residual")
      .select(timestamp_micros(col("d") * lit(86400000000L)).as("day"),
        col("revenue"), col("level"), col("trend"), col("fitted"), col("residual"))
      .orderBy("day")
  }

  /** Shared oracle CTE chain for the Holt recurrence: `daily`, `q`
    * (quantized milli-units + rank), `h1..hN`, and `hist` (all states).
    * Pre-stripped — safe to interpolate into stripMargin templates.
    */
  private val holtChainSql: String = {
    def sdiv(e: String, k: Int) =
      s"CAST(CASE WHEN ($e) < 0 THEN -((-($e)) // $k) ELSE ($e) // $k END AS BIGINT)"
    val steps = (2 to HoltDays).map { t =>
      s"""h$t AS (
         |  SELECT $t AS rn,
         |         ${sdiv(s"q.xq + h.l + h.b", 2)} AS l,
         |         ${sdiv(s"${sdiv(s"q.xq + h.l + h.b", 2)} - h.l + 3 * h.b", 4)} AS b
         |  FROM q, h${t - 1} h WHERE q.rn = $t)""".stripMargin
    }.mkString(",\n")
    val hist = (1 to HoltDays).map(t => s"SELECT * FROM h$t").mkString("\n  UNION ALL ")
    s"""daily AS (
       |  SELECT epoch_us(ts) // 86400000000 AS d,
       |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x
       |  FROM events GROUP BY 1 ORDER BY d LIMIT $HoltDays),
       |q AS (
       |  SELECT d, x, CAST(round(x * 1e3, 0) AS BIGINT) AS xq,
       |         row_number() OVER (ORDER BY d) AS rn
       |  FROM daily),
       |h1 AS (SELECT 1 AS rn, xq AS l, CAST(0 AS BIGINT) AS b FROM q WHERE rn = 1),
       |$steps,
       |hist AS (
       |  $hist)""".stripMargin
  }

  val holtDailySql: String = {
    s"""WITH $holtChainSql
       |SELECT make_timestamp(q.d * 86400000000) AS day,
       |       q.x AS revenue,
       |       CAST(h.l AS DOUBLE) / 1e3 AS level,
       |       CAST(h.b AS DOUBLE) / 1e3 AS trend,
       |       CAST(p.l + p.b AS DOUBLE) / 1e3 AS fitted,
       |       q.x - CAST(p.l + p.b AS DOUBLE) / 1e3 AS residual
       |FROM q JOIN hist h ON h.rn = q.rn
       |LEFT JOIN hist p ON p.rn = q.rn - 1
       |ORDER BY day""".stripMargin
  }

  /** Pairwise Pearson correlation among the event types' hourly count
    * series — the "which metrics move together" matrix an observability
    * or feature-selection pass computes. The series are ZERO-FILLED
    * over the observed hour grid first (an inner join on hours where
    * both types fired would silently condition on activity — the
    * classic correlation-of-counts bug); the grid is O(hours·|types|),
    * bounded by the time range, never by event volume. The six
    * sufficient statistics per pair are exact BIGINT sums (counts are
    * integers), and the correlation is one fixed double expression on
    * them — the [[Graph.assortativity]] device; `+ 0.0` normalizes the
    * IEEE −0.0 a tiny negative correlation rounds to. Zero-variance
    * series yield NULL (guarded divisor) identically in both engines.
    */
  def typeCorrelation(events: DataFrame): DataFrame = {
    val hc = events
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val hcC = Caches.tracked(hc.persist())
    val hours = hcC.select(col("h")).distinct()
    val types = hcC.select(col("event_type")).distinct()
    val grid = Caches.tracked(hours.crossJoin(broadcast(types))
      .join(hcC, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
      .persist())
    val p = grid.as("x").join(grid.as("y"),
        col("x.h") === col("y.h") && col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("x.n")).as("sx"), sum(col("y.n")).as("sy"),
        sum(col("x.n") * col("y.n")).as("sxy"),
        sum(col("x.n") * col("x.n")).as("sxx"),
        sum(col("y.n") * col("y.n")).as("syy"))
    p.select(col("type_a"), col("type_b"), col("n_hours"),
        round((col("n_hours").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          nullif(sqrt((col("n_hours").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            (col("n_hours").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), lit(0.0)), 6)
          .plus(lit(0.0)).as("corr"))
      .orderBy("type_a", "type_b")
  }

  val typeCorrelationSql: String =
    """WITH hc AS (
      |  SELECT epoch_us(ts) // 3600000000 AS h, event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |hours AS (SELECT DISTINCT h FROM hc),
      |types AS (SELECT DISTINCT event_type FROM hc),
      |grid AS (
      |  SELECT hours.h, types.event_type, coalesce(hc.n, 0) AS n
      |  FROM hours CROSS JOIN types
      |  LEFT JOIN hc ON hc.h = hours.h AND hc.event_type = types.event_type),
      |p AS (
      |  SELECT x.event_type AS type_a, y.event_type AS type_b,
      |         count(*) AS n_hours,
      |         CAST(sum(x.n) AS BIGINT) AS sx, CAST(sum(y.n) AS BIGINT) AS sy,
      |         CAST(sum(x.n * y.n) AS BIGINT) AS sxy,
      |         CAST(sum(x.n * x.n) AS BIGINT) AS sxx,
      |         CAST(sum(y.n * y.n) AS BIGINT) AS syy
      |  FROM grid x JOIN grid y ON x.h = y.h AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_hours,
      |       round((CAST(n_hours AS DOUBLE) * CAST(sxy AS DOUBLE)
      |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |             / nullif(sqrt((CAST(n_hours AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                           * (CAST(n_hours AS DOUBLE) * CAST(syy AS DOUBLE)
      |                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6)
      |         + 0.0 AS corr
      |FROM p ORDER BY type_a, type_b""".stripMargin

  /** Autocorrelation function of the hourly event-count series at the
    * declared lags — the seasonality screen a capacity/forecasting layer
    * runs first (a strong lag-24 spike = daily cycle; all-flat = no
    * structure worth a seasonal model). Series on a DENSE hour grid
    * (missing hours are true zeros — sparse alignment would silently
    * skip gaps and bias every lag).
    *
    * Parity/scale: the [[typeCorrelation]] device — all moments are
    * exact integer sums (shuffle-order free), Pearson is ONE fixed
    * double expression per lag row, rounded (+0.0). One aggregation to
    * hourly counts (|hours|-bounded, data-sized pass), then one
    * lag-exploded self-join on the hour grid: |hours|·|lags| rows, never
    * data-sized. The grid frame is persisted and reused for both join
    * sides.
    */
  def autocorrelation(events: DataFrame, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be >= 1: $lags")
    val hc = events
      .groupBy(expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(count(lit(1)).as("n"))
    val grid = Caches.tracked(hc.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("h"))
      .join(hc, Seq("h"), "left")
      .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
      .persist())
    val p = grid.as("x")
      .withColumn("lag", explode(lit(lags.map(_.toLong).toArray)))
      .join(grid.as("y"), col("y.h") === col("x.h") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x.n")).as("sx"), sum(col("y.n")).as("sy"),
        sum(col("x.n") * col("y.n")).as("sxy"),
        sum(col("x.n") * col("x.n")).as("sxx"),
        sum(col("y.n") * col("y.n")).as("syy"))
    p.select(col("lag"), col("n_pairs"),
        round((col("n_pairs").cast("double") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          nullif(sqrt((col("n_pairs").cast("double") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")) *
            (col("n_pairs").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))), lit(0.0)), 6)
          .plus(lit(0.0)).as("acf"))
      .orderBy("lag")
  }

  def autocorrelationSql(lags: Seq[Int]): String =
    s"""WITH hc AS (
       |  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS n
       |  FROM events GROUP BY 1),
       |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hc),
       |grid AS (
       |  SELECT gh.h, coalesce(hc.n, 0) AS n
       |  FROM (SELECT unnest(range(h0, h1 + 1)) AS h FROM b) gh
       |  LEFT JOIN hc ON hc.h = gh.h),
       |lg AS (SELECT unnest([${lags.mkString(", ")}]) AS lag),
       |p AS (
       |  SELECT lg.lag, count(*) AS n_pairs,
       |         CAST(sum(x.n) AS BIGINT) AS sx, CAST(sum(y.n) AS BIGINT) AS sy,
       |         CAST(sum(x.n * y.n) AS BIGINT) AS sxy,
       |         CAST(sum(x.n * x.n) AS BIGINT) AS sxx,
       |         CAST(sum(y.n * y.n) AS BIGINT) AS syy
       |  FROM grid x CROSS JOIN lg JOIN grid y ON y.h = x.h + lg.lag
       |  GROUP BY 1)
       |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
       |       round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
       |              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |             / nullif(sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                           * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
       |                              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0), 6)
       |         + 0.0 AS acf
       |FROM p ORDER BY lag""".stripMargin

  /** Rolling-origin one-step backtest of the [[holtDaily]] forecaster
    * against the naive (yesterday's value) baseline — the eval a
    * forecasting layer must pass before anyone trusts it: at every day
    * t ≥ 2, forecast x̂_t = l_{t−1} + b_{t−1} from data before t only,
    * score |x_t − x̂_t|, and compare against |x_t − x_{t−1}|. Absolute
    * errors accumulate in the recurrence's EXACT milli-units, so the
    * summary — per-forecast MAEs (truncating divide), MASE in exact
    * parts-per-million, and the skill flag — is bit-identical across
    * engines with no float summation anywhere. Same bounded driver
    * loop as the fit ([[HoltDays]] rows); the oracle reuses the fit's
    * unrolled CTE chain and joins consecutive states.
    */
  def holtBacktest(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .orderBy("d")
      .limit(HoltDays)
    val pts = daily.collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    def q(x: Double): Long =
      new java.math.BigDecimal(x * 1e3).setScale(0, java.math.RoundingMode.HALF_UP)
        .longValue()
    def sdiv(v: Long, k: Long): Long = if (v < 0) -((-v) / k) else v / k
    var l = 0L; var b = 0L; var prevXq = 0L
    var n = 0L; var se = 0L; var sn = 0L
    pts.zipWithIndex.foreach { case ((_, x), i) =>
      val xq = q(x)
      if (i == 0) { l = xq; b = 0L }
      else {
        se += math.abs(xq - (l + b))
        sn += math.abs(xq - prevXq)
        n += 1
        val lNew = sdiv(xq + l + b, 2L)
        b = sdiv(lNew - l + 3L * b, 4L)
        l = lNew
      }
      prevXq = xq
    }
    Seq((n,
        if (n == 0L) None else Some(se / n),
        if (n == 0L) None else Some(sn / n),
        if (sn == 0L) None else Some(1000000L * se / sn),
        se < sn))
      .toDF("n_forecasts", "holt_mae_milli", "naive_mae_milli", "mase_e6",
        "holt_beats_naive")
  }

  val holtBacktestSql: String =
    s"""WITH $holtChainSql,
       |err AS (
       |  SELECT abs(q.xq - (p.l + p.b)) AS ae, abs(q.xq - pq.xq) AS an
       |  FROM q JOIN hist p ON p.rn = q.rn - 1
       |         JOIN q pq ON pq.rn = q.rn - 1),
       |agg AS (SELECT count(*) AS n, CAST(sum(ae) AS BIGINT) AS se,
       |               CAST(sum(an) AS BIGINT) AS sn FROM err)
       |SELECT n AS n_forecasts,
       |  CASE WHEN n = 0 THEN NULL ELSE CAST(se // n AS BIGINT) END AS holt_mae_milli,
       |  CASE WHEN n = 0 THEN NULL ELSE CAST(sn // n AS BIGINT) END AS naive_mae_milli,
       |  CASE WHEN sn = 0 THEN NULL ELSE CAST((1000000 * se) // sn AS BIGINT) END AS mase_e6,
       |  coalesce(se, 0) < coalesce(sn, 0) AS holt_beats_naive
       |FROM agg""".stripMargin

  /** Split-conformal prediction interval for the hourly event count —
    * the distribution-free uncertainty band a capacity/alerting layer
    * wraps around ANY point forecaster. Predictor: seasonal naive (the
    * count 24 hour-buckets earlier — integral, assumption-free); the
    * conformal radius q is the ⌈(1−α)(n_cal+1)⌉-th smallest absolute
    * calibration residual (capped at n_cal), and the audit reports the
    * held-out coverage of ŷ ± q. Everything is exact integer order
    * statistics — counts, residuals, the ceil as (a·b + 1e6−1) DIV 1e6,
    * coverage in truncating-DIV ppm — so both engines agree bit-for-bit
    * with no quantile-interpolation hazard (the round-9 lesson: never
    * compare against an interpolated cut; here the cut IS an order
    * statistic).
    *
    * Scale shape: one map-side-combined groupBy folds events to the
    * hour-bucket frame; ranking/split/quantile run on that bounded
    * series frame (unpartitioned window over |hours| rows — the
    * layout-ops convention). Chronological split: calibrate on the
    * first ⅔, audit on the last ⅓.
    */
  def conformalCoverage(events: DataFrame, alphaPpm: Long): DataFrame = {
    require(alphaPpm > 0L && alphaPpm < 1000000L, s"alphaPpm in (0,1e6): $alphaPpm")
    val hourly = events.groupBy(expr("unix_micros(ts) div 3600000000").as("hb"))
      .agg(count(lit(1)).as("y"))
    val h = Caches.tracked(hourly.persist())
    val r = h.as("t")
      .join(h.select((col("hb") + 24L).as("hb2"), col("y").as("yhat")), col("hb") === col("hb2"))
      .select(col("hb"), col("y"), col("yhat"), abs(col("y") - col("yhat")).as("r"))
      .withColumn("rn", row_number().over(Window.orderBy(col("hb"))).cast("long"))
    val rc = Caches.tracked(r.persist())
    val split = broadcast(rc.agg(count(lit(1)).as("n"))
      .select(expr("CAST((2 * n) DIV 3 AS BIGINT)").as("n_cal"),
        expr("CAST(n - (2 * n) DIV 3 AS BIGINT)").as("n_test")))
    val cal = rc.crossJoin(split).filter(col("rn") <= col("n_cal"))
      .withColumn("rrk", row_number().over(Window.orderBy(col("r"), col("hb"))).cast("long"))
    val q = broadcast(cal
      .withColumn("k", expr(
        s"least(CAST(((n_cal + 1) * ${1000000L - alphaPpm} + 999999) DIV 1000000 AS BIGINT), n_cal)"))
      .filter(col("rrk") === col("k"))
      .select(col("k"), col("r").as("q")))
    rc.crossJoin(split).filter(col("rn") > col("n_cal")).crossJoin(q)
      .groupBy(col("n_cal"), col("n_test"), col("k"), col("q"))
      .agg(sum(when(col("r") <= col("q"), 1L).otherwise(0L)).as("n_covered"))
      .select(col("n_cal"), col("n_test"), col("k"), col("q"), col("n_covered"),
        expr("CAST((1000000 * n_covered) DIV n_test AS BIGINT)").as("coverage_ppm"),
        expr(s"CAST((1000000 * n_covered) DIV n_test AS BIGINT) >= ${1000000L - alphaPpm}")
          .as("meets_target"))
  }

  def conformalCoverageSql(alphaPpm: Long): String =
    s"""WITH hourly AS (
       |  SELECT epoch_us(ts) // 3600000000 AS hb, count(*) AS y
       |  FROM events GROUP BY 1),
       |r AS (
       |  SELECT t.hb, t.y, p.y AS yhat, abs(t.y - p.y) AS r,
       |         row_number() OVER (ORDER BY t.hb) AS rn
       |  FROM hourly t JOIN hourly p ON t.hb = p.hb + 24),
       |split AS (
       |  SELECT (2 * count(*)) // 3 AS n_cal,
       |         count(*) - (2 * count(*)) // 3 AS n_test
       |  FROM r),
       |cal AS (
       |  SELECT r.r, row_number() OVER (ORDER BY r.r, r.hb) AS rrk
       |  FROM r, split WHERE r.rn <= split.n_cal),
       |q AS (
       |  SELECT rrk AS k, r AS q FROM cal, split
       |  WHERE rrk = least(((n_cal + 1) * ${1000000L - alphaPpm} + 999999) // 1000000, n_cal))
       |SELECT CAST(split.n_cal AS BIGINT) AS n_cal,
       |       CAST(split.n_test AS BIGINT) AS n_test,
       |       CAST(q.k AS BIGINT) AS k, CAST(q.q AS BIGINT) AS q,
       |       CAST(sum(CASE WHEN r.r <= q.q THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       |       CAST((1000000 * sum(CASE WHEN r.r <= q.q THEN 1 ELSE 0 END))
       |            // split.n_test AS BIGINT) AS coverage_ppm,
       |       CAST((1000000 * sum(CASE WHEN r.r <= q.q THEN 1 ELSE 0 END))
       |            // split.n_test AS BIGINT) >= ${1000000L - alphaPpm} AS meets_target
       |FROM r CROSS JOIN split CROSS JOIN q
       |WHERE r.rn > split.n_cal
       |GROUP BY split.n_cal, split.n_test, q.k, q.q""".stripMargin

  /** Floor-shift constant for the pairwise-slope division: guarantees a
    * non-negative numerator for any |daily count diff| ≤ 1e8 per day of
    * gap, so Spark `DIV` ≡ DuckDB `//` (both truncate toward zero only on
    * non-negative operands — the repo's division-parity rule).
    *
    * Headroom audit (round-12 advice): numerator ≤ shift·gap + |Δc|·1e6
    * ≤ 1e14·2e4 + 1e8·1e6 ≈ 2.1e18 < 2^63 even for a 1970→now day span;
    * slope_ppm magnitude ≤ 1e14, so lo+hi in the 2·percentile median
    * device stays ≤ 2e14 < 2^53 (exact in the interpolation double). A
    * fixture that still exceeds the bound fails LOUDLY via the
    * raise_error guard in [[theilSenDaily]] instead of diverging by 1 ulp.
    */
  val TheilSenShift = 100000000000000L

  /** Theil–Sen robust trend + Mann–Kendall test over daily event counts,
    * per event type.
    *
    * For every day pair (i < j) the slope (c_j − c_i)/(d_j − d_i) is
    * quantized to ppm BIGINT with the floor-shift device (numerator may
    * be negative); the reported trend is the MEDIAN pairwise slope — the
    * Theil–Sen estimator, insensitive to up to ~29% outlier days where
    * OLS is not. Mann–Kendall S = #(rising pairs) − #(falling pairs) is
    * the classic distribution-free monotone-trend statistic on the same
    * pairs, pure integer.
    *
    * Scale shape: the raw scan partial-aggregates to one row per
    * (type, day) — O(days·|types|), census-bounded — and the pairwise
    * self-join expands only that bounded frame (C(days,2)·|types| rows),
    * never the raw events. The day frame is broadcast to itself, so the
    * pair enumeration adds zero exchanges after the one pre-agg shuffle.
    * Median parity: 2·percentile(int, 0.5) is exact (lo+hi integral,
    * exact in the interpolation double — the repo's median device).
    */
  def theilSenDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("d"))
      .agg(count(lit(1)).as("c"))
    val a = daily.select(col("event_type"), col("d").as("d1"), col("c").as("c1"))
    val b = daily.select(col("event_type"), col("d").as("d2"), col("c").as("c2"))
    val pairs = a.join(broadcast(b), Seq("event_type"))
      .filter(col("d2") > col("d1"))
      .withColumn("slope_ppm", expr(
        s"""CASE WHEN abs(c2 - c1) * 1000000 > $TheilSenShift * (d2 - d1)
           |     THEN CAST(raise_error(CONCAT('theilSenDaily: |count diff| ',
           |          abs(c2 - c1), ' over day gap ', d2 - d1,
           |          ' exceeds the DIV-parity floor-shift bound')) AS BIGINT)
           |     ELSE ((c2 - c1) * 1000000 + $TheilSenShift * (d2 - d1))
           |          DIV (d2 - d1) - $TheilSenShift END""".stripMargin))
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_days"))
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        expr("CAST(2 * percentile(slope_ppm, 0.5) AS BIGINT)")
          .as("slope_x2_ppm"),
        sum(when(col("c2") > col("c1"), 1L)
          .when(col("c2") < col("c1"), -1L).otherwise(0L)).as("mk_s"))
      .join(broadcast(nDays), "event_type")
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("slope_x2_ppm"), col("mk_s"),
        when(col("mk_s") > 0, lit("rising"))
          .when(col("mk_s") < 0, lit("falling"))
          .otherwise(lit("flat")).as("trend"))
      .orderBy("event_type")
  }

  val theilSenDailySql: String =
    s"""WITH daily AS (
       |  SELECT event_type, epoch_us(ts) // 86400000000 AS d, count(*) AS c
       |  FROM events GROUP BY 1, 2),
       |pairs AS (
       |  SELECT a.event_type,
       |         ((b.c - a.c) * 1000000 + $TheilSenShift * (b.d - a.d))
       |           // (b.d - a.d) - $TheilSenShift AS slope_ppm,
       |         CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
       |  FROM daily a JOIN daily b
       |    ON a.event_type = b.event_type AND b.d > a.d),
       |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
       |       FROM daily GROUP BY 1)
       |SELECT p.event_type, nd.n_days,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       CAST(2 * quantile_cont(p.slope_ppm, 0.5) AS BIGINT) AS slope_x2_ppm,
       |       CAST(sum(p.sgn) AS BIGINT) AS mk_s,
       |       CASE WHEN sum(p.sgn) > 0 THEN 'rising'
       |            WHEN sum(p.sgn) < 0 THEN 'falling'
       |            ELSE 'flat' END AS trend
       |FROM pairs p JOIN nd USING (event_type)
       |GROUP BY p.event_type, nd.n_days
       |ORDER BY p.event_type""".stripMargin
}
