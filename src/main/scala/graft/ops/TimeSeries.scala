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
      // truncates double→long where DuckDB rounds — CLAUDE.md pitfall)
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
}
