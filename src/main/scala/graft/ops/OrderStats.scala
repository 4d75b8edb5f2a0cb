package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-statistics operators: the 2-D skyline (Pareto frontier), rank
  * distribution positions, and the two-proportion experiment readout.
  *
  * Parity strategy: everything here is comparisons and rank arithmetic
  * over exact inputs — no analog accumulation — so results are
  * bit-identical across engines by construction; doubles only pass
  * through unmodified or divide exact integers in a fixed expression.
  */
object OrderStats {

  /** 2-D skyline of `part` minimizing (p_size, p_retailprice): parts for
    * which no other part is ≤ in both dimensions and < in at least one.
    *
    * Window formulation (no pairwise join): a part is on the frontier
    * iff (a) its price equals the MIN price within its own size (a
    * same-size part with lower price dominates via strict price), and
    * (b) its price is strictly below the MIN price over all smaller
    * sizes (any such part dominates via strict size). RANGE … 1
    * PRECEDING gives "strictly smaller size" directly.
    *
    * Scale shape: the classic O(n·n) skyline self-join is replaced by
    * one grouped (size, min_price) census — |distinct sizes|, value-
    * domain-bounded — a cumulative-min window over THAT census only,
    * and a broadcast join back to the part scan. Ties on both
    * dimensions survive together (neither dominates the other —
    * dominance needs one strict edge).
    */
  def skylineParts(part: DataFrame): DataFrame = {
    // pre-aggregate to one (size, min_price) row per size FIRST: the
    // global window then actually runs over the |distinct sizes| census
    // (the old plan only did so "effectively" — every part row still
    // moved through the single window task), and the census broadcasts
    // back to the part scan
    val perSize = part.groupBy(col("p_size"))
      .agg(min(col("p_retailprice")).as("min_same"))
    val wSmaller = Window.orderBy(col("p_size"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val sizes = perSize.withColumn("min_smaller", min(col("min_same")).over(wSmaller))
    part
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .join(broadcast(sizes), Seq("p_size"))
      .filter(col("p_retailprice") === col("min_same") &&
        (col("min_smaller").isNull || col("p_retailprice") < col("min_smaller")))
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .orderBy("p_size", "p_partkey")
  }

  val skylinePartsSql: String =
    """WITH w AS (
      |  SELECT p_partkey, p_name, p_size, p_retailprice,
      |         min(p_retailprice) OVER (PARTITION BY p_size) AS min_same,
      |         min(p_retailprice) OVER (ORDER BY p_size
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_smaller
      |  FROM part)
      |SELECT p_partkey, p_name, p_size, p_retailprice
      |FROM w
      |WHERE p_retailprice = min_same
      |  AND (min_smaller IS NULL OR p_retailprice < min_smaller)
      |ORDER BY p_size, p_partkey""".stripMargin

  /** Distribution position of each probe user's events within the FULL
    * per-type value distribution: percent_rank (rank−1)/(n−1) and
    * cume_dist. The window spans every event of the type; only the probe
    * users' rows are emitted — the "where does this observation sit"
    * readout, computed without materializing the distribution.
    */
  def distributionPosition(events: DataFrame, maxUser: Long): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"))
    events
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .filter(col("user_id") < maxUser)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("pct_rank"), col("cume"))
      .orderBy("event_id")
  }

  def distributionPositionSql(maxUser: Long): String =
    s"""WITH w AS (
       |  SELECT event_id, user_id, event_type, value,
       |         round(percent_rank() OVER (PARTITION BY event_type ORDER BY value), 6) AS pct_rank,
       |         round(cume_dist() OVER (PARTITION BY event_type ORDER BY value), 6) AS cume
       |  FROM events)
       |SELECT event_id, user_id, event_type, value, pct_rank, cume
       |FROM w WHERE user_id < $maxUser ORDER BY event_id""".stripMargin

  /** Signup→purchase conversion latency: per user, the first purchase
    * at-or-after their first signup; the latency distribution summarized
    * by the HISTOGRAM-SKETCH quantiles (p50/p90) — not exact
    * `percentile`, whose buffer would be O(users) at corpus scale —
    * plus the conversion rate.
    *
    * Parity: latencies are integral seconds (µs DIV 1e6 on each side
    * before subtracting — the repo's epoch-floor rule); the sketch
    * interpolation is the [[Sketches.histogramQuantiles]] arithmetic,
    * deterministic by construction.
    */
  def conversionLatency(events: DataFrame): DataFrame = {
    val su = events.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val pu = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val lat = su.join(pu, Seq("user_id"))
      .filter(col("p_ts") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("p_ts")).as("first_purchase"))
      .select(col("user_id"),
        (expr("unix_micros(first_purchase) div 1000000") -
          expr("unix_micros(signup_ts) div 1000000")).as("latency_s"))
      .withColumn("g", lit("all"))
    val q = Sketches.histogramQuantiles(lat, "g", "latency_s", 64,
      Seq(("p50_s", 0.5), ("p90_s", 0.9)))
    val signups = su.agg(count(lit(1)).as("n_signup_users"))
    q.crossJoin(broadcast(signups))
      .select(col("n_signup_users"), col("n").as("n_converted"),
        round(col("n").cast("double") / col("n_signup_users").cast("double"), 6)
          .as("conversion_rate"),
        col("p50_s"), col("p90_s"))
  }

  val conversionLatencySql: String = {
    def est(p: Double): String = {
      val target = s"greatest(CAST(ceil($p * b.n) AS BIGINT), 1)"
      s"""CASE WHEN b.v_max = b.v_min THEN b.v_min
         |     WHEN cum >= $target AND cum - c < $target
         |     THEN b.v_min + (b.v_max - b.v_min) / 64 *
         |          (bin + CAST($target - (cum - c) AS DOUBLE) / c) END""".stripMargin
    }
    s"""WITH su AS (
       |  SELECT user_id, min(ts) AS signup_ts FROM events
       |  WHERE event_type = 'signup' GROUP BY user_id),
       |lat AS (
       |  SELECT e.user_id,
       |         epoch_us(min(e.ts)) // 1000000 - epoch_us(s.signup_ts) // 1000000 AS latency_s
       |  FROM events e JOIN su s ON e.user_id = s.user_id
       |  WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
       |  GROUP BY e.user_id, s.signup_ts),
       |bounds AS (
       |  SELECT CAST(min(latency_s) AS DOUBLE) AS v_min,
       |         CAST(max(latency_s) AS DOUBLE) AS v_max, count(*) AS n
       |  FROM lat),
       |binned AS (
       |  SELECT CASE WHEN b.v_max = b.v_min THEN 0
       |         ELSE least(CAST(floor((l.latency_s - b.v_min) / ((b.v_max - b.v_min) / 64)) AS BIGINT), 63) END AS bin,
       |         count(*) AS c
       |  FROM lat l, bounds b GROUP BY 1),
       |cum AS (
       |  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum FROM binned),
       |sk AS (
       |  -- GROUP BY b.n (a constant) so an empty latency frame yields
       |  -- ZERO rows here, matching Spark's groupBy-shaped sketch
       |  SELECT b.n AS n,
       |    round(max(${est(0.5)}), 4) AS p50_s,
       |    round(max(${est(0.9)}), 4) AS p90_s
       |  FROM cum, bounds b GROUP BY b.n),
       |ns AS (SELECT count(*) AS n_signup_users FROM su)
       |SELECT ns.n_signup_users, sk.n AS n_converted,
       |       round(CAST(sk.n AS DOUBLE) / CAST(ns.n_signup_users AS DOUBLE), 6) AS conversion_rate,
       |       sk.p50_s, sk.p90_s
       |FROM sk, ns""".stripMargin
  }

  /** Difference-in-differences readout on the experiment arms: the
    * change in mean purchase value after the mid-window split date,
    * treatment (odd user_id) minus control — four DECIMAL-exact cell
    * means combined in one fixed double expression.
    */
  def impactDiD(events: DataFrame, splitDay: String): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select((col("user_id") % 2 === 1).as("treated"),
        (col("ts") >= lit(splitDay).cast("timestamp")).as("after"),
        col("value"))
      .groupBy(col("treated"), col("after"))
      .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
        count(lit(1)).cast("double")).as("mean_v"), count(lit(1)).as("n"))
    def cell(t: Boolean, a: Boolean) =
      max(when(col("treated") === t && col("after") === a, col("mean_v")))
    p.agg(
        round(cell(true, false), 6).as("treated_before"),
        round(cell(true, true), 6).as("treated_after"),
        round(cell(false, false), 6).as("control_before"),
        round(cell(false, true), 6).as("control_after"),
        (round((cell(true, true) - cell(true, false)) -
          (cell(false, true) - cell(false, false)), 6) + lit(0.0)).as("did_estimate"))
  }

  def impactDiDSql(splitDay: String): String =
    s"""WITH cells AS (
       |  SELECT user_id % 2 = 1 AS treated, ts >= TIMESTAMP '$splitDay' AS after,
       |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_v
       |  FROM events WHERE event_type = 'purchase'
       |  GROUP BY 1, 2)
       |SELECT
       |  round(max(CASE WHEN treated AND NOT after THEN mean_v END), 6) AS treated_before,
       |  round(max(CASE WHEN treated AND after THEN mean_v END), 6) AS treated_after,
       |  round(max(CASE WHEN NOT treated AND NOT after THEN mean_v END), 6) AS control_before,
       |  round(max(CASE WHEN NOT treated AND after THEN mean_v END), 6) AS control_after,
       |  round((max(CASE WHEN treated AND after THEN mean_v END)
       |         - max(CASE WHEN treated AND NOT after THEN mean_v END))
       |        - (max(CASE WHEN NOT treated AND after THEN mean_v END)
       |           - max(CASE WHEN NOT treated AND NOT after THEN mean_v END)), 6) + 0.0 AS did_estimate
       |FROM cells""".stripMargin

  /** RFM segmentation: every customer scored 1–4 on Recency (days since
    * last order, lower better), Frequency (order count) and Monetary
    * (revenue), cut at the exact interpolated quartiles of each metric,
    * then rolled up per 3-digit RFM segment code.
    *
    * Scale shape: the quartile cut points come from
    * [[ExactQuantiles.percentiles]] — the two-pass histogram-refinement
    * selection, NO unbounded percentile buffer and no global sort (the
    * ntile formulation would single-reduce the customer frame) — and
    * are broadcast back as one 3-value row per metric; scoring is then
    * a map-only comparison and the rollup a partial-agged groupBy on
    * ≤ 64 segment codes.
    *
    * Parity: metrics are held as exact integers (days, counts, cents)
    * and the quartile comparisons run in BIGINT on both engines — the
    * cross-multiplied fixed-point device. An interpolated quartile
    * q = v_lo + (v_hi − v_lo)·(fq/4) never exists as a double:
    * m > q  ⇔  4m > (4−fq)·v_lo + fq·v_hi, with v_lo/v_hi the order
    * statistics straddling rank p·(n−1) and fq ∈ {0..3} the rank's
    * fractional quarter — so the tie class (a metric landing exactly on
    * a rounded cut, where two engines' last-ulp interpolation could
    * disagree) is closed by construction. Monetary cents stay exact
    * below 2^51 cents per customer (~$22T) — far past any fixture.
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val day = expr("unix_micros(o_orderdate) div 86400000000")
    val maxDay = orders.agg(max(day).as("max_day"))
    val cust = Caches.tracked(orders
      .groupBy(col("o_custkey"))
      .agg(max(day).as("last_day"), count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("mon_dec"))
      .crossJoin(broadcast(maxDay))
      .withColumn("rec_l", col("max_day") - col("last_day"))
      .withColumn("rec", col("rec_l").cast("double"))
      .withColumn("monetary", col("mon_dec").cast("double"))
      // DECIMAL cents → BIGINT without a double round-trip (fraction .00)
      .withColumn("mon_c", (col("mon_dec") * lit(100)).cast("long"))
      .persist())
    // ONE two-pass selection over the unpivoted (metric, value) frame
    // reads all straddling order statistics (three sequential
    // percentiles() calls tripled the pass count: 6.7 s → ~2 s at sf0.1)
    val melted = cust.select(
      expr("stack(3, 'rec', rec_l, 'freq', freq, 'mon', mon_c) AS (g, v)"))
    def quartileRanks(n: Long): Seq[Long] = (1 to 3).flatMap { i =>
      val r = i.toLong * (n - 1); Seq(r / 4, (r + 3) / 4)
    }
    val ar = ExactQuantiles.valuesAtRanks(melted, "g", "v", quartileRanks)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2).toLong).toMap
    val n = cust.count()
    // quarter-unit threshold: m > q_i ⇔ 4m > (4−fq)·v_lo + fq·v_hi
    def thresh(metric: String, i: Int): Long =
      if (ar.isEmpty) 0L
      else {
        val r = i.toLong * (n - 1); val fq = r % 4
        (4 - fq) * ar((metric, r / 4)) + fq * ar((metric, (r + 3) / 4))
      }
    def scoreUp(scaled: Column, metric: String): Column =
      lit(1L) + (1 to 3).map(i =>
        when(scaled * 4 > thresh(metric, i), 1L).otherwise(0L)).reduce(_ + _)
    val scored = cust
      .select(col("o_custkey"), col("rec"), col("monetary"),
        (lit(5L) - scoreUp(col("rec_l"), "rec")).as("r_score"),
        scoreUp(col("freq"), "freq").as("f_score"),
        scoreUp(col("mon_c"), "mon").as("m_score"))
    scored
      .groupBy((col("r_score") * 100 + col("f_score") * 10 + col("m_score")).as("rfm_segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("monetary").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_monetary"),
        round(sum(col("rec").cast("long")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_recency_days"))
      .orderBy("rfm_segment")
  }

  val rfmSegmentsSql: String =
    """WITH cust AS (
      |  SELECT o_custkey,
      |         max(epoch_us(o_orderdate) // 86400000000) AS last_day,
      |         count(*) AS freq,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary,
      |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS mon_c
      |  FROM orders GROUP BY o_custkey),
      |mx AS (SELECT max(last_day) AS max_day FROM cust),
      |m AS (
      |  SELECT c.o_custkey, mx.max_day - c.last_day AS rec_l,
      |         CAST(mx.max_day - c.last_day AS DOUBLE) AS rec,
      |         c.freq, c.monetary, c.mon_c
      |  FROM cust c, mx),
      |melted AS (
      |  SELECT 'rec' AS g, rec_l AS v FROM m
      |  UNION ALL SELECT 'freq', freq FROM m
      |  UNION ALL SELECT 'mon', mon_c FROM m),
      |rk AS (
      |  SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) - 1 AS rk
      |  FROM melted),
      |nn AS (SELECT count(*) AS n FROM m),
      |cuts AS (
      |  SELECT rk.g, qi.i,
      |         (4 - (qi.i * (nn.n - 1)) % 4)
      |           * max(CASE WHEN rk.rk = (qi.i * (nn.n - 1)) // 4 THEN rk.v END)
      |       + ((qi.i * (nn.n - 1)) % 4)
      |           * max(CASE WHEN rk.rk = (qi.i * (nn.n - 1) + 3) // 4 THEN rk.v END) AS a
      |  FROM rk, nn, (SELECT unnest([1, 2, 3]) AS i) qi
      |  GROUP BY rk.g, qi.i, nn.n),
      |q AS (
      |  SELECT max(CASE WHEN g = 'rec' AND i = 1 THEN a END) AS r1,
      |         max(CASE WHEN g = 'rec' AND i = 2 THEN a END) AS r2,
      |         max(CASE WHEN g = 'rec' AND i = 3 THEN a END) AS r3,
      |         max(CASE WHEN g = 'freq' AND i = 1 THEN a END) AS f1,
      |         max(CASE WHEN g = 'freq' AND i = 2 THEN a END) AS f2,
      |         max(CASE WHEN g = 'freq' AND i = 3 THEN a END) AS f3,
      |         max(CASE WHEN g = 'mon' AND i = 1 THEN a END) AS m1,
      |         max(CASE WHEN g = 'mon' AND i = 2 THEN a END) AS m2,
      |         max(CASE WHEN g = 'mon' AND i = 3 THEN a END) AS m3
      |  FROM cuts),
      |scored AS (
      |  SELECT m.o_custkey, m.rec, m.monetary,
      |    5 - (1 + (CASE WHEN m.rec_l * 4 > q.r1 THEN 1 ELSE 0 END)
      |           + (CASE WHEN m.rec_l * 4 > q.r2 THEN 1 ELSE 0 END)
      |           + (CASE WHEN m.rec_l * 4 > q.r3 THEN 1 ELSE 0 END)) AS r_score,
      |    1 + (CASE WHEN m.freq * 4 > q.f1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN m.freq * 4 > q.f2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN m.freq * 4 > q.f3 THEN 1 ELSE 0 END) AS f_score,
      |    1 + (CASE WHEN m.mon_c * 4 > q.m1 THEN 1 ELSE 0 END)
      |      + (CASE WHEN m.mon_c * 4 > q.m2 THEN 1 ELSE 0 END)
      |      + (CASE WHEN m.mon_c * 4 > q.m3 THEN 1 ELSE 0 END) AS m_score
      |  FROM m, q)
      |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm_segment,
      |       count(*) AS n_customers,
      |       round(CAST(sum(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
      |             / CAST(count(*) AS DOUBLE), 4) AS avg_monetary,
      |       round(CAST(sum(CAST(rec AS BIGINT)) AS DOUBLE)
      |             / CAST(count(*) AS DOUBLE), 4) AS avg_recency_days
      |FROM scored
      |GROUP BY 1 ORDER BY rfm_segment""".stripMargin

  /** Inter-order gap statistics per repeat customer: integral day gaps
    * from a lag window (shuffle on custkey only), exact integer
    * aggregates — purchase-cadence features for churn models.
    */
  def orderGaps(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    orders
      .select(col("o_custkey"), col("o_orderkey"),
        expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_gaps"), min(col("gap")).as("min_gap_days"),
        max(col("gap")).as("max_gap_days"),
        round(sum(col("gap")).cast("double") / count(lit(1)).cast("double"), 4)
          .as("avg_gap_days"))
      .filter(col("n_gaps") >= 2)
      .orderBy("o_custkey")
  }

  val orderGapsSql: String =
    """WITH d AS (
      |  SELECT o_custkey, o_orderkey,
      |         epoch_us(o_orderdate) // 86400000000 AS day
      |  FROM orders),
      |g AS (
      |  SELECT o_custkey,
      |         day - lag(day, 1) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey) AS gap
      |  FROM d),
      |a AS (
      |  SELECT o_custkey, count(*) AS n_gaps,
      |         min(gap) AS min_gap_days, max(gap) AS max_gap_days,
      |         round(CAST(sum(gap) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS avg_gap_days
      |  FROM g WHERE gap IS NOT NULL GROUP BY o_custkey)
      |SELECT o_custkey, n_gaps, min_gap_days, max_gap_days, avg_gap_days
      |FROM a WHERE n_gaps >= 2 ORDER BY o_custkey""".stripMargin

  /** Two-proportion z-test between experiment arms (user_id parity):
    * conversion = the user's FIRST event (event-time order, event_id
    * tie-break) is a `purchase` — a rate that stays non-degenerate as
    * the fixture scales ("emitted ≥1 purchase" saturates to 100% once
    * users average a handful of events). The pooled two-sample z
    * statistic and the |z| > 1.96 significance flag, from exact per-arm
    * integers through one fixed double expression (sqrt is correctly
    * rounded IEEE in both engines); the z denominator is nullif-guarded
    * so a degenerate 0%/100% pooled rate reads NULL in both engines
    * rather than erroring under ANSI.
    *
    * Scale shape: one per-user window (shuffle on user_id), one 2-row
    * aggregate, driver-free.
    */
  /** Stratified outcome comparison (propensity-style matching on a
    * coarsened covariate) — the observational companion to
    * [[cupedAdjustment]]: users are stratified by PRE-period activity
    * (fixed integer buckets — no quantile-boundary hazard), the
    * POST-period value mass is compared between arms WITHIN each
    * stratum, and the `att_weighted` row aggregates the per-stratum
    * differences with matched weights w_s = min(n_treat, n_ctrl) — the
    * standard stratification estimator that removes covariate imbalance
    * a naive mean difference would absorb.
    *
    * Parity: outcomes in exact milli units, per-stratum means by
    * truncating divide on non-negative sums; the ATT numerator can be
    * negative, where Spark `DIV` (toward zero) and DuckDB `//` (floor)
    * disagree — so the division is shifted positive by K·den and K is
    * subtracted back (floor(a/W)+K identity, exact on both engines);
    * K = 1e12 milli leaves ~6 orders of magnitude of headroom over the
    * fixture's per-user value mass, and K·den ≈ 1e17 stays far inside
    * BIGINT.
    * One user-grained aggregate, one stratum-grained pass; all counts
    * integral.
    */
  def propensityStrata(events: DataFrame): DataFrame = {
    val K = 1000000000000L
    val mid = events.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid_us"))
    val perUser = events.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(expr("unix_micros(ts)") <= col("mid_us"), 1L).otherwise(0L)).as("x"),
        sum(when(expr("unix_micros(ts)") > col("mid_us"),
          expr("CAST(round(value * 1000) AS BIGINT)")).otherwise(0L)).as("y_milli"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
      // FIXTURE-GENERATION COUPLING: these cuts bracket the current
      // fixtures' per-user pre-period count distribution (~33 median at
      // sf0.1). A regeneration that shifts that distribution collapses
      // users into one stratum WITHOUT failing the oracle gate (both
      // engines share the cuts) — OrderStatsAndSeriesSpec's
      // ">= 2 strata populated in both arms" test is the loud alarm.
      .withColumn("stratum",
        when(col("x") <= 29L, "act_00_29").when(col("x") <= 33L, "act_30_33")
          .when(col("x") <= 37L, "act_34_37").otherwise("act_38_up"))
    val strata = Caches.tracked(perUser.groupBy(col("stratum"))
      .agg(sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_treat"),
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_ctrl"),
        sum(when(col("arm") === 1L, col("y_milli")).otherwise(0L)).as("sum_t"),
        sum(when(col("arm") === 0L, col("y_milli")).otherwise(0L)).as("sum_c"))
      .withColumn("mean_treat_milli",
        when(col("n_treat") > 0L, expr("CAST(sum_t DIV n_treat AS BIGINT)")))
      .withColumn("mean_ctrl_milli",
        when(col("n_ctrl") > 0L, expr("CAST(sum_c DIV n_ctrl AS BIGINT)")))
      .withColumn("diff_milli", col("mean_treat_milli") - col("mean_ctrl_milli"))
      .persist())
    val w = when(col("diff_milli").isNotNull, least(col("n_treat"), col("n_ctrl")))
      .otherwise(0L)
    val att = strata.agg(
        sum(col("n_treat")).as("n_treat"), sum(col("n_ctrl")).as("n_ctrl"),
        sum(w * coalesce(col("diff_milli"), lit(0L))).as("num"),
        sum(w).as("den"))
      .select(lit("att_weighted").as("stratum"), col("n_treat"), col("n_ctrl"),
        lit(null).cast("long").as("mean_treat_milli"),
        lit(null).cast("long").as("mean_ctrl_milli"),
        when(col("den") > 0L,
          expr(s"CAST((num + den * ${K}L) DIV den AS BIGINT) - ${K}L")).as("diff_milli"))
    strata.select(col("stratum"), col("n_treat"), col("n_ctrl"),
        col("mean_treat_milli"), col("mean_ctrl_milli"), col("diff_milli"))
      .unionByName(att)
      .orderBy("stratum")
  }

  val propensityStrataSql: String = {
    val k = 1000000000000L
    s"""WITH mid AS (
       |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us FROM events),
       |u AS (
       |  SELECT user_id,
       |         sum(CASE WHEN epoch_us(ts) <= mid.mid_us THEN 1 ELSE 0 END) AS x,
       |         sum(CASE WHEN epoch_us(ts) > mid.mid_us
       |                  THEN CAST(round(value * 1000) AS BIGINT) ELSE 0 END) AS y_milli
       |  FROM events, mid GROUP BY user_id),
       |t AS (
       |  SELECT CASE WHEN x <= 29 THEN 'act_00_29' WHEN x <= 33 THEN 'act_30_33'
       |              WHEN x <= 37 THEN 'act_34_37' ELSE 'act_38_up' END AS stratum,
       |         user_id % 2 AS arm, y_milli
       |  FROM u),
       |s AS (
       |  SELECT stratum,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl,
       |         CAST(sum(CASE WHEN arm = 1 THEN y_milli ELSE 0 END) AS BIGINT) AS sum_t,
       |         CAST(sum(CASE WHEN arm = 0 THEN y_milli ELSE 0 END) AS BIGINT) AS sum_c
       |  FROM t GROUP BY stratum),
       |d AS (
       |  SELECT stratum, n_treat, n_ctrl,
       |         CASE WHEN n_treat > 0 THEN CAST(sum_t // n_treat AS BIGINT) END AS mean_treat_milli,
       |         CASE WHEN n_ctrl > 0 THEN CAST(sum_c // n_ctrl AS BIGINT) END AS mean_ctrl_milli
       |  FROM s),
       |d2 AS (SELECT *, mean_treat_milli - mean_ctrl_milli AS diff_milli FROM d),
       |att AS (
       |  SELECT 'att_weighted' AS stratum,
       |         CAST(sum(n_treat) AS BIGINT) AS n_treat,
       |         CAST(sum(n_ctrl) AS BIGINT) AS n_ctrl,
       |         CAST(NULL AS BIGINT) AS mean_treat_milli,
       |         CAST(NULL AS BIGINT) AS mean_ctrl_milli,
       |         CASE WHEN sum(CASE WHEN diff_milli IS NOT NULL THEN least(n_treat, n_ctrl) ELSE 0 END) > 0
       |              THEN CAST((sum(CASE WHEN diff_milli IS NOT NULL
       |                                  THEN least(n_treat, n_ctrl) * diff_milli ELSE 0 END)
       |                         + sum(CASE WHEN diff_milli IS NOT NULL
       |                                    THEN least(n_treat, n_ctrl) ELSE 0 END) * $k)
       |                        // sum(CASE WHEN diff_milli IS NOT NULL
       |                                    THEN least(n_treat, n_ctrl) ELSE 0 END) AS BIGINT) - $k
       |         END AS diff_milli
       |  FROM d2)
       |SELECT stratum, n_treat, n_ctrl, mean_treat_milli, mean_ctrl_milli, diff_milli FROM d2
       |UNION ALL
       |SELECT stratum, n_treat, n_ctrl, mean_treat_milli, mean_ctrl_milli, diff_milli FROM att
       |ORDER BY stratum""".stripMargin
  }

  /** Sample-ratio-mismatch audit — the health check every experiment
    * platform runs BEFORE reading the metrics: under the designed 50/50
    * assignment (arm = user_id % 2, the [[abTestConversion]] hash), the
    * per-arm user counts must match a fair coin; a skewed split means
    * the assignment or logging is broken and every downstream metric is
    * biased. Two-cell χ² = (n_a − n_b)²/n, reported per entry segment
    * (the user's first event_type) plus an ALL row, in exact ppm with
    * the division-free flag: SRM iff 10⁶·(n_a−n_b)² > 3841459·n
    * (3.841459 = χ²₁ at α=0.05, precomputed — the embed-the-constant
    * device, no engine libm involved).
    *
    * Scale shape: one window keyed by user (first event), one grouped
    * aggregate per segment, integer arithmetic end-to-end; the ALL row
    * folds from the segment aggregates, not a second scan.
    */
  def srmCheck(events: DataFrame): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val users = events
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .select(col("event_type").as("segment"),
        (col("user_id") % 2).cast("long").as("arm"))
    val seg = users.groupBy(col("segment"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))
    val all = seg.agg(sum(col("n_a")).as("n_a"), sum(col("n_b")).as("n_b"))
      .select(lit("ALL").as("segment"), col("n_a"), col("n_b"))
    seg.unionByName(all)
      .select(col("segment"), col("n_a"), col("n_b"),
        expr("CAST((1000000 * (n_a - n_b) * (n_a - n_b)) DIV (n_a + n_b) AS BIGINT)")
          .as("chi2_ppm"),
        (lit(1000000L) * (col("n_a") - col("n_b")) * (col("n_a") - col("n_b")) >
          lit(3841459L) * (col("n_a") + col("n_b"))).as("srm"))
      .orderBy("segment")
  }

  val srmCheckSql: String =
    """WITH u AS (
      |  SELECT event_type AS segment, user_id % 2 AS arm
      |  FROM (SELECT user_id, event_type,
      |          row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |        FROM events)
      |  WHERE rn = 1),
      |seg AS (
      |  SELECT segment,
      |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM u GROUP BY segment),
      |both_rows AS (
      |  SELECT * FROM seg
      |  UNION ALL
      |  SELECT 'ALL', CAST(sum(n_a) AS BIGINT), CAST(sum(n_b) AS BIGINT) FROM seg)
      |SELECT segment, n_a, n_b,
      |       CAST((1000000 * (n_a - n_b) * (n_a - n_b)) // (n_a + n_b) AS BIGINT) AS chi2_ppm,
      |       1000000 * (n_a - n_b) * (n_a - n_b) > 3841459 * (n_a + n_b) AS srm
      |FROM both_rows ORDER BY segment""".stripMargin

  def abTestConversion(events: DataFrame): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val perUser = events
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .select(col("user_id"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("converted"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    val a = arms.filter(col("arm") === 0L)
      .select(col("n").as("n_a"), col("conv").as("conv_a"))
    val b = arms.filter(col("arm") === 1L)
      .select(col("n").as("n_b"), col("conv").as("conv_b"))
    a.crossJoin(b)
      .withColumn("p_a", col("conv_a").cast("double") / col("n_a").cast("double"))
      .withColumn("p_b", col("conv_b").cast("double") / col("n_b").cast("double"))
      .withColumn("p_pool",
        (col("conv_a") + col("conv_b")).cast("double") /
          (col("n_a") + col("n_b")).cast("double"))
      .withColumn("z",
        (col("p_a") - col("p_b")) /
          nullif(sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / col("n_a").cast("double") + lit(1.0) / col("n_b").cast("double"))),
            lit(0.0)))
      .select(col("n_a"), col("conv_a"), round(col("p_a"), 6).as("rate_a"),
        col("n_b"), col("conv_b"), round(col("p_b"), 6).as("rate_b"),
        round(col("z"), 4).as("z_score"),
        (abs(col("z")) > 1.96).as("significant"))
  }

  val abTestConversionSql: String =
    """WITH firsts AS (
      |  SELECT user_id, event_type,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |per_user AS (
      |  SELECT user_id,
      |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS converted,
      |         user_id % 2 AS arm
      |  FROM firsts WHERE rn = 1),
      |arms AS (
      |  SELECT arm, count(*) AS n, CAST(sum(converted) AS BIGINT) AS conv
      |  FROM per_user GROUP BY arm),
      |x AS (
      |  SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
      |         CAST(a.conv AS DOUBLE) / CAST(a.n AS DOUBLE) AS p_a,
      |         CAST(b.conv AS DOUBLE) / CAST(b.n AS DOUBLE) AS p_b,
      |         CAST(a.conv + b.conv AS DOUBLE) / CAST(a.n + b.n AS DOUBLE) AS p_pool
      |  FROM (SELECT * FROM arms WHERE arm = 0) a, (SELECT * FROM arms WHERE arm = 1) b),
      |z AS (
      |  SELECT *, (p_a - p_b) / nullif(sqrt(p_pool * (1.0 - p_pool)
      |              * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 0.0) AS zv
      |  FROM x)
      |SELECT n_a, conv_a, round(p_a, 6) AS rate_a,
      |       n_b, conv_b, round(p_b, 6) AS rate_b,
      |       round(zv, 4) AS z_score, abs(zv) > 1.96 AS significant
      |FROM z""".stripMargin

  /** CUPED variance reduction (Deng et al., WSDM'13) for the parity-arm
    * experiment: each user's PRE-period activity (event count before
    * the stream's midpoint — the [[graft.ops.Profiling.psiDrift]] split
    * device) is the covariate X for their POST-period metric Y, and the
    * pooled θ = cov(X,Y)/var(X) shifts each arm's post-period mean to
    * ȳ_arm − θ·(x̄_arm − x̄). Output per arm: user count, raw and
    * adjusted means, plus the pooled θ and ρ² riders (ρ² IS the
    * variance-reduction fraction CUPED buys — the number that justifies
    * running it).
    *
    * Parity: X and Y are integer counts, so every sufficient statistic
    * (n, Σx, Σy, Σxy, Σxx, Σyy — per arm and pooled) is an exact
    * BIGINT; θ, the adjusted means and ρ² are fixed double expressions
    * on those integers, nullif-guarded against zero variance and
    * `+ 0.0`-normalized where a sign crossing could round to −0.0.
    * Scale shape: one groupBy(user_id) with the midpoint broadcast in,
    * then arm-level and pooled aggregates over the |users| frame.
    */
  def cupedAdjustment(events: DataFrame): DataFrame = {
    val mid = events.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid_us"))
    val perUser = Caches.tracked(events.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(expr("unix_micros(ts)") <= col("mid_us"), 1L).otherwise(0L)).as("x"),
        sum(when(expr("unix_micros(ts)") > col("mid_us"), 1L).otherwise(0L)).as("y"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
      .persist())
    val g = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
    // cov numerator and the two variance terms as named columns: ρ²'s
    // square is an explicit num*num (pow(x, 2.0) is a libm-vs-JVM
    // last-ulp hazard; plain multiplication is identical by IEEE)
    val numE = col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vxE = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vyE = col("n").cast("double") * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val thetaE = numE / nullif(vxE, lit(0.0))
    arms.crossJoin(broadcast(g))
      .select(col("arm"), col("n_users"),
        round(col("sya").cast("double") / col("n_users").cast("double"), 6).as("mean_post"),
        round(thetaE, 6).plus(lit(0.0)).as("theta"),
        round(col("sya").cast("double") / col("n_users").cast("double") -
          thetaE * (col("sxa").cast("double") / col("n_users").cast("double") -
            col("sx").cast("double") / col("n").cast("double")), 6)
          .plus(lit(0.0)).as("mean_post_adj"),
        round(numE * numE / nullif(vxE * vyE, lit(0.0)), 6).as("rho2"))
      .orderBy("arm")
  }

  val cupedAdjustmentSql: String =
    """WITH mid AS (
      |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us FROM events),
      |pu AS (
      |  SELECT user_id,
      |         CAST(sum(CASE WHEN epoch_us(ts) <= mid.mid_us THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |         CAST(sum(CASE WHEN epoch_us(ts) > mid.mid_us THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |         user_id % 2 AS arm
      |  FROM events, mid GROUP BY user_id, mid.mid_us),
      |g AS (
      |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pu),
      |arms AS (
      |  SELECT arm, count(*) AS n_users, CAST(sum(x) AS BIGINT) AS sxa,
      |         CAST(sum(y) AS BIGINT) AS sya
      |  FROM pu GROUP BY arm),
      |st AS (
      |  SELECT arms.*, g.*,
      |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
      |         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
      |  FROM arms, g),
      |th AS (SELECT st.*, num / nullif(vx, 0.0) AS theta FROM st)
      |SELECT arm, n_users,
      |       round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE), 6) AS mean_post,
      |       round(theta, 6) + 0.0 AS theta,
      |       round(CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)
      |             - theta * (CAST(sxa AS DOUBLE) / CAST(n_users AS DOUBLE)
      |                        - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0.0
      |         AS mean_post_adj,
      |       round(num * num / nullif(vx * vy, 0.0), 6) AS rho2
      |FROM th ORDER BY arm""".stripMargin

  /** Experiment power analysis: the per-arm sample size needed to detect
    * a relative lift over the OBSERVED conversion rate at 80% power /
    * 5% two-sided alpha — n = (z_a + z_b)^2 · (p1(1−p1) + p2(1−p2)) / δ²
    * with the normal quantiles embedded as Scala-computed literals
    * (z_{0.975} = 1.959964, z_{0.8} = 0.841621), evaluated for a ladder
    * of candidate lifts. Pairs with [[abTestConversion]]: that query
    * reads an experiment out; this one sizes the next.
    *
    * All inputs are the exact per-user conversion integers; the formula
    * is one fixed double expression per lift row (ceil → BIGINT via the
    * round-then-cast rule).
    */
  def powerAnalysis(events: DataFrame, liftsPct: Seq[Int]): DataFrame = {
    val zA = 1.959964
    val zB = 0.841621
    val wFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val base = events
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .withColumn("p1", col("conv").cast("double") / col("n_users").cast("double"))
    val rows = liftsPct.map { l =>
      base.select(lit(l.toLong).as("lift_pct"), col("p1"),
        (col("p1") * lit(1.0 + l / 100.0)).as("p2"))
    }.reduce(_ unionAll _)
    rows
      .withColumn("delta", col("p2") - col("p1"))
      .withColumn("n_per_arm",
        ceil(lit((zA + zB) * (zA + zB)) *
          (col("p1") * (lit(1.0) - col("p1")) + col("p2") * (lit(1.0) - col("p2"))) /
          (col("delta") * col("delta"))).cast("long"))
      .select(col("lift_pct"), round(col("p1"), 6).as("base_rate"),
        round(col("p2"), 6).as("target_rate"), col("n_per_arm"))
      .orderBy("lift_pct")
  }

  def powerAnalysisSql(liftsPct: Seq[Int]): String = {
    val zA = 1.959964
    val zB = 0.841621
    val liftRows = liftsPct.map(l => s"($l)").mkString(", ")
    s"""WITH firsts AS (
       |  SELECT user_id, event_type,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |base AS (
       |  SELECT count(*) AS n_users,
       |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS conv
       |  FROM firsts WHERE rn = 1),
       |b2 AS (SELECT *, CAST(conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS p1 FROM base),
       |lifts(lift_pct) AS (VALUES $liftRows),
       |calc AS (
       |  SELECT CAST(l.lift_pct AS BIGINT) AS lift_pct, b.p1,
       |         b.p1 * (1.0 + CAST(l.lift_pct AS DOUBLE) / 100.0) AS p2
       |  FROM lifts l, b2 b)
       |SELECT lift_pct, round(p1, 6) AS base_rate, round(p2, 6) AS target_rate,
       |       CAST(ceil(CAST('${(zA + zB) * (zA + zB)}' AS DOUBLE)
       |                 * (p1 * (1.0 - p1) + p2 * (1.0 - p2))
       |                 / ((p2 - p1) * (p2 - p1))) AS BIGINT) AS n_per_arm
       |FROM calc ORDER BY lift_pct""".stripMargin
  }

  /** Kolmogorov–Smirnov drift between the first and second time-half of
    * the event value distribution — the distribution-shift monitor that
    * complements [[graft.ops.Profiling]]'s PSI: KS is the sup-norm on
    * CDFs, so it catches a shape change PSI's fixed quantile bins can
    * blur. Values land in FIXED unit-width bins capped at `maxBin`
    * (schema-bounded alphabet, NOT data-sized — the discrete KS at bin
    * granularity, stated as such), the split point is the integral
    * midpoint of the observed epoch-µs range, and the statistic
    * cross-multiplies into exact BIGINT: max over bins of
    * |Fa·Nb − Fb·Na|, then one truncating DIV by Na·Nb (ppm). The
    * argmax bin (min bin on ties — two-step max-then-min, no composite
    * arg_max packing) says WHERE the distributions diverge. BIGINT
    * budget: Fa·Nb ≤ Na·Nb ≤ 9e12 under the ppm scaling — the sourceTvd
    * bound.
    *
    * Scale shape: one pass folds events to ≤ maxBin+1 (bin, side)
    * partials (map-side combine); the CDF window and max run on the
    * bin-alphabet frame (bounded unpartitioned window — the layout-ops
    * convention). No data-sized shuffle beyond the one groupBy.
    */
  def ksDrift(events: DataFrame, maxBin: Int, thresholdPpm: Long): DataFrame = {
    require(maxBin >= 1, s"maxBin must be >= 1: $maxBin")
    val ev = events.select(expr("unix_micros(ts)").as("us"),
      least(floor(col("value")), lit(maxBin)).cast("long").as("bin"))
    val evC = Caches.tracked(ev.persist())
    val mid = broadcast(evC.agg(
      expr("CAST((min(us) + max(us)) DIV 2 AS BIGINT)").as("mid")))
    val sides = evC.crossJoin(mid).groupBy(col("bin"))
      .agg(sum(when(col("us") < col("mid"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("us") >= col("mid"), 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("bin")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = Caches.tracked(sides
      .withColumn("fa", sum(col("ca")).over(w))
      .withColumn("fb", sum(col("cb")).over(w))
      .persist())
    val tot = broadcast(dd.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      count(lit(1)).as("n_bins")))
    val diffs = dd.crossJoin(tot)
      .select(col("bin"), col("na"), col("nb"), col("n_bins"),
        abs(col("fa") * col("nb") - col("fb") * col("na")).as("diff"))
    val mx = broadcast(diffs.agg(max(col("diff")).as("mx")))
    diffs.crossJoin(mx).filter(col("diff") === col("mx"))
      .groupBy(col("na"), col("nb"), col("n_bins"), col("mx"))
      .agg(min(col("bin")).as("argmax_bin"))
      .select(col("na").as("n_first_half"), col("nb").as("n_second_half"),
        col("n_bins"),
        expr("CAST((1000000 * mx) DIV greatest(na * nb, 1) AS BIGINT)").as("ks_ppm"),
        col("argmax_bin"),
        expr(s"CAST((1000000 * mx) DIV greatest(na * nb, 1) AS BIGINT) > $thresholdPpm")
          .as("drifted"))
  }

  def ksDriftSql(maxBin: Int, thresholdPpm: Long): String =
    s"""WITH ev AS (
       |  SELECT epoch_us(ts) AS us,
       |         least(CAST(floor(value) AS BIGINT), $maxBin) AS bin
       |  FROM events),
       |mid AS (SELECT (min(us) + max(us)) // 2 AS mid FROM ev),
       |sides AS (
       |  SELECT bin,
       |         CAST(sum(CASE WHEN us < mid THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |         CAST(sum(CASE WHEN us >= mid THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM ev CROSS JOIN mid GROUP BY bin),
       |dd AS (
       |  SELECT bin,
       |         CAST(sum(ca) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fa,
       |         CAST(sum(cb) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fb
       |  FROM sides),
       |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
       |               count(*) AS n_bins FROM sides),
       |diffs AS (
       |  SELECT bin, na, nb, n_bins, abs(fa * nb - fb * na) AS diff
       |  FROM dd CROSS JOIN tot),
       |mx AS (SELECT max(diff) AS mx FROM diffs)
       |SELECT na AS n_first_half, nb AS n_second_half, n_bins,
       |       CAST((1000000 * mx) // greatest(na * nb, 1) AS BIGINT) AS ks_ppm,
       |       min(bin) AS argmax_bin,
       |       CAST((1000000 * mx) // greatest(na * nb, 1) AS BIGINT) > $thresholdPpm AS drifted
       |FROM diffs CROSS JOIN mx
       |WHERE diff = mx
       |GROUP BY na, nb, n_bins, mx""".stripMargin

  /** Mann–Whitney rank-sum test per event-type segment between the
    * parity arms (user_id % 2 — the repo's standing experiment
    * assignment): does arm 0's `value` distribution stochastically
    * dominate arm 1's? Reports the doubled U statistics (doubling keeps
    * tie midranks integral: a tie group occupying ranks lo..hi has
    * 2·midrank = 2·cum_before + group_size + 1, always an integer) and
    * the common-language effect size P(A>B) + ½P(A=B) in ppm.
    *
    * Scale shape: the rank computation never sorts rows — it folds the
    * events to a (segment, cent-value) CENSUS first (alphabet bounded
    * by the value domain — range·100 cells — independent of row count),
    * then one partitioned cumulative window over the census computes
    * every midrank. Sums run in DECIMAL(38,0) (DuckDB: HUGEINT) so
    * n_a·n_b stays exact past 2^63 at corpus scale; exports narrow to
    * BIGINT.
    *
    * Parity: centi units via round() BEFORE the Long cast (Spark
    * truncates, DuckDB rounds — CLAUDE.md); all arithmetic integral;
    * ppm by truncating DIV on non-negative operands.
    */
  def mannWhitney(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type").as("segment"),
      (col("user_id") % 2).cast("long").as("arm"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val census = ev.groupBy(col("segment"), col("v"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("ca"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("cb"))
    val wBefore = Window.partitionBy(col("segment")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = census
      .withColumn("cum_before",
        coalesce(sum(col("ca") + col("cb")).over(wBefore), lit(0L)))
      // Σ over arm-0 members of 2·midrank, one census row at a time
      .withColumn("r2a_part",
        (col("ca") * (lit(2L) * col("cum_before") + col("ca") + col("cb") + lit(1L)))
          .cast("decimal(38,0)"))
    val agg = ranked.groupBy(col("segment"))
      .agg(sum(col("ca")).cast("decimal(38,0)").as("na"),
        sum(col("cb")).cast("decimal(38,0)").as("nb"),
        sum(col("r2a_part")).as("r2a"))
      .withColumn("u2a", col("r2a") - col("na") * (col("na") + lit(1L)))
      .withColumn("u2b", lit(2L) * col("na") * col("nb") - col("u2a"))
    agg.select(col("segment"),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      col("u2a").cast("long").as("u2_a"), col("u2b").cast("long").as("u2_b"),
      expr("CAST((1000000 * u2a) DIV (2 * na * nb) AS BIGINT)").as("cles_ppm"),
      (col("u2a") > col("u2b")).as("a_dominates"))
      .orderBy("segment")
  }

  val mannWhitneySql: String =
    """WITH ev AS (
      |  SELECT event_type AS segment, user_id % 2 AS arm,
      |         CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |census AS (
      |  SELECT segment, v,
      |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM ev GROUP BY segment, v),
      |ranked AS (
      |  SELECT segment, ca, cb,
      |         coalesce(sum(ca + cb) OVER (PARTITION BY segment ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM census),
      |agg AS (
      |  SELECT segment, sum(ca) AS na, sum(cb) AS nb,
      |         sum(ca * (2 * cum_before + ca + cb + 1)) AS r2a
      |  FROM ranked GROUP BY segment),
      |u AS (
      |  SELECT segment, na, nb, r2a - na * (na + 1) AS u2a,
      |         2 * na * nb - (r2a - na * (na + 1)) AS u2b
      |  FROM agg)
      |SELECT segment, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |       CAST(u2a AS BIGINT) AS u2_a, CAST(u2b AS BIGINT) AS u2_b,
      |       CAST((1000000 * u2a) // (2 * na * nb) AS BIGINT) AS cles_ppm,
      |       u2a > u2b AS a_dominates
      |FROM u ORDER BY segment""".stripMargin

  /** Kruskal–Wallis sufficient statistics — the k-group generalization
    * of [[mannWhitney]]: pooled midranks of `value` across ALL event
    * types, per-group doubled rank sums, and the global tie mass
    * Σ(t³−t). Everything the H statistic (and its tie correction)
    * needs, delivered as EXACT integers — the engine ships sufficient
    * statistics, not a libm chi-square p-value (the er_em_weights
    * convention: no transcendental may decide a gate row).
    *
    * Same census device as the 2-group test: one (cent-value) census
    * bounded by the value domain, one cumulative window over it, and
    * per-group conditional sums — the k groups cost ONE pass however
    * many there are.
    */
  def rankAnova(events: DataFrame): DataFrame = {
    val ev = events.select(col("event_type").as("segment"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val census = ev.groupBy(col("v"), col("segment"))
      .agg(count(lit(1)).as("c"))
    val pooled = census.groupBy(col("v")).agg(sum(col("c")).as("t"))
    // exclusive running count = inclusive device cumsum minus self —
    // range-partitioned, no single-task window over the value census
    val ranked = Ranks.overGlobalOrder(pooled, Seq(col("v").asc),
        cumSums = Seq("cum_incl" -> col("t")))
      .withColumn("cum_before", col("cum_incl") - col("t"))
      .drop("cum_incl")
    val globals = broadcast(ranked.agg(
      sum(col("t")).as("n_total"),
      sum((col("t") * col("t") * col("t") - col("t")).cast("decimal(38,0)"))
        .cast("long").as("tie_mass")))
    census.join(broadcast(ranked), Seq("v"))
      .groupBy(col("segment"))
      .agg(sum(col("c")).as("n_i"),
        sum((col("c") * (lit(2L) * col("cum_before") + col("t") + lit(1L)))
          .cast("decimal(38,0)")).as("r2"))
      .crossJoin(globals)
      .select(col("segment"), col("n_i"), col("r2").cast("long").as("r2_i"),
        expr("CAST((500 * r2) DIV n_i AS BIGINT)").as("mean_rank_milli"),
        col("n_total"), col("tie_mass"))
      .orderBy("segment")
  }

  val rankAnovaSql: String =
    """WITH ev AS (
      |  SELECT event_type AS segment, CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events),
      |census AS (
      |  SELECT v, segment, count(*) AS c FROM ev GROUP BY v, segment),
      |pooled AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM census GROUP BY v),
      |ranked AS (
      |  SELECT v, t,
      |         coalesce(sum(t) OVER (ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      |  FROM pooled),
      |globals AS (
      |  SELECT CAST(sum(t) AS BIGINT) AS n_total,
      |         CAST(sum(t * t * t - t) AS BIGINT) AS tie_mass
      |  FROM ranked)
      |SELECT segment, CAST(sum(c) AS BIGINT) AS n_i,
      |       CAST(sum(c * (2 * cum_before + t + 1)) AS BIGINT) AS r2_i,
      |       CAST((500 * sum(c * (2 * cum_before + t + 1))) // sum(c) AS BIGINT)
      |         AS mean_rank_milli,
      |       g.n_total, g.tie_mass
      |FROM census JOIN ranked USING (v) CROSS JOIN globals g
      |GROUP BY segment, g.n_total, g.tie_mass
      |ORDER BY segment""".stripMargin

  /** Exact 10%-trimmed and winsorized means of `value` per event type —
    * the robust-metric pair every experiment readout wants beside the
    * raw mean (one fat outlier should not move the dashboard).
    *
    * k = n DIV 10 rows are dropped from each tail (trimmed) or clamped
    * to the surviving boundary order statistics v_lo = value at rank
    * k+1 and v_hi = value at rank n−k (winsorized). Everything is
    * computed from the same (event_type, cent-value) census as
    * [[mannWhitney]] — per census row the kept mass is
    * max(0, min(cum_incl, n−k) − max(cum_before, k)) — so no
    * interpolated quantile and no per-row sort anywhere; the census
    * alphabet is value-domain-bounded, not data-bounded.
    *
    * Output means are truncating-DIV milli-units (exact integers on
    * both engines); sums carry DECIMAL(38,0)/HUGEINT internally.
    */
  def trimmedMean(events: DataFrame): DataFrame = {
    val census = events
      .select(col("event_type").as("segment"),
        expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .groupBy(col("segment"), col("v")).agg(count(lit(1)).as("c"))
    val wBefore = Window.partitionBy(col("segment")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("segment"))
    val marked = census
      .withColumn("cum_before", coalesce(sum(col("c")).over(wBefore), lit(0L)))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("k", expr("CAST(n DIV 10 AS BIGINT)"))
      .withColumn("kept",
        greatest(lit(0L),
          least(col("cum_before") + col("c"), col("n") - col("k")) -
            greatest(col("cum_before"), col("k"))))
    marked.groupBy(col("segment"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("kept")).as("n_kept"),
        sum((col("v") * col("kept")).cast("decimal(38,0)")).as("sum_kept"),
        sum((col("v") * col("c")).cast("decimal(38,0)")).as("sum_all"),
        // boundary order statistics: first value whose inclusive rank
        // clears each cut (min over the qualifying census rows)
        min(when(col("cum_before") + col("c") > col("k"), col("v"))).as("v_lo"),
        min(when(col("cum_before") + col("c") >= col("n") - col("k"), col("v"))).as("v_hi"))
      .select(col("segment"), col("n"), col("k"), col("n_kept"),
        col("v_lo").as("v_lo_centi"), col("v_hi").as("v_hi_centi"),
        expr("CAST((10 * sum_all) DIV n AS BIGINT)").as("mean_milli"),
        expr("CAST((10 * sum_kept) DIV n_kept AS BIGINT)").as("trimmed_mean_milli"),
        expr("CAST((10 * (sum_kept + k * (v_lo + v_hi))) DIV n AS BIGINT)")
          .as("winsorized_mean_milli"))
      .orderBy("segment")
  }

  val trimmedMeanSql: String =
    """WITH census AS (
      |  SELECT event_type AS segment, CAST(round(value * 100) AS BIGINT) AS v,
      |         count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |marked AS (
      |  SELECT segment, v, c,
      |         coalesce(sum(c) OVER (PARTITION BY segment ORDER BY v
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
      |         sum(c) OVER (PARTITION BY segment) AS n
      |  FROM census),
      |kc AS (
      |  SELECT *, n // 10 AS k,
      |         greatest(0, least(cum_before + c, n - (n // 10))
      |                     - greatest(cum_before, n // 10)) AS kept
      |  FROM marked)
      |SELECT segment, CAST(max(n) AS BIGINT) AS n, CAST(max(k) AS BIGINT) AS k,
      |       CAST(sum(kept) AS BIGINT) AS n_kept,
      |       min(CASE WHEN cum_before + c > k THEN v END) AS v_lo_centi,
      |       min(CASE WHEN cum_before + c >= n - k THEN v END) AS v_hi_centi,
      |       CAST((10 * sum(v * c)) // max(n) AS BIGINT) AS mean_milli,
      |       CAST((10 * sum(v * kept)) // sum(kept) AS BIGINT) AS trimmed_mean_milli,
      |       CAST((10 * (sum(v * kept) + max(k) * (min(CASE WHEN cum_before + c > k THEN v END)
      |                 + min(CASE WHEN cum_before + c >= n - k THEN v END)))) // max(n) AS BIGINT)
      |         AS winsorized_mean_milli
      |FROM kc GROUP BY segment ORDER BY segment""".stripMargin

  /** Acklam's rational approximation of the inverse standard-normal CDF
    * (relative error < 1.2e-9) — DRIVER-SIDE ONLY, used to precompute
    * the χ² critical-value table below; both engines receive the same
    * rounded literals, so parity never depends on this approximation.
    */
  private def probit(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val plow = 0.02425
    require(p > 0.0 && p < 1.0, s"probit domain: $p")
    if (p < plow) {
      val q = math.sqrt(-2.0 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    } else if (p <= 1.0 - plow) {
      val q = p - 0.5
      val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1.0)
    } else {
      val q = math.sqrt(-2.0 * math.log(1.0 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1.0)
    }
  }

  /** Largest segment count the embedded BH critical table covers; the
    * fixture alphabet is 5, the headroom absorbs alphabet drift (an m
    * beyond the table yields NULL crit rows — loud, not silently wrong). */
  val FdrMMax = 12

  /** χ²₁ critical values for the Benjamini–Hochberg schedule at
    * α = 0.05, in ppm: crit(m, k) = probit(1 − α·k/(2m))² for rank k of
    * m hypotheses, flattened (m−1)·FdrMMax + k, 1-indexed. Precomputed
    * in Scala (the embed-the-constant device — no engine libm) and
    * shared verbatim by the plan and the oracle. crit(1, 1) reproduces
    * the independently embedded 3841459 of [[srmCheck]].
    */
  val fdrCritPpm: IndexedSeq[Long] =
    (1 to FdrMMax).flatMap { m =>
      (1 to FdrMMax).map { k =>
        if (k > m) 0L
        else {
          val z = probit(1.0 - 0.05 * k / (2.0 * m))
          math.round(z * z * 1e6)
        }
      }
    }

  /** Benjamini–Hochberg FDR gate over the per-entry-segment conversion
    * tests — the multiple-testing correction an experiment platform
    * applies when one experiment reads MANY segment metrics: testing 5
    * segments at α=0.05 each inflates the false-positive rate to ~23%;
    * BH caps the expected FALSE DISCOVERY fraction at α instead.
    *
    * Per segment (the user's first event_type): two-proportion χ² of
    * user-level purchase conversion between the parity arms, kept
    * division-free as the exact identity
    * χ² = (ca·nb − cb·na)²·N / (na·nb·C·(N−C)) with every product in
    * DECIMAL(38,0) (HUGEINT in the oracle — they exceed BIGINT at real
    * user counts). Segments rank by the truncated-ppm statistic
    * (identical truncation both engines ⇒ identical order), each rank k
    * compares cross-multiplied against the embedded crit(m, k), and BH
    * rejects ranks 1..k_max where k_max is the deepest passing rank.
    *
    * Scale shape: one user-level aggregate (window + groupBy — the
    * [[srmCheck]] shape), then everything runs on the alphabet-bounded
    * segment frame (whole-frame windows over ≤ |alphabet| rows).
    */
  def fdrGate(events: DataFrame): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val users = events
      .withColumn("rn", row_number().over(wFirst))
      .groupBy(col("user_id"))
      .agg(max(when(col("rn") === 1, col("event_type"))).as("segment"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val seg = users.groupBy(col("segment")).agg(
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("arm") === 0L, col("conv")).otherwise(0L)).as("conv_a"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("arm") === 1L, col("conv")).otherwise(0L)).as("conv_b"))
    val st = seg
      .withColumn("dlt", expr("conv_a * n_b - conv_b * n_a"))
      .withColumn("num", expr("CAST(dlt AS DECIMAL(38,0)) * dlt * (n_a + n_b)"))
      .withColumn("den", expr(
        "CAST(n_a AS DECIMAL(38,0)) * n_b * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b)"))
      .withColumn("chi2_ppm", expr(
        "CASE WHEN den = 0 THEN NULL ELSE CAST((1000000 * num) DIV den AS BIGINT) END"))
    val wAll = Window.partitionBy()
    val wRank = Window.partitionBy()
      .orderBy(col("chi2_ppm").desc_nulls_last, col("segment"))
    val critArr = array(fdrCritPpm.map(lit): _*)
    st
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .withColumn("crit_ppm",
        when(col("m") <= FdrMMax,
          element_at(critArr, ((col("m") - 1) * FdrMMax + col("rank")).cast("int"))))
      .withColumn("pass", col("den") > 0 &&
        expr("CAST(1000000 AS DECIMAL(38,0)) * num >= CAST(crit_ppm AS DECIMAL(38,0)) * den"))
      .withColumn("k_max",
        coalesce(max(when(col("pass"), col("rank"))).over(wAll), lit(0L)))
      .select(col("segment"), col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        col("chi2_ppm"), col("m"), col("rank"), col("crit_ppm"),
        (col("rank") <= col("k_max")).as("reject_bh"))
      .orderBy("segment")
  }

  /** Oracle mirror of [[fdrGate]]: same window/groupBy user frame, the
    * χ² identity in HUGEINT, the SAME flattened crit literals indexed
    * (m−1)·FdrMMax + rank, the same deepest-passing-rank fold. */
  def fdrGateSql: String = {
    val critList = fdrCritPpm.mkString(", ")
    s"""WITH raw AS (
       |  SELECT user_id, event_type,
       |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |pu AS (
       |  SELECT user_id,
       |         max(CASE WHEN rn = 1 THEN event_type END) AS segment,
       |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
       |         user_id % 2 AS arm
       |  FROM raw GROUP BY user_id),
       |seg AS (
       |  SELECT segment,
       |         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
       |         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |         CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM pu GROUP BY segment),
       |st AS (
       |  SELECT *,
       |         CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
       |           * (conv_a * n_b - conv_b * n_a) * (n_a + n_b) AS num,
       |         CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
       |           * (n_a + n_b - conv_a - conv_b) AS den
       |  FROM seg),
       |st2 AS (
       |  SELECT *, CASE WHEN den = 0 THEN NULL
       |                 ELSE CAST((1000000 * num) // den AS BIGINT) END AS chi2_ppm
       |  FROM st),
       |rk AS (
       |  SELECT *, CAST(count(*) OVER () AS BIGINT) AS m,
       |         CAST(row_number() OVER (ORDER BY chi2_ppm DESC NULLS LAST, segment)
       |              AS BIGINT) AS rank
       |  FROM st2),
       |cr AS (
       |  SELECT *, CASE WHEN m <= $FdrMMax
       |                 THEN CAST([$critList][CAST((m - 1) * $FdrMMax + rank AS INTEGER)]
       |                           AS BIGINT) END AS crit_ppm
       |  FROM rk),
       |ps AS (
       |  SELECT *, den > 0 AND 1000000 * num >= CAST(crit_ppm AS HUGEINT) * den AS pass
       |  FROM cr),
       |km AS (
       |  SELECT *, coalesce(max(CASE WHEN pass THEN rank END) OVER (), 0) AS k_max
       |  FROM ps)
       |SELECT segment, n_a, conv_a, n_b, conv_b, chi2_ppm, m, rank, crit_ppm,
       |       rank <= k_max AS reject_bh
       |FROM km ORDER BY segment""".stripMargin
  }

  /** Number of bootstrap replicates for [[bootstrapCi]]. */
  val BootReps = 64

  /** Poisson(1) inverse-CDF thresholds on the Mersenne hash space
    * [[graft.functions.PortableHash.P]]: t_k = ⌊CDF(k)·P⌋ for k = 0..4
    * (weights cap at 5; P(w > 5) ≈ 6e−4). Driver-precomputed from
    * e⁻¹·Σ1/j! and embedded as the SAME BIGINT literals in the plan and
    * the oracle — the embed-the-constant device.
    */
  val bootPoissonThresholds: IndexedSeq[Long] = {
    val e = math.exp(-1.0)
    IndexedSeq(1.0, 2.0, 2.5, 8.0 / 3.0, 65.0 / 24.0)
      .map(s => (s * e * graft.functions.PortableHash.P.toDouble).toLong)
  }

  /** Per-replicate permutation coefficients (a_b·h + c_b mod P) — a
    * pairwise-independent family over the ONE md5 row hash, so the
    * expensive digest runs once per row instead of once per
    * (row, replicate) (measured 1.7 s → ~0.7 s at sf0.1). Disjoint
    * coefficient series from the minhash/bloom families.
    */
  val bootPerms: IndexedSeq[(Long, Long)] = {
    val P = graft.functions.PortableHash.P
    (1 to BootReps).map(i => ((123456791L * i + 3L) % P, (987654323L * i + 11L) % P))
  }

  /** Hash-deterministic Poisson bootstrap CI of the per-type value mean —
    * the resampling device that actually works on a cluster: classic
    * bootstrap resampling needs n draws WITH replacement per replicate
    * (a shuffle per replicate, and nondeterministic); the Poisson
    * approximation gives every row an independent Poisson(1) weight per
    * replicate, exact in one pass, and making the weight a FUNCTION OF
    * THE ROW KEY (PortableHash of "bs<b>:<event_id>") makes the whole
    * resample deterministic, partition-invariant, and oracle-checkable —
    * no engine RNG anywhere.
    *
    * Per replicate b: u_b = (a_b·h + c_b) mod P permutes the ONE md5 row
    * hash ([[bootPerms]] — one digest per row, not per (row, replicate)),
    * w = Poisson⁻¹(u_b) against the embedded [[bootPoissonThresholds]];
    * the replicate mean is the truncating milli ratio Σw·x / Σw (the
    * DEFINED statistic both engines compute bit-identically), and the
    * 95% band is the 2nd/63rd order statistic of the 64 replicate
    * means — exact ranks, no interpolated quantile (build-notes hazard).
    *
    * Scale shape: ONE scan; the ×[[BootReps]] explode feeds a partial
    * aggregation into types×64 groups, so the shuffle carries group
    * partials, never the exploded rows; the rank window runs on the
    * 64-row-per-type replicate frame. w > 0 filters ~37% of exploded
    * rows before they exist (filter inside the lambda array).
    */
  def bootstrapCi(events: DataFrame): DataFrame = {
    val Seq(t0, t1, t2, t3, t4) = bootPoissonThresholds.toSeq
    // EXPLICIT width before the ×64 hash fan-out: the one-file scan is
    // one partition, and the md5 work is ×BootReps the input size — the
    // same pin-the-parallelism rule as the kNN BNLJ (round-11 notes).
    // Without it this ran single-task (17.8 s vs 1.4 s at sf0.1).
    val width = events.sparkSession.sparkContext.defaultParallelism
    val hp = graft.functions.PortableHash
    // h is PROJECTED before the lambda (HOF lambdas re-evaluate unbound
    // child expressions per element — build notes); inside the lambda
    // only the cheap permutation runs per replicate. Persisted: the
    // replicate fan-out AND the exact-mean fold both read it — unpinned,
    // each re-ran the scan+hash lineage
    val base = Caches.tracked(events.select(col("event_type"),
      expr("CAST(round(value * 1000) AS BIGINT)").as("xm"),
      (hp.tokenHash(concat(lit("bs:"), col("event_id").cast("string"))) % hp.P).as("h"))
      .repartition(width)
      .persist())
    def wOf(u: Column): Column =
      when(u < t0, 0L).when(u < t1, 1L).when(u < t2, 2L)
        .when(u < t3, 3L).when(u < t4, 4L).otherwise(5L)
    val aArr = array(bootPerms.map(p => lit(p._1)): _*)
    val cArr = array(bootPerms.map(p => lit(p._2)): _*)
    val wArr = filter(
      transform(sequence(lit(0), lit(BootReps - 1)), b =>
        struct(b.cast("long").as("b"),
          wOf((element_at(aArr, b + 1) * col("h") + element_at(cArr, b + 1)) % hp.P)
            .as("w"))),
      s => s.getField("w") > 0L)
    val reps = base
      .select(col("event_type"), col("xm"), explode(wArr).as("r"))
      .groupBy(col("event_type"), col("r.b").as("b"))
      .agg(sum(col("r.w")).as("sw"), sum(col("r.w") * col("xm")).as("swx"))
      .withColumn("rep_mean_milli", expr("CAST(swx DIV sw AS BIGINT)"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("rep_mean_milli"), col("b"))
    val bands = reps.withColumn("rn", row_number().over(wRank))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_replicates"),
        max(when(col("rn") === 2, col("rep_mean_milli"))).as("boot_lo_milli"),
        max(when(col("rn") === BootReps - 1, col("rep_mean_milli"))).as("boot_hi_milli"))
    val exact = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(xm) DIV count(1) AS BIGINT)").as("mean_milli"))
    exact.join(bands, "event_type")
      .select(col("event_type"), col("n"), col("mean_milli"),
        col("n_replicates"), col("boot_lo_milli"), col("boot_hi_milli"))
      .orderBy("event_type")
  }

  /** Oracle mirror of [[bootstrapCi]]: the ×64 replicate grid as a cross
    * join, the same hash→Poisson thresholds, truncating replicate means
    * and exact 2nd/63rd rank picks. */
  def bootstrapCiSql: String = {
    val Seq(t0, t1, t2, t3, t4) = bootPoissonThresholds.toSeq
    val P = graft.functions.PortableHash.P
    val h = graft.functions.PortableHash.tokenHashSql(
      "'bs:' || CAST(event_id AS VARCHAR)")
    val aList = bootPerms.map(_._1).mkString(", ")
    val cList = bootPerms.map(_._2).mkString(", ")
    s"""WITH base AS (
       |  SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS xm,
       |         $h % $P AS h
       |  FROM events),
       |hashes AS (
       |  SELECT base.event_type, base.xm, CAST(b.b AS BIGINT) AS b,
       |         ([$aList][CAST(b.b + 1 AS INTEGER)] * base.h
       |          + [$cList][CAST(b.b + 1 AS INTEGER)]) % $P AS u
       |  FROM base, (SELECT unnest(range(0, $BootReps)) AS b) b),
       |grid AS (
       |  SELECT event_type, xm, b,
       |         CASE WHEN u < $t0 THEN 0 WHEN u < $t1 THEN 1
       |              WHEN u < $t2 THEN 2 WHEN u < $t3 THEN 3
       |              WHEN u < $t4 THEN 4 ELSE 5 END AS w
       |  FROM hashes),
       |reps AS (
       |  SELECT event_type, b, CAST(sum(w) AS BIGINT) AS sw,
       |         CAST(sum(w * xm) AS BIGINT) AS swx
       |  FROM grid WHERE w > 0 GROUP BY 1, 2),
       |rk AS (
       |  SELECT event_type, CAST(swx // sw AS BIGINT) AS m,
       |         row_number() OVER (PARTITION BY event_type
       |                            ORDER BY swx // sw, b) AS rn
       |  FROM reps),
       |bands AS (
       |  SELECT event_type, count(*) AS n_replicates,
       |         max(CASE WHEN rn = 2 THEN m END) AS boot_lo_milli,
       |         max(CASE WHEN rn = ${BootReps - 1} THEN m END) AS boot_hi_milli
       |  FROM rk GROUP BY event_type),
       |exact AS (
       |  SELECT event_type, count(*) AS n,
       |         CAST(CAST(sum(xm) AS BIGINT) // count(*) AS BIGINT) AS mean_milli
       |  FROM base GROUP BY event_type)
       |SELECT e.event_type, e.n, e.mean_milli,
       |       b.n_replicates, b.boot_lo_milli, b.boot_hi_milli
       |FROM exact e JOIN bands b USING (event_type)
       |ORDER BY e.event_type""".stripMargin
  }

  /** Event-study panel around the stream midpoint — the plot behind
    * every DiD readout ([[graft.ops]]'s `events_impact_did` gives ONE
    * effect number; the event study shows the per-day path, which is
    * where parallel-trends violations and anticipation effects are
    * actually seen). Per day: the treat−control activity difference,
    * and the effect relative to the PRE-period mean difference
    * (baseline-adjusted, so a level gap between arms reads as zero
    * effect pre-intervention).
    *
    * Exact: daily counts are integers; the baseline mean is milli
    * fixed-point via the +K floor-shift (pre-period diffs can be
    * negative — DIV/`//` divergence); effects are plain integer
    * subtractions. Scale shape: one (day, arm) partial-agged fold off
    * the scan, the scalar baseline broadcast back, |days| output rows.
    */
  def eventStudy(events: DataFrame): DataFrame = {
    val K = 1000000000L
    val daily = events.select(
        expr("unix_micros(ts) div 86400000000").as("day"),
        (col("user_id") % 2 === 0).as("treat"))
      .groupBy(col("day"))
      .agg(sum(when(col("treat"), 1L).otherwise(0L)).as("n_treat"),
        sum(when(!col("treat"), 1L).otherwise(0L)).as("n_ctrl"))
      .withColumn("diff", col("n_treat") - col("n_ctrl"))
    val mid = daily.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val base = daily.crossJoin(broadcast(mid)).filter(col("day") <= col("mid"))
      .agg(count(lit(1)).as("n_pre"), sum(col("diff")).as("s_pre"))
      .select(expr(s"CAST((1000 * s_pre + $K * n_pre) DIV n_pre AS BIGINT) - $K")
        .as("baseline_milli"))
    daily.crossJoin(broadcast(mid)).crossJoin(broadcast(base))
      .select(timestamp_micros(col("day") * lit(86400000000L)).as("day"),
        col("n_treat"), col("n_ctrl"), col("diff"),
        (col("day") > col("mid")).as("is_post"),
        (lit(1000L) * col("diff") - col("baseline_milli")).as("effect_milli"))
      .orderBy("day")
  }

  val eventStudySql: String = {
    val K = 1000000000L
    s"""WITH daily AS (
       |  SELECT epoch_us(ts) // 86400000000 AS day,
       |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
       |         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_ctrl
       |  FROM events GROUP BY 1),
       |d2 AS (SELECT *, n_treat - n_ctrl AS diff FROM daily),
       |m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM d2),
       |base AS (
       |  SELECT CAST((1000 * sum(diff) + $K * count(*)) // count(*) AS BIGINT) - $K
       |           AS baseline_milli
       |  FROM d2, m WHERE day <= mid)
       |SELECT make_timestamp(d2.day * 86400000000) AS day,
       |       d2.n_treat, d2.n_ctrl, d2.diff,
       |       d2.day > m.mid AS is_post,
       |       1000 * d2.diff - base.baseline_milli AS effect_milli
       |FROM d2, m, base ORDER BY day""".stripMargin
  }

  /** Sharp regression-discontinuity probe — the quasi-experimental
    * design when assignment is a THRESHOLD on a running variable: users
    * just left/right of the cut are comparable, so a conversion-rate
    * jump at the cut is the local treatment effect. Running variable:
    * the user's total event count; bands of width `bw` each side. The
    * second row is the PLACEBO at cut−bw — a credible design shows a
    * jump at the real cut and none at the placebo.
    *
    * Exact: band membership is integer comparison, rates are truncating
    * ppm, the jump is a difference of the two truncated ppms (the
    * DEFINED statistic — both engines truncate identically).
    * Scale shape: one user-level aggregate, two alphabet-bounded rows.
    */
  def regressionDiscontinuity(events: DataFrame, cut: Long, bw: Long,
                              minValue: Double): DataFrame = {
    // outcome: HIGH-VALUE purchase (plain purchase saturates at ~100%
    // on the fixture — a rate of 1.0 in every band carries no signal)
    val users = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("x"),
        max(when(col("event_type") === "purchase" && col("value") >= minValue,
          1L).otherwise(0L)).as("conv"))
    def row(label: String, c: Long) = users
      .agg(sum(when(col("x") >= c - bw && col("x") < c, 1L).otherwise(0L)).as("n_left"),
        sum(when(col("x") >= c - bw && col("x") < c, col("conv")).otherwise(0L)).as("conv_left"),
        sum(when(col("x") >= c && col("x") < c + bw, 1L).otherwise(0L)).as("n_right"),
        sum(when(col("x") >= c && col("x") < c + bw, col("conv")).otherwise(0L)).as("conv_right"))
      .select(lit(label).as("probe"), lit(c).as("cut"),
        col("n_left"), col("conv_left"), col("n_right"), col("conv_right"),
        expr("CASE WHEN n_left = 0 THEN NULL ELSE CAST((1000000 * conv_left) DIV n_left AS BIGINT) END").as("rate_left_ppm"),
        expr("CASE WHEN n_right = 0 THEN NULL ELSE CAST((1000000 * conv_right) DIV n_right AS BIGINT) END").as("rate_right_ppm"))
      .withColumn("jump_ppm", col("rate_right_ppm") - col("rate_left_ppm"))
    row("cut", cut).unionByName(row("placebo", cut - bw)).orderBy("probe")
  }

  def regressionDiscontinuitySql(cut: Long, bw: Long, minValue: Double): String = {
    def row(label: String, c: Long) =
      s"""SELECT '$label' AS probe, CAST($c AS BIGINT) AS cut,
         |  CAST(sum(CASE WHEN x >= ${c - bw} AND x < $c THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
         |  CAST(sum(CASE WHEN x >= ${c - bw} AND x < $c THEN conv ELSE 0 END) AS BIGINT) AS conv_left,
         |  CAST(sum(CASE WHEN x >= $c AND x < ${c + bw} THEN 1 ELSE 0 END) AS BIGINT) AS n_right,
         |  CAST(sum(CASE WHEN x >= $c AND x < ${c + bw} THEN conv ELSE 0 END) AS BIGINT) AS conv_right
         |FROM u""".stripMargin
    s"""WITH u AS (
       |  SELECT user_id, count(*) AS x,
       |         max(CASE WHEN event_type = 'purchase' AND value >= $minValue
       |                  THEN 1 ELSE 0 END) AS conv
       |  FROM events GROUP BY user_id),
       |rows_x AS (
       |  ${row("cut", cut)}
       |  UNION ALL
       |  ${row("placebo", cut - bw)}),
       |r2 AS (
       |  SELECT *,
       |    CASE WHEN n_left = 0 THEN NULL
       |         ELSE CAST((1000000 * conv_left) // n_left AS BIGINT) END AS rate_left_ppm,
       |    CASE WHEN n_right = 0 THEN NULL
       |         ELSE CAST((1000000 * conv_right) // n_right AS BIGINT) END AS rate_right_ppm
       |  FROM rows_x)
       |SELECT probe, cut, n_left, conv_left, n_right, conv_right,
       |       rate_left_ppm, rate_right_ppm,
       |       rate_right_ppm - rate_left_ppm AS jump_ppm
       |FROM r2 ORDER BY probe""".stripMargin
  }

  /** Pocock two-sided boundary at α = 0.05 for [[sequentialProbe]]'s 5
    * looks, in z² ppm (2.413² · 10⁶ — the published group-sequential
    * table constant, embedded verbatim in both engines). */
  val PocockZ2PpmK5 = 5822569L

  /** Group-sequential A/B probe — the peeking-correction device an
    * experiment platform runs when results are read DAILY instead of
    * once: five equally-spaced looks over the stream, each testing the
    * cumulative two-proportion χ² against the Pocock boundary (constant
    * across looks; naive repeated 1.96 testing at 5 looks inflates
    * false positives to ~14%). A user enters at their first event and
    * counts as converted once a purchase is logged at or before the
    * look — the point-in-time state the platform would actually have.
    *
    * Exact: per-look counts are integer comparisons on per-user
    * (first_us, first_purchase_us); the χ² compare is the
    * [[fdrGate]] cross-multiplied identity in DECIMAL(38,0)/HUGEINT;
    * `first_crossed_look` folds over the 5-row frame.
    */
  def sequentialProbe(events: DataFrame): DataFrame = {
    val users = events.groupBy(col("user_id"))
      .agg(min(expr("unix_micros(ts)")).as("first_us"),
        min(when(col("event_type") === "purchase" && col("value") >= 150.0,
          expr("unix_micros(ts)"))).as("purch_us"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
    val span = events.agg(expr("min(unix_micros(ts))").as("lo"),
      expr("max(unix_micros(ts))").as("hi"))
    val looks = span.select(explode(sequence(lit(1L), lit(5L))).as("look"),
        col("lo"), col("hi"))
      .select(col("look"),
        expr("lo + ((hi - lo) * look) div 5").as("look_us"))
    val st = users.crossJoin(broadcast(looks))
      .filter(col("first_us") <= col("look_us"))
      .groupBy(col("look"), col("look_us"))
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0L && col("purch_us") <= col("look_us"), 1L).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1L && col("purch_us") <= col("look_us"), 1L).otherwise(0L)).as("conv_b"))
      .withColumn("dlt", expr("conv_a * n_b - conv_b * n_a"))
      .withColumn("num", expr("CAST(dlt AS DECIMAL(38,0)) * dlt * (n_a + n_b)"))
      .withColumn("den", expr(
        "CAST(n_a AS DECIMAL(38,0)) * n_b * (conv_a + conv_b) * (n_a + n_b - conv_a - conv_b)"))
      .withColumn("chi2_ppm", expr(
        "CASE WHEN den = 0 THEN NULL ELSE CAST((1000000 * num) DIV den AS BIGINT) END"))
      .withColumn("crossed", col("den") > 0 &&
        expr(s"CAST(1000000 AS DECIMAL(38,0)) * num > CAST($PocockZ2PpmK5 AS DECIMAL(38,0)) * den"))
    val wAll = Window.partitionBy()
    st.withColumn("first_crossed_look",
        min(when(col("crossed"), col("look"))).over(wAll))
      .select(col("look"), timestamp_micros(col("look_us")).as("look_ts"),
        col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        col("chi2_ppm"), col("crossed"), col("first_crossed_look"))
      .orderBy("look")
  }

  val sequentialProbeSql: String =
    s"""WITH u AS (
       |  SELECT user_id, min(epoch_us(ts)) AS first_us,
       |         min(CASE WHEN event_type = 'purchase' AND value >= 150.0
       |                  THEN epoch_us(ts) END) AS purch_us,
       |         user_id % 2 AS arm
       |  FROM events GROUP BY user_id),
       |sp AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
       |looks AS (
       |  SELECT CAST(k AS BIGINT) AS look,
       |         lo + ((hi - lo) * CAST(k AS BIGINT)) // 5 AS look_us
       |  FROM sp, (SELECT unnest(range(1, 6)) AS k) t),
       |st AS (
       |  SELECT l.look, l.look_us,
       |    CAST(sum(CASE WHEN u.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN u.arm = 0 AND u.purch_us <= l.look_us THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
       |    CAST(sum(CASE WHEN u.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
       |    CAST(sum(CASE WHEN u.arm = 1 AND u.purch_us <= l.look_us THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
       |  FROM u JOIN looks l ON u.first_us <= l.look_us
       |  GROUP BY 1, 2),
       |x AS (
       |  SELECT *,
       |    CAST(conv_a * n_b - conv_b * n_a AS HUGEINT)
       |      * (conv_a * n_b - conv_b * n_a) * (n_a + n_b) AS num,
       |    CAST(n_a AS HUGEINT) * n_b * (conv_a + conv_b)
       |      * (n_a + n_b - conv_a - conv_b) AS den
       |  FROM st),
       |x2 AS (
       |  SELECT *,
       |    CASE WHEN den = 0 THEN NULL
       |         ELSE CAST((1000000 * num) // den AS BIGINT) END AS chi2_ppm,
       |    den > 0 AND 1000000 * num > $PocockZ2PpmK5 * den AS crossed
       |  FROM x)
       |SELECT look, make_timestamp(look_us) AS look_ts,
       |       n_a, conv_a, n_b, conv_b, chi2_ppm, crossed,
       |       min(CASE WHEN crossed THEN look END) OVER () AS first_crossed_look
       |FROM x2 ORDER BY look""".stripMargin

  /** Exact Gini split-gain screen over per-user features — the feature
    * audit a label-balance / curation pipeline runs before training a
    * quality classifier: which cheap per-user signal (entry event type,
    * type breadth, activity band, first-seen hour quadrant) most purifies
    * the conversion label.
    *
    * The metric is DEFINED in truncating integer arithmetic so both
    * engines agree bit-for-bit: parent impurity ppm =
    * ⌊10⁶·(n² − pos² − neg²) / n²⌋ and each child bucket contributes
    * ⌊10⁶·(n_v² − pos_v² − neg_v²) / (n·n_v)⌋ (the weighted-impurity
    * term with its division truncated PER TERM — documented metric, not
    * an approximation of something else); gain = parent − Σ terms, which
    * truncation can push a hair negative for a useless feature. Products
    * ride DECIMAL(38,0)/HUGEINT so the shape survives real user counts.
    *
    * Scale shape: ONE user-level aggregate, a 4-way explode of the
    * per-user feature tuple (rows ×4, no joins), one contingency
    * groupBy bounded by Σ|feature alphabets|, and a broadcast of the
    * one-row parent stats.
    *
    * Fixture note: the activity cuts (40/60/80 events) bracket the
    * generation's ~67 events/user mean; drift degrades gain toward 0
    * (a no-signal reading), never breaks parity.
    */
  def splitGain(events: DataFrame): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val users = events
      .withColumn("rn", row_number().over(wFirst))
      .groupBy(col("user_id"))
      .agg(max(when(col("rn") === 1, col("event_type"))).as("entry"),
        max(when(col("rn") === 1,
          expr("((unix_micros(ts) div 3600000000) % 24) div 6"))).as("hrq"),
        countDistinct(col("event_type")).as("breadth"),
        count(lit(1)).as("n_ev"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("pos"))
    val feats = users.select(col("pos"), explode(array(
      struct(lit("entry_type").as("feature"),
        concat(lit("et_"), col("entry")).as("bucket")),
      struct(lit("type_breadth").as("feature"),
        concat(lit("bd_"), col("breadth")).as("bucket")),
      struct(lit("activity").as("feature"),
        when(col("n_ev") <= 40, "act_le40").when(col("n_ev") <= 60, "act_le60")
          .when(col("n_ev") <= 80, "act_le80").otherwise("act_hi").as("bucket")),
      struct(lit("first_hour").as("feature"),
        concat(lit("hr_"), col("hrq")).as("bucket")))).as("fb"))
      .select(col("fb.feature").as("feature"), col("fb.bucket").as("bucket"), col("pos"))
    val parent = users.agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
      .select(col("n"), col("pos"),
        expr("""CAST((1000000 * (CAST(n AS DECIMAL(38,0)) * n
               |                 - CAST(pos AS DECIMAL(38,0)) * pos
               |                 - CAST(n - pos AS DECIMAL(38,0)) * (n - pos)))
               |     DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
          .as("parent_gini_ppm"))
    val cont = feats.groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).as("n_v"), sum(col("pos")).as("pos_v"))
    cont.crossJoin(broadcast(parent))
      .withColumn("term_ppm", expr(
        """CAST((1000000 * (CAST(n_v AS DECIMAL(38,0)) * n_v
          |                 - CAST(pos_v AS DECIMAL(38,0)) * pos_v
          |                 - CAST(n_v - pos_v AS DECIMAL(38,0)) * (n_v - pos_v)))
          |     DIV (CAST(n AS DECIMAL(38,0)) * n_v) AS BIGINT)""".stripMargin))
      .groupBy(col("feature"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("parent_gini_ppm")).as("parent_gini_ppm"),
        sum(col("term_ppm")).as("child_gini_ppm"))
      .select(col("feature"), col("n_buckets"), col("parent_gini_ppm"),
        col("child_gini_ppm"),
        (col("parent_gini_ppm") - col("child_gini_ppm")).as("gain_ppm"))
      .orderBy(col("gain_ppm").desc, col("feature"))
  }

  /** Oracle mirror of [[splitGain]]: the per-user frame, the 4-way
    * UNION ALL feature unpivot, and the same truncating-per-term
    * impurity arithmetic in HUGEINT. */
  val splitGainSql: String =
    """WITH raw AS (
      |  SELECT user_id, event_type, ts,
      |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |pu AS (
      |  SELECT user_id,
      |         max(CASE WHEN rn = 1 THEN event_type END) AS entry,
      |         max(CASE WHEN rn = 1 THEN ((epoch_us(ts) // 3600000000) % 24) // 6 END) AS hrq,
      |         CAST(count(DISTINCT event_type) AS BIGINT) AS breadth,
      |         count(*) AS n_ev,
      |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM raw GROUP BY user_id),
      |fb AS (
      |  SELECT 'entry_type' AS feature, 'et_' || entry AS bucket, pos FROM pu
      |  UNION ALL
      |  SELECT 'type_breadth', 'bd_' || CAST(breadth AS VARCHAR), pos FROM pu
      |  UNION ALL
      |  SELECT 'activity',
      |         CASE WHEN n_ev <= 40 THEN 'act_le40' WHEN n_ev <= 60 THEN 'act_le60'
      |              WHEN n_ev <= 80 THEN 'act_le80' ELSE 'act_hi' END, pos FROM pu
      |  UNION ALL
      |  SELECT 'first_hour', 'hr_' || CAST(hrq AS VARCHAR), pos FROM pu),
      |par AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos FROM pu),
      |cont AS (
      |  SELECT feature, bucket, CAST(count(*) AS BIGINT) AS n_v,
      |         CAST(sum(pos) AS BIGINT) AS pos_v
      |  FROM fb GROUP BY 1, 2),
      |terms AS (
      |  SELECT feature,
      |         CAST((1000000 * (CAST(n_v AS HUGEINT) * n_v
      |                          - CAST(pos_v AS HUGEINT) * pos_v
      |                          - CAST(n_v - pos_v AS HUGEINT) * (n_v - pos_v)))
      |              // (CAST(p.n AS HUGEINT) * n_v) AS BIGINT) AS term_ppm
      |  FROM cont, par p),
      |pg AS (
      |  SELECT CAST((1000000 * (CAST(n AS HUGEINT) * n
      |                          - CAST(pos AS HUGEINT) * pos
      |                          - CAST(n - pos AS HUGEINT) * (n - pos)))
      |              // (CAST(n AS HUGEINT) * n) AS BIGINT) AS parent_gini_ppm
      |  FROM par)
      |SELECT f.feature, f.n_buckets, pg.parent_gini_ppm, f.child_gini_ppm,
      |       pg.parent_gini_ppm - f.child_gini_ppm AS gain_ppm
      |FROM (SELECT feature, CAST(count(*) AS BIGINT) AS n_buckets,
      |             CAST(sum(term_ppm) AS BIGINT) AS child_gini_ppm
      |      FROM terms GROUP BY feature) f, pg
      |ORDER BY gain_ppm DESC, feature""".stripMargin
}
