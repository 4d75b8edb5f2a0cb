package graft.ops

import org.apache.spark.sql.DataFrame
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
    * one sort + two window minima — a single exchange on nothing (global
    * RANGE window over size): at corpus scale you'd pre-aggregate to
    * one (size, min_price) row per size first, which this plan's first
    * window effectively is, so the global window runs over |distinct
    * sizes| not |parts|. Ties on both dimensions survive together
    * (neither dominates the other — dominance needs one strict edge).
    */
  def skylineParts(part: DataFrame): DataFrame = {
    val wSmaller = Window.orderBy(col("p_size"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(col("p_size"))
    part
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .withColumn("min_same", min(col("p_retailprice")).over(wSame))
      .withColumn("min_smaller", min(col("p_retailprice")).over(wSmaller))
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
}
