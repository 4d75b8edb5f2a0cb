package graft.ops

import graft.functions.{KmvFunctions, PortableHash}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch summaries — the approximate-aggregate layer a 100 TB
  * analytics store runs on (exact global distincts don't fit a shuffle;
  * bounded sketches do).
  */
object Sketches {

  /** Approximate distinct users per event type via the KMV sketch
    * ([[graft.functions.KmvMinHashes]]), audited against the exact count.
    *
    * Scale shape: the sketch is a k-bounded partial aggregate — map tasks
    * ship ≤ k longs per group, merge is union-truncate, so the shuffle
    * volume is O(groups · k) regardless of corpus size. The exact
    * `count_distinct` alongside is the AUDIT column (cheap at fixture
    * scale; on the real corpus you'd drop it and trust the ±1/√k bound —
    * k=64 gives ~12% expected error).
    *
    * Estimator: exact when the sketch isn't full (size < k ⇒ the group
    * had < k distinct hashes ⇒ size IS the distinct count); otherwise the
    * classic KMV estimate (k-1)/frac(kth smallest hash), frac mapping the
    * 60-bit portable hash onto (0, 1].
    */
  def approxDistinctUsers(events: DataFrame, k: Int): DataFrame = {
    KmvFunctions.register(events.sparkSession)
    val h = PortableHash.tokenHash(col("user_id").cast("string"))
    events
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("n_exact"),
        KmvFunctions.kmvMinHashes(h, k).as("sk"))
      .select(col("event_type"), col("n_exact"),
        size(col("sk")).cast("long").as("sketch_size"),
        round(
          when(size(col("sk")) < k, size(col("sk")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              ((element_at(col("sk"), k).cast("double") + lit(1.0)) / lit(KmvFunctions.HashSpace))),
          4).as("kmv_estimate"))
      .withColumn("rel_error",
        round(abs(col("kmv_estimate") - col("n_exact")) / col("n_exact"), 4))
      .orderBy("event_type")
  }

  /** The oracle rebuilds the sketch declaratively: the k smallest distinct
    * hashes per group are just `row_number() OVER (ORDER BY h) <= k` —
    * that reproducibility (vs. HLL's engine-private register layout) is
    * why KMV is the checkable choice here.
    */
  def approxDistinctUsersSql(k: Int): String =
    s"""WITH exact AS (
       |  SELECT event_type, count(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY event_type),
       |h AS (
       |  SELECT DISTINCT event_type,
       |         ${PortableHash.tokenHashSql("CAST(user_id AS VARCHAR)")} AS h
       |  FROM events),
       |ranked AS (
       |  SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
       |  FROM h),
       |sk AS (
       |  SELECT event_type, count(*) AS sketch_size,
       |         max(CASE WHEN rn = $k THEN h END) AS kth
       |  FROM ranked WHERE rn <= $k GROUP BY event_type),
       |est AS (
       |  SELECT e.event_type, e.n_exact, CAST(s.sketch_size AS BIGINT) AS sketch_size,
       |         round(CASE WHEN s.sketch_size < $k THEN CAST(s.sketch_size AS DOUBLE)
       |               ELSE ${(k - 1).toDouble} / ((s.kth + 1.0) / ${KmvFunctions.HashSpace}) END, 4) AS kmv_estimate
       |  FROM exact e JOIN sk s ON e.event_type = s.event_type)
       |SELECT event_type, n_exact, sketch_size, kmv_estimate,
       |       round(abs(kmv_estimate - n_exact) / n_exact, 4) AS rel_error
       |FROM est ORDER BY event_type""".stripMargin
}
