package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed joins and aggregations.
  *
  * AQE's skew-join splitting handles most skew at runtime (on by default,
  * asserted in SCALING.md), but two cases still want explicit salt:
  * sort-merge joins whose skewed side feeds from a shuffle AQE won't
  * split (e.g. under a required distribution), and streaming joins where
  * AQE is disabled entirely. The classic remedy: replicate the small side
  * `salt` times and scatter the skewed side's hot keys across the
  * replicas — hot-key work fans out over `salt` tasks at the cost of a
  * `salt`× blow-up of the SMALL side only.
  */
object Salting {

  /** Equi-join `skewed ⋈ small` on `key`, with the skewed side scattered
    * over `salt` sub-keys. Result set is identical to the plain join —
    * every skewed row meets exactly the one replica matching its salt.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String, salt: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    // outer-preserving the SMALL side is unsound under salting: a replica
    // with no matching (key, salt) row would surface as `salt` spurious
    // null-extended rows — only skewed-side-preserving joins are identical
    // to the plain join
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "leftanti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports skewed-side-preserving joins only (inner/left/semi/anti), got $joinType")
    // deterministic scatter: hash the whole row's key + a uniform spread
    // column (monotonically_increasing_id is partition-local & cheap)
    val s = skewed.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salt)))
    val r = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    s.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-safe aggregation: count per (key, salt) partial, then
    * re-aggregate per key. A hot key's updates spread over `salt`
    * partial groups instead of one reducer. (Spark's hash aggregation
    * with map-side partials already absorbs most of this — the explicit
    * form is for aggregates without partial pushdown, e.g. exact
    * count-distinct over a hot key.)
    */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("partial"))
      .groupBy(col(key))
      .agg(sum(col("partial")).as("n_distinct"))
  }
}
