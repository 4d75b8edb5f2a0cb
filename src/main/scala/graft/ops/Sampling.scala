package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified deterministic sampling — class rebalancing for training
  * corpora (downweight dominant strata, keep rare ones whole) without a
  * shuffle and without RNG.
  *
  * Quota sampling ("exactly k per stratum") needs a per-stratum rank —
  * a sort somewhere. Rate sampling ("1-in-r per stratum") is a pure
  * FILTER: keep a row iff portable-hash(id) % rate(stratum) == 0. It is
  * reproducible across engines/runs/partitionings (the property
  * `sample()` lacks), composes with pushdown (the filter reaches the
  * scan), and costs zero shuffles at any scale. The same hash prefix
  * trick gives nested samples: rate 10 ⊇ rate 20 ⊇ rate 40 …
  */
object Sampling {

  private def rateFor(rates: Map[String, Int], defaultRate: Int)(key: Column): Column =
    rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): Column) {
      case ((k, r), acc) => when(key === k, r).otherwise(acc)
    }

  private def rateForSql(rates: Map[String, Int], defaultRate: Int, key: String): String = {
    val cases = rates.toSeq.sortBy(_._1)
      .map { case (k, r) => s"WHEN $key = '$k' THEN $r" }.mkString(" ")
    s"CASE $cases ELSE $defaultRate END"
  }

  /** Sampled rows: one in `rates(stratum)` kept, deterministically. */
  def stratified(df: DataFrame, keyCol: String, idCol: String,
                 rates: Map[String, Int], defaultRate: Int = 1): DataFrame = {
    val rate = rateFor(rates, defaultRate)(col(keyCol))
    df.filter(PortableHash.tokenHash(col(idCol).cast("string")) % rate === 0)
  }

  /** Per-stratum totals vs sampled counts — the rebalancing audit. One
    * aggregation pass (the sample decision is a conditional inside the
    * agg, not a second scan).
    */
  def stratifiedSummary(df: DataFrame, keyCol: String, idCol: String,
                        rates: Map[String, Int], defaultRate: Int = 1): DataFrame = {
    val rate = rateFor(rates, defaultRate)(col(keyCol))
    val kept = PortableHash.tokenHash(col(idCol).cast("string")) % rate === 0
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_total"),
        sum(when(kept, 1L).otherwise(0L)).as("n_sampled"),
        max(rate).cast("long").as("rate"))
      .orderBy(keyCol)
  }

  def stratifiedSummarySql(table: String, keyCol: String, idCol: String,
                           rates: Map[String, Int], defaultRate: Int = 1): String = {
    val rate = rateForSql(rates, defaultRate, keyCol)
    val kept = s"${PortableHash.tokenHashSql(s"CAST($idCol AS VARCHAR)")} % ($rate) = 0"
    s"""SELECT $keyCol, count(*) AS n_total,
       |  CAST(sum(CASE WHEN $kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       |  CAST(max($rate) AS BIGINT) AS rate
       |FROM $table GROUP BY $keyCol ORDER BY $keyCol""".stripMargin
  }
}
