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

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    * each doc draws key = ln(u)/w from a uniform u and its weight w; the
    * k LARGEST keys are exactly a weight-proportional WOR draw. The
    * uniform comes from the 60-bit [[PortableHash]] of the doc id — no
    * RNG, so the sample is reproducible across engines and backfills
    * (the same property [[graft.ops.Curation]]'s importance sampler
    * uses), and u = (h+1)/2^60 ∈ (0, 1] never takes ln(0).
    *
    * Scale shape: key assignment is a map-only projection; the top-k is
    * a TakeOrderedAndProject (per-partition heaps, driver merges k
    * rows) — a 100 TB corpus is one scan plus k rows of driver state,
    * never a global sort. Keys are rounded to 6 dp (the repo-wide score
    * convention — wide enough to absorb JVM-vs-libm ln() last-ulp
    * differences) before ranking, with doc_id as the total-order
    * tie-break, so both engines cut the same boundary.
    */
  def weightedSample(docs: DataFrame, k: Int): DataFrame = {
    val h = PortableHash.tokenHash(concat(lit("ws|"), col("doc_id").cast("string")))
    val u = (h.cast("double") + lit(1.0)) / lit(1152921504606846976L).cast("double")
    // nullif: a zero-weight doc's key must be NULL (= excluded from the
    // ordered take) in both engines, not Spark-NULL vs DuckDB -inf
    // + 0.0 normalizes IEEE negative zero: a key in (−5e-7, 0) rounds
    // to −0.0 in DuckDB but +0.0 via Spark's BigDecimal path, and the
    // harness compares reprs (seen at sf0.1: '-0.0' vs '0.0')
    docs.select(col("doc_id"), col("n_chars"),
        (round(log(u) / nullif(col("n_chars").cast("double"), lit(0.0)), 6) + lit(0.0))
          .as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id"))
      .limit(k)
  }

  def weightedSampleSql(k: Int): String = {
    val h = PortableHash.tokenHashSql("concat('ws|', CAST(doc_id AS VARCHAR))")
    s"""SELECT doc_id, n_chars,
       |  round(ln((CAST($h AS DOUBLE) + 1.0) / 1152921504606846976.0)
       |        / nullif(CAST(n_chars AS DOUBLE), 0.0), 6) + 0.0 AS es_key
       |FROM documents
       |ORDER BY es_key DESC, doc_id
       |LIMIT $k""".stripMargin
  }
}
