package graft.ops

import graft.functions.PortableHash
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed curation pipeline — the end-to-end funnel a training-data
  * run actually executes, with per-stage survivor counts as the
  * observability artifact:
  *
  *   1. quality gate    — keep docs with quality ≥ `qualityMin`
  *      ([[TextAnalysis.qualityScore]])
  *   2. exact dedup     — canonical survivor = min doc_id per content
  *      fingerprint among quality survivors ([[TextAnalysis.fingerprint]])
  *   3. stratified keep — per-language 1-in-r hash rates
  *      ([[Sampling]]'s rate semantics over [[TextAnalysis.languageId]])
  *
  * One pass computes all per-doc signals (they are pure projections over
  * the same text — no joins), one window keyed on the fingerprint decides
  * canonicality, one aggregation keyed on language emits the funnel. At
  * 100 TB: a projection, one fingerprint-keyed exchange, one
  * language-keyed exchange.
  */
object Curation {

  def funnel(docs: DataFrame, qualityMin: Double,
             rates: Map[String, Int], defaultRate: Int = 1): DataFrame = {
    // all three signals in ONE projection lineage (TextAnalysis.signals) —
    // a join of their standalone formulations would re-scan the corpus
    // per signal and cannot broadcast at corpus scale
    val enriched = TextAnalysis.signals(docs)
      .withColumn("ok", col("quality") >= qualityMin)
    // canonical = the smallest quality-passing doc_id on this fingerprint
    val w = Window.partitionBy(col("fp"))
    val flagged = enriched
      .withColumn("canon",
        coalesce(min(when(col("ok"), col("doc_id"))).over(w) === col("doc_id"), lit(false)))
    val rate = rates.toSeq.sortBy(_._1).foldRight(lit(defaultRate): org.apache.spark.sql.Column) {
      case ((k, r), acc) => when(col("pred_lang") === k, r).otherwise(acc)
    }
    flagged
      .withColumn("sampled",
        col("canon") && PortableHash.tokenHash(col("doc_id").cast("string")) % rate === 0)
      .groupBy(col("pred_lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("canon"), 1L).otherwise(0L)).as("n_canonical"),
        sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"))
      .orderBy("pred_lang")
  }

  def funnelSql(qualityMin: Double, rates: Map[String, Int], defaultRate: Int = 1): String = {
    val rate = {
      val cases = rates.toSeq.sortBy(_._1)
        .map { case (k, r) => s"WHEN pred_lang = '$k' THEN $r" }.mkString(" ")
      s"CASE $cases ELSE $defaultRate END"
    }
    s"""WITH ${TextAnalysis.signalsSql},
       |enriched AS (
       |  SELECT doc_id, pred_lang, quality, fp,
       |         quality >= $qualityMin AS ok
       |  FROM sig),
       |flagged AS (
       |  SELECT *,
       |    coalesce(min(CASE WHEN ok THEN doc_id END) OVER (PARTITION BY fp) = doc_id, false) AS canon
       |  FROM enriched),
       |sampled AS (
       |  SELECT *,
       |    canon AND ${PortableHash.tokenHashSql("CAST(doc_id AS VARCHAR)")} % ($rate) = 0 AS keep
       |  FROM flagged)
       |SELECT pred_lang, count(*) AS n_total,
       |  CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
       |  CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT) AS n_canonical,
       |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
       |FROM sampled GROUP BY pred_lang ORDER BY pred_lang""".stripMargin
  }
}
