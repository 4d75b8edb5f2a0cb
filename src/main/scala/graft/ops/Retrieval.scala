package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the RAG serving shape: fuse a lexical ranking
  * (BM25 over `documents`) with a dense ranking (exact cosine over
  * `embeddings`, vec_id ↔ doc_id) by reciprocal-rank fusion,
  * rrf(d) = Σ_systems 1/(K + rank_s(d)) with the conventional K = 60.
  *
  * Parity: both input rankings are already oracle-checked queries
  * ([[TextAnalysis.bm25TopK]], [[Similarity.bruteForceTopK]]); RRF adds
  * only 1/(K + rank) on INTEGRAL ranks — a correctly-rounded division
  * of exact integers, and the two-term sum is a single IEEE add — so
  * the fused scores are bit-identical across engines before the 6 dp
  * rounding even applies. The oracle nests the two component queries
  * verbatim as subqueries: one definition per ranking, shared between
  * standalone and fused paths.
  *
  * Scale shape: each component is its own bounded top-k (broadcast
  * query sets, partial per-partition top-k); the fusion then joins two
  * k·|Q|-row frames — negligible beside the component scans. The final
  * cut is a per-query window over ≤ 2k rows.
  */
object Retrieval {

  private val RrfK = 60

  /** query_id (= probe vec_id) ↔ BM25 query string, the cross-modal
    * bridge: query i's text terms pair with probe vector i. */
  private def queryMap(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    broadcast(TextAnalysis.bm25Queries.map(_._1).zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("query_id", "query"))
  }

  def hybridRrf(docs: DataFrame, emb: DataFrame, kEach: Int, kFinal: Int): DataFrame = {
    val qmap = queryMap(docs.sparkSession)
    val b = TextAnalysis.bm25TopK(docs, kEach)
      .select(col("query"), col("doc_id"), col("rank").as("bm25_rank"))
    val a = Similarity.bruteForceTopK(emb, TextAnalysis.bm25Queries.size, kEach)
      .join(qmap, "query_id")
      .select(col("query"), col("vec_id").as("doc_id"), col("rank").as("ann_rank"))
    val fused = b.join(a, Seq("query", "doc_id"), "full_outer")
      .select(col("query"), col("doc_id"), col("bm25_rank"), col("ann_rank"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("bm25_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("ann_rank")), lit(0.0)), 6).as("rrf"))
    val w = Window.partitionBy(col("query")).orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kFinal)
      .orderBy(col("query"), col("rank"))
  }

  def hybridRrfSql(kEach: Int, kFinal: Int): String = {
    val qvals = TextAnalysis.bm25Queries.map(_._1).zipWithIndex
      .map { case (q, i) => s"(CAST($i AS BIGINT), '$q')" }.mkString(", ")
    s"""WITH qmap(query_id, query) AS (VALUES $qvals),
       |b AS (
       |  SELECT query, doc_id, rank AS bm25_rank
       |  FROM (${TextAnalysis.bm25TopKSql(kEach)})),
       |a AS (
       |  SELECT m.query, r.vec_id AS doc_id, r.rank AS ann_rank
       |  FROM (${Similarity.bruteForceTopKSql(TextAnalysis.bm25Queries.size, kEach)}) r
       |  JOIN qmap m ON r.query_id = m.query_id),
       |f AS (
       |  SELECT coalesce(b.query, a.query) AS query,
       |         coalesce(b.doc_id, a.doc_id) AS doc_id,
       |         b.bm25_rank, a.ann_rank,
       |         round(coalesce(1e0 / ($RrfK + b.bm25_rank), 0e0)
       |               + coalesce(1e0 / ($RrfK + a.ann_rank), 0e0), 6) AS rrf
       |  FROM b FULL OUTER JOIN a ON b.query = a.query AND b.doc_id = a.doc_id),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER
       |    (PARTITION BY query ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank
       |  FROM f)
       |SELECT query, doc_id, bm25_rank, ann_rank, rrf, rank FROM ranked
       |WHERE rank <= $kFinal ORDER BY query, rank""".stripMargin
  }
}
