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

  /** Context-window packing of the BM25 ranking — the assembly step
    * between retrieval and generation: walk each query's ranked list in
    * order, accumulate BPE-ish token costs, and mark the PREFIX that
    * fits the token budget (rank order is relevance order, so prefix
    * truncation — not skip-and-continue — is the standard contract; a
    * skipped mid-rank doc would reorder evidence). Per row: the doc's
    * token cost, the running total, and whether it made the window —
    * the audit a RAG operator reads to size budgets (how much of the
    * top-k actually ships?).
    *
    * Parity: ranks and token counts are integers; the cumulative sum
    * runs over the deterministic rank order. Scale shape: the ranked
    * candidate frame is |Q|·k rows and BROADCASTS into the corpus-side
    * token projection (one scan, join keyed doc_id); the window is
    * per-query over ≤ k rows.
    */
  def contextPacking(docs: DataFrame, k: Int, budgetTokens: Long): DataFrame = {
    require(k >= 1 && budgetTokens >= 1, s"k and budget must be >= 1: $k, $budgetTokens")
    val cand = TextAnalysis.bm25TopK(docs, k)
      .select(col("query"), col("doc_id"), col("rank"))
    val toks = docs.select(col("doc_id"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("doc_tokens"))
    val w = Window.partitionBy(col("query")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(cand), "doc_id")
      .withColumn("cum_tokens", sum(col("doc_tokens")).over(w))
      .withColumn("packed", col("cum_tokens") <= budgetTokens)
      .select(col("query"), col("rank"), col("doc_id"), col("doc_tokens"),
        col("cum_tokens"), col("packed"))
      .orderBy(col("query"), col("rank"))
  }

  def contextPackingSql(k: Int, budgetTokens: Long): String =
    s"""WITH cand AS (${TextAnalysis.bm25TopKSql(k)}),
       |toks AS (
       |  SELECT doc_id,
       |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS doc_tokens
       |  FROM documents),
       |j AS (
       |  SELECT c.query, c.rank, c.doc_id, t.doc_tokens,
       |         CAST(sum(t.doc_tokens) OVER (PARTITION BY c.query ORDER BY c.rank
       |                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM cand c JOIN toks t ON t.doc_id = c.doc_id)
       |SELECT query, rank, doc_id, doc_tokens, cum_tokens,
       |       cum_tokens <= $budgetTokens AS packed
       |FROM j ORDER BY query, rank""".stripMargin

  /** Pseudo-relevance-feedback query expansion (the RM3/Rocchio shape):
    * pass 1 retrieves each query's `fdbk` top BM25 documents; the
    * `expand` strongest non-query terms of those documents (by summed
    * term frequency — an INTEGRAL weight, so candidate selection has no
    * float-ranking hazard; ties break on the term string) join the
    * query; pass 2 re-ranks the corpus under the expanded term set.
    * Output rows carry the expansion terms (sorted, comma-joined) so an
    * operator can audit what the feedback loop added.
    *
    * Scale shape: both passes are [[TextAnalysis.bm25Rank]] passes over
    * the SAME persisted tf/dl corpus frames (one tokenize, two scoring
    * joins); the feedback frame is fdbk·|Q| rows, candidate weighting is
    * one aggregate over the feedback docs' terms, and the expanded
    * workload stays a broadcast-sized (query, term) list.
    */
  def queryExpansion(docs: DataFrame, fdbk: Int, expand: Int, k: Int): DataFrame = {
    require(fdbk >= 1 && expand >= 1 && k >= 1,
      s"fdbk, expand and k must be >= 1: $fdbk, $expand, $k")
    val spark = docs.sparkSession
    import spark.implicits._
    val q1 = broadcast(TextAnalysis.bm25Queries
      .flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("query", "term"))
    val (tf, dl) = TextAnalysis.bm25Corpus(docs, checkpoint = true)
    val feedback = TextAnalysis.bm25Rank(tf, dl, q1, fdbk)
      .select(col("query"), col("doc_id"))
    val cand = feedback.join(tf, "doc_id")
      .join(q1, Seq("query", "term"), "left_anti")
      .groupBy(col("query"), col("term")).agg(sum(col("tf")).as("w"))
    val wSel = Window.partitionBy(col("query")).orderBy(col("w").desc, col("term"))
    // exp feeds BOTH the pass-2 workload and the expanded_terms audit
    // column — checkpointing this (queries·expand)-bounded frame runs
    // pass 1 ONCE instead of twice (it re-executed under each consumer)
    val exp = cand.withColumn("rn", row_number().over(wSel))
      .filter(col("rn") <= expand).select(col("query"), col("term"))
      .localCheckpoint()
    val q2 = q1.select(col("query"), col("term")).unionByName(exp)
    val expStr = exp.groupBy(col("query"))
      .agg(concat_ws(",", sort_array(collect_list(col("term")))).as("expanded_terms"))
    TextAnalysis.bm25Rank(tf, dl, q2, k)
      .join(broadcast(expStr), Seq("query"), "left")
      .select(col("query"), col("doc_id"), col("bm25"), col("rank"),
        coalesce(col("expanded_terms"), lit("")).as("expanded_terms"))
      .orderBy(col("query"), col("rank"))
  }

  def queryExpansionSql(fdbk: Int, expand: Int, k: Int): String =
    s"""WITH ${TextAnalysis.bm25CorpusCtesSql},
       |q(query, term) AS (VALUES ${TextAnalysis.bm25QueryValuesSql}),
       |${TextAnalysis.bm25PassCtesSql("q", "1")},
       |fb AS (SELECT query, doc_id FROM ranked1 WHERE rank <= $fdbk),
       |cand AS (
       |  SELECT b.query, f.term, CAST(sum(f.tf) AS BIGINT) AS w
       |  FROM fb b JOIN tf f ON b.doc_id = f.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM q WHERE q.query = b.query AND q.term = f.term)
       |  GROUP BY b.query, f.term),
       |exp AS (
       |  SELECT query, term FROM (
       |    SELECT query, term,
       |           row_number() OVER (PARTITION BY query ORDER BY w DESC, term) AS rn
       |    FROM cand)
       |  WHERE rn <= $expand),
       |q2 AS (SELECT query, term FROM q UNION ALL SELECT query, term FROM exp),
       |${TextAnalysis.bm25PassCtesSql("q2", "2")},
       |expstr AS (
       |  SELECT query, string_agg(term, ',' ORDER BY term) AS expanded_terms
       |  FROM exp GROUP BY query)
       |SELECT r.query, r.doc_id, r.bm25, r.rank,
       |       coalesce(e.expanded_terms, '') AS expanded_terms
       |FROM ranked2 r LEFT JOIN expstr e ON r.query = e.query
       |WHERE r.rank <= $k ORDER BY r.query, r.rank""".stripMargin
}
