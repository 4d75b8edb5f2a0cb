package graft.ops

import graft.functions.{PortableHash, Tokenize}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * column expressions (whole-stage codegen, no UDFs), each with a DuckDB
  * oracle rendering sharing the same constants.
  */
object TextAnalysis {

  /** Marker stopword lists per language — the classic n-gram/stopword-hit
    * heuristic. Deterministic argmax with lexicographic tie-break ('und'
    * when nothing matches).
    */
  val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "dans")
  )

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  private def hitCountSql(words: Seq[String]): String =
    s"len(list_filter(tok, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Predicted language per doc: argmax marker hits; ties → first lang in
    * lexicographic order (markers is sorted); zero hits → 'und'.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = Tokenize.tokens(col("text"))
    val withHits = docs.select(
      (col("doc_id") +: markers.map { case (l, ws) => hitCount(toks, ws).as(s"hits_$l") }): _*)
    // argmax via greatest + chained when (first match wins = lexicographic tie-break)
    val best = greatest(markers.map(m => col(s"hits_${m._1}")): _*)
    val pred = markers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(best > 0 && col(s"hits_$l") === best, l).otherwise(acc)
    }
    // foldRight chains when(de)...when(fr): first TRUE branch in markers order wins
    withHits.select(col("doc_id"), pred.as("pred_lang"), best.cast("int").as("n_hits"))
      .orderBy(col("doc_id"))
  }

  val languageIdSql: String = {
    val hits = markers.map { case (l, ws) => s"${hitCountSql(ws)} AS hits_$l" }.mkString(", ")
    val best = s"greatest(${markers.map(m => s"hits_${m._1}").mkString(", ")})"
    val pred = markers.foldRight("'und'") { case ((l, _), acc) =>
      s"CASE WHEN best > 0 AND hits_$l = best THEN '$l' ELSE $acc END"
    }
    s"""WITH t AS (SELECT doc_id, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |h AS (SELECT doc_id, $hits FROM t),
       |b AS (SELECT *, $best AS best FROM h)
       |SELECT doc_id, $pred AS pred_lang, CAST(best AS INTEGER) AS n_hits
       |FROM b ORDER BY doc_id""".stripMargin
  }

  /** Zipf rank-frequency fit: OLS slope of ln(freq) on ln(rank) over the
    * top terms — natural language sits near slope −1, and a corpus that
    * doesn't is synthetic, templated, or mis-tokenized (here the fixture
    * reports its 31-word vocabulary's shape honestly). Ranks come from a
    * global ordered take of the tiny term-count frame (|vocab| rows, not
    * corpus rows); the fit reuses the sufficient-statistics device of
    * [[graft.ops.Analytics.priceSlope]] — regression is aggregation.
    */
  def zipfFit(docs: DataFrame, topN: Int): DataFrame = {
    val counts = docs
      .select(explode(Tokenize.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(topN)
    val xy = counts.select(
      log(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("term"))).cast("double")).as("x"),
      log(col("cnt").cast("double")).as("y"))
    xy.agg(count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n_terms"),
        round((col("n_terms").cast("double") * col("sxy") - col("sx") * col("sy")) /
          nullif(col("n_terms").cast("double") * col("sxx") - col("sx") * col("sx"),
            lit(0.0)), 6).as("zipf_slope"))
  }

  def zipfFitSql(topN: Int): String =
    s"""WITH tok AS (SELECT unnest(${Tokenize.tokensSql("text")}) AS term FROM documents),
       |counts AS (
       |  SELECT term, count(*) AS cnt FROM tok GROUP BY term
       |  ORDER BY cnt DESC, term LIMIT $topN),
       |xy AS (
       |  SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, term) AS DOUBLE)) AS x,
       |         ln(CAST(cnt AS DOUBLE)) AS y
       |  FROM counts),
       |m AS (
       |  SELECT count(*) AS n_terms, sum(x) AS sx, sum(y) AS sy,
       |         sum(x * y) AS sxy, sum(x * x) AS sxx
       |  FROM xy)
       |SELECT n_terms,
       |       round((CAST(n_terms AS DOUBLE) * sxy - sx * sy)
       |             / nullif(CAST(n_terms AS DOUBLE) * sxx - sx * sx, 0.0), 6) AS zipf_slope
       |FROM m""".stripMargin

  /** Classifier-evaluation artifact for [[languageId]]: the confusion
    * matrix of predicted vs DECLARED language (the fixture's `lang`
    * column as ground truth), plus per-cell share of the declared
    * class — precision/recall read straight off the matrix. The audit
    * every heuristic filter needs before it gates a corpus.
    *
    * Scale shape: the per-doc prediction is the same map-only
    * projection as [[languageId]]; the matrix is a ≤ |langs|² -group
    * partial-merged aggregate. Nothing new shuffles.
    */
  def languageIdConfusion(docs: DataFrame): DataFrame = {
    val toks = Tokenize.tokens(col("text"))
    val withHits = docs.select(
      (Seq(col("doc_id"), col("lang")) ++
        markers.map { case (l, ws) => hitCount(toks, ws).as(s"hits_$l") }): _*)
    val best = greatest(markers.map(m => col(s"hits_${m._1}")): _*)
    val pred = markers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(best > 0 && col(s"hits_$l") === best, l).otherwise(acc)
    }
    val cells = withHits.select(col("lang").as("true_lang"), pred.as("pred_lang"))
      .groupBy(col("true_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy(col("true_lang")).agg(sum(col("n")).as("n_true"))
    cells.join(broadcast(totals), "true_lang")
      .select(col("true_lang"), col("pred_lang"), col("n"),
        round(col("n").cast("double") / col("n_true").cast("double"), 6).as("share_of_true"))
      .orderBy("true_lang", "pred_lang")
  }

  val languageIdConfusionSql: String = {
    val hits = markers.map { case (l, ws) => s"${hitCountSql(ws)} AS hits_$l" }.mkString(", ")
    val best = s"greatest(${markers.map(m => s"hits_${m._1}").mkString(", ")})"
    val pred = markers.foldRight("'und'") { case ((l, _), acc) =>
      s"CASE WHEN best > 0 AND hits_$l = best THEN '$l' ELSE $acc END"
    }
    s"""WITH t AS (SELECT doc_id, lang, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |h AS (SELECT doc_id, lang, $hits FROM t),
       |b AS (SELECT *, $best AS best FROM h),
       |cells AS (
       |  SELECT lang AS true_lang, $pred AS pred_lang, count(*) AS n
       |  FROM b GROUP BY 1, 2),
       |totals AS (SELECT true_lang, CAST(sum(n) AS BIGINT) AS n_true FROM cells GROUP BY 1)
       |SELECT c.true_lang, c.pred_lang, c.n,
       |       round(CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE), 6) AS share_of_true
       |FROM cells c JOIN totals t ON c.true_lang = t.true_lang
       |ORDER BY c.true_lang, c.pred_lang""".stripMargin
  }

  /** Quality score: length/punctuation/stopword heuristics.
    *   n_tokens, mean token length, stopword ratio (en markers),
    *   alnum ratio; score = clamped weighted sum, rounded to 4 dp.
    */
  def qualityScore(docs: DataFrame): DataFrame = qualityScoreWith(docs, Nil)

  /** [[qualityScore]] with passthrough columns carried in the SAME
    * lineage — composing downstream consumers (e.g. per-source sampling)
    * must not re-join a second projection of the corpus on doc_id.
    */
  def qualityScoreWith(docs: DataFrame, keep: Seq[String]): DataFrame = {
    val toks = Tokenize.tokens(col("text"))
    val allStop = markers.flatMap(_._2).distinct.sorted
    docs.select(col("doc_id") +: keep.map(col) :+ toks.as("tok") :+ col("text"): _*)
      .select(col("doc_id") +: keep.map(col) ++: Seq(
        size(col("tok")).cast("long").as("n_tokens"),
        round(length(concat_ws("", col("tok"))).cast("double") / greatest(size(col("tok")), lit(1)), 4).as("mean_tok_len"),
        round(size(filter(col("tok"), t => t.isin(allStop.map(lit(_)): _*))).cast("double") /
          greatest(size(col("tok")), lit(1)), 4).as("stopword_ratio"),
        round((length(col("text")) - length(regexp_replace(col("text"), "[a-z0-9 ]", ""))).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("alnum_ratio")): _*)
      .withColumn("quality",
        round(least(lit(1.0),
          lit(0.3) * least(col("n_tokens") / 64.0, lit(1.0))
            + lit(0.3) * col("stopword_ratio") * 4.0
            + lit(0.4) * col("alnum_ratio")), 4))
      .orderBy(col("doc_id"))
  }

  val qualityScoreSql: String = qualityScoreSqlWith(Nil)

  /** SQL mirror of [[qualityScoreWith]]: same CTE chain with passthrough
    * columns threaded through every stage.
    */
  def qualityScoreSqlWith(keep: Seq[String]): String = {
    val allStop = markers.flatMap(_._2).distinct.sorted.map(w => s"'$w'").mkString(", ")
    val k = keep.map(c => s"$c, ").mkString
    s"""WITH t AS (SELECT doc_id, ${k}text, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |m AS (
       |  SELECT doc_id, $k
       |    CAST(len(tok) AS BIGINT) AS n_tokens,
       |    round(CAST(length(coalesce(list_aggregate(tok, 'string_agg', ''), '')) AS DOUBLE) / greatest(len(tok), 1), 4) AS mean_tok_len,
       |    round(CAST(len(list_filter(tok, t -> t IN ($allStop))) AS DOUBLE) / greatest(len(tok), 1), 4) AS stopword_ratio,
       |    round(CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 4) AS alnum_ratio
       |  FROM t)
       |SELECT doc_id, ${k}n_tokens, mean_tok_len, stopword_ratio, alnum_ratio,
       |  round(least(1.0,
       |    0.3 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
       |    + 0.3 * stopword_ratio * 4.0
       |    + 0.4 * alnum_ratio), 4) AS quality
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens and a BPE-ish regex segmentation
    * (`\w+` words + single non-space symbols) — the standard pre-tokenizer
    * shape; counts only, portable across engines.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(Tokenize.tokens(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
        .cast("long").as("bpe_tokens"),
      length(col("text")).cast("long").as("n_chars"))
      .withColumn("chars_per_token",
        round(col("n_chars").cast("double") / greatest(col("bpe_tokens"), lit(1L)), 4))
      .orderBy(col("doc_id"))

  val tokenCountsSql: String =
    s"""SELECT doc_id,
       |  CAST(len(${Tokenize.tokensSql("text")}) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  round(CAST(length(text) AS DOUBLE) / greatest(CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT), 1), 4) AS chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Source-relative quality normalization — the gate-design audit a
    * multi-source corpus needs before thresholding: a single global
    * quality cut passes wildly different FRACTIONS of each source (one
    * boilerplate-heavy crawl loses everything, a clean one sails
    * through), so production filters threshold on the within-source
    * percentile instead. Per doc: the within-source percentile rank of
    * its quality score and whether the global gate and the
    * source-median gate DISAGREE (`flipped` — the rows where gate
    * design changes the corpus).
    *
    * Parity: ranks come from a deterministic total order (quality,
    * doc_id) — no double arithmetic, only comparisons on the
    * gate-proven [[qualityScoreWith]] doubles; the percentile is
    * integral ((rk−1)·1e6 DIV max(n−1, 1)).
    *
    * Scale shape: ONE corpus lineage (qualityScoreWith carries `source`
    * through the scoring projection — no re-join on doc_id), one
    * shuffle on source for the rank window (per-source sort, the
    * sessionize shape). No global window, no second scan.
    */
  def sourceNormalizedQuality(docs: DataFrame, gate: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bySrc = Window.partitionBy(col("source"))
    val q = qualityScoreWith(docs, Seq("source"))
      .select(col("doc_id"), col("source"), col("quality"))
      .withColumn("rk", row_number().over(bySrc.orderBy(col("quality"), col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(bySrc))
    q.select(col("doc_id"), col("source"), col("quality"),
        expr("CAST(((rk - 1) * 1000000) DIV greatest(n_src - 1, 1) AS BIGINT)")
          .as("pct_source_ppm"),
        (col("quality") >= gate).as("pass_global"))
      .withColumn("pass_source", col("pct_source_ppm") >= 500000L)
      .withColumn("flipped", col("pass_global") =!= col("pass_source"))
      .orderBy(col("doc_id"))
  }

  def sourceNormalizedQualitySql(gate: Double): String =
    s"""WITH q AS (${qualityScoreSqlWith(Seq("source")).replace("ORDER BY doc_id", "")}),
       |r AS (
       |  SELECT doc_id, source, quality,
       |         row_number() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rk,
       |         count(*) OVER (PARTITION BY source) AS n_src
       |  FROM q)
       |SELECT doc_id, source, quality,
       |       CAST(((rk - 1) * 1000000) // greatest(n_src - 1, 1) AS BIGINT) AS pct_source_ppm,
       |       quality >= $gate AS pass_global,
       |       CAST(((rk - 1) * 1000000) // greatest(n_src - 1, 1) AS BIGINT) >= 500000 AS pass_source,
       |       (quality >= $gate) <> (CAST(((rk - 1) * 1000000) // greatest(n_src - 1, 1) AS BIGINT) >= 500000) AS flipped
       |FROM r ORDER BY doc_id""".stripMargin

  /** Pairwise total-variation distance between per-source unigram
    * distributions — the domain-shift screen a mixture designer reads
    * before setting sampling weights (TVD 0 = same distribution, 1e6 ppm
    * = disjoint support). TVD instead of KL/JS on purpose: ½·Σ|p−q|
    * cross-multiplies into EXACT integer arithmetic
    * (Σ|n_a·N_b − n_b·N_a| over the union vocab, then one truncating
    * DIV by 2·N_a·N_b — no data-dependent logarithm, no float sums).
    * BIGINT budget: the summed numerator is ≤ 2·N_a·N_b, so the 1e6 ppm
    * scaling holds while N_a·N_b ≤ ~9e12 (≈3M tokens per side); beyond
    * that, divide the per-source counts by a common power of ten first
    * (same truncation on both engines).
    *
    * Scale shape: ONE tokenize + (source, term) groupBy is the data
    * pass; everything after runs on |vocab|·|sources|²-bounded frames
    * (source totals self-joined into pairs, terms cross-joined in, two
    * hash joins back to the counts).
    */
  def sourceTvd(docs: DataFrame): DataFrame = {
    val c = Caches.tracked(docs
      .select(col("source"), explode(Tokenize.tokens(col("text"))).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("n"))
      .persist())
    val tot = c.groupBy(col("source")).agg(sum(col("n")).as("total"))
    val pairs = tot.as("a").join(tot.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"),
        col("a.total").as("ta"), col("b.total").as("tb"))
    val terms = c.select(col("term")).distinct()
    pairs.join(broadcast(terms))
      .join(c.select(col("source").as("sa"), col("term"), col("n").as("na")),
        Seq("sa", "term"), "left")
      .join(c.select(col("source").as("sb"), col("term"), col("n").as("nb")),
        Seq("sb", "term"), "left")
      .na.fill(0L, Seq("na", "nb"))
      .groupBy(col("sa").as("source_a"), col("sb").as("source_b"),
        col("ta").as("n_tokens_a"), col("tb").as("n_tokens_b"))
      .agg(sum(when(col("na") > 0L || col("nb") > 0L, 1L).otherwise(0L)).as("vocab_union"),
        sum(abs(col("na") * col("tb") - col("nb") * col("ta"))).as("s"))
      .select(col("source_a"), col("source_b"), col("n_tokens_a"), col("n_tokens_b"),
        col("vocab_union"),
        expr("CAST((1000000 * s) DIV (2 * n_tokens_a * n_tokens_b) AS BIGINT)")
          .as("tvd_ppm"))
      .orderBy(col("source_a"), col("source_b"))
  }

  val sourceTvdSql: String =
    s"""WITH tok AS (
       |  SELECT source, unnest(${Tokenize.tokensSql("text")}) AS term FROM documents),
       |c AS (SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2),
       |tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1),
       |p AS (
       |  SELECT a.source AS sa, b.source AS sb, a.total AS ta, b.total AS tb
       |  FROM tot a JOIN tot b ON a.source < b.source),
       |t AS (SELECT DISTINCT term FROM c),
       |j AS (
       |  SELECT p.sa, p.sb, p.ta, p.tb,
       |         coalesce(ca.n, 0) AS na, coalesce(cb.n, 0) AS nb
       |  FROM p CROSS JOIN t
       |  LEFT JOIN c ca ON ca.source = p.sa AND ca.term = t.term
       |  LEFT JOIN c cb ON cb.source = p.sb AND cb.term = t.term)
       |SELECT sa AS source_a, sb AS source_b, ta AS n_tokens_a, tb AS n_tokens_b,
       |       CAST(sum(CASE WHEN na > 0 OR nb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_union,
       |       CAST((1000000 * CAST(sum(abs(na * tb - nb * ta)) AS BIGINT))
       |            // (2 * ta * tb) AS BIGINT) AS tvd_ppm
       |FROM j GROUP BY sa, sb, ta, tb ORDER BY source_a, source_b""".stripMargin

  /** Tokenizer fertility by language — the tokenizer-efficiency audit a
    * multilingual pretraining mix is budgeted with: `fertility_ppm` =
    * BPE-ish tokens per whitespace word (×10⁶) and `chars_per_token_ppm`
    * per language. A language whose fertility is 2× the corpus mean pays
    * 2× the context window for the same text — the number that drives
    * per-language sampling weights and tokenizer retraining decisions.
    * One pruned scan, one partial-agged groupBy on the (tiny) language
    * key; ratios are truncating-DIV integers on aggregate sums (never
    * per-doc floats averaged).
    */
  def tokenizerFertility(docs: DataFrame): DataFrame =
    docs.select(col("lang"),
        size(Tokenize.tokens(col("text"))).cast("long").as("ws"),
        size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0)))
          .cast("long").as("bpe"),
        length(col("text")).cast("long").as("nc"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ws")).as("ws_tokens"),
        sum(col("bpe")).as("bpe_tokens"), sum(col("nc")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("bpe_tokens"), col("n_chars"),
        expr("CAST((1000000 * bpe_tokens) DIV greatest(ws_tokens, 1) AS BIGINT)")
          .as("fertility_ppm"),
        expr("CAST((1000000 * n_chars) DIV greatest(bpe_tokens, 1) AS BIGINT)")
          .as("chars_per_token_ppm"))
      .orderBy(col("lang"))

  val tokenizerFertilitySql: String =
    s"""WITH d AS (
       |  SELECT lang,
       |         CAST(len(${Tokenize.tokensSql("text")}) AS BIGINT) AS ws,
       |         CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS bpe,
       |         CAST(length(text) AS BIGINT) AS nc
       |  FROM documents)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       |       CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
       |       CAST(sum(nc) AS BIGINT) AS n_chars,
       |       CAST((1000000 * CAST(sum(bpe) AS BIGINT)) // greatest(CAST(sum(ws) AS BIGINT), 1) AS BIGINT) AS fertility_ppm,
       |       CAST((1000000 * CAST(sum(nc) AS BIGINT)) // greatest(CAST(sum(bpe) AS BIGINT), 1) AS BIGINT) AS chars_per_token_ppm
       |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** TF-IDF top term per document: tf = term count in doc, idf =
    * ln(N / df). ONE tokenize+explode pass: df is derived from the tf
    * frame (tf already holds one row per distinct (doc, term), so
    * `tf.groupBy(term).count` IS the document frequency) — the corpus is
    * scanned once, and tf is persisted for its two consumers. Top-1 per
    * doc is a `min(struct(-tfidf, term))` partial aggregate — map-side
    * combined, one shuffle, no per-doc sort — matching the window's
    * (tfidf DESC, term ASC) tie-break. Score rounded to 6 dp before
    * ranking so libm/JVM ln ulp differences can't flip ranks between
    * engines.
    */
  def tfidfTopTerms(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(Tokenize.tokens(col("text"))).as("term"))
    val tf = Caches.tracked(
      tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf")).persist())
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
    scored
      .groupBy(col("doc_id"))
      .agg(min(struct((-col("tfidf")).as("neg"), col("term").as("term"),
        col("tfidf").as("tfidf"))).as("top"))
      .select(col("doc_id"), col("top.term").as("top_term"), col("top.tfidf").as("tfidf"))
      .orderBy(col("doc_id"))
  }

  val tfidfTopTermsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${Tokenize.tokensSql("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.term,
       |         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
       |  FROM tf JOIN df USING (term), n),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
       |  FROM scored)
       |SELECT doc_id, term AS top_term, tfidf FROM ranked WHERE rn = 1
       |ORDER BY doc_id""".stripMargin

  /** Keyphrase extraction: top-`k` BIGRAMS per document by tf·idf — the
    * phrase-level sibling of [[tfidfTopTerms]] (unigram tf-idf surfaces
    * corpus-rare words; bigrams surface distinctive phrasing, the usual
    * keyphrase baseline). Same single-pass shape: tf per (doc, bigram)
    * from one tokenize+explode, df derived FROM the tf frame, score
    * rounded to 6 dp before ranking (ln ulp guard), rank window per doc
    * over the doc's own bigrams only.
    */
  def keyphrases(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"),
      explode(graft.functions.Tokenize.bigrams(
        graft.functions.Tokenize.tokens(col("text")))).as("phrase"))
    val tf = Caches.tracked(
      tok.groupBy(col("doc_id"), col("phrase")).agg(count(lit(1)).as("tf")).persist())
    val df_ = tf.groupBy(col("phrase")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("phrase"))
    tf.join(broadcast(df_), "phrase")
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("phrase"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("phrase"), col("score"))
      .orderBy("doc_id", "rank")
  }

  def keyphrasesSql(k: Int): String =
    s"""WITH tk AS (
       |  SELECT doc_id, ${Tokenize.tokensSql("text")} AS toks FROM documents),
       |tok AS (
       |  SELECT doc_id, unnest(${Tokenize.bigramsSql("toks")}) AS phrase FROM tk),
       |tf AS (SELECT doc_id, phrase, count(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT phrase, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.phrase,
       |         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS score
       |  FROM tf JOIN df USING (phrase), n),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER
       |    (PARTITION BY doc_id ORDER BY score DESC, phrase) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT doc_id, rank, phrase, score FROM ranked WHERE rank <= $k
       |ORDER BY doc_id, rank""".stripMargin

  /** Tokenizer application: encode each document's first `maxLen` tokens
    * against a corpus-derived vocabulary (top `vocabSize` terms by count,
    * lexicographic tie-break), OOV = −1 — the relational view of the
    * ids-array a training pipeline feeds the model, kept exploded so it
    * stays oracle-checkable and late-projectable.
    *
    * Scale shape: the top-vocabSize selection is a partial top-K
    * (TakeOrderedAndProject — never a full-vocab single-task sort), the
    * ordinal window runs over the vocabSize survivors only, and the
    * vocabulary broadcasts into the encode join; the corpus side is a
    * bounded posexplode projection (≤ maxLen rows per doc), never
    * shuffled.
    */
  def tokenIds(docs: DataFrame, vocabSize: Int, maxLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col("doc_id"), posexplode(Tokenize.tokens(col("text"))))
      .withColumnRenamed("col", "term")
      .filter(col("pos") < maxLen)
    val counts = docs.select(explode(Tokenize.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    // top-vocabSize FIRST (TakeOrderedAndProject — per-partition partial
    // top-K, no full-vocab single-task sort), THEN the ordinal over the
    // K survivors: the remaining window is parameter-bounded, the
    // knnOutliers convention
    val w = Window.orderBy(col("n").desc, col("term"))
    val vocab = counts
      .orderBy(col("n").desc, col("term")).limit(vocabSize)
      .withColumn("token_id", (row_number().over(w) - 1).cast("long"))
      .select(col("term"), col("token_id"))
    tok.join(broadcast(vocab), Seq("term"), "left")
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))
      .orderBy("doc_id", "pos")
  }

  def tokenIdsSql(vocabSize: Int, maxLen: Int): String =
    s"""WITH tokd AS (
       |  SELECT doc_id, ${Tokenize.tokensSql("text")} AS t FROM documents),
       |counts AS (
       |  SELECT term, count(*) AS n
       |  FROM (SELECT unnest(t) AS term FROM tokd) GROUP BY 1),
       |vocab AS (
       |  SELECT term, token_id FROM (
       |    SELECT term,
       |           CAST(row_number() OVER (ORDER BY n DESC, term) - 1 AS BIGINT) AS token_id
       |    FROM counts)
       |  WHERE token_id < $vocabSize),
       |pe AS (
       |  SELECT doc_id,
       |         unnest([i - 1 FOR i IN range(1, least(len(t), $maxLen) + 1)]) AS pos,
       |         unnest([t[i] FOR i IN range(1, least(len(t), $maxLen) + 1)]) AS term
       |  FROM tokd)
       |SELECT p.doc_id, CAST(p.pos AS BIGINT) AS pos, p.term,
       |       CAST(coalesce(v.token_id, -1) AS BIGINT) AS token_id
       |FROM pe p LEFT JOIN vocab v ON p.term = v.term
       |ORDER BY p.doc_id, p.pos""".stripMargin

  // ------------------------------------------------------------------ bm25

  /** Fixed retrieval workload for [[bm25TopK]]: query id = the phrase
    * itself, terms drawn from the fixture vocabulary. Shared verbatim by
    * the Spark plan and the oracle VALUES list.
    */
  val bm25Queries: Seq[(String, Seq[String])] = Seq(
    "spark query join"  -> Seq("spark", "query", "join"),
    "stream window agg" -> Seq("stream", "window", "agg"),
    "hash merge sort"   -> Seq("hash", "merge", "sort"),
    "fast scan filter"  -> Seq("fast", "scan", "filter"))

  private val bm25K1 = 1.2
  private val bm25B = 0.75

  /** BM25 ranked retrieval: top-k documents per query under
    * Okapi BM25 (k1 = 1.2, b = 0.75, idf = ln((N-df+0.5)/(df+0.5)+1)).
    *
    * Scale shape: the query term list is a broadcast local relation, so
    * the corpus-sized tf frame streams through a broadcast-hash join and
    * only rows matching a query term survive into scoring; df for query
    * terms and the (N, Σdl) corpus stats are one-row/tiny broadcast
    * aggregates. The per-(query, doc) sum runs over ≤|query| rounded
    * DECIMAL terms (order-independent), then ranks with a per-query
    * window — partial top-k via WindowGroupLimit, never a global sort.
    * Double math is written in the identical shape on both engines;
    * per-term scores are rounded before the sum, the sum before the rank.
    */
  def bm25TopK(docs: DataFrame, k: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qterms = broadcast(
      bm25Queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }.toDF("query", "term"))
    val (tf, dl) = bm25Corpus(docs)
    bm25Rank(tf, dl, qterms, k)
  }

  /** The per-corpus BM25 frames shared by every scoring pass: (doc,
    * term) tf and per-doc length. tf feeds BOTH the df aggregate and the
    * scoring join; dl feeds BOTH the corpus stats and the per-doc norm —
    * each persists once (tracked, caller evicts) instead of
    * re-tokenizing the corpus per subtree.
    */
  private[ops] def bm25Corpus(docs: DataFrame,
                              checkpoint: Boolean = false): (DataFrame, DataFrame) = {
    val tok = docs.select(col("doc_id"), explode(Tokenize.tokens(col("text"))).as("term"))
    val tfRaw = tok.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dlRaw = docs.select(col("doc_id"),
      size(Tokenize.tokens(col("text"))).cast("long").as("dl"))
    if (checkpoint)
      // eager localCheckpoint instead of persist for MULTI-pass callers
      // (RM3's two scoring passes + feedback/candidate joins): a persist
      // caches the rows but every downstream action still re-ANALYZES
      // the tokenize lineage — at fixture scale those driver-side
      // planning gaps, not the jobs, dominated rag_query_expansion
      // (47 jobs / 3.2s). Fixed-round and |corpus|-bounded → eligible
      // under the repo's localCheckpoint rule (CLAUDE.md round 9).
      (tfRaw.localCheckpoint(), dlRaw.localCheckpoint())
    else
      (Caches.tracked(tfRaw.persist()), Caches.tracked(dlRaw.persist()))
  }

  /** One BM25 scoring pass over prepared [[bm25Corpus]] frames for an
    * arbitrary (query, term) workload — the core [[bm25TopK]] and the
    * pseudo-relevance-feedback second pass ([[Retrieval.queryExpansion]])
    * share. Same rounding ladder on both engines: per-term score at
    * 9 dp, DECIMAL sum, 6 dp before the rank.
    */
  private[ops] def bm25Rank(tf: DataFrame, dl: DataFrame,
                            qterms: DataFrame, k: Int): DataFrame = {
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfq = tf.join(qterms.select(col("term")).distinct(), "term")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val per = tf.join(qterms, "term")
      .join(dl, "doc_id")
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .select(col("query"), col("doc_id"),
        round(
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * lit(bm25K1 + 1)) /
            (col("tf") + lit(bm25K1) *
              (lit(1 - bm25B) + lit(bm25B) * col("dl") * col("n_docs") / col("sum_dl"))),
          9).as("s"))
    val agg = per.groupBy(col("query"), col("doc_id"))
      .agg(sum(col("s").cast("decimal(28,9)")).as("sd"))
      .select(col("query"), col("doc_id"), round(col("sd").cast("double"), 6).as("bm25"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query")).orderBy(col("bm25").desc, col("doc_id"))
    agg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("query"), col("rank"))
  }

  /** CTE bodies for one BM25 scoring pass against query CTE `$q` —
    * emits `dfq$tag`, `per$tag`, `agg$tag`, `ranked$tag` over the shared
    * `tf`/`dl`/`stats` CTEs ([[bm25CorpusCtesSql]]). Pre-stripped.
    */
  private[ops] def bm25PassCtesSql(q: String, tag: String): String =
    s"""dfq$tag AS (SELECT tf.term, count(*) AS df
       |        FROM tf JOIN (SELECT DISTINCT term FROM $q) qt ON tf.term = qt.term
       |        GROUP BY 1),
       |per$tag AS (
       |  SELECT $q.query, f.doc_id,
       |         round(
       |           ln((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0) + 1.0e0) *
       |             (f.tf * ${bm25K1 + 1}e0) /
       |             (f.tf + ${bm25K1}e0 *
       |               (${1 - bm25B}e0 + ${bm25B}e0 * l.dl * s.n_docs / s.sum_dl)),
       |           9) AS s
       |  FROM tf f JOIN $q ON f.term = $q.term
       |            JOIN dl l ON f.doc_id = l.doc_id
       |            JOIN dfq$tag d ON f.term = d.term, stats s),
       |agg$tag AS (
       |  SELECT query, doc_id,
       |         round(CAST(sum(CAST(s AS DECIMAL(28,9))) AS DOUBLE), 6) AS bm25
       |  FROM per$tag GROUP BY 1, 2),
       |ranked$tag AS (
       |  SELECT query, doc_id, bm25, CAST(row_number() OVER
       |    (PARTITION BY query ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rank
       |  FROM agg$tag)""".stripMargin

  /** Shared corpus CTEs (`tok`, `tf`, `dl`, `stats`) over `documents`.
    * Pre-stripped. */
  private[ops] val bm25CorpusCtesSql: String =
    s"""tok AS (
       |  SELECT doc_id, unnest(${Tokenize.tokensSql("text")}) AS term FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dl AS (SELECT doc_id, CAST(len(${Tokenize.tokensSql("text")}) AS BIGINT) AS dl
       |       FROM documents),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl)""".stripMargin

  /** The VALUES list for the fixed [[bm25Queries]] workload. */
  private[ops] val bm25QueryValuesSql: String = bm25Queries
    .flatMap { case (q, ts) => ts.map(t => s"('$q', '$t')") }.mkString(", ")

  def bm25TopKSql(k: Int): String =
    s"""WITH $bm25CorpusCtesSql,
       |q(query, term) AS (VALUES $bm25QueryValuesSql),
       |${bm25PassCtesSql("q", "")}
       |SELECT query, doc_id, bm25, rank FROM ranked WHERE rank <= $k
       |ORDER BY query, rank""".stripMargin

  /** Deterministic hash sampling: the reproducible (cross-engine,
    * cross-run) alternative to `sample()` for pipeline debugging at
    * scale — keep a doc iff md5-hash(doc_id) mod k == 0.
    */
  def hashSample(docs: DataFrame, k: Int): DataFrame =
    docs.filter(PortableHash.tokenHash(col("doc_id").cast("string")) % k === 0)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  def hashSampleSql(k: Int): String =
    s"""SELECT doc_id, source, n_chars FROM documents
       |WHERE ${PortableHash.tokenHashSql("CAST(doc_id AS VARCHAR)")} % $k = 0
       |ORDER BY doc_id""".stripMargin

  /** All per-doc curation signals — quality, predicted language, content
    * fingerprint — in ONE projection lineage over a single scan: the
    * signals share the token array, so joining their standalone
    * formulations would re-scan and re-tokenize the corpus per signal
    * (and a self-join on doc_id cannot broadcast at corpus scale).
    * Column semantics are identical to [[qualityScore]], [[languageId]],
    * [[fingerprint]] (same constants, same rounding).
    */
  def signals(docs: DataFrame): DataFrame = {
    val allStop = markers.flatMap(_._2).distinct.sorted
    val withTok = docs.select(col("doc_id"), col("text"), Tokenize.tokens(col("text")).as("tok"))
    val withParts = withTok.select(
      col("doc_id"), col("tok"),
      size(col("tok")).cast("long").as("n_tokens"),
      round(size(filter(col("tok"), t => t.isin(allStop.map(lit(_)): _*))).cast("double") /
        greatest(size(col("tok")), lit(1)), 4).as("stopword_ratio"),
      round((length(col("text")) - length(regexp_replace(col("text"), "[a-z0-9 ]", ""))).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("alnum_ratio"))
    val withHits = withParts.select(
      Seq(col("doc_id"), col("tok"), col("n_tokens"), col("stopword_ratio"), col("alnum_ratio")) ++
        markers.map { case (l, ws) => hitCount(col("tok"), ws).as(s"hits_$l") }: _*)
    val best = greatest(markers.map(m => col(s"hits_${m._1}")): _*)
    val pred = markers.foldRight(lit("und"): Column) { case ((l, _), acc) =>
      when(best > 0 && col(s"hits_$l") === best, l).otherwise(acc)
    }
    withHits.select(
      col("doc_id"),
      round(least(lit(1.0),
        lit(0.3) * least(col("n_tokens") / 64.0, lit(1.0))
          + lit(0.3) * col("stopword_ratio") * 4.0
          + lit(0.4) * col("alnum_ratio")), 4).as("quality"),
      pred.as("pred_lang"),
      md5(concat_ws(" ", col("tok"))).as("fp"))
  }

  /** Single-scan CTE chain mirroring [[signals]]; emits CTE `sig`
    * (doc_id, quality, pred_lang, fp) over a `documents` table.
    */
  val signalsSql: String = {
    val allStop = markers.flatMap(_._2).distinct.sorted.map(w => s"'$w'").mkString(", ")
    val hits = markers.map { case (l, ws) => s"${hitCountSql(ws)} AS hits_$l" }.mkString(", ")
    val best = s"greatest(${markers.map(m => s"hits_${m._1}").mkString(", ")})"
    val pred = markers.foldRight("'und'") { case ((l, _), acc) =>
      s"CASE WHEN $best > 0 AND hits_$l = $best THEN '$l' ELSE $acc END"
    }
    s"""t AS (SELECT doc_id, text, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |parts AS (
       |  SELECT doc_id, tok,
       |    CAST(len(tok) AS BIGINT) AS n_tokens,
       |    round(CAST(len(list_filter(tok, t -> t IN ($allStop))) AS DOUBLE) / greatest(len(tok), 1), 4) AS stopword_ratio,
       |    round(CAST(length(text) - length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 4) AS alnum_ratio,
       |    $hits
       |  FROM t),
       |sig AS (
       |  SELECT doc_id,
       |    round(least(1.0,
       |      0.3 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
       |      + 0.3 * stopword_ratio * 4.0
       |      + 0.4 * alnum_ratio), 4) AS quality,
       |    $pred AS pred_lang,
       |    md5(coalesce(list_aggregate(tok, 'string_agg', ' '), '')) AS fp
       |  FROM parts)""".stripMargin
  }

  /** Intra-document repetition (the Gopher/C4-family quality gate for
    * boilerplate and degenerate generation): fraction of 3-token shingles
    * that are repeats of an earlier shingle in the SAME document, plus
    * the multiplicity of the most-repeated shingle. Pure projection over
    * the raw (duplicate-preserving) shingle list — no shuffle; documents
    * with < 3 tokens report zero shingles and ratio 0.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val sh = Tokenize.shingles3(Tokenize.tokens(col("text")))
    docs.select(col("doc_id"), sh.as("sh"))
      .select(col("doc_id"),
        size(col("sh")).cast("long").as("n_shingles"),
        size(array_distinct(col("sh"))).cast("long").as("n_distinct"),
        // max multiplicity = occurrences of the most-repeated shingle
        coalesce(array_max(transform(array_distinct(col("sh")),
          s => size(filter(col("sh"), x => x === s)))), lit(0)).cast("long").as("max_repeat"))
      .withColumn("rep_ratio",
        when(col("n_shingles") === 0, lit(0.0d))
          .otherwise(round(lit(1.0d) - col("n_distinct").cast("double") / col("n_shingles"), 6)))
      .orderBy(col("doc_id"))
  }

  val repetitionSql: String =
    s"""WITH t AS (SELECT doc_id, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |s AS (SELECT doc_id, ${Tokenize.shingles3Sql("tok")} AS sh FROM t),
       |m AS (
       |  SELECT doc_id,
       |    CAST(len(sh) AS BIGINT) AS n_shingles,
       |    CAST(len(list_distinct(sh)) AS BIGINT) AS n_distinct,
       |    CAST(coalesce(list_max([len(list_filter(sh, x -> x = s)) FOR s IN list_distinct(sh)]), 0) AS BIGINT) AS max_repeat
       |  FROM s)
       |SELECT doc_id, n_shingles, n_distinct, max_repeat,
       |  CASE WHEN n_shingles = 0 THEN 0.0
       |       ELSE round(1.0 - CAST(n_distinct AS DOUBLE) / n_shingles, 6) END AS rep_ratio
       |FROM m ORDER BY doc_id""".stripMargin

  /** Repetition TRUNCATION — the transformation counterpart of
    * [[repetition]]'s metric (the degenerate-generation cutoff heuristic):
    * cut the document just before the first 3-token shingle that already
    * occurred earlier in the same document, i.e. keep tokens
    * `[0, i+2)` where `i` is the first repeated shingle's start (whole
    * doc when nothing repeats).
    *
    * Pure projection; the O(span²) prefix-containment scan is per-row
    * and bounded by document length. The repeated-shingle probe binds
    * `sh` through a projection first (lambda bodies re-evaluate UNBOUND
    * child expressions per element — the 14× shingle pitfall), and the
    * index sequence is guarded against Spark's descending `sequence(1, 0)`.
    */
  def repetitionTruncate(docs: DataFrame): DataFrame = {
    val bound = docs.select(col("doc_id"), Tokenize.tokens(col("text")).as("tok"))
      .select(col("doc_id"), col("tok"), Tokenize.shingles3(col("tok")).as("sh"))
    // 0-based starts i ≥ 1 whose shingle appeared in sh[0..i-1]
    val idxs = when(size(col("sh")) > 1, sequence(lit(1), size(col("sh")) - 1))
      .otherwise(array().cast("array<int>"))
    val reps = filter(idxs,
      i => array_contains(slice(col("sh"), lit(1), i), element_at(col("sh"), i + 1)))
    bound
      .select(col("doc_id"), col("tok"),
        when(size(reps) > 0, element_at(reps, 1)).as("first_rep"))
      .select(col("doc_id"),
        size(col("tok")).cast("long").as("n_tokens_in"),
        coalesce(col("first_rep") + 2, size(col("tok"))).cast("long").as("n_tokens_out"),
        col("first_rep").isNotNull.as("truncated"),
        md5(concat_ws(" ",
          slice(col("tok"), lit(1), coalesce(col("first_rep") + 2, size(col("tok")))))
          .cast("binary")).as("out_md5"))
      .orderBy("doc_id")
  }

  val repetitionTruncateSql: String =
    s"""WITH t AS (SELECT doc_id, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |s AS (SELECT doc_id, tok, ${Tokenize.shingles3Sql("tok")} AS sh FROM t),
       |r AS (
       |  SELECT doc_id, tok,
       |    [i FOR i IN range(1, greatest(len(sh), 1)) IF list_contains(sh[1:i], sh[i + 1])][1] AS first_rep
       |  FROM s)
       |SELECT doc_id,
       |  CAST(len(tok) AS BIGINT) AS n_tokens_in,
       |  CAST(coalesce(first_rep + 2, len(tok)) AS BIGINT) AS n_tokens_out,
       |  first_rep IS NOT NULL AS truncated,
       |  md5(coalesce(list_aggregate(tok[1:coalesce(first_rep + 2, len(tok))], 'string_agg', ' '), '')) AS out_md5
       |FROM r ORDER BY doc_id""".stripMargin

  /** Cross-document boilerplate detection (the C4/RefinedWeb span-dedup
    * family): a doc's 3-token spans that also occur in ≥ `minDocs` OTHER
    * documents are boilerplate (headers, footers, templates); report the
    * per-doc shared-span ratio. Distinct from [[repetition]] (intra-doc)
    * and pairwise near-dup (this is corpus-frequency based — no pairs).
    *
    * Shape: one shingle explode → span document-frequency (map-side
    * combined, shuffle on span) → broadcast-join the FREQUENT span set
    * back (the frequent tail is tiny by Zipf — the full df frame never
    * joins) → per-doc aggregate. The heavy exchange is the df groupBy,
    * linear in corpus spans.
    */
  def boilerplate(docs: DataFrame, minDocs: Int): DataFrame = {
    // ONE tokenize+shingle pass, persisted: both the span-df aggregate
    // and the per-doc rollup explode from this cached frame (the shingle
    // pipeline was a prior 14x hotspot — never recompute it per branch).
    // Short docs (< 3 tokens) keep their empty array here and surface
    // with ratio 0, matching repetition()'s contract.
    val spanArrays = Caches.tracked(docs.select(col("doc_id"),
      array_distinct(Tokenize.shingles3(Tokenize.tokens(col("text")))).as("sh")).persist())
    val spans = spanArrays.select(col("doc_id"), explode(col("sh")).as("span"))
    // spans is distinct per (doc_id, span) by construction — plain count
    // IS the document frequency (no distinct-aggregate rewrite)
    val frequent = spans.groupBy(col("span"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs + 1) // self + minDocs others
      .select(col("span"), lit(true).as("is_freq"))
    // no broadcast hint: tiny here, but the frequent tail of a web-scale
    // corpus is NOT driver-sized — let the planner/AQE pick broadcast vs
    // shuffle from actual stats
    val shared = spans.join(frequent, Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("is_freq"), 1L).otherwise(0L)).as("n_shared_spans"))
    spanArrays.select(col("doc_id"), size(col("sh")).cast("long").as("n_spans"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_shared_spans"), lit(0L)).as("n_shared_spans"))
      .withColumn("boilerplate_ratio",
        when(col("n_spans") === 0, lit(0.0d))
          .otherwise(round(col("n_shared_spans").cast("double") / col("n_spans"), 6)))
      .orderBy(col("doc_id"))
  }

  def boilerplateSql(minDocs: Int): String =
    s"""WITH t AS (SELECT doc_id, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |sa AS (SELECT doc_id, list_distinct(${Tokenize.shingles3Sql("tok")}) AS sh FROM t),
       |spans AS (SELECT doc_id, unnest(sh) AS span FROM sa),
       |freq AS (
       |  SELECT span FROM spans GROUP BY span
       |  HAVING count(*) >= ${minDocs + 1}),
       |shared AS (
       |  SELECT doc_id, count(*) AS n_shared_spans
       |  FROM spans WHERE span IN (SELECT span FROM freq) GROUP BY doc_id)
       |SELECT sa.doc_id, CAST(len(sa.sh) AS BIGINT) AS n_spans,
       |  coalesce(sh.n_shared_spans, 0) AS n_shared_spans,
       |  CASE WHEN len(sa.sh) = 0 THEN 0.0
       |       ELSE round(CAST(coalesce(sh.n_shared_spans, 0) AS DOUBLE) / len(sa.sh), 6) END AS boilerplate_ratio
       |FROM sa LEFT JOIN shared sh ON sa.doc_id = sh.doc_id
       |ORDER BY sa.doc_id""".stripMargin

  /** Corpus-trained unigram LM scoring — the CCNet/KenLM-style fluency
    * filter reduced to its distributable skeleton: p(w) = corpus MLE,
    * doc score = mean log p(token). The vocabulary table is tiny relative
    * to the corpus and BROADCAST back; the corpus token stream joins
    * map-side (no corpus shuffle) and reduces per doc — two passes over
    * tokens, zero corpus-sized state. Production swaps the MLE for a real
    * LM's logprob without changing the plan shape. Mean rounded to 6 dp
    * before any downstream ranking (ln ulp discipline).
    */
  def unigramLogprob(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(Tokenize.tokens(col("text"))).as("term"))
    val counts = tok.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // total token count derives from the tiny counts frame — a third
    // full-corpus tokenize pass would buy nothing
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    tok
      .join(broadcast(counts), "term")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        round(avg(log(col("cnt").cast("double") / col("n_total"))), 6).as("mean_logprob"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val unigramLogprobSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(${Tokenize.tokensSql("text")}) AS term FROM documents),
       |counts AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
       |total AS (SELECT count(*) AS n_total FROM tok)
       |SELECT doc_id,
       |  round(avg(ln(CAST(cnt AS DOUBLE) / n_total)), 6) AS mean_logprob,
       |  count(*) AS n_tokens
       |FROM tok JOIN counts USING (term), total
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Tokenizer vocab-sizing curve: the fraction of corpus token
    * OCCURRENCES covered by the top-S terms, for each candidate vocab
    * size — what decides S before training a tokenizer (the complement,
    * 1−coverage, is the OOV/byte-fallback rate a size-S vocab pays).
    *
    * Scale shape: one tokenize pass collapsing through map-side partial
    * counts into the term-vocab frame; the top-max(sizes) selection is a
    * partial top-K (TakeOrderedAndProject), so the ordinal window runs
    * over a parameter-bounded frame, never the full vocabulary.
    */
  def vocabCoverage(docs: DataFrame, sizes: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(explode(Tokenize.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // only ranks <= max(sizes) matter: top-K select first (per-partition
    // partial top-K), then a parameter-bounded ordinal window
    val ranked = counts
      .orderBy(col("cnt").desc, col("term")).limit(sizes.max)
      .withColumn("rn",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))))
    sizes.map { s =>
      ranked.filter(col("rn") <= s)
        .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("covered"))
        .select(lit(s).as("vocab_size"), col("n_terms"), col("covered"))
    }.reduce(_.unionAll(_))
      .crossJoin(broadcast(total))
      .select(col("vocab_size"), col("n_terms"), col("covered"), col("total"),
        round(col("covered").cast("double") / col("total"), 6).as("coverage"))
      .orderBy("vocab_size")
  }

  def vocabCoverageSql(sizes: Seq[Int]): String = {
    val rows = sizes.map(s =>
      s"""SELECT $s AS vocab_size, count(*) AS n_terms,
         |         CAST(sum(cnt) AS BIGINT) AS covered FROM ranked WHERE rn <= $s""".stripMargin)
      .mkString("\n  UNION ALL ")
    s"""WITH tok AS (
       |  SELECT unnest(${Tokenize.tokensSql("text")}) AS term FROM documents),
       |counts AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM counts),
       |ranked AS (
       |  SELECT term, cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rn
       |  FROM counts),
       |per AS (
       |  $rows)
       |SELECT p.vocab_size, p.n_terms, p.covered, t.total,
       |       round(CAST(p.covered AS DOUBLE) / t.total, 6) AS coverage
       |FROM per p, tot t ORDER BY p.vocab_size""".stripMargin
  }

  /** Per-doc mean bigram log-likelihood under the corpus bigram LM with
    * interpolated unigram backoff: p(w2|w1) = λ·C(w1w2)/C(w1·) +
    * (1−λ)·C(w2)/N — the next step up from [[unigramLogprob]] in LM-based
    * quality filtering (a fluent doc scores high under BOTH; gibberish
    * with plausible unigrams only fools the unigram model).
    *
    * Scale shape: two tokenize passes (bigram + unigram), each collapsing
    * through map-side partial counts; C(w1·) derives from the pair-vocab
    * frame, never a third corpus pass. The count joins are broadcast here
    * (token vocabulary is bounded); at a 100 TB corpus the bigram table
    * outgrows a broadcast and the same plan runs as a shuffle join keyed
    * by pair — still linear, no change to the lineage.
    */
  def bigramLogprob(docs: DataFrame, lambda: Double): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(Tokenize.tokens(col("text"))).as("term"))
    val uni = tok.groupBy(col("term")).agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum(col("cu")).as("n_total"))
    val bi = docs.select(col("doc_id"),
      explode(Tokenize.bigrams(Tokenize.tokens(col("text")))).as("pair"))
    val bc = bi.groupBy(col("pair")).agg(count(lit(1)).as("cb"))
    val w1c = bc.groupBy(substring_index(col("pair"), " ", 1).as("w1"))
      .agg(sum(col("cb")).as("cw1"))
    val p = lit(lambda) * (col("cb").cast("double") / col("cw1")) +
      lit(1.0 - lambda) * (col("cu").cast("double") / col("n_total"))
    bi
      .join(broadcast(bc), "pair")
      .join(broadcast(w1c), substring_index(col("pair"), " ", 1) === col("w1"))
      .join(broadcast(uni), substring_index(col("pair"), " ", -1) === col("term"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(round(avg(log(p)), 6).as("mean_logprob"),
        count(lit(1)).as("n_bigrams"))
      .orderBy(col("doc_id"))
  }

  def bigramLogprobSql(lambda: Double): String =
    s"""WITH tokd AS (SELECT doc_id, ${Tokenize.tokensSql("text")} AS t FROM documents),
       |tok AS (SELECT doc_id, unnest(t) AS term FROM tokd),
       |uni AS (SELECT term, count(*) AS cu FROM tok GROUP BY term),
       |tot AS (SELECT count(*) AS n_total FROM tok),
       |bi AS (SELECT doc_id, unnest(${Tokenize.bigramsSql("t")}) AS pair FROM tokd),
       |bc AS (SELECT pair, count(*) AS cb FROM bi GROUP BY pair),
       |w1c AS (SELECT split_part(pair, ' ', 1) AS w1, CAST(sum(cb) AS BIGINT) AS cw1
       |        FROM bc GROUP BY split_part(pair, ' ', 1))
       |SELECT b.doc_id,
       |  round(avg(ln($lambda * (CAST(cb AS DOUBLE) / cw1) +
       |                ${1.0 - lambda} * (CAST(cu AS DOUBLE) / n_total))), 6) AS mean_logprob,
       |  count(*) AS n_bigrams
       |FROM bi b
       |JOIN bc USING (pair)
       |JOIN w1c ON split_part(b.pair, ' ', 1) = w1c.w1
       |JOIN uni ON split_part(b.pair, ' ', 2) = uni.term, tot
       |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin

  /** Document fingerprints: order-sensitive content hash (md5 of the
    * normalized token stream) + a 60-bit integer prefix for compact
    * join keys — duplicate doc_ids share fingerprints.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(concat_ws(" ", Tokenize.tokens(col("text")))).as("fp"))
      .withColumn("fp64", conv(substring(col("fp"), 1, 15), 16, 10).cast("long"))
      .orderBy(col("doc_id"))

  val fingerprintSql: String =
    s"""SELECT doc_id,
       |  md5(coalesce(list_aggregate(${Tokenize.tokensSql("text")}, 'string_agg', ' '), '')) AS fp,
       |  CAST(concat('0x', substr(md5(coalesce(list_aggregate(${Tokenize.tokensSql("text")}, 'string_agg', ' '), '')), 1, 15)) AS BIGINT) AS fp64
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Tokenizer-induction first step: the corpus's top merge candidates —
    * adjacent token pairs ranked by frequency (what a BPE/WordPiece
    * trainer computes every merge round, here over word tokens).
    *
    * Scale shape: one tokenize pass, one explode, one partial-combined
    * count keyed by pair, then a global top-N that runs as
    * TakeOrderedAndProject — k-bounded per-partition heaps, never a full
    * sort of the pair vocabulary. Ties break lexicographically so the
    * cut at rank N is engine-identical.
    */
  def bpeMerges(docs: DataFrame, topN: Int): DataFrame =
    docs.select(explode(Tokenize.bigrams(Tokenize.tokens(col("text")))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("pair"))
      .limit(topN)

  def bpeMergesSql(topN: Int): String =
    s"""WITH tok AS (SELECT ${Tokenize.tokensSql("text")} AS t FROM documents),
       |pairs AS (SELECT unnest(${Tokenize.bigramsSql("t")}) AS pair FROM tok)
       |SELECT pair, count(*) AS n_occurrences
       |FROM pairs GROUP BY pair
       |ORDER BY n_occurrences DESC, pair LIMIT $topN""".stripMargin

  /** Per-document n-gram novelty: the fraction of a doc's distinct
    * 3-token shingles never seen in any EARLIER doc (doc_id order = crawl
    * order). The running novelty of a corpus is the diversity signal
    * curation dashboards track — novelty collapsing toward zero means the
    * crawl is re-fetching the same phrasing and further ingest buys no
    * new data (the same signal that motivates near-dup dedup, but as a
    * scalar per doc instead of a pair relation).
    *
    * Scale shape: one distinct-shingle explode, first-occurrence via a
    * min window keyed on the shingle hash (the shuffle every
    * inverted-index op pays), one per-doc partial-combined aggregate, and
    * a keyed left join back to the corpus spine so shingle-free docs
    * surface with novelty NULL (division guarded on both engines). No
    * global order, no iterative pass: "earlier" is resolved per shingle
    * by min(doc_id), not by walking the corpus sequentially.
    */
  def ngramNovelty(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val th = docs.select(col("doc_id"),
        explode(array_distinct(Tokenize.shingles3(Tokenize.tokens(col("text"))))).as("feat"))
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
    val perDoc = th
      .withColumn("first_doc", min(col("doc_id")).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
    docs.select(col("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          nullif(coalesce(col("n_shingles"), lit(0L)), lit(0L)), 6).as("novelty"))
      .orderBy(col("doc_id"))
  }

  val ngramNoveltySql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, ${Tokenize.tokensSql("text")} AS tok FROM documents),
       |feat AS (
       |  SELECT DISTINCT doc_id, unnest(${Tokenize.shingles3Sql("tok")}) AS feat FROM tok),
       |th AS (SELECT doc_id, ${PortableHash.tokenHashSql("feat")} AS h FROM feat),
       |firsts AS (
       |  SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS first_doc FROM th),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_shingles,
       |    CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM firsts GROUP BY doc_id)
       |SELECT d.doc_id,
       |  coalesce(p.n_shingles, 0) AS n_shingles,
       |  coalesce(p.n_novel, 0) AS n_novel,
       |  round(CAST(coalesce(p.n_novel, 0) AS DOUBLE) /
       |        nullif(coalesce(p.n_shingles, 0), 0), 6) AS novelty
       |FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Winnowing fingerprint selection (the MOSS device): over the 3-gram
    * shingle hash sequence, every window of `w` consecutive positions
    * contributes its minimum hash (rightmost position on ties), and the
    * selected (hash, position) set — deduplicated — is the document's
    * fingerprint. Guarantees: any shared run of ≥ w+2 tokens yields a
    * shared fingerprint, and selection density ≈ 2/(w+1), which is what
    * makes it the robust upgrade over every-kth-hash sampling.
    *
    * Portable formulation (no struct-valued window aggregates): the
    * per-window min and its rightmost position come from a bounded
    * ×w band self-join + two grouped aggregates, identical in both
    * engines; all values are integral.
    */
  def winnowing(docs: DataFrame, w: Int): DataFrame = {
    val kg = Caches.tracked(docs
      .select(col("doc_id"),
        posexplode(Tokenize.shingles3(Tokenize.tokens(col("text")))))
      .select(col("doc_id"), col("pos").cast("long").as("p"),
        graft.functions.PortableHash.tokenHash(col("col")).as("h"))
      .persist())
    val nk = kg.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kgrams"))
      .filter(col("n_kgrams") >= w)
    val starts = kg.select(col("doc_id"), col("p").as("ws"))
      .join(broadcast(nk), "doc_id")
      .filter(col("ws") <= col("n_kgrams") - w)
    val wnd = starts.join(kg.select(col("doc_id"), col("p").as("p2"), col("h")),
        Seq("doc_id"))
      .filter(col("p2") >= col("ws") && col("p2") < col("ws") + w)
    val mins = wnd.groupBy(col("doc_id"), col("ws"))
      .agg(min(col("h")).as("mh"))
    val sel = wnd.join(mins, Seq("doc_id", "ws"))
      .filter(col("h") === col("mh"))
      .groupBy(col("doc_id"), col("ws"), col("n_kgrams"), col("mh"))
      .agg(max(col("p2")).as("sp"))
    sel.select(col("doc_id"), col("n_kgrams"), col("mh"), col("sp")).distinct()
      .groupBy(col("doc_id"), col("n_kgrams"))
      .agg(count(lit(1)).as("n_fingerprints"))
      .select(col("doc_id"), col("n_kgrams"), col("n_fingerprints"),
        round(col("n_fingerprints").cast("double") /
          (col("n_kgrams") - w + 1).cast("double"), 6).as("density"))
      .orderBy("doc_id")
  }

  def winnowingSql(w: Int): String =
    s"""WITH tk AS (
       |  SELECT doc_id, ${Tokenize.tokensSql("text")} AS toks FROM documents),
       |shs AS (SELECT doc_id, ${Tokenize.shingles3Sql("toks")} AS sh FROM tk),
       |kg0 AS (SELECT doc_id, sh, unnest(range(1, len(sh) + 1)) AS i FROM shs),
       |kg AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p,
       |         ${graft.functions.PortableHash.tokenHashSql("sh[i]")} AS h
       |  FROM kg0),
       |nk AS (
       |  SELECT doc_id, count(*) AS n_kgrams FROM kg GROUP BY doc_id
       |  HAVING count(*) >= $w),
       |starts AS (
       |  SELECT kg.doc_id, kg.p AS ws, nk.n_kgrams
       |  FROM kg JOIN nk USING (doc_id)
       |  WHERE kg.p <= nk.n_kgrams - $w),
       |wnd AS (
       |  SELECT s.doc_id, s.ws, s.n_kgrams, k.p AS p2, k.h
       |  FROM starts s JOIN kg k
       |    ON k.doc_id = s.doc_id AND k.p >= s.ws AND k.p < s.ws + $w),
       |mins AS (
       |  SELECT doc_id, ws, n_kgrams, min(h) AS mh
       |  FROM wnd GROUP BY 1, 2, 3),
       |sel AS (
       |  SELECT w2.doc_id, w2.ws, m.n_kgrams, m.mh, max(w2.p2) AS sp
       |  FROM wnd w2 JOIN mins m ON m.doc_id = w2.doc_id AND m.ws = w2.ws
       |  WHERE w2.h = m.mh
       |  GROUP BY 1, 2, 3, 4),
       |fp AS (SELECT DISTINCT doc_id, n_kgrams, mh, sp FROM sel)
       |SELECT doc_id, n_kgrams, count(*) AS n_fingerprints,
       |       round(CAST(count(*) AS DOUBLE)
       |             / CAST(n_kgrams - ${w - 1} AS DOUBLE), 6) AS density
       |FROM fp GROUP BY doc_id, n_kgrams
       |ORDER BY doc_id""".stripMargin

  /** Spearman rank agreement between two curation signals — document
    * length (n_chars) and lexical breadth (distinct-token count): do the
    * two gates rank the corpus the same way, i.e. is the second signal
    * redundant? ρ is reported in exact ppm.
    *
    * Ranks are over the TIE-BROKEN total order (signal, doc_id) — both
    * engines break ties identically, the ranks are permutations of
    * 1..n, and the classic ρ = 1 − 6Σd²/(n(n²−1)) is then exact integer
    * arithmetic (no Pearson-on-midranks sqrt). Spearman's footrule Σ|d|
    * rides along as the L1 agreement.
    *
    * Scale shape: NO global row sort. Each rank = (census cumulative
    * below my signal value) + (row_number among my ties) — the census
    * is signal-alphabet-bounded (chars ≤ doc length cap; breadth ≤
    * vocabulary) and broadcast back, and the tie window is partitioned
    * by signal value. Σd² carries DECIMAL(38,0)/HUGEINT (n³ passes 2^63
    * past ~2M rows); exports narrow to BIGINT with ppm by DIV.
    */
  def rankAgreement(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def rankBy(base: DataFrame, sig: String): DataFrame = {
      val census = base.groupBy(col(sig)).agg(count(lit(1)).as("c"))
      val wBefore = Window.orderBy(col(sig))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = census.withColumn("cum_before",
        coalesce(sum(col("c")).over(wBefore), lit(0L))).drop("c")
      val wTie = Window.partitionBy(col(sig)).orderBy(col("doc_id"))
      base.join(broadcast(cum), sig)
        .withColumn(s"r_$sig", col("cum_before") + row_number().over(wTie))
        .drop("cum_before")
    }
    val sigs = docs.select(col("doc_id"), col("n_chars").as("s1"),
      size(Tokenize.distinctTokens(col("text"))).cast("long").as("s2"))
    val ranked = rankBy(rankBy(sigs, "s1"), "s2")
      .withColumn("d", (col("r_s1") - col("r_s2")).cast("long"))
    ranked.agg(count(lit(1)).as("n"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).as("sum_d2"),
        sum(abs(col("d"))).as("footrule"))
      .select(col("n"), col("sum_d2").cast("long").as("sum_d2"),
        col("footrule").cast("long").as("footrule"),
        expr("CAST(1000000 - (6000000 * sum_d2) DIV (n * (n * n - 1)) AS BIGINT)")
          .as("rho_ppm"))
  }

  val rankAgreementSql: String =
    s"""WITH sigs AS (
       |  SELECT doc_id, n_chars AS s1,
       |         CAST(len(${Tokenize.distinctTokensSql("text")}) AS BIGINT) AS s2
       |  FROM documents),
       |ranked AS (
       |  SELECT row_number() OVER (ORDER BY s1, doc_id)
       |           - row_number() OVER (ORDER BY s2, doc_id) AS d
       |  FROM sigs)
       |SELECT count(*) AS n,
       |       CAST(sum(d * d) AS BIGINT) AS sum_d2,
       |       CAST(sum(abs(d)) AS BIGINT) AS footrule,
       |       CAST(1000000 - (6000000 * sum(d * d))
       |            // (count(*) * (count(*) * count(*) - 1)) AS BIGINT) AS rho_ppm
       |FROM ranked""".stripMargin

  /** Wald–Wolfowitz runs audit of the training shuffle order: lay the
    * corpus out in the deterministic hash order every pack/sample
    * operator here uses (tokenHash of the salted doc_id) and ask whether
    * same-SOURCE documents clump — fewer runs of consecutive equal
    * sources than a random interleave predicts means the "shuffle" still
    * feeds the trainer source-correlated batches.
    *
    * Exact rational comparison (no variance/sqrt): with n rows of which
    * n_i per source, E[runs]·n = n² − Σn_i² + n, so `clumped` compares
    * runs·n against that product in BIGINT — the cross-multiplication
    * device.
    *
    * Scale shape: NO global-order window over the data. The hash key is
    * 60-bit non-negative, so `u DIV 2^54` splits the order into 64
    * contiguous ranges; boundaries are counted inside each range
    * (partitioned lag) and the 64 range-edge adjacencies come from a
    * min_by/max_by per range (64-row frame). The oracle mirrors with
    * one flat lag — same count, single-node formulation.
    */
  def shuffleAudit(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = docs.select(col("doc_id"), col("source"),
      PortableHash.tokenHash(concat(lit("shuffle:"), col("doc_id").cast("string")))
        .as("u"))
      .withColumn("bucket", expr(s"CAST(u DIV ${1L << 54} AS BIGINT)"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("u"), col("doc_id"))
    val inner = ordered
      .withColumn("prev", lag(col("source"), 1).over(wIn))
      .agg(sum(when(col("prev").isNotNull && col("prev") =!= col("source"), 1L)
        .otherwise(0L)).as("inner_changes"))
    val edges = ordered.groupBy(col("bucket"))
      .agg(min_by(col("source"), struct(col("u"), col("doc_id"))).as("first_src"),
        max_by(col("source"), struct(col("u"), col("doc_id"))).as("last_src"))
    val wB = Window.orderBy(col("bucket"))
    val edgeChanges = edges
      .withColumn("prev_last", lag(col("last_src"), 1).over(wB))
      .agg(sum(when(col("prev_last").isNotNull && col("prev_last") =!= col("first_src"), 1L)
        .otherwise(0L)).as("edge_changes"))
    val sizes = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_sources"),
        sum(col("c") * col("c")).as("sum_sq"))
    sizes.crossJoin(broadcast(inner)).crossJoin(broadcast(edgeChanges))
      .select(col("n"), col("n_sources"),
        (col("inner_changes") + col("edge_changes") + lit(1L)).as("runs"),
        ((col("inner_changes") + col("edge_changes") + lit(1L)) * col("n")).as("runs_x_n"),
        (col("n") * col("n") - col("sum_sq") + col("n")).as("expected_x_n"))
      .withColumn("clumped", col("runs_x_n") < col("expected_x_n"))
  }

  val shuffleAuditSql: String = {
    val u = PortableHash.tokenHashSql("concat('shuffle:', CAST(doc_id AS VARCHAR))")
    s"""WITH ordered AS (
       |  SELECT source, $u AS uk, doc_id FROM documents),
       |lagged AS (
       |  SELECT source, lag(source) OVER (ORDER BY uk, doc_id) AS prev
       |  FROM ordered),
       |changes AS (
       |  SELECT CAST(sum(CASE WHEN prev IS NOT NULL AND prev <> source
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS ch
       |  FROM lagged),
       |sizes AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS n_sources,
       |         CAST(sum(c * c) AS BIGINT) AS sum_sq
       |  FROM (SELECT count(*) AS c FROM documents GROUP BY source))
       |SELECT n, n_sources, ch + 1 AS runs, (ch + 1) * n AS runs_x_n,
       |       n * n - sum_sq + n AS expected_x_n,
       |       (ch + 1) * n < n * n - sum_sq + n AS clumped
       |FROM sizes CROSS JOIN changes""".stripMargin
  }

  /** Anneal-phase selection audit — the "finish training on the best
    * data" cut (the Llama/MiniCPM-style anneal): per source, the top
    * `topPct`% of docs by quality survive, and the audit reports the
    * TOKEN share that selection actually keeps. The number that matters
    * is the doc%→token% gap: quality correlates with length, so a 20%
    * doc cut routinely keeps 30%+ of tokens — budget by tokens, not
    * docs, or the anneal runs long.
    *
    * Exact by construction: ranks come from the deterministic
    * (quality DESC, doc_id) total order over the gate-proven 4-dp
    * quality score; k = ⌊n·topPct/100⌋ docs per source; token sums and
    * the share ppm are integers. `boundary_quality` exposes the cut
    * score (NULL when the source is too small for a single pick —
    * loud, not silently wrong).
    *
    * Scale shape: ONE corpus lineage ([[qualityScoreWith]] carries
    * source + token counts through the scoring projection — no re-join
    * on doc_id, the build-notes rule), one per-source rank window, one
    * grouped fold.
    */
  def annealSelection(docs: DataFrame, topPct: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topPct > 0 && topPct < 100, s"topPct in (0, 100): $topPct")
    val bySrc = Window.partitionBy(col("source"))
    qualityScoreWith(docs, Seq("source"))
      .select(col("doc_id"), col("source"), col("quality"), col("n_tokens"))
      .withColumn("rk", row_number().over(
        bySrc.orderBy(col("quality").desc, col("doc_id"))))
      .withColumn("n_src", count(lit(1)).over(bySrc))
      .withColumn("k", expr(s"(n_src * $topPct) DIV 100"))
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"), max(col("k")).as("k_selected"),
        sum(col("n_tokens")).as("tokens_total"),
        sum(when(col("rk") <= col("k"), col("n_tokens")).otherwise(0L))
          .as("tokens_selected"),
        max(when(col("rk") === col("k"), col("quality"))).as("boundary_quality"))
      .select(col("source"), col("n_docs"), col("k_selected"),
        col("tokens_total"), col("tokens_selected"),
        expr("CAST((1000000 * tokens_selected) DIV tokens_total AS BIGINT)")
          .as("token_share_ppm"),
        col("boundary_quality"))
      .orderBy("source")
  }

  def annealSelectionSql(topPct: Int): String =
    s"""WITH q AS (${qualityScoreSqlWith(Seq("source")).replace("ORDER BY doc_id", "")}),
       |r AS (
       |  SELECT doc_id, source, quality, n_tokens,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY quality DESC, doc_id) AS rk,
       |         count(*) OVER (PARTITION BY source) AS n_src
       |  FROM q),
       |k AS (SELECT *, (n_src * $topPct) // 100 AS k FROM r)
       |SELECT source, CAST(max(n_src) AS BIGINT) AS n_docs,
       |       CAST(max(k) AS BIGINT) AS k_selected,
       |       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       |       CAST(sum(CASE WHEN rk <= k THEN n_tokens ELSE 0 END) AS BIGINT)
       |         AS tokens_selected,
       |       CAST((1000000 * sum(CASE WHEN rk <= k THEN n_tokens ELSE 0 END))
       |            // sum(n_tokens) AS BIGINT) AS token_share_ppm,
       |       max(CASE WHEN rk = k THEN quality END) AS boundary_quality
       |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** Per-token burstiness (Fano factor — variance-to-mean ratio of the
    * per-document count, zeros included): the classic content-vs-function
    * word discriminator. A Poisson-scattered token reads ≈ 1e6 ppm;
    * topical words clump (appear many times in few docs) and read far
    * above it — the signal a keyword extractor or stopword-list builder
    * keys on, orthogonal to plain frequency (tf-idf) and rank shape
    * (zipf).
    *
    * Exact integer form: with per-doc counts c over n docs,
    * Fano = Var/mean = (n·Σc² − (Σc)²) / (n·Σc) — documents NOT
    * containing the token contribute 0 to both sums, so one (token, doc)
    * aggregation over the exploded corpus is the complete sufficient
    * statistic; ppm via truncating DIV, identical both engines.
    *
    * Scale shape: explode → two partial-agged groupBys; output is
    * vocabulary-bounded. mean_milli = 1000·Σc/n rides the same fold.
    */
  def burstiness(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(Tokenize.tokens(col("text"))).as("tok"))
    val perDoc = toks.groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("c"))
    val nDocs = docs.agg(count(lit(1)).as("n"))
    perDoc.groupBy(col("tok"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
      .crossJoin(broadcast(nDocs))
      .select(col("tok"), col("df"), col("sc").as("total_count"),
        expr("CAST((1000000 * (n * sc2 - sc * sc)) DIV (n * sc) AS BIGINT)")
          .as("fano_ppm"),
        expr("CAST((1000 * sc) DIV n AS BIGINT)").as("mean_milli"))
      .orderBy(col("fano_ppm").desc, col("tok"))
  }

  val burstinessSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${Tokenize.tokensSql("text")}) AS tok
       |  FROM documents),
       |per_doc AS (SELECT tok, doc_id, count(*) AS c FROM toks GROUP BY 1, 2),
       |nd AS (SELECT count(*) AS n FROM documents),
       |st AS (
       |  SELECT tok, count(*) AS df, CAST(sum(c) AS BIGINT) AS sc,
       |         CAST(sum(c * c) AS BIGINT) AS sc2
       |  FROM per_doc GROUP BY tok)
       |SELECT tok, df, sc AS total_count,
       |       CAST((1000000 * (n * sc2 - sc * sc)) // (n * sc) AS BIGINT) AS fano_ppm,
       |       CAST((1000 * sc) // n AS BIGINT) AS mean_milli
       |FROM st, nd ORDER BY fano_ppm DESC, tok""".stripMargin

  /** Per-source vocabulary growth curve — distinct 3-token shingles and
    * total shingle mass after the first k docs of each source, at fixed
    * doc-count checkpoints (Heaps'-law audit without the log-log fit):
    * the saturation read a mixture designer uses to judge when MORE data
    * from a source stops adding diversity, and the per-source analogue
    * of [[ngramNovelty]]'s global curve. 3-shingles, not unigrams — the
    * fixture vocabulary is 31 words, unigram sets saturate instantly
    * (build notes).
    *
    * Exact by construction: "first k docs" is the (source, doc_id)
    * rank order, a shingle counts at checkpoint k iff its FIRST
    * occurrence rank ≤ k (min-rank per distinct shingle), mass is the
    * per-rank occurrence fold — every number an integer count.
    * ttr_ppm = 10⁶·distinct/mass is the type-token ratio at k.
    *
    * Scale shape: one rank window per source, explode, then BOTH
    * checkpoint folds run over PRE-AGGREGATED frames (per-(source,
    * shingle) first ranks — vocabulary-bounded; per-(source, rank)
    * masses — doc-bounded) crossed with the constant checkpoint list,
    * never over the raw token stream.
    */
  def vocabGrowth(docs: DataFrame, checkpoints: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(checkpoints.nonEmpty && checkpoints == checkpoints.sorted,
      s"checkpoints must be ascending: $checkpoints")
    val ranked = docs.select(col("source"), col("doc_id"), col("text"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
    val sh = ranked.select(col("source"), col("rk"),
      explode(Tokenize.shingles3(Tokenize.tokens(col("text")))).as("sh"))
    val ck = explode(array(checkpoints.map(k => lit(k.toLong)): _*)).as("checkpoint")
    val firsts = sh.groupBy(col("source"), col("sh")).agg(min(col("rk")).as("fr"))
    val vocab = firsts.select(col("source"), col("fr"), ck)
      .groupBy(col("source"), col("checkpoint"))
      .agg(sum(when(col("fr") <= col("checkpoint"), 1L).otherwise(0L))
        .as("distinct_shingles"))
    val mass = sh.groupBy(col("source"), col("rk")).agg(count(lit(1)).as("occ"))
      .select(col("source"), col("rk"), col("occ"), ck)
      .groupBy(col("source"), col("checkpoint"))
      .agg(sum(when(col("rk") <= col("checkpoint"), col("occ")).otherwise(0L))
        .as("shingle_mass"))
    // doc counts fold over the |docs|-bounded rank frame, NOT the
    // shingle frame (a <3-token doc has no shingle rows but is a doc)
    val nd = ranked.select(col("source"), col("rk"), ck)
      .groupBy(col("source"), col("checkpoint"))
      .agg(sum(when(col("rk") <= col("checkpoint"), 1L).otherwise(0L)).as("n_docs"))
    vocab.join(mass, Seq("source", "checkpoint"))
      .join(nd, Seq("source", "checkpoint"))
      .select(col("source"), col("checkpoint"), col("n_docs"),
        col("distinct_shingles"), col("shingle_mass"),
        expr("""CASE WHEN shingle_mass = 0 THEN NULL
               |     ELSE CAST((1000000 * distinct_shingles) DIV shingle_mass
               |               AS BIGINT) END""".stripMargin).as("ttr_ppm"))
      .orderBy("source", "checkpoint")
  }

  def vocabGrowthSql(checkpoints: Seq[Int]): String = {
    val ckList = checkpoints.mkString(", ")
    s"""WITH ranked AS (
       |  SELECT source, doc_id, text,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
       |              AS BIGINT) AS rk
       |  FROM documents),
       |tk AS (SELECT source, rk, ${Tokenize.tokensSql("text")} AS toks FROM ranked),
       |sh AS (
       |  SELECT source, rk, unnest(${Tokenize.shingles3Sql("toks")}) AS sh
       |  FROM tk),
       |cks AS (SELECT CAST(unnest([$ckList]) AS BIGINT) AS checkpoint),
       |firsts AS (SELECT source, sh, min(rk) AS fr FROM sh GROUP BY 1, 2),
       |vocab AS (
       |  SELECT f.source, c.checkpoint,
       |         CAST(sum(CASE WHEN f.fr <= c.checkpoint THEN 1 ELSE 0 END)
       |              AS BIGINT) AS distinct_shingles
       |  FROM firsts f CROSS JOIN cks c GROUP BY 1, 2),
       |mass0 AS (SELECT source, rk, count(*) AS occ FROM sh GROUP BY 1, 2),
       |mass AS (
       |  SELECT m.source, c.checkpoint,
       |         CAST(sum(CASE WHEN m.rk <= c.checkpoint THEN m.occ ELSE 0 END)
       |              AS BIGINT) AS shingle_mass
       |  FROM mass0 m CROSS JOIN cks c GROUP BY 1, 2),
       |nd AS (
       |  SELECT r.source, c.checkpoint,
       |         CAST(sum(CASE WHEN r.rk <= c.checkpoint THEN 1 ELSE 0 END)
       |              AS BIGINT) AS n_docs
       |  FROM ranked r CROSS JOIN cks c GROUP BY 1, 2)
       |SELECT v.source, v.checkpoint, d.n_docs, v.distinct_shingles, m.shingle_mass,
       |       CASE WHEN m.shingle_mass = 0 THEN NULL
       |            ELSE CAST((1000000 * v.distinct_shingles) // m.shingle_mass
       |                      AS BIGINT) END AS ttr_ppm
       |FROM vocab v JOIN mass m ON m.source = v.source
       |                        AND m.checkpoint = v.checkpoint
       |              JOIN nd d ON d.source = v.source
       |                       AND d.checkpoint = v.checkpoint
       |ORDER BY v.source, v.checkpoint""".stripMargin
  }

  /** Kneser–Ney smoothed bigram probabilities (absolute discount
    * d = 3/4), top-N bigrams — the modern-LM smoothing counterpart to
    * [[bigramLogprob]]'s Jelinek–Mercer interpolation: the backoff mass
    * goes to the CONTINUATION distribution (how many distinct left
    * contexts a word follows), not the raw unigram frequency, which is
    * what makes "san francisco"-style collocations score correctly.
    *
    * Exactness: with d = 3/4 every term is rational on the common
    * denominator 4·c(w1)·T (T = distinct bigram types):
    * p_KN·4·c1·T = (4·c12 − 3)·T + 3·N1+(w1·)·N1+(·w2), all BIGINT
    * counts (an observed bigram has c12 ≥ 1, so the discount max(·,0)
    * never binds). Published in ppb via the DECIMAL(38,0) ≡ HUGEINT
    * product + truncating-DIV device — no logs, no doubles.
    *
    * Scale shape: one tokenize pass partial-aggregates to the bigram
    * census (vocab²-bounded); the context/continuation marginals derive
    * from the census and broadcast back; the top-N is a
    * TakeOrderedAndProject (deterministic tie-break on the pair), never
    * a global sort.
    */
  def knProbability(docs: DataFrame, topN: Int): DataFrame = {
    val bc = docs
      .select(explode(Tokenize.bigrams(Tokenize.tokens(col("text")))).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("pair"), " ", 1))
      .withColumn("w2", substring_index(col("pair"), " ", -1))
    val b = Caches.tracked(bc.persist())
    val byW1 = b.groupBy(col("w1"))
      .agg(sum(col("c12")).cast("long").as("c1"),
        count(lit(1)).cast("long").as("n_follow"))
    val byW2 = b.groupBy(col("w2"))
      .agg(count(lit(1)).cast("long").as("n_precede"))
    val tot = b.agg(count(lit(1)).cast("long").as("n_bigram_types"))
    b.join(broadcast(byW1), "w1")
      .join(broadcast(byW2), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("p_kn_ppb", expr(
        """CAST(CAST((4 * c12 - 3) * n_bigram_types
          |          + 3 * n_follow * n_precede AS DECIMAL(38,0)) * 1000000000
          |     DIV (CAST(4 AS DECIMAL(38,0)) * c1 * n_bigram_types) AS BIGINT)""".stripMargin))
      .withColumn("p_mle_ppb",
        expr("CAST(CAST(c12 AS DECIMAL(38,0)) * 1000000000 DIV c1 AS BIGINT)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("n_follow"),
        col("n_precede"), col("n_bigram_types"), col("p_kn_ppb"), col("p_mle_ppb"))
      .orderBy(col("p_kn_ppb").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  def knProbabilitySql(topN: Int): String =
    s"""WITH tokd AS (SELECT ${Tokenize.tokensSql("text")} AS t FROM documents),
       |bi AS (SELECT unnest(${Tokenize.bigramsSql("t")}) AS pair FROM tokd),
       |bc AS (SELECT pair, split_part(pair, ' ', 1) AS w1,
       |              split_part(pair, ' ', 2) AS w2, count(*) AS c12
       |       FROM bi GROUP BY 1),
       |w1c AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
       |               CAST(count(*) AS BIGINT) AS n_follow
       |        FROM bc GROUP BY 1),
       |w2c AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_precede
       |        FROM bc GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM bc)
       |SELECT bc.w1, bc.w2, bc.c12, w1c.c1, w1c.n_follow, w2c.n_precede,
       |       tot.n_bigram_types,
       |       CAST(CAST((4 * bc.c12 - 3) * tot.n_bigram_types
       |                 + 3 * w1c.n_follow * w2c.n_precede AS HUGEINT)
       |            * 1000000000
       |            // (CAST(4 AS HUGEINT) * w1c.c1 * tot.n_bigram_types)
       |            AS BIGINT) AS p_kn_ppb,
       |       CAST(CAST(bc.c12 AS HUGEINT) * 1000000000 // w1c.c1 AS BIGINT)
       |         AS p_mle_ppb
       |FROM bc JOIN w1c USING (w1) JOIN w2c USING (w2) CROSS JOIN tot
       |ORDER BY p_kn_ppb DESC, bc.w1, bc.w2 LIMIT $topN""".stripMargin
}
