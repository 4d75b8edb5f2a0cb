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

  /** Percentile-anchored quality gate: instead of a hand-picked absolute
    * threshold, keep the top `keepFraction` of the corpus by quality —
    * the calibration step that makes a quality filter portable across
    * corpora with different score distributions. Exact interpolated
    * percentile (same engine-parity recipe as the P50/P95/P99 metrics) —
    * NOTE the exact buffer holds every score, so this form is the
    * fixture-scale audit; [[qualityGateSketch]] is the bounded scale
    * path. Output: the derived threshold + survivor counts.
    */
  def qualityGate(docs: DataFrame, keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction < 1, s"keepFraction in (0,1): $keepFraction")
    val sig = TextAnalysis.signals(docs).select(col("quality"))
    val th = sig.agg(
      round(expr(s"percentile(quality, ${1.0 - keepFraction})"), 4).as("threshold"))
    sig.crossJoin(broadcast(th))
      .agg(
        max(col("threshold")).as("threshold"),
        count(lit(1)).as("n_total"),
        sum(when(col("quality") >= col("threshold"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** [[qualityGate]] with the threshold selected by the EXACT two-pass
    * histogram refinement ([[ExactQuantiles]]) instead of the
    * O(|corpus|)-buffer `percentile` aggregate — same numbers, same
    * oracle, bounded memory at any corpus size. This is the release-gate
    * shape when a sketch's ±ε is not acceptable; the sketch variant
    * ([[qualityGateSketch]]) stays the cheaper one-scan path.
    */
  def qualityGateTwoPass(docs: DataFrame, keepFraction: Double): DataFrame = {
    require(keepFraction > 0 && keepFraction < 1, s"keepFraction in (0,1): $keepFraction")
    val sig = Caches.tracked(TextAnalysis.signals(docs)
      .select(lit("all").as("g"), col("quality")).persist())
    val th = ExactQuantiles.percentiles(sig, "g", "quality",
        Seq("threshold" -> (1.0 - keepFraction)))
      .select(col("threshold"))
    sig.crossJoin(broadcast(th))
      .agg(
        max(col("threshold")).as("threshold"),
        count(lit(1)).as("n_total"),
        sum(when(col("quality") >= col("threshold"), 1L).otherwise(0L)).as("n_kept"))
  }

  /** [[qualityGate]] with the threshold derived from a fixed-bin histogram
    * sketch instead of the exact `percentile` (whose aggregation buffer
    * holds EVERY quality score — O(|corpus|) memory on one reducer at
    * 100 TB). `quality` is bounded in [0, 1] by construction
    * ([[TextAnalysis.signals]] applies `least(1.0, …)`), so the histogram
    * needs NO bounds pass: bin = min(floor(q·nBins), nBins−1) is a single
    * map-side-combined aggregation shipping ≤ nBins counter partials —
    * bounded at any corpus size. The exact-percentile threshold is kept as
    * the AUDIT column (the [[Sketches.approxDistinctUsers]] pairing): at
    * fixture scale it is cheap; at scale you drop it and keep the sketch.
    *
    * The sketch threshold is rounded to 4 dp BEFORE the survivor count
    * compares against it (rounding after would let engine-private
    * double formatting leak into the keep/drop decision).
    */
  def qualityGateSketch(docs: DataFrame, keepFraction: Double, nBins: Int): DataFrame = {
    require(keepFraction > 0 && keepFraction < 1, s"keepFraction in (0,1): $keepFraction")
    val q = 1.0 - keepFraction
    val sig = TextAnalysis.signals(docs).select(col("quality"))
    val binned = sig
      .groupBy(least(floor(col("quality") * nBins), lit((nBins - 1).toLong)).as("bin"))
      .agg(count(lit(1)).as("c"))
    // partitionless windows are fine HERE: both run over the nBins-
    // bounded histogram census, never the corpus (the PlanShapeSpec
    // bounded-census allowance)
    val cum = binned
      .withColumn("cum", sum(col("c")).over(Window.orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over())
    val target = greatest(ceil(lit(q) * col("n")), lit(1L))
    val prev = col("cum") - col("c")
    val est = (col("bin") + (target - prev).cast("double") / col("c")) / lit(nBins)
    val th = cum.agg(
      round(max(when(col("cum") >= target && prev < target, est)), 4).as("threshold_sketch"))
    val thExact = sig.agg(
      round(expr(s"percentile(quality, $q)"), 4).as("threshold_exact"))
    sig.crossJoin(broadcast(th)).crossJoin(broadcast(thExact))
      .agg(
        max(col("threshold_sketch")).as("threshold_sketch"),
        max(col("threshold_exact")).as("threshold_exact"),
        count(lit(1)).as("n_total"),
        sum(when(col("quality") >= col("threshold_sketch"), 1L).otherwise(0L)).as("n_kept_sketch"),
        sum(when(col("quality") >= col("threshold_exact"), 1L).otherwise(0L)).as("n_kept_exact"))
  }

  /** Oracle mirror of [[qualityGateSketch]] — histogram rebuilt
    * declaratively with the same bin/rank/interpolation arithmetic.
    */
  def qualityGateSketchSql(keepFraction: Double, nBins: Int): String = {
    val q = 1.0 - keepFraction
    val target = s"greatest(CAST(ceil($q * n) AS BIGINT), 1)"
    s"""WITH ${TextAnalysis.signalsSql},
       |binned AS (
       |  SELECT least(CAST(floor(quality * $nBins) AS BIGINT), ${nBins - 1}) AS bin, count(*) AS c
       |  FROM sig GROUP BY 1),
       |cum AS (
       |  SELECT bin, c, sum(c) OVER (ORDER BY bin) AS cum, sum(c) OVER () AS n
       |  FROM binned),
       |th AS (
       |  SELECT round(max(CASE WHEN cum >= $target AND cum - c < $target
       |                   THEN (bin + CAST($target - (cum - c) AS DOUBLE) / c) / $nBins END), 4) AS threshold_sketch
       |  FROM cum),
       |the AS (SELECT round(quantile_cont(quality, $q), 4) AS threshold_exact FROM sig)
       |SELECT max(th.threshold_sketch) AS threshold_sketch,
       |       max(the.threshold_exact) AS threshold_exact,
       |       count(*) AS n_total,
       |       CAST(sum(CASE WHEN sig.quality >= th.threshold_sketch THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_sketch,
       |       CAST(sum(CASE WHEN sig.quality >= the.threshold_exact THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_exact
       |FROM sig, th, the""".stripMargin
  }

  def qualityGateSql(keepFraction: Double): String =
    s"""WITH ${TextAnalysis.signalsSql},
       |th AS (
       |  SELECT round(quantile_cont(quality, ${1.0 - keepFraction}), 4) AS threshold
       |  FROM sig)
       |SELECT max(th.threshold) AS threshold, count(*) AS n_total,
       |  CAST(sum(CASE WHEN sig.quality >= th.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM sig, th""".stripMargin

  /** Source-mixture rebalancing: per source, the repeat/keep factor that
    * moves the corpus from its ACTUAL composition to a TARGET one (the
    * domain-weights step of pretraining data assembly). factor > 1 means
    * upsample (repeat epochs), < 1 means downsample. Pure aggregation —
    * one shuffle on the source key at any scale.
    */
  def sourceMix(docs: DataFrame, targetWeights: Map[String, Double],
                defaultWeight: Double = 1.0): DataFrame = {
    val weight = targetWeights.toSeq.sortBy(_._1)
      .foldRight(lit(defaultWeight): org.apache.spark.sql.Column) {
        case ((k, v), acc) => when(col("source") === k, v).otherwise(acc)
      }
    val perSource = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), max(weight).as("target_w"))
    // totals via an empty window over the per-source frame (one pass,
    // same shape as Routing.offsetFrontier) — a self-crossJoin would
    // re-plan the docs scan + aggregation twice
    perSource
      .withColumn("n_total", sum(col("n_docs")).over())
      .withColumn("w_total", sum(col("target_w")).over())
      .select(col("source"), col("n_docs"),
        round(col("target_w") / col("w_total"), 6).as("target_share"),
        round(col("n_docs").cast("double") / col("n_total"), 6).as("actual_share"),
        round((col("target_w") / col("w_total")) /
          (col("n_docs").cast("double") / col("n_total")), 6).as("mix_factor"))
      .orderBy("source")
  }

  def sourceMixSql(targetWeights: Map[String, Double], defaultWeight: Double = 1.0): String = {
    val cases = targetWeights.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN source = '$k' THEN $v" }.mkString(" ")
    val weight = s"CASE $cases ELSE $defaultWeight END"
    s"""WITH per_source AS (
       |  SELECT source, count(*) AS n_docs, max($weight) AS target_w
       |  FROM documents GROUP BY source),
       |tot AS (SELECT sum(n_docs) AS n_total, sum(target_w) AS w_total FROM per_source)
       |SELECT source, n_docs,
       |  round(target_w / w_total, 6) AS target_share,
       |  round(CAST(n_docs AS DOUBLE) / n_total, 6) AS actual_share,
       |  round((target_w / w_total) / (CAST(n_docs AS DOUBLE) / n_total), 6) AS mix_factor
       |FROM per_source, tot ORDER BY source""".stripMargin
  }

  /** Sequence packing plan: assign docs to fixed-token-budget bins — the
    * context-window packing step before pretraining. Docs scatter across
    * `nBuckets` hash buckets (parallelism), and within a bucket the
    * running token total assigns bin = floor(exclusive_cumsum / budget):
    * one window per bucket, buckets fully parallel — never a global sort.
    * Deterministic across partitionings (bucket + order are pure
    * functions of doc_id).
    */
  def packBins(docs: DataFrame, budget: Int, nBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = size(graft.functions.Tokenize.tokens(col("text"))).cast("long")
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"),
        graft.functions.PortableHash.routerPartition(col("doc_id"), nBuckets).as("bucket"),
        toks.as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .withColumn("bin_id", floor((col("cum_tokens") - col("n_tokens")).cast("double") / budget).cast("long"))
      .orderBy("bucket", "doc_id")
  }

  def packBinsSql(budget: Int, nBuckets: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    ${graft.functions.PortableHash.routerPartitionSql("doc_id", nBuckets)} AS bucket,
       |    CAST(len(${graft.functions.Tokenize.tokensSql("text")}) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM d)
       |SELECT doc_id, bucket, n_tokens, cum_tokens,
       |  CAST(floor(CAST(cum_tokens - n_tokens AS DOUBLE) / $budget) AS BIGINT) AS bin_id
       |FROM c ORDER BY bucket, doc_id""".stripMargin

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

  /** Quality-weighted (importance) sampling: a doc is kept with
    * probability equal to its quality score — keep iff
    * hash(doc_id) % D < round(quality·D). Deterministic: no RNG, so
    * re-runs and backfills select the IDENTICAL subset (the property a
    * reproducible training-data pipeline needs), and the acceptance test
    * is integral arithmetic on both engines (quality has 4 decimals, so
    * quality·10⁴ is exactly integral — no rounding boundary to disagree
    * on). The audit output shows per-source kept counts and mean quality
    * before/after: avg_q_kept > avg_q_all is the up-weighting working.
    * One lineage over the corpus (quality + source carried together);
    * a single partial-combined aggregate.
    */
  def importanceSample(docs: DataFrame, denom: Int): DataFrame = {
    val q = TextAnalysis.qualityScoreWith(docs, Seq("source"))
    val kept = PortableHash.tokenHash(col("doc_id").cast("string")) % denom <
      round(col("quality") * denom).cast("long")
    q.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
        round(sum(col("quality").cast("decimal(10,4)")).cast("double") / count(lit(1)), 6)
          .as("avg_q_all"),
        // nullif: a source keeping zero docs must yield NULL on both
        // engines, not a 0-denominator IEEE artifact
        round(sum(when(kept, col("quality").cast("decimal(10,4)"))).cast("double") /
          nullif(sum(when(kept, 1L).otherwise(0L)), lit(0L)), 6).as("avg_q_kept"))
      .orderBy("source")
  }

  def importanceSampleSql(denom: Int): String = {
    val kept = s"(${PortableHash.tokenHashSql("CAST(doc_id AS VARCHAR)")}) % $denom" +
      s" < CAST(round(quality * $denom, 0) AS BIGINT)"
    s"""WITH q AS (${TextAnalysis.qualityScoreSqlWith(Seq("source"))})
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN $kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  round(CAST(sum(CAST(quality AS DECIMAL(10,4))) AS DOUBLE) / count(*), 6) AS avg_q_all,
       |  round(CAST(sum(CASE WHEN $kept THEN CAST(quality AS DECIMAL(10,4)) END) AS DOUBLE)
       |        / nullif(sum(CASE WHEN $kept THEN 1 ELSE 0 END), 0), 6) AS avg_q_kept
       |FROM q GROUP BY source ORDER BY source""".stripMargin
  }

  /** Temperature-scaled source mixing (the multilingual-pretraining
    * formula, e.g. mC4/XLM-R): sampling weight ∝ n_tokens^alpha, so
    * alpha = 1 reproduces natural proportions and alpha → 0 approaches
    * uniform — small sources get up-sampled, dominant ones damped. For
    * each source the plan reports the natural token share, the
    * temperature share, the boost factor (temp/natural — how many times
    * over-represented the source becomes), and the number of epochs the
    * source's data is repeated when a training run draws `budgetTokens`
    * tokens from the mix.
    *
    * Scale shape: one partial-combined aggregate keyed on source (token
    * counts sum as exact BIGINTs); the share arithmetic runs over the
    * |sources|-row frame via empty-frame windows (same device as
    * [[sourceMix]]). Parity: pow(·, alpha) is evaluated per source row
    * and rounded to 6 dp, then summed as DECIMAL — the cross-source sum
    * is exact, never an order-dependent float reduction.
    */
  def temperatureMix(docs: DataFrame, alpha: Double, budgetTokens: Long): DataFrame = {
    val perSource = docs
      .select(col("source"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("n_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("w",
        round(pow(col("n_tokens").cast("double"), alpha), 6).cast("decimal(38,6)"))
    perSource
      .withColumn("tok_total", sum(col("n_tokens")).over())
      .withColumn("w_total", sum(col("w")).over())
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("tok_total").cast("double"), 6)
          .as("natural_share"),
        round(col("w").cast("double") / col("w_total").cast("double"), 6)
          .as("temp_share"),
        round((col("w").cast("double") / col("w_total").cast("double")) /
          (col("n_tokens").cast("double") / col("tok_total").cast("double")), 6)
          .as("boost"),
        round(lit(budgetTokens.toDouble) *
          (col("w").cast("double") / col("w_total").cast("double")) /
          col("n_tokens").cast("double"), 6).as("epochs_at_budget"))
      .orderBy("source")
  }

  /** Sliding-window token chunking — the context-window splitter every
    * training pipeline runs before tokenization/packing. Each document is
    * cut into chunks of `chunkSize` tokens starting every `stride` tokens
    * (overlap = chunkSize - stride); every stride point ≤ n starts a
    * chunk, so the document tail is always covered (the final chunks are
    * short). One row per chunk with a PortableHash fingerprint of the
    * re-joined chunk text — the key chunk-level dedup would group on.
    *
    * Scale shape: pure projection + one explode — map-only, no shuffle,
    * fan-out bounded by n_tokens/stride per document. The chunk list is
    * built with `slice` (not a lambda over `sequence`) so the token array
    * is evaluated once per row, and `start` is bound through a projection
    * before `slice` references it (HOF-lambda re-evaluation pitfall).
    */
  def chunkDocs(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    docs
      .select(col("doc_id"), graft.functions.Tokenize.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      // sequence(a, b) with b < a yields a DESCENDING sequence — the
      // n >= 1 filter guards it (and drops token-less docs, which have
      // no chunks by definition)
      .filter(col("n") >= 1)
      .withColumn("start", explode(sequence(lit(1), col("n"), lit(stride))))
      .withColumn("chunk", slice(col("toks"), col("start"), lit(chunkSize)))
      .select(col("doc_id"),
        expr(s"CAST((start - 1) DIV $stride AS BIGINT)").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        size(col("chunk")).cast("long").as("n_tok"),
        graft.functions.PortableHash.tokenHash(array_join(col("chunk"), " ")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")
  }

  def chunkDocsSql(chunkSize: Int, stride: Int): String =
    s"""WITH tk AS (
       |  SELECT doc_id, ${graft.functions.Tokenize.tokensSql("text")} AS toks
       |  FROM documents),
       |sized AS (SELECT doc_id, toks, len(toks) AS n FROM tk WHERE len(toks) >= 1),
       |st AS (
       |  SELECT doc_id, toks, n, unnest(range(1, n + 1, $stride)) AS start
       |  FROM sized),
       |ch AS (
       |  SELECT doc_id, start, toks[start : start + ${chunkSize - 1}] AS chunk
       |  FROM st)
       |SELECT doc_id,
       |  (start - 1) // $stride AS chunk_idx,
       |  CAST(start AS BIGINT) AS start_tok,
       |  CAST(len(chunk) AS BIGINT) AS n_tok,
       |  ${graft.functions.PortableHash.tokenHashSql("array_to_string(chunk, ' ')")} AS chunk_hash
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  def temperatureMixSql(alpha: Double, budgetTokens: Long): String =
    s"""WITH per_source AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(CAST(len(${graft.functions.Tokenize.tokensSql("text")}) AS BIGINT)) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |weighted AS (
       |  SELECT *, CAST(round(pow(CAST(n_tokens AS DOUBLE), $alpha), 6) AS DECIMAL(38,6)) AS w
       |  FROM per_source),
       |tot AS (SELECT sum(n_tokens) AS tok_total, sum(w) AS w_total FROM weighted)
       |SELECT source, n_docs, n_tokens,
       |  round(CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE), 6) AS natural_share,
       |  round(CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE), 6) AS temp_share,
       |  round((CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE)) /
       |        (CAST(n_tokens AS DOUBLE) / CAST(tok_total AS DOUBLE)), 6) AS boost,
       |  round($budgetTokens.0 * (CAST(w AS DOUBLE) / CAST(w_total AS DOUBLE)) /
       |        CAST(n_tokens AS DOUBLE), 6) AS epochs_at_budget
       |FROM weighted, tot ORDER BY source""".stripMargin

  /** Chunk-level duplication audit (the RETRO-style question "how much
    * of this document is boilerplate shared with other documents?"):
    * every sliding chunk from [[chunkDocs]] is fingerprinted, a chunk is
    * SHARED when its hash occurs in more than one distinct document, and
    * each doc reports its shared-chunk ratio.
    *
    * Scale shape: pure hash-groupBy dedup at chunk granularity — one
    * shuffle on chunk_hash for the occurrence counts, one on doc_id for
    * the per-doc rollup; the duplicated-hash frame joins back by hash
    * (no pairwise work anywhere).
    */
  def chunkOverlap(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    val ch = Caches.tracked(chunkDocs(docs, chunkSize, stride)
      .select(col("doc_id"), col("chunk_hash")).persist())
    val occ = ch.groupBy(col("chunk_hash"))
      .agg(count_distinct(col("doc_id")).as("nd"))
    ch.join(occ, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
        round(col("n_shared_chunks").cast("double") / col("n_chunks").cast("double"), 6)
          .as("shared_ratio"))
      .orderBy("doc_id")
  }

  /** Content-defined chunking (the rsync/FastCDC idea on tokens): a
    * chunk boundary falls BEFORE every shingle position whose 3-gram
    * hash is ≡ 0 mod `div` — boundaries are decided by local CONTENT,
    * so inserting a token near the head of a document shifts every
    * fixed-stride chunk of [[chunkOverlap]] but leaves all CDC chunk
    * fingerprints beyond the edit intact (the property the spec pins).
    * Expected chunk length ≈ `div` shingles. Per doc: chunk count,
    * chunks whose exact fingerprint occurs in another document, and the
    * shared share in ppm — chunk-level exact dedup, the storage-dedup
    * complement of the document-level MinHash family.
    *
    * Scale shape: one positional-shingle explode (the dedup family's
    * shared device), one per-doc window cumsum for chunk ids, one
    * hash-groupBy for fingerprints, one occurrence groupBy + hash join
    * back — all linear, no pairwise work. Fingerprints are md5 over the
    * pos-ordered shingle-hash sequence (deterministic under any shuffle
    * via array_sort on (pos, h); DuckDB mirrors with ORDER BY inside
    * string_agg).
    */
  def cdcChunkDedup(docs: DataFrame, div: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(div >= 2, s"div must be >= 2: $div")
    val sh = docs.select(col("doc_id"),
        posexplode(graft.functions.Tokenize.shingles3(
          graft.functions.Tokenize.tokens(col("text")))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        graft.functions.PortableHash.tokenHash(col("col")).as("h"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val fp = Caches.tracked(sh
      .withColumn("brk",
        when(col("pos") > 0L && col("h") % lit(div) === 0L, 1L).otherwise(0L))
      .withColumn("chunk", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("chunk"))
      .agg(expr("md5(concat_ws(',', transform(array_sort(collect_list(struct(pos, h))), " +
        "x -> CAST(x.h AS STRING))))").as("f"),
        count(lit(1)).as("n_shingles"))
      .persist())
    val occ = fp.select(col("doc_id"), col("f")).distinct()
      .groupBy(col("f")).agg(count(lit(1)).as("nd"))
    fp.join(occ, "f")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("nd") > 1L, 1L).otherwise(0L)).as("n_shared_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"),
        expr("CAST((1000000 * n_shared_chunks) DIV n_chunks AS BIGINT)").as("shared_ppm"))
      .orderBy(col("doc_id"))
  }

  def cdcChunkDedupSql(div: Long): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${graft.functions.Tokenize.tokensSql("text")} AS toks FROM documents),
       |shl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) >= 3
       |           THEN [{'pos': CAST(i - 1 AS BIGINT),
       |                  'h': ${graft.functions.PortableHash.tokenHashSql(
                              "toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}}
       |                 FOR i IN range(1, len(toks) - 1)]
       |           ELSE [] END AS ss
       |  FROM toks),
       |sh AS (SELECT doc_id, unnest(ss, recursive := true) FROM shl),
       |ch AS (
       |  SELECT doc_id, pos, h,
       |         sum(CASE WHEN pos > 0 AND h % $div = 0 THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS chunk
       |  FROM sh),
       |fp AS (
       |  SELECT doc_id, chunk,
       |         md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY pos)) AS f,
       |         count(*) AS n_shingles
       |  FROM ch GROUP BY doc_id, chunk),
       |occ AS (
       |  SELECT f, count(*) AS nd
       |  FROM (SELECT DISTINCT doc_id, f FROM fp) GROUP BY f)
       |SELECT fp.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(sum(CASE WHEN occ.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
       |       CAST((1000000 * sum(CASE WHEN occ.nd > 1 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
       |         AS shared_ppm
       |FROM fp JOIN occ ON fp.f = occ.f
       |GROUP BY fp.doc_id ORDER BY fp.doc_id""".stripMargin

  def chunkOverlapSql(chunkSize: Int, stride: Int): String =
    s"""WITH ch AS (
       |  SELECT doc_id, chunk_hash FROM (${chunkDocsSql(chunkSize, stride)})),
       |occ AS (
       |  SELECT chunk_hash, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
       |SELECT c.doc_id, count(*) AS n_chunks,
       |       CAST(sum(CASE WHEN o.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
       |       round(CAST(sum(CASE WHEN o.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 6) AS shared_ratio
       |FROM ch c JOIN occ o USING (chunk_hash)
       |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin
}
