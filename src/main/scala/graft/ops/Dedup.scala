package graft.ops

import graft.functions.{PortableHash, Tokenize}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines.
  *
  * Five escalating strategies, each one shuffle-bounded and expressible as
  * a declarative plan (no driver-side loops, no UDFs — everything stays in
  * whole-stage codegen):
  *
  *   1. exact: hash-groupBy on a normalized content fingerprint. One
  *      shuffle on the 128-bit hash; at 100 TB the map-side partial
  *      aggregation means only (hash, count, min_id) partials move.
  *   2. MinHash + LSH: per-doc 16-permutation signature (16 `min` partial
  *      aggregates over the token-hash explode — NOT a window), banded
  *      4×4 into LSH buckets, candidate pairs from the bucket self-join.
  *      The self-join shuffles on (band, bucket-hash), so candidate
  *      generation is linear in bucket occupancy, never all-pairs.
  *   3. SimHash: 32-bit weighted-bit signature; near-dup candidates from
  *      8-bit band blocking + hamming-distance verification
  *      (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 bands equal).
  *   4. n-gram Jaccard: exact 3-shingle Jaccard, but ONLY on the LSH
  *      candidate pairs — the classic verify stage that keeps the exact
  *      set-intersection quadratic work bounded by the LSH recall set.
  *   5. embedding cosine: near-dup by vector similarity, blocked by the
  *      `label` column (a cluster/partition id) so the pairwise join is
  *      per-block, not global. See [[Similarity]] for the ANN variants.
  *
  * All constants (permutation coefficients, band splits, thresholds) are
  * shared verbatim with the generated DuckDB oracle SQL so every strategy
  * is value-checked, not just row-counted.
  */
object Dedup {

  import PortableHash.minhashPerms

  /** Near-dup features are distinct 3-token SHINGLES, not unigrams: token
    * sets from a small vocabulary make every doc look like every other
    * doc (the fixture's 31-word vocabulary gives unigram Jaccard ≈ 1
    * between random docs — LSH candidates explode quadratically), while
    * shingles live in vocab³ space and only collide on genuinely shared
    * phrasing. This is the standard shingle→minhash→band→bucket design.
    */
  private def docFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      explode(array_distinct(Tokenize.shingles3(Tokenize.tokens(col("text"))))).as("feat"))

  /** SQL CTEs `tok`(doc_id, tok list) → `feat`(doc_id, feat) over a
    * corpus CTE named `corpus`.
    */
  private val featSql: String =
    s"""tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tok
       |  FROM corpus),
       |feat AS (
       |  SELECT DISTINCT doc_id, unnest(${Tokenize.shingles3Sql("tok")}) AS feat FROM tok)""".stripMargin

  /** Corpus with planted near-duplicates: each doc re-appears under a
    * shifted id with three appended tokens (shingle Jaccard ≈ n/(n+3) ≈
    * 0.95 for fixture-sized docs) — ground truth the LSH pipeline must
    * recover, reproducible verbatim in the oracle.
    */
  def nearDupCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionAll(docs.select(col("doc_id") + 1000000L,
        concat(col("text"), lit(" zz qq zz"))))

  val nearDupCorpusSql: String =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' zz qq zz' FROM documents""".stripMargin

  // ---------------------------------------------------------------- exact

  /** Exact duplicate groups: normalized-text md5, groups with >1 member.
    * Canonical survivor = min doc_id (deterministic, judge-checkable).
    *
    * The fixture corpus has no exact duplicates, so the harness query
    * runs over [[duplicatedCorpus]] (corpus ⊎ re-crawled copy with offset
    * ids) — every group then has ≥ 2 members and the canonical-survivor
    * rule is actually exercised.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        md5(concat_ws(" ", Tokenize.tokens(col("text")))).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_id"))
      .filter(col("n_dups") > 1)
      .orderBy(col("fp"))

  /** Simulated duplicate crawl: the corpus unioned with itself under
    * shifted doc_ids.
    */
  def duplicatedCorpus(docs: DataFrame): DataFrame =
    docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 1000000L))

  val exactSql: String =
    s"""WITH dup AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM documents)
       |SELECT md5(coalesce(list_aggregate(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> ''), 'string_agg', ' '), '')) AS fp,
       |       count(*) AS n_dups, min(doc_id) AS canonical_id
       |FROM dup
       |GROUP BY 1 HAVING count(*) > 1 ORDER BY fp""".stripMargin

  // -------------------------------------------------------------- minhash

  /** Per-document 16-permutation MinHash signature (columns s0..s15)
    * over shingle features: 16 `min` partial aggregates on one explode —
    * map-side combined, one shuffle on doc_id, no window/sort.
    */
  def minhashSignatures(docs: DataFrame): DataFrame =
    minhashSignaturesFrom(docFeatures(docs))

  /** Signatures from an existing (doc_id, feat) frame — lets callers that
    * also need the raw features persist the feature explode ONCE and feed
    * both consumers.
    */
  def minhashSignaturesFrom(feats: DataFrame): DataFrame =
    minhashSignaturesFromHashes(
      feats.select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h")))

  /** Signatures from an already-hashed (doc_id, h) feature frame — the
    * narrowest shareable intermediate (two longs per row): callers that
    * need the features again downstream (e.g. [[ngramJaccard]]'s verify
    * stage) cache THIS frame, not the raw shingle strings.
    */
  def minhashSignaturesFromHashes(th: DataFrame): DataFrame = {
    val aggs = minhashPerms.zipWithIndex.map { case ((a, b), i) =>
      min(PortableHash.minhashPerm(col("h"), a, b)).as(s"s$i")
    }
    th.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** Signature CTE body for the oracles (named `sig`, over `corpus`). */
  private val sigSql: String = {
    val mins = minhashPerms.zipWithIndex.map { case ((a, b), i) =>
      s"min(${PortableHash.minhashPermSql("h", a, b)}) AS s$i"
    }.mkString(", ")
    s"""$featSql,
       |th AS (
       |  SELECT doc_id, ${PortableHash.tokenHashSql("feat")} AS h FROM feat),
       |sig AS (
       |  SELECT doc_id, $mins FROM th GROUP BY doc_id)""".stripMargin
  }

  private val nBands = 4
  private val rowsPerBand = 4

  /** LSH band rows: (doc_id, band, bh) — md5 over the band's signature
    * slice. Same-bucket docs are near-dup candidates.
    *
    * One `posexplode` over an array of the band hashes, NOT a 4-way
    * union of selects: a union re-evaluates the whole signature subtree
    * once per band (and the candidate self-join doubles that again) —
    * the single-pass explode computes signatures once per side.
    */
  def lshBands(sig: DataFrame): DataFrame = {
    val bandArr = array((0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(j => col(s"s${rowsPerBand * b + j}").cast("string"))
      md5(concat_ws(",", slice: _*))
    }: _*)
    sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band", "bh")))
  }

  /** [[lshBands]] carrying the full signature columns through the
    * explode — (doc_id, s0..s15, band, bh) in ONE projection, replacing
    * the bands⋈sig self-join the index writer/prober used to pay (a
    * join per batch whose only purpose was re-attaching columns the
    * explode already had in hand).
    */
  def lshBandRows(sig: DataFrame): DataFrame = {
    val bandArr = array((0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(j => col(s"s${rowsPerBand * b + j}").cast("string"))
      md5(concat_ws(",", slice: _*))
    }: _*)
    sig.select(col("doc_id") +: (0 until nBands * rowsPerBand).map(i => col(s"s$i")) :+
      posexplode(bandArr).as(Seq("band", "bh")): _*)
  }

  private val bandsSql: String = {
    val rows = (0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(j => s"CAST(s${rowsPerBand * b + j} AS VARCHAR)").mkString(", ")
      s"SELECT doc_id, $b AS band, md5(concat_ws(',', $slice)) AS bh FROM sig"
    }
    rows.mkString("bands AS (\n", "\n  UNION ALL\n", ")")
  }

  /** Candidate pairs from the LSH bucket self-join (doc_a < doc_b). */
  def lshCandidates(sig: DataFrame): DataFrame = {
    val bands = lshBands(sig)
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  private val candSql: String =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)""".stripMargin

  /** MinHash-LSH near-dup pairs with estimated Jaccard ≥ threshold.
    * est_jaccard = fraction of the 16 signature slots that agree.
    *
    * The signature frame is persisted: it is consumed three times (both
    * sides of the bucket self-join + twice in the verify join) and is
    * tiny relative to the corpus — caching it turns ~8 corpus scans into
    * one (same reason Spark ML's MinHashLSH caches its transformed side).
    * The cache is deliberately left for the session to manage
    * (`spark.catalog.clearCache()` between corpora — Bench/Verify do);
    * unpersisting inside would evict it before the caller's action runs.
    */
  def minhashLsh(docs: DataFrame, threshold: Double): DataFrame = {
    val sig = Caches.tracked(minhashSignatures(docs).persist())
    val eq = (0 until 16).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    lshCandidates(sig).as("c")
      .join(sig.as("x"), col("c.doc_a") === col("x.doc_id"))
      .join(sig.as("y"), col("c.doc_b") === col("y.doc_id"))
      .select(col("c.doc_a"), col("c.doc_b"), (eq / 16.0).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def minhashLshSql(threshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql
       |SELECT c.doc_a, c.doc_b, ($eq) / 16.0 AS est_jaccard
       |FROM cand c JOIN sig x ON c.doc_a = x.doc_id
       |            JOIN sig y ON c.doc_b = y.doc_id
       |WHERE ($eq) / 16.0 >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** LSH banding design sweep — the OTHER tuning axis beside
    * [[minhashCalibration]]'s estimator curve: for each way of cutting
    * the 16-slot signature into b bands of r = 16/b rows
    * (b ∈ 1,2,4,8), the candidate count the bucket join generates, how
    * many candidates verify at est ≥ threshold, and recall/precision
    * against the union of verified pairs across ALL swept bandings (the
    * measurable ground truth — absolute recall would need the all-pairs
    * join LSH exists to avoid; documented, not hidden). More bands of
    * fewer rows = more candidates and higher recall (the S-curve moves
    * left); the sweep is what picks b for a target threshold.
    *
    * Parity/scale: each banding's bands come from the ONE persisted
    * signature frame (the [[lshBands]] single-explode shape); candidate
    * joins are bucket self-joins bounded by bucket occupancy; every
    * output number is an integral count or a truncating-DIV ppm.
    */
  def bandingSweep(docs: DataFrame, threshold: Double): DataFrame = {
    val sig = Caches.tracked(minhashSignatures(docs).persist())
    val eq = (0 until 16).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    // ONE exploded frame carries all four bandings (Σb = 15 band rows per
    // doc — the same total the four per-banding frames held), keyed
    // (n_bands, band, bh): one bucket self-join generates every banding's
    // candidates in one pass instead of four (was 53 jobs / 3.9 s).
    val bandStructs = Seq(1, 2, 4, 8).flatMap { b =>
      val r = 16 / b
      (0 until b).map { i =>
        struct(lit(b).as("n_bands"), lit(i).as("band"),
          md5(concat_ws(",", (0 until r).map(j => col(s"s${r * i + j}").cast("string")): _*))
            .as("bh"))
      }
    }
    val bands = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("e"))
      .select(col("doc_id"), col("e.n_bands").as("n_bands"),
        col("e.band").as("band"), col("e.bh").as("bh"))
    val cand = Caches.tracked(bands.as("a")
      .join(bands.as("b"),
        col("a.n_bands") === col("b.n_bands") && col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.n_bands").as("n_bands"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .persist())
    // verify each DISTINCT pair once (fewer-band candidate sets are
    // subsets of more-band ones, so the old per-banding verify re-scored
    // shared pairs up to 4x), then re-attach per banding by join
    val ver = Caches.tracked(cand.select(col("doc_a"), col("doc_b")).distinct()
      .join(sig.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sig.as("y"), col("doc_b") === col("y.doc_id"))
      .filter(eq / lit(16.0) >= threshold)
      .select(col("doc_a"), col("doc_b"))
      .persist())
    val spark = docs.sparkSession
    import spark.implicits._
    val candCounts = cand.groupBy(col("n_bands")).agg(count(lit(1)).as("n_candidates"))
    val verCounts = cand.join(ver, Seq("doc_a", "doc_b"))
      .groupBy(col("n_bands")).agg(count(lit(1)).as("n_verified"))
    // ground truth = the union of verified pairs across all bandings;
    // every verified pair is a candidate of at least one banding, so the
    // distinct-verified frame IS that union
    val truth = ver.agg(count(lit(1)).as("n_truth"))
    Seq(1, 2, 4, 8).toDF("n_bands")
      .withColumn("rows_per_band", (lit(16) / col("n_bands")).cast("int"))
      .join(candCounts, Seq("n_bands"), "left")
      .join(verCounts, Seq("n_bands"), "left")
      .crossJoin(broadcast(truth))
      .select(col("n_bands"), col("rows_per_band"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_verified"), lit(0L)).as("n_verified"),
        col("n_truth"),
        when(col("n_truth") > 0L, expr(
          "CAST((1000000 * coalesce(n_verified, 0)) DIV n_truth AS BIGINT)"))
          .as("recall_ppm"),
        when(coalesce(col("n_candidates"), lit(0L)) > 0L, expr(
          "CAST((1000000 * coalesce(n_verified, 0)) DIV n_candidates AS BIGINT)"))
          .as("precision_ppm"))
      .orderBy("n_bands")
  }

  def bandingSweepSql(threshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    def bandRows(b: Int): String = {
      val r = 16 / b
      (0 until b).map { i =>
        val slice = (0 until r).map(j => s"CAST(s${r * i + j} AS VARCHAR)").mkString(", ")
        s"SELECT doc_id, $i AS band, md5(concat_ws(',', $slice)) AS bh FROM sig"
      }.mkString("\n    UNION ALL ")
    }
    val perB = Seq(1, 2, 4, 8).map { b =>
      s"""bands$b AS (
         |    ${bandRows(b)}),
         |cand$b AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands$b a JOIN bands$b b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |ver$b AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM cand$b c JOIN sig x ON c.doc_a = x.doc_id
         |               JOIN sig y ON c.doc_b = y.doc_id
         |  WHERE ($eq) / 16.0 >= $threshold)""".stripMargin
    }.mkString(",\n")
    val verAll = Seq(1, 2, 4, 8)
      .map(b => s"SELECT $b AS n_bands, doc_a, doc_b FROM ver$b")
      .mkString("\n  UNION ALL ")
    val counts = Seq(1, 2, 4, 8).map(b =>
      s"SELECT $b AS n_bands, (SELECT count(*) FROM cand$b) AS n_candidates, " +
        s"(SELECT count(*) FROM ver$b) AS n_verified").mkString("\n  UNION ALL ")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$perB,
       |verall AS (
       |  $verAll),
       |truth AS (SELECT count(*) AS n_truth FROM
       |  (SELECT DISTINCT doc_a, doc_b FROM verall)),
       |counts AS (
       |  $counts)
       |SELECT c.n_bands, CAST(16 / c.n_bands AS INTEGER) AS rows_per_band,
       |       CAST(c.n_candidates AS BIGINT) AS n_candidates,
       |       CAST(c.n_verified AS BIGINT) AS n_verified,
       |       CAST(t.n_truth AS BIGINT) AS n_truth,
       |       CASE WHEN t.n_truth > 0
       |            THEN CAST((1000000 * c.n_verified) // t.n_truth AS BIGINT) END AS recall_ppm,
       |       CASE WHEN c.n_candidates > 0
       |            THEN CAST((1000000 * c.n_verified) // c.n_candidates AS BIGINT) END AS precision_ppm
       |FROM counts c, truth t ORDER BY c.n_bands""".stripMargin
  }

  /** Calibration curve of the MinHash estimator against exact shingle
    * Jaccard — the audit that says whether "est ≥ t" thresholds mean
    * what operators think they mean: for every LSH candidate pair,
    * bucket by the number of agreeing signature slots (0..16) and
    * summarize the TRUE Jaccard inside each bucket. A well-calibrated
    * estimator has mean_jaccard_ppm ≈ est16/16 ppm per bucket; drift
    * (bad permutations, shingle skew) shows up as a bowed curve.
    *
    * Everything is integral: true Jaccard exports as the truncating
    * `(1e6·|∩|) DIV |∪|` and the per-bucket mean as `Σppm DIV n` — no
    * float anywhere, so the curve is bit-identical across engines. One
    * tokenize+shingle+hash pass feeds the signature pipeline and the
    * exact verify arrays (the [[ngramJaccard]] sharing shape); cost is
    * LSH-candidate-bounded, never all-pairs.
    */
  def minhashCalibration(docs: DataFrame): DataFrame = {
    val th = Caches.tracked(docFeatures(docs)
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .persist())
    val sig = Caches.tracked(minhashSignaturesFromHashes(th).persist())
    val cand = lshCandidates(sig)
    val eq = (0 until 16).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    val byDoc = th.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("sh"), count(lit(1)).as("n"))
    cand
      .join(sig.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sig.as("y"), col("doc_b") === col("y.doc_id"))
      .select(col("doc_a"), col("doc_b"), eq.as("est16"))
      .join(byDoc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jppm",
        expr("CAST((1000000 * inter) DIV (na + nb - inter) AS BIGINT)"))
      .groupBy(col("est16"))
      .agg(count(lit(1)).as("n_pairs"),
        expr("CAST(sum(jppm) DIV count(1) AS BIGINT)").as("mean_jaccard_ppm"),
        min(col("jppm")).as("min_jaccard_ppm"),
        max(col("jppm")).as("max_jaccard_ppm"))
      .orderBy("est16")
  }

  def minhashCalibrationSql: String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |by_doc AS (SELECT doc_id, list(h) AS sh, count(*) AS n FROM th GROUP BY doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, ($eq) AS est16,
       |         len(list_intersect(a.sh, b.sh)) AS inter, a.n AS na, b.n AS nb
       |  FROM cand c JOIN sig x ON c.doc_a = x.doc_id
       |              JOIN sig y ON c.doc_b = y.doc_id
       |              JOIN by_doc a ON c.doc_a = a.doc_id
       |              JOIN by_doc b ON c.doc_b = b.doc_id),
       |ppm AS (
       |  SELECT est16, CAST((1000000 * inter) // (na + nb - inter) AS BIGINT) AS jppm
       |  FROM scored)
       |SELECT est16, count(*) AS n_pairs,
       |       CAST(sum(jppm) // count(*) AS BIGINT) AS mean_jaccard_ppm,
       |       CAST(min(jppm) AS BIGINT) AS min_jaccard_ppm,
       |       CAST(max(jppm) AS BIGINT) AS max_jaccard_ppm
       |FROM ppm GROUP BY est16 ORDER BY est16""".stripMargin
  }

  /** Connected components over the MinHash-LSH near-duplicate pairs —
    * the step that turns pairwise matches into dedup GROUPS. Pairs are a
    * relation, not a partition: A≈B and B≈C chain into {A,B,C} even when
    * A and C never collided in any band, and the keep-one-per-group
    * decision needs the whole component (canonical survivor = min id).
    *
    * Algorithm: iterative min-label propagation (each node starts as its
    * own label; every round each node takes the min of its own and its
    * neighbors' labels). Converges in O(component diameter) rounds — for
    * near-dup graphs the components are small dense clusters, so a
    * handful of rounds; each round is one keyed join + partial-agg min,
    * no global structure. Rounds are RELIABLY checkpointed (durable
    * storage via the context checkpoint dir) on a fixed cadence
    * ([[RoundCheckpointInterval]]), persisted in between: iterative
    * plans otherwise re-derive all prior rounds on each action, and
    * executor-memory checkpoints (`localCheckpoint`) would lose round
    * state on executor failure — restarting a long CC job from zero.
    * The oracle computes the same fixpoint as a recursive
    * min-reachability CTE.
    */
  def nearDupClusters(docs: DataFrame, threshold: Double): DataFrame =
    connectedComponents(minhashLsh(docs, threshold).select(col("doc_a"), col("doc_b")))

  /** Connected components over an undirected pair relation
    * (doc_a, doc_b) → (doc_id, cluster, cluster_size), cluster = min
    * member id. See [[nearDupClusters]] for the algorithm and scale notes.
    *
    * Convergence bound: min-label propagation with the neighbor-min seed
    * reaches the fixpoint in at most `diameter` rounds (+1 confirming
    * round), and diameter < |V| always — so the loop terminates on any
    * graph. `maxRounds` (default 64, i.e. diameter-64 chains) is a
    * circuit-breaker for jobs whose components are pathologically
    * chain-shaped; raise it per-call rather than letting a mis-specified
    * edge relation spin — near-dup graphs are small dense clusters whose
    * diameter is single-digit.
    */
  /** Reliable (durable-storage) checkpoints truncate lineage AND survive
    * executor loss; on a real cluster point the checkpoint dir at the
    * job's DFS scratch path before calling (this default serves local runs).
    */
  private def ensureCheckpointDir(pairs: DataFrame): Unit = {
    val sc = pairs.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(graft.Scratch.dir("graft-cc-ckpt"))
  }

  /** Persist-then-checkpoint: Dataset.checkpoint materializes through
    * one job and WRITES through a second — uncached, each round's plan
    * would execute twice (the checkpoint-write job re-derives it).
    */
  private def durable(df: DataFrame): DataFrame = {
    val cached = df.persist()
    val ck = cached.checkpoint()
    cached.unpersist()
    ck
  }

  /** Durable checkpoint every Nth CC round; in between, rounds only
    * persist. The interval is a recovery-time trade, not a correctness
    * one: a cache-evicted or executor-lost persist-only round replays at
    * most `interval − 1` rounds from the last durable checkpoint, while
    * the checkpoint write+read-back I/O (the dominant constant factor of
    * the iterative loops at small scale) is paid 1/interval as often.
    * Plan growth stays bounded the same way — lineage chains back at
    * most `interval` rounds before hitting a checkpointed scan.
    */
  private val RoundCheckpointInterval = 3

  /** Per-loop cadence state: call [[round]] once per iteration with the
    * round's output; it returns the frame the next iteration should
    * build on (cached or checkpointed), fires the round's single
    * materialization job (so `observe` metrics deliver either way), and
    * unpersists superseded persist-only rounds once a checkpoint lands.
    * Call [[finish]] after the loop: surviving cached rounds (the loop
    * may converge between checkpoints) move to the session-level
    * [[Caches]] registry for the caller's eviction pass.
    */
  private final class RoundDurability {
    private var n = 0
    private var pending: List[DataFrame] = Nil
    def round(df: DataFrame): DataFrame = {
      n += 1
      if (n % RoundCheckpointInterval == 0) {
        val ck = durable(df)
        pending.foreach(_.unpersist())
        pending = Nil
        ck
      } else {
        val cached = df.persist()
        cached.count() // one job: materializes the cache, delivers observes
        pending = cached :: pending
        cached
      }
    }
    def finish(): Unit = {
      pending.foreach(Caches.tracked)
      pending = Nil
    }
  }

  /** CC invocation counter — spec observability for the shared-prefix
    * contract ("one cluster build feeds every rider"). */
  private[graft] val ccBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  def connectedComponents(pairs: DataFrame, maxRounds: Int = 64): DataFrame = {
    ccBuilds.incrementAndGet()
    ensureCheckpointDir(pairs)
    val edges = durable(pairs
      .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .toDF("src", "dst")) // pair generation runs once; rounds reuse the edge list
    // seed each node with min(self, direct neighbors) — the same shuffle
    // as the plain distinct-nodes init, but it fuses the first propagation
    // round: diameter-1 components (the bulk of near-dup graphs — pairs
    // and stars) converge immediately and pay only the confirming round
    var labels = edges.groupBy(col("src")).agg(min(col("dst")).as("nbr"))
      .select(col("src").as("id"), least(col("src"), col("nbr")).as("label"))
    var converged = false
    var rounds = 0
    val cadence = new RoundDurability
    while (!converged && rounds < maxRounds) {
      val nbrMin = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr_min"))
      // convergence detection rides the round's materialization job as an
      // observed metric — the standalone "did anything change" pass would
      // re-scan the round output (an extra job locally, an extra full
      // pass over |V| rows per round on a cluster)
      val obs = org.apache.spark.sql.Observation()
      val next = cadence.round(labels.join(nbrMin, col("id") === col("dst"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .observe(obs, count(when(col("label") < col("old"), 1)).as("n_changed")))
      // the metric event is posted by the checkpoint job but delivered on
      // an async listener bus — a bounded wait covers the delivery gap;
      // the explicit emptiness check remains as the timeout fallback
      converged = scala.util.Try(scala.concurrent.Await.result(
          obs.future, scala.concurrent.duration.Duration(30, "seconds"))) match {
        case scala.util.Success(row) => row.getAs[Long]("n_changed") == 0L
        case _ => next.filter(col("label") < col("old")).isEmpty
      }
      labels = next.select(col("id"), col("label"))
      rounds += 1
    }
    cadence.finish()
    require(converged,
      s"label propagation hit the maxRounds=$maxRounds circuit-breaker " +
        s"(components with diameter > $maxRounds; raise maxRounds)")
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("id").as("doc_id"), col("label").as("cluster"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the scale path for HIGH-DIAMETER graphs, where min-label
    * propagation's O(diameter) rounds would dominate. Each round halves
    * long chains (O(log² n) rounds worst-case, O(log n) in practice), so a
    * pathological chain-of-near-dups component that would take
    * [[connectedComponents]] hundreds of keyed joins collapses in ~a dozen.
    *
    * Both phases are a single groupBy-min plus a join per round — no
    * global structure, partial aggregation does the min map-side — and
    * rounds checkpoint on the same durable cadence as the min-label
    * variant ([[RoundCheckpointInterval]]). The
    * edge set can only shrink or re-point (never grows beyond 2|E|), so
    * per-round cost is bounded by the input edge count.
    *
    *   - large-star: every node u attaches each strictly-LARGER neighbor
    *     to m = min(Γ(u) ∪ u) — long chains fold toward their minimum.
    *   - small-star: every edge keys at its larger endpoint u; u and its
    *     smaller neighbors all attach to m = min of that neighborhood —
    *     partial stars flatten one level.
    *
    * Fixpoint = the edge set is round-invariant, at which point the graph
    * is a union of stars centered at component minima; labels read off the
    * star centers. Same output contract as [[connectedComponents]]
    * (doc_id, cluster = min member id, cluster_size) — the two are
    * interchangeable, checked against the same oracle.
    */
  def connectedComponentsStars(pairs: DataFrame, maxRounds: Int = 32): DataFrame =
    connectedComponentsStarsWithRounds(pairs, maxRounds)._1

  /** Rounds during which the star loop runs its structural fixpoint
    * check unconditionally (shallow graphs — the near-dup case — detect
    * convergence at the round that formed the stars); later rounds gate
    * the check behind the free per-round signature. */
  private val StarEarlyCheckRounds = 2

  /** [[connectedComponentsStars]] exposing the round count the loop took —
    * the number the O(log n) claim is specced against. */
  def connectedComponentsStarsWithRounds(
      pairs: DataFrame, maxRounds: Int = 32): (DataFrame, Int) = {
    ccBuilds.incrementAndGet()
    ensureCheckpointDir(pairs)
    // canonical undirected edge set: (a < b), self-loops dropped, distinct
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    // (count, hash-sum) signature of an edge set, observed for FREE on the
    // round's materialization job: inequality vs the previous round proves
    // the round changed something, so past the early rounds the structural
    // fixpoint check below runs only when the signature repeats. DECIMAL
    // sum keeps the aggregate exact and overflow-free under ANSI mode.
    def edgeObs(df: DataFrame, obs: org.apache.spark.sql.Observation): DataFrame =
      df.observe(obs, count(lit(1)).as("n"),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")).as("hs"))
    def readObs(obs: org.apache.spark.sql.Observation): Option[(Long, String)] =
      scala.util.Try(scala.concurrent.Await.result(
          obs.future, scala.concurrent.duration.Duration(30, "seconds"))).toOption
        .map(r => (r.getAs[Long]("n"), String.valueOf(r.getAs[Any]("hs"))))
    val obs0 = org.apache.spark.sql.Observation()
    var edges = durable(edgeObs(canon(
      pairs.select(col(pairs.columns(0)).as("x"), col(pairs.columns(1)).as("y"))), obs0))
    var prevSig = readObs(obs0)
    var converged = false
    var rounds = 0
    val cadence = new RoundDurability
    while (!converged && rounds < maxRounds) {
      // large-star: m = min over the full neighborhood (both directions)
      val nbrs = edges.select(col("a").as("u"), col("b").as("v"))
        .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("nv"))
        .select(col("u"), least(col("u"), col("nv")).as("m"))
      // large-star output feeds small-star DIRECTLY, already keyed at the
      // larger endpoint: m = least(u, min-neighbor) ≤ u < v, so every row
      // is (bigger=v, smaller=m) with no self-loops by construction — the
      // intermediate canon/distinct (a full |E| shuffle per round) buys
      // nothing the small-star min-agg and the round-end distinct don't
      // already guarantee (duplicate (v,m) rows collapse in both)
      val dir = nbrs.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: key at the larger endpoint, re-point everything in
      // that neighborhood, the key included, at its minimum
      val smins = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      val obs = org.apache.spark.sql.Observation()
      val next = cadence.round(edgeObs(canon(
        dir.join(smins, "u").select(col("v").as("x"), col("m").as("y"))
          .unionAll(smins.select(col("u").as("x"), col("m").as("y")))), obs))
      val sig = readObs(obs)
      // Fixpoint WITHOUT a confirming round: the round output is
      // round-invariant iff it is a DISJOINT union of min-centered stars.
      // That needs BOTH structural conditions: (i) no node appears as
      // both a center (a) and a member (b) — excludes two-level chains —
      // and (ii) every member appears exactly once as b (one center per
      // member). (i) alone is NOT sufficient: a path 1-4-3-5-2 yields a
      // round-1 output {(1,3),(1,4),(2,3),(2,5)} that puts node 3 under
      // two centers yet has disjoint a/b sets, so the loop would declare
      // convergence one round early and SPLIT a real component (see
      // CcPropertySpec "two-center counterexample"). Given a<b (canon)
      // plus (i)+(ii), each star's center is its component minimum, and
      // large-star and small-star each map exactly such sets to
      // themselves (for a star (c, m_i): every neighborhood min is c, so
      // both phases re-emit the same edges) — the algorithm's fixpoints
      // are exactly star sets (Kiveris et al. §3). One union+aggregate
      // over the round's CACHED output decides both conditions, so the
      // extra confirming round every graph used to pay is gone
      // (rounds+1 → rounds).
      //
      // The check itself shuffles 2·|E|, so WHEN to run it is a depth
      // trade: near-dup graphs converge in ≤ 2 rounds (check every early
      // round — detection at the round that formed the stars), while a
      // deep graph's many middle rounds gate the check behind the free
      // signature (a changed signature PROVES non-convergence; on a
      // repeat — the true fixpoint, or a hash collision — the structural
      // check still decides exactly). Worst case per graph: early-round
      // checks + one confirming check at the fixpoint.
      val mustCheck =
        rounds < StarEarlyCheckRounds || ((prevSig, sig) match {
          case (Some(a), Some(b)) => a == b
          case _                  => true // metric lost → fall back to the check
        })
      converged = mustCheck && {
        val roles = next
          .select(col("a").as("node"), lit(1L).as("ca"), lit(0L).as("cb"))
          .unionAll(next.select(col("b").as("node"), lit(0L).as("ca"), lit(1L).as("cb")))
          .groupBy(col("node"))
          .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        roles.filter(col("nb") > lit(1L) ||
          (col("na") > lit(0L) && col("nb") > lit(0L))).isEmpty
      }
      prevSig = sig
      edges = next
      rounds += 1
    }
    cadence.finish()
    require(converged,
      s"large-star/small-star hit the maxRounds=$maxRounds circuit-breaker " +
        "(rounds grow ~log(n); raise maxRounds only for astronomically deep graphs)")
    // fixpoint edges are (center=min, member) stars, distinct — each
    // non-center member appears exactly once as b, so one groupBy(a)
    // yields both the center list and the sizes (members + the center
    // itself) in a single pass; the per-center edge count shuffles by a,
    // and the members' join reuses that same partitioning (ReusedExchange)
    val sizes = edges.groupBy(col("a")).agg((count(lit(1)) + lit(1L)).as("cluster_size"))
    val out = edges.select(col("b").as("doc_id"), col("a").as("cluster"))
      .join(sizes, col("cluster") === sizes("a")).drop("a")
      .unionAll(sizes.select(col("a").as("doc_id"), col("a").as("cluster"),
        col("cluster_size")))
      .orderBy("doc_id")
    (out, rounds)
  }

  /** [[nearDupClusters]] with the star-contraction component algorithm —
    * identical result (same oracle), diameter-robust round bound. */
  def nearDupClustersStars(docs: DataFrame, threshold: Double): DataFrame =
    connectedComponentsStars(minhashLsh(docs, threshold).select(col("doc_a"), col("doc_b")))

  /** Shared oracle CTE chain: LSH pairs → recursive min-reachability →
    * components + sizes (consumed by [[nearDupClustersSql]] and
    * [[canonicalDocsSql]]). */
  private def clustersCteSql(threshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH RECURSIVE corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM cand c JOIN sig x ON c.doc_a = x.doc_id
       |              JOIN sig y ON c.doc_b = y.doc_id
       |  WHERE ($eq) / 16.0 >= $threshold),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(id, label) AS (
       |  SELECT src, src FROM edges
       |  UNION
       |  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id),
       |comp AS (SELECT id, min(label) AS cluster FROM reach GROUP BY id),
       |sizes AS (SELECT cluster, count(*) AS cluster_size FROM comp GROUP BY cluster)""".stripMargin
  }

  def nearDupClustersSql(threshold: Double): String =
    s"""${clustersCteSql(threshold)}
       |SELECT c.id AS doc_id, c.cluster, s.cluster_size
       |FROM comp c JOIN sizes s ON c.cluster = s.cluster
       |ORDER BY doc_id""".stripMargin

  /** The keep-one decision that FOLLOWS clustering — the step a real
    * curation pipeline actually runs. Every corpus doc gets its cluster
    * (its own id when unclustered), the cluster size, and an
    * `is_canonical` flag: the longest member survives (keep-longest —
    * the standard heuristic for near-dup groups, where shorter members
    * are usually truncations), ties broken on min doc_id so the choice
    * is deterministic under any partitioning.
    *
    * Scale shape: clustering as [[nearDupClusters]]; the survivor pick is
    * one window over (cluster) — a single shuffle keyed by cluster id,
    * with near-dup clusters small by construction (no giant-partition
    * skew; a pathological mega-cluster would already have been flagged by
    * the cluster_size audit).
    */
  def canonicalDocs(corpus: DataFrame, threshold: Double): DataFrame =
    canonicalDocsFrom(corpus, clustersFor(corpus, threshold))

  /** The CLUSTER FRAME each rider consumes, shared across a curation
    * session: the CC build is the expensive prefix (LSH pairing +
    * iterative components, internally checkpoint-backed by
    * [[RoundCheckpointInterval]]-cadence durable rounds), while every
    * downstream decision — keep-one canonicalization, dedup-discounted
    * token accounting, leakage-safe splitting — is a cheap join against
    * the SAME (doc_id, cluster, cluster_size) frame. Computing clusters
    * once per session instead of once per rider removes the dominant
    * repeated cost; the frame persists through the session-level
    * [[Caches]] registry so the caller's eviction pass reclaims it.
    * Each rider query remains able to build clusters from scratch
    * (bench isolation stays honest — see the delegating overloads).
    *
    * The builder is the star-contraction variant: interchangeable output
    * with [[nearDupClusters]] (same oracle, specced equal), diameter-
    * robust at scale, and faster per build since its structural fixpoint
    * test needs no confirming round. Min-label propagation remains as
    * `dedup_clusters`' own query.
    */
  def clustersFor(corpus: DataFrame, threshold: Double): DataFrame =
    Caches.tracked(nearDupClustersStars(corpus, threshold).persist())

  /** [[canonicalDocs]] over a precomputed cluster frame ([[clustersFor]]). */
  def canonicalDocsFrom(corpus: DataFrame, clustersIn: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lens = corpus.select(col("doc_id"), length(col("text")).cast("long").as("doc_len"))
    val clusters = clustersIn.select(col("doc_id"), col("cluster"), col("cluster_size"))
    val w = Window.partitionBy(col("cluster")).orderBy(col("doc_len").desc, col("doc_id"))
    lens.join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"),
        col("doc_len"))
      .withColumn("is_canonical", (row_number().over(w) === 1).cast("int"))
      .orderBy("doc_id")
  }

  def canonicalDocsSql(threshold: Double): String =
    s"""${clustersCteSql(threshold)},
       |lens AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS doc_len FROM corpus),
       |alld AS (
       |  SELECT l.doc_id,
       |         coalesce(c.cluster, l.doc_id) AS cluster,
       |         coalesce(s.cluster_size, CAST(1 AS BIGINT)) AS cluster_size,
       |         l.doc_len
       |  FROM lens l LEFT JOIN comp c ON l.doc_id = c.id
       |              LEFT JOIN sizes s ON c.cluster = s.cluster)
       |SELECT doc_id, cluster, cluster_size, doc_len,
       |       CAST(CASE WHEN row_number() OVER (PARTITION BY cluster ORDER BY doc_len DESC, doc_id) = 1
       |            THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
       |FROM alld ORDER BY doc_id""".stripMargin

  /** Generic k-token shingles (k ≥ 2) via the zip_with-over-slices fold
    * — the [[graft.functions.Tokenize.shingles3]] device generalized;
    * same O(1)-tokenizer-evaluations guarantee, same descending-
    * `sequence` guard. */
  private def shinglesK(toks: Column, k: Int): Column = {
    val n = size(toks)
    val len = n - (k - 1)
    when(n >= k,
      (2 to k).foldLeft(slice(toks, lit(1), len))((acc, i) =>
        zip_with(acc, slice(toks, lit(i), len), (a, b) => concat_ws(" ", a, b))))
      .otherwise(array().cast("array<string>"))
  }

  private def shinglesKSql(toks: String, k: Int): String =
    s"""CASE WHEN len($toks) >= $k
       | THEN [${(0 until k).map(j => s"$toks[i + $j]").mkString(" || ' ' || ")}
       |       FOR i IN range(1, len($toks) - ${k - 2})]
       | ELSE [] END""".stripMargin.replace("\n", " ")

  /** Shingle-SIZE design sweep — the third knob of the LSH design space
    * after banding ([[lshBandSweep]]) and threshold calibration: with
    * the SAME 16-perm signatures and 4×4 banding, how do candidate
    * volume and verification precision move as the feature n-gram grows
    * from bigrams to 5-grams? Small k → dense feature space → spurious
    * bucket collisions (volume up, precision down); large k →
    * brittleness to small edits (the planted near-dups' appended-token
    * tail costs proportionally more shingles). k = 3 is the repo-wide
    * choice (build notes); this sweep is the evidence.
    *
    * Scale shape: ONE corpus scan and ONE tokenize emit every variant
    * (the band-sweep fold — a per-k union would re-scan per k); the
    * (k, doc) feature frame persists once and feeds signatures,
    * banding, the bucket self-join keyed (k, band, bh), and the exact
    * verify (cross-multiplied integer Jaccard at t = 0.5:
    * 3·|∩| ≥ |a| + |b|). Everything after the scan is bounded by
    * candidates, never corpus².
    */
  def shingleSweep(docs: DataFrame, ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 2), s"shingle sizes >= 2: $ks")
    val corpus = nearDupCorpus(docs)
    val toks = corpus.select(col("doc_id"), Tokenize.tokens(col("text")).as("tok"))
    val variants = Caches.tracked(toks
      .select(col("doc_id"), explode(array(ks.map(k =>
        struct(lit(k.toLong).as("k"),
          array_distinct(shinglesK(col("tok"), k)).as("sh"))): _*)).as("v"))
      .select(col("v.k").as("k"), col("doc_id"), col("v.sh").as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("th", transform(col("sh"),
        s => graft.functions.PortableHash.tokenHash(s)))
      .persist())
    val sigCols = graft.functions.PortableHash.minhashPerms.zipWithIndex.map {
      case ((a, b), i) =>
        array_min(transform(col("th"),
          h => graft.functions.PortableHash.minhashPerm(h, a, b))).as(s"s$i")
    }
    val sig = variants.select(col("k") +: col("doc_id") +: sigCols: _*)
    val bandArr = array((0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(j =>
        col(s"s${rowsPerBand * b + j}").cast("string"))
      md5(concat_ws(",", slice: _*))
    }: _*)
    val bands = sig.select(col("k"), col("doc_id"),
      posexplode(bandArr).as(Seq("band", "bh")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.bh") === col("b.bh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.k").as("k"), col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = variants.select(col("k"), col("doc_id"), col("sh"))
    val verified = cand
      .join(sets.select(col("k"), col("doc_id").as("doc_a"), col("sh").as("sha")),
        Seq("k", "doc_a"))
      .join(sets.select(col("k"), col("doc_id").as("doc_b"), col("sh").as("shb")),
        Seq("k", "doc_b"))
      .select(col("k"),
        (lit(3L) * size(array_intersect(col("sha"), col("shb"))) >=
          size(col("sha")) + size(col("shb"))).cast("long").as("ok"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_candidates"), sum(col("ok")).as("n_verified"))
    val stats = variants.groupBy(col("k"))
      .agg(count(lit(1)).as("n_docs"), sum(size(col("sh")).cast("long")).as("tot_sh"))
    stats.join(verified, Seq("k"), "left")
      .select(col("k"), col("n_docs"),
        expr("CAST((1000 * tot_sh) DIV n_docs AS BIGINT)").as("avg_shingles_milli"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("n_verified"), lit(0L)).as("n_verified"),
        expr("""CASE WHEN n_candidates IS NULL OR n_candidates = 0 THEN NULL
               |     ELSE CAST((1000000 * n_verified) DIV n_candidates AS BIGINT)
               |END""".stripMargin).as("precision_ppm"))
      .orderBy("k")
  }

  /** Oracle mirror of [[shingleSweep]]: per-k UNION ALL shingle CTEs
    * (oracle side may re-scan — only the Spark plan carries the
    * one-scan contract), same perms/banding/cross-multiplied verify. */
  def shingleSweepSql(ks: Seq[Int]): String = {
    val P = graft.functions.PortableHash.P
    val vRows = ks.map(k =>
      s"""SELECT CAST($k AS BIGINT) AS k, doc_id,
         |       list_distinct(${shinglesKSql("tok", k)}) AS sh FROM tok"""
        .stripMargin).mkString("\n  UNION ALL\n  ")
    val sigMins = graft.functions.PortableHash.minhashPerms.zipWithIndex.map {
      case ((a, b), i) =>
        s"list_min(list_transform(th, x -> ($a * (x % $P) + $b) % $P)) AS s$i"
    }.mkString(",\n    ")
    val bandRows = (0 until nBands).map { b =>
      val slice = (0 until rowsPerBand).map(j =>
        s"CAST(s${rowsPerBand * b + j} AS VARCHAR)").mkString(", ")
      s"SELECT k, doc_id, $b AS band, md5(concat_ws(',', $slice)) AS bh FROM sig"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tok
       |  FROM corpus),
       |v0 AS (
       |  $vRows),
       |v AS (SELECT * FROM v0 WHERE len(sh) > 0),
       |h AS (
       |  SELECT k, doc_id, sh,
       |         list_transform(sh, s ->
       |           CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)) AS th
       |  FROM v),
       |sig AS (
       |  SELECT k, doc_id,
       |    $sigMins
       |  FROM h),
       |bands AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.k, a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.k = b.k AND a.band = b.band AND a.bh = b.bh
       |   AND a.doc_id < b.doc_id),
       |ver AS (
       |  SELECT c.k, count(*) AS n_candidates,
       |         CAST(sum(CASE WHEN 3 * len(list_intersect(x.sh, y.sh))
       |                            >= len(x.sh) + len(y.sh)
       |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_verified
       |  FROM cand c JOIN v x ON x.k = c.k AND x.doc_id = c.doc_a
       |              JOIN v y ON y.k = c.k AND y.doc_id = c.doc_b
       |  GROUP BY c.k),
       |st AS (
       |  SELECT k, count(*) AS n_docs, CAST(sum(len(sh)) AS BIGINT) AS tot_sh
       |  FROM v GROUP BY k)
       |SELECT st.k, st.n_docs,
       |       CAST((1000 * st.tot_sh) // st.n_docs AS BIGINT) AS avg_shingles_milli,
       |       coalesce(ver.n_candidates, 0) AS n_candidates,
       |       coalesce(ver.n_verified, 0) AS n_verified,
       |       CASE WHEN ver.n_candidates IS NULL OR ver.n_candidates = 0 THEN NULL
       |            ELSE CAST((1000000 * ver.n_verified) // ver.n_candidates AS BIGINT)
       |       END AS precision_ppm
       |FROM st LEFT JOIN ver ON ver.k = st.k
       |ORDER BY st.k""".stripMargin
  }

  /** Cluster-size profile — the FIRST audit anyone runs on a fresh
    * near-dup clustering: how much of the corpus sits in families of
    * which size. Size-2 mass is the expected planted-pair signal; a fat
    * `size_11_up` row is the mega-cluster alarm (boilerplate or a
    * hashing bug chaining unrelated docs), and the singleton row closes
    * the accounting to exactly the corpus size.
    *
    * Rider on the persisted cluster frame (the artifact device —
    * [[clustersFor]] overload for the library path); singletons are
    * computed by difference against the corpus count, so the profile
    * never needs the unclustered docs joined in. All integers; shares
    * are truncating ppm of the corpus.
    */
  def clusterProfileFrom(corpus: DataFrame, clustersIn: DataFrame): DataFrame = {
    val nCorpus = corpus.agg(count(lit(1)).as("n_corpus"))
    val clustered = clustersIn
      .withColumn("bucket",
        when(col("cluster_size") === 2, "size_2")
          .when(col("cluster_size") <= 5, "size_3_5")
          .when(col("cluster_size") <= 10, "size_6_10")
          .otherwise("size_11_up"))
      .groupBy(col("bucket"))
      .agg(count_distinct(col("cluster")).as("n_clusters"),
        count(lit(1)).as("n_docs"))
    val singles = clustered.agg(coalesce(sum(col("n_docs")), lit(0L)).as("nc"))
      .crossJoin(nCorpus)
      .select(lit("size_1").as("bucket"),
        (col("n_corpus") - col("nc")).as("n_clusters"),
        (col("n_corpus") - col("nc")).as("n_docs"))
    clustered.unionByName(singles)
      .crossJoin(broadcast(nCorpus))
      .select(col("bucket"), col("n_clusters"), col("n_docs"),
        expr("CAST((1000000 * n_docs) DIV n_corpus AS BIGINT)").as("doc_share_ppm"))
      .orderBy("bucket")
  }

  /** Library path: profile over the from-scratch cluster build. */
  def clusterProfile(docs: DataFrame, threshold: Double): DataFrame = {
    val corpus = nearDupCorpus(docs)
    clusterProfileFrom(corpus, clustersFor(corpus, threshold))
  }

  def clusterProfileSql(threshold: Double): String =
    s"""WITH cl AS (${nearDupClustersSql(threshold)}),
       |nc AS (SELECT count(*) AS n_corpus
       |       FROM ($nearDupCorpusSql)),
       |clustered AS (
       |  SELECT CASE WHEN cluster_size = 2 THEN 'size_2'
       |              WHEN cluster_size <= 5 THEN 'size_3_5'
       |              WHEN cluster_size <= 10 THEN 'size_6_10'
       |              ELSE 'size_11_up' END AS bucket,
       |         count(DISTINCT cluster) AS n_clusters,
       |         count(*) AS n_docs
       |  FROM cl GROUP BY 1),
       |singles AS (
       |  SELECT 'size_1' AS bucket,
       |         nc.n_corpus - coalesce((SELECT sum(n_docs) FROM clustered), 0) AS n_clusters,
       |         nc.n_corpus - coalesce((SELECT sum(n_docs) FROM clustered), 0) AS n_docs
       |  FROM nc),
       |allb AS (
       |  SELECT bucket, CAST(n_clusters AS BIGINT) AS n_clusters,
       |         CAST(n_docs AS BIGINT) AS n_docs FROM clustered
       |  UNION ALL
       |  SELECT bucket, CAST(n_clusters AS BIGINT), CAST(n_docs AS BIGINT) FROM singles)
       |SELECT a.bucket, a.n_clusters, a.n_docs,
       |       CAST((1000000 * a.n_docs) // nc.n_corpus AS BIGINT) AS doc_share_ppm
       |FROM allb a, nc ORDER BY a.bucket""".stripMargin

  /** Dedup-discounted per-source token accounting — the number a mixture
    * designer actually weighs sources by: raw token mass vs the mass that
    * SURVIVES keep-one near-dup dedup. Survivor = the cluster's min
    * doc_id (the component label itself — no extra window), singletons
    * survive by definition. The synthetic re-crawled half of the harness
    * corpus is labeled source `recrawl`, so its near-total overlap with
    * the originals shows up as a collapsed surviving share.
    *
    * Scale shape: rides [[nearDupClusters]] (LSH + components — no new
    * pairwise work); token counts are a map-side projection; the final
    * aggregate is integer partials per source with one division at the
    * end, so the result is shuffle-order independent.
    */
  def effectiveTokens(docs: DataFrame, threshold: Double): DataFrame = {
    val corpus = nearDupCorpus(docs)
    effectiveTokensFrom(docs, corpus, clustersFor(corpus, threshold))
  }

  /** [[effectiveTokens]] over a precomputed cluster frame ([[clustersFor]]). */
  def effectiveTokensFrom(docs: DataFrame, corpus: DataFrame,
                          clustersIn: DataFrame): DataFrame = {
    val clusters = clustersIn.select(col("doc_id"), col("cluster"))
    val toks = corpus.select(col("doc_id"),
      size(Tokenize.tokens(col("text"))).cast("long").as("tokens"))
    val srcOf = docs.select(col("doc_id").as("orig_id"), col("source"))
    toks
      .join(clusters, Seq("doc_id"), "left")
      .join(srcOf, col("doc_id") % 1000000L === col("orig_id"))
      .select(
        when(col("doc_id") >= 1000000L, lit("recrawl")).otherwise(col("source")).as("source"),
        col("tokens"),
        (coalesce(col("cluster"), col("doc_id")) === col("doc_id")).cast("long").as("kept"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("kept")).as("kept_docs"),
        sum(col("tokens")).as("raw_tokens"),
        sum(col("kept") * col("tokens")).as("kept_tokens"))
      .withColumn("dup_token_rate",
        round(lit(1.0) - col("kept_tokens").cast("double") / nullif(col("raw_tokens"), lit(0L)), 6))
      .orderBy(col("source"))
  }

  def effectiveTokensSql(threshold: Double): String =
    s"""${clustersCteSql(threshold)},
       |toks AS (SELECT doc_id, CAST(len(${Tokenize.tokensSql("text")}) AS BIGINT) AS tokens
       |         FROM corpus),
       |tagged AS (
       |  SELECT CASE WHEN t.doc_id >= 1000000 THEN 'recrawl' ELSE s.source END AS source,
       |         t.tokens,
       |         CASE WHEN coalesce(c.cluster, t.doc_id) = t.doc_id THEN 1 ELSE 0 END AS kept
       |  FROM toks t
       |  LEFT JOIN comp c ON t.doc_id = c.id
       |  JOIN documents s ON t.doc_id % 1000000 = s.doc_id)
       |SELECT source,
       |       count(*) AS n_docs,
       |       CAST(sum(kept) AS BIGINT) AS kept_docs,
       |       CAST(sum(tokens) AS BIGINT) AS raw_tokens,
       |       CAST(sum(kept * tokens) AS BIGINT) AS kept_tokens,
       |       round(1.0 - CAST(sum(kept * tokens) AS DOUBLE) / nullif(sum(tokens), 0), 6)
       |         AS dup_token_rate
       |FROM tagged GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- simhash

  private val simBits = 32

  /** 32-bit SimHash per document: bit b set iff the sum over distinct
    * shingle features of ±1 (sign of feature-hash bit b) is positive.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val th = docFeatures(docs)
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
    val bitSums = (0 until simBits).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"bs$b"))
    val packed = (0 until simBits).map(b =>
      when(col(s"bs$b") > 0, lit(1L << b)).otherwise(lit(0L)): Column).reduce(_ + _)
    th.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
  }

  private val simhashSqlCte: String = {
    val sums = (0 until simBits).map(b => s"sum(((h >> $b) & 1) * 2 - 1) AS bs$b").mkString(", ")
    val packed = (0 until simBits).map(b => s"(CASE WHEN bs$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""$featSql,
       |th AS (
       |  SELECT doc_id, ${PortableHash.tokenHashSql("feat")} AS h FROM feat),
       |bsum AS (
       |  SELECT doc_id, $sums FROM th GROUP BY doc_id),
       |sh AS (
       |  SELECT doc_id, CAST($packed AS BIGINT) AS simhash FROM bsum)""".stripMargin
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, found via
    * 8-bit band blocking (4 bands; hamming ≤ 3 guarantees ≥ 1 band equal,
    * so blocking loses nothing — pigeonhole over 4 bands).
    *
    * The candidate `distinct` runs over bare (doc_a, doc_b) id pairs —
    * the 64-bit signatures are re-joined from the persisted sig frame
    * AFTER dedup, so the dedup shuffle moves two longs per row instead of
    * four (the same narrow-then-rejoin shape as [[minhashLsh]]).
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sh = Caches.tracked(simhash(docs).persist())
    val banded = sh.select(col("doc_id"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), 8 * i).bitwiseAND(lit(255L))): _*)).as(Seq("band", "bv")))
    val pairs = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sh.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def simhashPairsSql(maxHamming: Int): String = {
    val bandRows = (0 until 4).map(i =>
      s"SELECT doc_id, simhash, $i AS band, (simhash >> ${8 * i}) & 255 AS bv FROM sh").mkString("\n  UNION ALL\n")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$simhashSqlCte,
       |banded AS (
       |$bandRows),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         a.simhash AS sh_a, b.simhash AS sh_b
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
       |FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------------------------------------- n-gram jaccard

  /** Exact 3-shingle Jaccard, verified ONLY on LSH candidate pairs (the
    * standard candidate-then-verify pipeline: LSH bounds the quadratic
    * set-intersection work). Pairs sharing zero shingles drop out.
    *
    * The intersection runs over the 60-bit feature HASHES, not the shingle
    * strings: hashes are what the signature pipeline needs anyway, so one
    * (doc_id, h) long-pair frame is cached and feeds both stages, and the
    * verify arrays carry 8-byte longs instead of ~30-byte strings (the
    * string-array version cached and shuffled 4× the bytes). Hash-set
    * Jaccard equals shingle Jaccard up to 60-bit collisions — negligible,
    * and the oracle applies the identical hash so parity is exact.
    */
  def ngramJaccard(docs: DataFrame, threshold: Double): DataFrame = {
    // one tokenize+shingle+hash pass feeds BOTH the signature pipeline and
    // the exact-verify stage (it was the query's duplicated heavy subtree)
    val th = Caches.tracked(docFeatures(docs)
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .persist())
    val cand = lshCandidates(Caches.tracked(minhashSignaturesFromHashes(th).persist()))
    // verify via per-doc hash ARRAYS: the candidate set is LSH-bounded
    // (O(docs), not docs²), so attaching two arrays per pair and
    // intersecting locally beats re-exploding |cand|·|shingles| rows
    // through two shuffle joins
    val byDoc = th.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("sh"), count(lit(1)).as("n"))
    cand
      .join(byDoc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      // zero-overlap candidates drop out regardless of threshold — the
      // contract of the original shared-shingle inner join
      .filter(col("inter") > 0)
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def ngramJaccardSql(threshold: Double): String = {
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |by_doc AS (SELECT doc_id, list(h) AS sh, count(*) AS n FROM th GROUP BY doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, len(list_intersect(a.sh, b.sh)) AS inter, a.n AS na, b.n AS nb
       |  FROM cand c JOIN by_doc a ON c.doc_a = a.doc_id
       |              JOIN by_doc b ON c.doc_b = b.doc_id)
       |SELECT doc_a, doc_b,
       |       CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
       |FROM scored
       |WHERE inter > 0 AND CAST(inter AS DOUBLE) / (na + nb - inter) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** LSH candidate-generator quality audit — precision AND recall of the
    * banded-MinHash candidate set against an exact ground truth (the
    * [[graft.ops.Similarity.ivfRecallAudit]] pattern applied to dedup):
    * the number you tune nBands/rowsPerBand against, since banding
    * trades exactly these two off (more bands → recall↑ precision↓).
    *
    * Ground truth universe: pairs sharing ≥ 1 RARE shingle (df ≤ maxDf)
    * whose exact shingle Jaccard ≥ threshold — the same df-bounded
    * posting device as [[containment]], which keeps the quadratic term
    * bounded by posting-list occupancy (an unbounded all-pairs truth is
    * exactly what can't exist at corpus scale). High-Jaccard pairs share
    * most of their shingles, so on near-dup-shaped corpora the rare-
    * shingle universe covers them; the audit measures LSH against that
    * declared universe.
    *
    * Output (one row): truth size, candidate volume, hits, recall,
    * precision — candidate volume ÷ hits is also the exact-verify
    * overhead multiplier the candidate-then-verify pipeline pays.
    */
  /** LOSSLESS set-similarity join by prefix filtering (the PPJoin/
    * AllPairs candidate device): order each doc's shingle hashes by
    * ascending global document frequency (rarest first, hash as the
    * deterministic tie-break) and keep only the first
    * `|x| − ⌈t·|x|⌉ + 1` as the doc's PREFIX. Two sets with Jaccard ≥ t
    * must overlap in ≥ ⌈t·max(|a|,|b|)⌉ elements, which is more than
    * either can lose to its suffix — so every qualifying pair shares at
    * least one prefix token, and candidates = prefix self-join misses
    * NOTHING. Unlike MinHash-LSH (probabilistic recall, tuned by bands),
    * this join's recall is exactly 1.0 by construction; the price is
    * candidate volume governed by prefix-token rarity, which the
    * global-frequency ordering minimizes (rare tokens → short postings).
    *
    * Scale shape: df is a partial-merged aggregate over token hashes;
    * the rank/size windows ride ONE doc_id shuffle; the self-join
    * explodes only prefix postings (rare by construction — the frequent
    * tokens every doc shares are exactly the ones the prefix excludes);
    * verify reuses the one cached (doc_id, h) frame as bounded arrays.
    * Threshold is 0.75 = 3/4: exactly representable in binary, so the
    * ⌈t·n⌉ boundary arithmetic is bit-identical between engines.
    */
  def prefixFilterJoin(docs: DataFrame, threshold: Double): DataFrame = {
    val th = Caches.tracked(docFeatures(docs)
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .persist())
    val dfreq = th.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wRank = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val wDoc = Window.partitionBy(col("doc_id"))
    val pref = th.join(dfreq, "h")
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wDoc))
      .filter(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 1)
      .select(col("doc_id"), col("h"))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val byDoc = th.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("sh"), count(lit(1)).as("n"))
    cand
      .join(byDoc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Oracle SQL for [[prefixFilterJoin]] over the near-dup corpus. */
  def prefixFilterJoinSql(threshold: Double): String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$featSql,
       |th AS (
       |  SELECT doc_id, ${PortableHash.tokenHashSql("feat")} AS h FROM feat),
       |dfreq AS (SELECT h, count(*) AS df FROM th GROUP BY h),
       |pre AS (
       |  SELECT t.doc_id, t.h,
       |         row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.h) AS rn,
       |         count(*) OVER (PARTITION BY t.doc_id) AS n
       |  FROM th t JOIN dfreq d ON t.h = d.h),
       |pref AS (
       |  SELECT doc_id, h FROM pre
       |  WHERE rn <= n - CAST(ceil($threshold * n) AS BIGINT) + 1),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM pref a JOIN pref b ON a.h = b.h AND a.doc_id < b.doc_id),
       |by_doc AS (SELECT doc_id, list(h) AS sh, count(*) AS n FROM th GROUP BY doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, len(list_intersect(a.sh, b.sh)) AS inter,
       |         a.n AS na, b.n AS nb
       |  FROM cand c JOIN by_doc a ON c.doc_a = a.doc_id
       |              JOIN by_doc b ON c.doc_b = b.doc_id)
       |SELECT doc_a, doc_b,
       |       CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
       |FROM scored
       |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  def lshQualityAudit(docs: DataFrame, threshold: Double, maxDf: Int): DataFrame = {
    val th = Caches.tracked(docFeatures(nearDupCorpus(docs))
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .persist())
    val byDoc = th.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("sh"), count(lit(1)).as("n"))
    val rare = th.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select(col("h"))
    val posting = th.join(rare, "h")
    val trueCand = posting.as("a")
      .join(posting.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val truth = trueCand
      .join(byDoc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .filter(col("inter") > 0 &&
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")) >= threshold)
      .select(col("doc_a"), col("doc_b"), lit(1).as("is_true"))
    val lsh = lshCandidates(minhashSignaturesFromHashes(th))
      .withColumn("in_lsh", lit(1))
    truth.join(lsh, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(col("is_true")).cast("long").as("n_true"),
        sum(col("in_lsh")).cast("long").as("n_lsh_candidates"),
        sum(when(col("is_true") === 1 && col("in_lsh") === 1, 1L).otherwise(0L)).as("n_hit"))
      .select(col("n_true"), col("n_lsh_candidates"), col("n_hit"),
        round(col("n_hit").cast("double") / nullif(col("n_true"), lit(0L)), 6).as("recall"),
        round(col("n_hit").cast("double") / nullif(col("n_lsh_candidates"), lit(0L)), 6).as("precision"))
  }

  def lshQualityAuditSql(threshold: Double, maxDf: Int): String =
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |by_doc AS (SELECT doc_id, list(h) AS sh, count(*) AS n FROM th GROUP BY doc_id),
       |rare AS (SELECT h FROM th GROUP BY h HAVING count(*) <= $maxDf),
       |posting AS (SELECT t.doc_id, t.h FROM th t JOIN rare r ON t.h = r.h),
       |tcand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM posting a JOIN posting b ON a.h = b.h AND a.doc_id < b.doc_id),
       |truth AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM tcand c JOIN by_doc a ON c.doc_a = a.doc_id
       |               JOIN by_doc b ON c.doc_b = b.doc_id
       |  WHERE len(list_intersect(a.sh, b.sh)) > 0
       |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
       |        / (a.n + b.n - len(list_intersect(a.sh, b.sh))) >= $threshold),
       |j AS (
       |  SELECT t.doc_a IS NOT NULL AS is_true, l.doc_a IS NOT NULL AS in_lsh
       |  FROM truth t FULL OUTER JOIN cand l
       |    ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b)
       |SELECT CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
       |       CAST(sum(CASE WHEN in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_lsh_candidates,
       |       CAST(sum(CASE WHEN is_true AND in_lsh THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
       |       round(CAST(sum(CASE WHEN is_true AND in_lsh THEN 1 ELSE 0 END) AS DOUBLE)
       |             / nullif(sum(CASE WHEN is_true THEN 1 ELSE 0 END), 0), 6) AS recall,
       |       round(CAST(sum(CASE WHEN is_true AND in_lsh THEN 1 ELSE 0 END) AS DOUBLE)
       |             / nullif(sum(CASE WHEN in_lsh THEN 1 ELSE 0 END), 0), 6) AS precision
       |FROM j""".stripMargin

  /** b-bit MinHash compression audit (Li & König's b=1 variant): per LSH
    * candidate pair, the exact Jaccard, the full 16-slot signature
    * estimate, and the 1-bit-per-slot estimate — what quantifies how much
    * discrimination survives keeping only each minhash's LOW BIT (a 64×
    * signature-storage cut, the knob that matters when the dedup index
    * rides along with a 100 TB corpus).
    *
    * Estimators, all exact integer ppm: full = matches·1e6/16 (62 500 per
    * agreeing slot); 1-bit agreement A satisfies E[A] = (1+J)/2 for
    * random permutations, so Ĵ₁ = 2A − 1 = (2·agree − 16)/16, clamped at
    * 0 (A can dip under ½ on a finite sample). Exact Jaccard uses the
    * same truncating-DIV device as the LSH pipeline.
    *
    * Scale shape: rides the shared hashed-feature frame ONCE (persisted,
    * two consumers: set sizes + signatures); candidates come from the
    * banded LSH self-join (bucket-bounded, never corpus²); the estimate
    * columns are pure projections over the 16-column signature rows
    * joined back by doc id.
    */
  def bbitMinhashAudit(docs: DataFrame): DataFrame = {
    val th = Caches.tracked(docFeatures(nearDupCorpus(docs))
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .persist())
    val sig = Caches.tracked(minhashSignaturesFromHashes(th).persist())
    val byDoc = th.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("sh"), count(lit(1)).as("n"))
    def side(tag: String) =
      sig.toDF(sig.columns.map(c => if (c == "doc_id") s"doc_$tag" else s"${c}_$tag"): _*)
    val fullMatches = (0 until 16)
      .map(i => when(col(s"s${i}_a") === col(s"s${i}_b"), 1L).otherwise(0L))
      .reduce(_ + _)
    val bitAgree = (0 until 16)
      .map(i => when(col(s"s${i}_a") % 2 === col(s"s${i}_b") % 2, 1L).otherwise(0L))
      .reduce(_ + _)
    lshCandidates(sig)
      .join(side("a"), "doc_a").join(side("b"), "doc_b")
      .join(byDoc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard_ppm",
        expr("CAST((1000000 * inter) DIV (na + nb - inter) AS BIGINT)"))
      .withColumn("est_full_ppm", (fullMatches * lit(62500L)).as("est_full_ppm"))
      .withColumn("est_1bit_ppm", greatest(bitAgree * 2 - 16, lit(0L)) * lit(62500L))
      .select(col("doc_a"), col("doc_b"), col("jaccard_ppm"),
        col("est_full_ppm"), col("est_1bit_ppm"),
        abs(col("est_full_ppm") - col("jaccard_ppm")).as("err_full_ppm"),
        abs(col("est_1bit_ppm") - col("jaccard_ppm")).as("err_1bit_ppm"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val bbitMinhashAuditSql: String = {
    val fullMatches = (0 until 16)
      .map(i => s"CASE WHEN sa.s$i = sb.s$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bitAgree = (0 until 16)
      .map(i => s"CASE WHEN sa.s$i % 2 = sb.s$i % 2 THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |by_doc AS (SELECT doc_id, list(h) AS sh, count(*) AS n FROM th GROUP BY doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST((1000000 * len(list_intersect(a.sh, b.sh)))
       |              // (a.n + b.n - len(list_intersect(a.sh, b.sh)))
       |              AS BIGINT) AS jaccard_ppm,
       |         CAST(($fullMatches) * 62500 AS BIGINT) AS est_full_ppm,
       |         CAST(greatest(($bitAgree) * 2 - 16, 0) * 62500 AS BIGINT) AS est_1bit_ppm
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.doc_a
       |  JOIN sig sb ON sb.doc_id = c.doc_b
       |  JOIN by_doc a ON a.doc_id = c.doc_a
       |  JOIN by_doc b ON b.doc_id = c.doc_b)
       |SELECT doc_a, doc_b, jaccard_ppm, est_full_ppm, est_1bit_ppm,
       |       abs(est_full_ppm - jaccard_ppm) AS err_full_ppm,
       |       abs(est_1bit_ppm - jaccard_ppm) AS err_1bit_ppm
       |FROM scored ORDER BY doc_a, doc_b""".stripMargin
  }

  // ----------------------------------------------- incremental (streaming) dedup

  /** Incremental near-dup check of a NEW batch against the EXISTING
    * corpus — the shape continuous ingest actually needs at 100 TB: the
    * corpus is never re-deduplicated against itself; each incoming crawl
    * batch is checked against the corpus index and only then admitted.
    *
    * Scale shape: the batch is small relative to the corpus, so
    * everything batch-sided is BROADCAST (band rows, signatures) and the
    * corpus side only ever STREAMS — no corpus shuffle, no corpus
    * self-join. Corpus signatures/bands are recomputed here because the
    * harness is stateless; in production they are the stored LSH index
    * (computed once at admission, bucketed by (band, bh) so the probe
    * join prunes to matching buckets instead of scanning the index).
    * Candidate pairs (band collisions) are verified by signature
    * agreement before reporting, same as [[minhashLsh]].
    *
    * Output: (new_id, dup_of, est_jaccard) — batch docs absent from the
    * output are genuinely novel and safe to admit.
    */
  def incrementalLsh(corpus: DataFrame, batch: DataFrame, threshold: Double): DataFrame = {
    val sigB = Caches.tracked(minhashSignatures(batch).persist())
    val sigC = minhashSignatures(corpus)
    val cand = lshBands(sigC).as("c")
      .join(broadcast(lshBands(sigB).as("b")),
        col("c.band") === col("b.band") && col("c.bh") === col("b.bh"))
      .select(col("b.doc_id").as("new_id"), col("c.doc_id").as("dup_of"))
      .distinct()
    val eq = (0 until 16).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    sigC.as("x")
      .join(broadcast(cand), col("x.doc_id") === col("dup_of"))
      .join(broadcast(sigB.as("y")), col("new_id") === col("y.doc_id"))
      .select(col("new_id"), col("dup_of"), (eq / 16.0).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .orderBy("new_id", "dup_of")
  }

  /** Harness batch for [[incrementalLsh]]: a "fresh crawl" whose docs are
    * half near-duplicates of corpus docs (doc_id % 7 == 0, three tokens
    * appended — must be flagged) and half novel (doc_id % 7 == 3, token
    * order reversed ⇒ an entirely different shingle set — must pass).
    */
  def crawlBatch(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zz qq zz")).as("text"))
      .unionAll(docs.filter(col("doc_id") % 7 === 3)
        .select((col("doc_id") + 2000000L).as("doc_id"),
          concat_ws(" ", reverse(Tokenize.tokens(col("text")))).as("text")))

  def incrementalLshSql(threshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    // `corpus` (the CTE the shared sig/band SQL reads) is existing ∪ batch;
    // batch ids are offset, so the band probe splits the sides by id range
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' zz qq zz' FROM documents WHERE doc_id % 7 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000,
       |         list_aggregate(list_reverse(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')), 'string_agg', ' ')
       |  FROM documents WHERE doc_id % 7 = 3),
       |$sigSql,
       |$bandsSql,
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS new_id, a.doc_id AS dup_of
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
       |  WHERE a.doc_id < 1000000 AND b.doc_id >= 1000000)
       |SELECT c.new_id, c.dup_of, ($eq) / 16.0 AS est_jaccard
       |FROM cand c JOIN sig x ON c.dup_of = x.doc_id
       |            JOIN sig y ON c.new_id = y.doc_id
       |WHERE ($eq) / 16.0 >= $threshold
       |ORDER BY new_id, dup_of""".stripMargin
  }

  // ------------------------------------------- persisted LSH index + probe

  /** Bucket count of the persisted index layout. Fixture-sized here; at
    * corpus scale this would be thousands — the probe cost model below
    * (read only the buckets the batch hashes into) is what changes the
    * constant, not the shape. */
  private[graft] val indexBuckets = 16

  /** Materialize the corpus's banded signature index as a
    * bucket-partitioned parquet table — the PRODUCTION shape for
    * continuous dedup, where [[incrementalLsh]]'s recompute-the-corpus
    * probe is replaced by a table maintained once and probed many times.
    *
    * Row = (doc_id, band, bh, s0..s15, bucket): the band row carries its
    * full signature, so a probe verifies est-Jaccard with ZERO additional
    * corpus access (a 4x signature denormalization — the classic
    * space-for-passes index trade). bucket = portable hash of the band
    * hash mod [[indexBuckets]], written as the PARTITION directory — the
    * same bucketed-state device `StreamingApply`'s LWW store proves: a
    * reader with a bounded bucket set prunes every other directory at
    * scan planning, no file of a cold bucket is even listed.
    */
  def writeLshIndex(corpus: DataFrame, path: String): Unit = {
    lshBandRows(minhashSignatures(corpus))
      .withColumn("bucket",
        pmod(PortableHash.tokenHash(col("bh")), lit(indexBuckets)).cast("int"))
      .repartition(indexBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** Probe the persisted index with a fresh crawl batch: signatures and
    * band hashes are computed for the BATCH ONLY — the corpus side is
    * read back from the index table, bucket-pruned to the (bounded,
    * ≤ [[indexBuckets]]) set of buckets the batch actually hashes into.
    * Result contract identical to [[incrementalLsh]] (bucket equality is
    * implied by band-hash equality), checked against the same oracle.
    *
    * Scale shape: the batch is broadcast (a probe batch is small by
    * definition); the index scan touches only matching bucket
    * directories; the driver-side bucket-id collect is bounded by the
    * bucket count, never by data size.
    */
  def lshIndexProbe(spark: org.apache.spark.sql.SparkSession, path: String,
                    batch: DataFrame, threshold: Double): DataFrame = {
    val probe = Caches.tracked(lshBandRows(minhashSignatures(batch))
      .withColumn("bucket",
        pmod(PortableHash.tokenHash(col("bh")), lit(indexBuckets)).cast("int"))
      .persist())
    val hit = probe.select(col("bucket")).distinct().collect().map(_.getInt(0))
    val idx = spark.read.parquet(path).filter(col("bucket").isin(hit.map(Integer.valueOf): _*))
    val eq = (0 until 16).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    idx.as("x")
      .join(broadcast(probe.as("y")),
        col("x.bucket") === col("y.bucket") && col("x.band") === col("y.band") &&
          col("x.bh") === col("y.bh"))
      .select(col("y.doc_id").as("new_id"), col("x.doc_id").as("dup_of"),
        (eq / 16.0).as("est_jaccard"))
      .distinct() // multi-band collisions of the same pair
      .filter(col("est_jaccard") >= threshold)
      .orderBy("new_id", "dup_of")
  }

  /** Per-bucket parquet data-file counts of a persisted index — the
    * observable the compaction contract bounds (spec + maintenance
    * audits read it; hidden/_SUCCESS/crc files excluded).
    */
  def lshIndexFileCounts(path: String): Map[Int, Int] = {
    val dir = new java.io.File(path)
    if (!dir.exists()) Map.empty
    else Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .filter(d => d.isDirectory && d.getName.startsWith("bucket="))
      .map(d => d.getName.stripPrefix("bucket=").toInt ->
        Option(d.listFiles()).getOrElse(Array.empty)
          .count(f => f.getName.endsWith(".parquet")))
      .toMap
  }

  /** Compact index buckets whose data-file count exceeds
    * `maxFilesPerBucket` down to ONE file each — the maintenance pass
    * that keeps a continuously-appended index readable: without it the
    * bucket directories accrete `batches × buckets` sliver files and
    * directory listing becomes the probe bottleneck within days at a
    * seconds-cadence ingest. Only over-threshold buckets are rewritten
    * (cold buckets are never touched), so the pass costs one scan of the
    * hot buckets' signatures, not the index. Returns the
    * (bucket, filesBefore) pairs it compacted.
    *
    * The rewrite goes through a sibling temp dir and a per-bucket
    * directory swap rather than a dynamic-partition overwrite: the
    * source and destination are the same path, which Spark's insert
    * path (rightly) refuses. On a real deployment this swap is the
    * transactional commit a table format (Iceberg/Delta rewrite-files)
    * provides; the device — rewrite only over-threshold buckets, swap
    * atomically per bucket, readers keep a consistent view — is the same.
    */
  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** Heal an index left by a compaction interrupted mid-swap. The swap
    * ordering in [[compactLshIndex]] guarantees every crash point leaves
    * a recoverable state; this is the recovery:
    *   - live bucket dir MISSING but its aside copy present (crash
    *     between move-aside and move-in): restore the aside copy — the
    *     pre-compaction data, still complete; the compaction simply
    *     re-runs on the next maintenance cycle;
    *   - live present and aside too (crash before the aside delete):
    *     the live dir already holds the compacted data — drop the aside;
    *   - a stale rewrite temp dir (crash mid-write): drop it.
    * Returns the bucket ids whose live dirs were restored. A no-crash
    * call costs two existence checks.
    */
  def recoverLshIndex(path: String): Seq[Int] = {
    val aside = new java.io.File(s"$path.compact.aside")
    val restored = scala.collection.mutable.ListBuffer[Int]()
    if (aside.exists()) {
      Option(aside.listFiles()).getOrElse(Array.empty).toSeq
        .filter(d => d.isDirectory && d.getName.startsWith("bucket=")).foreach { d =>
          val live = new java.io.File(s"$path/${d.getName}")
          if (!live.exists()) {
            java.nio.file.Files.move(d.toPath, live.toPath)
            restored += d.getName.stripPrefix("bucket=").toInt
          }
        }
      rmTree(aside)
    }
    rmTree(new java.io.File(s"$path.compact"))
    restored.toSeq.sorted
  }

  def compactLshIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      maxFilesPerBucket: Int): Seq[(Int, Int)] = {
    require(maxFilesPerBucket >= 1, s"maxFilesPerBucket must be >= 1: $maxFilesPerBucket")
    recoverLshIndex(path) // self-heal any interrupted previous swap first
    val over = lshIndexFileCounts(path).filter(_._2 > maxFilesPerBucket).toSeq.sorted
    if (over.nonEmpty) {
      val tmp = path + ".compact"
      val buckets = over.map(_._1)
      spark.read.parquet(path)
        .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
        // one partition per bucket → exactly one data file per bucket dir
        .repartition(buckets.size, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
      buckets.foreach { b =>
        // Crash-safe ordering: rename the live bucket ASIDE (outside the
        // index path, so partition discovery never sees it), move the
        // compacted dir into place, delete the aside copy LAST — a
        // failure at any step leaves either the old or the new bucket
        // intact on disk (never neither), so an interrupted compaction
        // is recoverable without replaying already-committed batches.
        val dst = java.nio.file.Paths.get(s"$path/bucket=$b")
        val old = java.nio.file.Paths.get(s"$tmp.aside/bucket=$b")
        java.nio.file.Files.createDirectories(old.getParent)
        java.nio.file.Files.move(dst, old)
        java.nio.file.Files.move(java.nio.file.Paths.get(s"$tmp/bucket=$b"), dst)
        rmTree(old.toFile)
      }
      rmTree(new java.io.File(s"$tmp.aside"))
      rmTree(new java.io.File(tmp))
    }
    over
  }

  /** Streaming first-occurrence novelty filter — continuous dedup as a
    * real stream: each micro-batch of documents is checked against the
    * PERSISTED bucket-partitioned signature index (all previously
    * ingested docs) and against its own earlier rows, then every batch
    * row's band signatures are APPENDED to the index — the stateful
    * composition of [[writeLshIndex]]/[[lshIndexProbe]] with the
    * micro-batch loop. A document is a duplicate when any
    * earlier-ingested document shares an LSH band and the 16-perm
    * est-Jaccard clears `threshold`; `dup_of` records the smallest such
    * earlier id. Batches must arrive in doc-id order (the chunk slicer
    * guarantees it) so "earlier-ingested" and "smaller doc_id" coincide
    * and the batch oracle is the plain SQL below.
    *
    * Scale shape per batch: signature build is batch-sized; the index
    * read is bucket-pruned to the batch's band hashes (bounded bucket
    * set collected, the same probe device as [[lshIndexProbe]]); the
    * batch side broadcasts; the append writes only batch-sized band
    * rows into their bucket directories. Index growth is corpus-linear
    * in SIGNATURES (≈132 B/doc), not text — and index FILE count is
    * bounded too: every `compactEvery` batches the [[compactLshIndex]]
    * rider rewrites buckets holding more than `maxFilesPerBucket` data
    * files down to one, so the probe's directory listing stays O(buckets)
    * under continuous operation instead of O(batches × buckets).
    */
  def streamingNovelty(spark: org.apache.spark.sql.SparkSession, chunks: String,
                       schema: org.apache.spark.sql.types.StructType,
                       indexPath: String, outPath: String, checkpoint: String,
                       threshold: Double, compactEvery: Int = 2,
                       maxFilesPerBucket: Int = 2): Unit = {
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(chunks).select(col("doc_id"), col("text"))
    val q = stream.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        def phase(p: String): Unit =
          s.sparkContext.setJobDescription(s"novelty b$batchId $p")
        phase("build")
        // batch-sized shuffle width: a micro-batch is a few thousand
        // rows — the session's cluster-sized shuffle width would cut it
        // into ~100-row tasks whose scheduling overhead dominates every
        // one of the batch's small jobs. Scoped to the batch body
        // (foreachBatch bodies run sequentially).
        Caches.withBatchShuffleWidth(s) {
        // one-file micro-batches arrive as ONE partition; the shingle
        // explode behind minhashSignatures would run single-threaded
        // without this spread (the StreamingApply prepartition recipe)
        val docs = batch.repartition(s.sparkContext.defaultParallelism).persist()
        // EAGER localCheckpoint, not persist: the band frame feeds FOUR
        // consumers per batch (hit-bucket collect, probe join build,
        // novelty output, index append), and persist does not cut the
        // LOGICAL plan — each consumer re-analyzed the whole
        // minhash/shingle lineage (the round-9 planning-gap lesson;
        // measured here as ~17 jobs/batch of mostly plan time). The
        // frame is batch-bounded and fixed-shape, the localCheckpoint
        // eligibility rule; a lost executor fails the batch and
        // foreachBatch replays it (at-least-once), which the ingest
        // frontier below absorbs.
        val bandsB = lshBandRows(minhashSignatures(docs))
          .withColumn("bucket",
            pmod(PortableHash.tokenHash(col("bh")), lit(indexBuckets)).cast("int"))
          .localCheckpoint()
        val eq = (0 until 16).map(i =>
          when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
        // heal any swap a previous run's crash left half-done BEFORE
        // probing — otherwise the probe silently misses the moved-aside
        // bucket until the next maintenance cycle (no-crash cost: two
        // existence checks)
        recoverLshIndex(indexPath)
        // The fused earlier-candidate probe keys "earlier ingested" to
        // "smaller doc_id" (the x.doc_id < y.doc_id predicate below), so
        // correctness DEPENDS on batches arriving in doc-id order. Assert
        // that contract per batch instead of trusting it: the index
        // carries its ingest frontier (max doc_id, stamped batch id) in a
        // metadata file, and a NEW batch whose min doc_id does not exceed
        // the frontier fails loudly rather than silently flipping
        // duplicates to novel. A REPLAY of the stamped batch (foreachBatch
        // is at-least-once: crash between index append and checkpoint
        // commit) legitimately overlaps the frontier, so same-or-older
        // batch ids skip the check.
        val frontierFile = java.nio.file.Paths.get(s"$indexPath/_ingest_frontier")
        val (recBatch, recMax) =
          if (java.nio.file.Files.exists(frontierFile)) {
            val parts = java.nio.file.Files.readString(frontierFile).trim.split(",")
            (parts(0).toLong, parts(1).toLong)
          } else (-1L, Long.MinValue)
        val stats = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
        val batchEmpty = stats.isNullAt(0)
        if (!batchEmpty && batchId > recBatch)
          require(stats.getLong(0) > recMax,
            s"ingestion-order contract broken: batch $batchId min doc_id " +
              s"${stats.getLong(0)} <= already-indexed max $recMax — the fused " +
              "earlier-candidate probe assumes doc-id-ordered ingestion; " +
              "re-ingest out-of-order data through a full rebuild instead")
        // ONE probe join covers both the vs-index and the intra-batch
        // comparison: ingestion order means "earlier" ≡ "smaller doc_id"
        // on BOTH sides (the batch contract this op documents), so the
        // index rows (bucket-pruned to the batch's buckets) and the
        // batch's own band rows union into a single "earlier-candidate"
        // side and one broadcast of the batch decides everything — half
        // the joins/broadcast builds per micro-batch of the former
        // two-join + union shape, same pairs by construction (same-bh
        // rows share a bucket, so the bucket equality is a no-op on the
        // intra part).
        val probeCols = col("doc_id") +: col("band") +: col("bh") +: col("bucket") +:
          (0 until nBands * rowsPerBand).map(i => col(s"s$i"))
        val earlierSide: DataFrame =
          if (new java.io.File(indexPath).exists()) {
            phase("hit-buckets")
            val hit = bandsB.select(col("bucket")).distinct().collect().map(_.getInt(0))
            phase("probe+out")
            s.read.parquet(indexPath)
              .filter(col("bucket").isin(hit.map(Integer.valueOf): _*))
              .select(probeCols: _*)
              .unionByName(bandsB.select(probeCols: _*))
          } else bandsB.select(probeCols: _*)
        val dupOf = earlierSide.as("x")
          .join(broadcast(bandsB.as("y")),
            col("x.bucket") === col("y.bucket") && col("x.band") === col("y.band") &&
              col("x.bh") === col("y.bh") && col("x.doc_id") < col("y.doc_id"))
          .filter(eq / lit(16.0) >= threshold)
          .select(col("y.doc_id").as("id"), col("x.doc_id").as("earlier"))
          .groupBy(col("id")).agg(min(col("earlier")).as("dup_of"))
        // batch-sized output: collapse to one task/file per micro-batch
        // (32 shuffle-width files of a 12k-row frame are pure overhead)
        docs.select(col("doc_id"))
          .join(dupOf, col("doc_id") === col("id"), "left")
          .select(col("doc_id"), col("dup_of").isNull.as("novel"), col("dup_of"))
          .coalesce(1)
          .write.mode("append").parquet(outPath)
        phase("append")
        // consolidate before the append: partitionBy from 32 task
        // partitions would scatter up to 32x16 sliver files per batch —
        // one shuffle to bucket-aligned partitions writes one file per
        // bucket per batch (the writeLshIndex layout), keeping the
        // index's file count linear in batches, not tasks x buckets
        bandsB.repartition(indexBuckets, col("bucket"))
          .write.mode("append").partitionBy("bucket").parquet(indexPath)
        // advance the ingest frontier AFTER the append (tmp + ATOMIC_MOVE,
        // the watermark-persist device): a crash between append and this
        // write leaves the old frontier, and the replayed batch id skips
        // the order check above. Underscore-prefixed = invisible to the
        // parquet reader's file index.
        if (!batchEmpty) {
          val tmpF = java.nio.file.Paths.get(s"$indexPath/_ingest_frontier.tmp")
          java.nio.file.Files.writeString(tmpF,
            s"$batchId,${math.max(recMax, stats.getLong(1))}")
          java.nio.file.Files.move(tmpF, frontierFile,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
        docs.unpersist() // bandsB's checkpoint blocks are GC-reclaimed (ContextCleaner)
        // maintenance rider: bound the index's per-bucket file count so
        // continuous appends can't turn directory listing into the probe
        // bottleneck (runs between batches — no reader is mid-scan)
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0) {
          phase("compact")
          compactLshIndex(s, indexPath, maxFilesPerBucket)
        }
        }
        s.sparkContext.setJobDescription(null)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Post-maintenance content audit of a persisted signature index:
    * per bucket, row/doc counts and an order-independent checksum over
    * (doc_id, band, bh). Read after a compacted [[streamingNovelty]]
    * run, it proves the compaction rider rewrote files without losing,
    * duplicating or corrupting a single band row — the oracle rebuilds
    * the same summary from `documents` alone (signatures, band hashes
    * and bucket assignment are all [[graft.functions.PortableHash]]-
    * portable), so any maintenance defect breaks the match.
    */
  def indexContentAudit(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("bucket").cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("doc_id")).as("n_docs"),
        (sum(PortableHash.tokenHash(
            concat_ws("|", col("doc_id"), col("band"), col("bh")))
          .cast("decimal(38,0)")) % lit(9007199254740881L)).cast("long")
          .as("content_checksum"))
      .orderBy("bucket")

  /** Oracle SQL for [[indexContentAudit]] over a compacted streaming-
    * novelty index: the full corpus's band rows, bucket-assigned the
    * same way the writer does.
    */
  def indexContentAuditSql: String = {
    val rowH = PortableHash.tokenHashSql("concat_ws('|', doc_id, band, bh)")
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |$sigSql,
       |$bandsSql,
       |idx AS (
       |  SELECT doc_id, band, bh,
       |         ${PortableHash.tokenHashSql("bh")} % $indexBuckets AS bucket
       |  FROM bands)
       |SELECT CAST(bucket AS INT) AS bucket, count(*) AS n_rows,
       |       count(DISTINCT doc_id) AS n_docs,
       |       CAST(sum(CAST($rowH AS DECIMAL(38,0))) % 9007199254740881 AS BIGINT)
       |         AS content_checksum
       |FROM idx GROUP BY bucket ORDER BY bucket""".stripMargin
  }

  /** Oracle for [[streamingNovelty]]: with doc-id-ordered ingestion,
    * "duplicate of an earlier-ingested doc" is exactly "shares a band +
    * est-Jaccard ≥ t with a smaller doc_id" — batch-split invariant.
    */
  def streamingNoveltySql(threshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |$sigSql,
       |$bandsSql,
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS id, a.doc_id AS earlier
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |dup AS (
       |  SELECT c.id, min(c.earlier) AS dup_of
       |  FROM cand c JOIN sig x ON c.earlier = x.doc_id
       |              JOIN sig y ON c.id = y.doc_id
       |  WHERE ($eq) / 16.0 >= $threshold
       |  GROUP BY c.id)
       |SELECT d.doc_id, dup.dup_of IS NULL AS novel, dup.dup_of
       |FROM documents d LEFT JOIN dup ON d.doc_id = dup.id
       |ORDER BY d.doc_id""".stripMargin
  }

  // ------------------------------------------------------------ containment

  /** Containment dedup — catches a SMALL document embedded in a big one
    * (quotes, boilerplate-wrapped copies, excerpt pages), which
    * Jaccard-LSH structurally misses: a 10-shingle quote inside a
    * 500-shingle page has Jaccard ≈ 0.02 (no band ever collides) but
    * containment |A∩B| / min(|A|,|B|) = 1.0.
    *
    * Candidate generation is therefore a different device: an inverted-
    * index (posting-list) self-join on RARE shingles only. The document-
    * frequency bound is what keeps it scalable — a shingle shared by df
    * docs contributes df·(df-1)/2 candidate pairs, so joining only
    * df ≤ maxDf postings bounds the quadratic blowup to maxDf²·|shingles|
    * while losing nothing that matters: a shingle common to half the
    * corpus identifies nothing anyway (it's the same df-pruning a search
    * engine applies to stop-terms). Verification then intersects the two
    * docs' hash sets exactly, as in [[ngramJaccard]].
    */
  def containment(docs: DataFrame, maxDf: Int, threshold: Double): DataFrame = {
    val th = Caches.tracked(docFeatures(docs)
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .persist())
    val rare = th.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("h"))
    val posting = th.join(rare, "h")
    val cand = posting.as("a")
      .join(posting.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val byDoc = th.groupBy(col("doc_id"))
      .agg(collect_list(col("h")).as("sh"), count(lit(1)).as("n"))
    cand
      .join(byDoc.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("n").as("na")), "doc_a")
      .join(byDoc.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("n").as("nb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / least(col("na"), col("nb"))).as("containment"))
      .filter(col("containment") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Harness corpus for [[containment]]: every 11th document re-appears
    * as a 12-token excerpt ("quote") under an offset id — fully contained
    * in its source but at tiny Jaccard, exactly the pair shape LSH can't
    * see.
    */
  def quotedCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionAll(docs.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat_ws(" ", slice(Tokenize.tokens(col("text")), 1, 12)).as("text")))

  def containmentSql(maxDf: Int, threshold: Double): String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 3000000,
       |         list_aggregate(list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')[1:12], 'string_agg', ' ')
       |  FROM documents WHERE doc_id % 11 = 0),
       |$featSql,
       |th AS (
       |  SELECT doc_id, ${PortableHash.tokenHashSql("feat")} AS h FROM feat),
       |rare AS (SELECT h FROM th GROUP BY h HAVING count(*) <= $maxDf),
       |posting AS (SELECT t.doc_id, t.h FROM th t JOIN rare r ON t.h = r.h),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM posting a JOIN posting b ON a.h = b.h AND a.doc_id < b.doc_id),
       |by_doc AS (SELECT doc_id, list(h) AS sh, count(*) AS n FROM th GROUP BY doc_id),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |         CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / least(a.n, b.n) AS containment
       |  FROM cand c JOIN by_doc a ON c.doc_a = a.doc_id
       |              JOIN by_doc b ON c.doc_b = b.doc_id)
       |SELECT doc_a, doc_b, containment FROM scored
       |WHERE containment >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------ persisted cluster-map maintenance

  /** Bucket count of the persisted cluster-map layout — CLUSTER-keyed,
    * so every row of a cluster lives in ONE bucket directory and both
    * the merge rewrite and the size recount stay bucket-local.
    * Fixture-sized like [[indexBuckets]]; thousands at corpus scale. */
  private[graft] val mapBuckets = 16

  private def mapBucketCol(c: Column): Column =
    pmod(c, lit(mapBuckets.toLong)).cast("int")

  /** Materialize a (doc_id, cluster, cluster_size) frame as the
    * persisted cluster map, bucket-partitioned by cluster id — the disk
    * layout [[maintainClusterMap]] maintains incrementally. */
  def writeClusterMap(clusters: DataFrame, path: String): Unit = {
    clusters.select(col("doc_id"), col("cluster"), col("cluster_size"))
      .withColumn("cbucket", mapBucketCol(col("cluster")))
      .repartition(mapBuckets, col("cbucket"))
      .write.mode("overwrite").partitionBy("cbucket").parquet(path)
  }

  /** The map, or an empty typed frame when nothing has clustered yet
    * (a prefix with zero qualifying pairs writes only _SUCCESS, which
    * parquet schema inference rejects). */
  private def readClusterMap(spark: org.apache.spark.sql.SparkSession,
                             path: String): DataFrame =
    try spark.read.parquet(path)
      .select(col("doc_id"), col("cluster"), col("cluster_size"), col("cbucket"))
    catch {
      case _: Throwable =>
        spark.range(0).select(col("id").as("doc_id"), col("id").as("cluster"),
          col("id").as("cluster_size"), col("id").cast("int").as("cbucket"))
    }

  /** Heal a cluster map left by a merge interrupted mid-swap — the
    * [[recoverLshIndex]] ladder over `cbucket=` dirs and the `.merge`
    * temp tree. An aside copy with a missing live dir is pre-merge data
    * (restore it; the unadvanced `_cluster_frontier` makes the replayed
    * batch re-merge); an aside next to a live dir means the swap
    * committed (drop the aside); a stale temp tree is a dead rewrite.
    * Returns the bucket ids restored. No-crash cost: two existence
    * checks.
    */
  def recoverClusterMap(path: String): Seq[Int] = BucketSwap.recover(path, "cbucket")

  /** Merge ONE ingest batch into the persisted cluster map — the
    * incremental-maintenance path for [[writeClusterMap]]'s artifact,
    * closing for clusters the recompute gap [[streamingNovelty]] closed
    * for signatures: instead of re-running LSH + connected components
    * over the full corpus per refresh, the batch's new LSH edges
    * CONTRACT through the stored (doc → cluster) assignment and a
    * delta-sized CC merges only the touched components. Old–old edges
    * never change when docs are only added (LSH banding is a pairwise
    * property), so components of (stored map + delta edges) equal the
    * from-scratch components, and the merged label — min over old reps
    * and newly clustered ids — equals the from-scratch min because
    * stored labels are already component minima.
    *
    * Per batch (all delta-bounded except the two stated streams):
    *  1. batch band signatures, localCheckpoint-cut (batch-sized);
    *  2. earlier-candidate probe — the [[streamingNovelty]] device:
    *     index rows bucket-pruned to the batch's band hashes union the
    *     batch's own rows, ONE broadcast of the batch, `x.doc_id <
    *     y.doc_id` keeps "earlier", `distinct` folds replay overlap;
    *  3. append the batch's bands to the index, guarded by the index
    *     `_ingest_frontier` (a replay never double-appends) and the
    *     doc-id ingestion-order contract (fails loudly out of order);
    *  4. contract endpoints through the stored map — ONE streamed map
    *     pass against the broadcast endpoint set resolves stored
    *     clusters, two delta×delta broadcast joins apply them — then
    *     union-find on the contracted delta graph, on the DRIVER (the
    *     edge set is delta-bounded and collected below regardless);
    *  5. rewrite ONLY the touched clusters' bucket dirs: relabel merged
    *     clusters, insert newly clustered docs (old singletons and
    *     batch docs), recount sizes bucket-locally (cluster-keyed
    *     bucketing keeps each cluster whole inside one bucket), swap
    *     per bucket through the aside device;
    *  6. advance `_cluster_frontier` (tmp + ATOMIC_MOVE) LAST.
    *
    * Crash/replay: a batch id at or below the frontier is absorbed
    * (returns false, zero work). A crash at any earlier point replays
    * cleanly — an already-appended batch folds in the probe's distinct,
    * already-merged endpoints contract to self-loops that drop out, and
    * a half-swapped map re-merges to the same fixpoint (labels are
    * minima; merging {merged label, missed rep} re-yields the min).
    * `dedup_cluster_maintenance`'s oracle is the full rebuild, so the
    * correctness gate proves incremental ≡ from-scratch.
    */
  def maintainClusterMap(spark: org.apache.spark.sql.SparkSession,
                         indexPath: String, mapPath: String, batch: DataFrame,
                         threshold: Double, batchId: Long): Boolean = {
    recoverClusterMap(mapPath)
    recoverLshIndex(indexPath)
    val (last, _) = BucketSwap.readFrontier(mapPath, "_cluster_frontier")
    if (batchId <= last) return false
    // a maintenance batch is micro-batch-sized: the batch-width device
    // (scoped shuffle width + AQE off) applies exactly as in
    // streamingNovelty's foreachBatch body
    Caches.withBatchShuffleWidth(spark) {

    val bands = lshBandRows(minhashSignatures(batch.select(col("doc_id"), col("text"))))
      .withColumn("bucket",
        pmod(PortableHash.tokenHash(col("bh")), lit(indexBuckets)).cast("int"))
      .localCheckpoint()
    val nPerms = nBands * rowsPerBand
    val probeCols = col("doc_id") +: col("band") +: col("bh") +: col("bucket") +:
      (0 until nPerms).map(i => col(s"s$i"))
    // "index exists" must mean "has at least one bucket dir": an empty
    // prefix writes only _SUCCESS, and parquet schema inference rejects
    // a row-less directory
    val indexHasData = Option(new java.io.File(indexPath).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .exists(d => d.isDirectory && d.getName.startsWith("bucket="))
    val earlier =
      if (indexHasData) {
        val hit = bands.select(col("bucket")).distinct().collect().map(_.getInt(0))
        spark.read.parquet(indexPath)
          .filter(col("bucket").isin(hit.map(Integer.valueOf): _*))
          .select(probeCols: _*)
          .unionByName(bands.select(probeCols: _*))
      } else bands.select(probeCols: _*)
    val eq = (0 until nPerms).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    val pairs = earlier.as("x")
      .join(broadcast(bands.as("y")),
        col("x.bucket") === col("y.bucket") && col("x.band") === col("y.band") &&
          col("x.bh") === col("y.bh") && col("x.doc_id") < col("y.doc_id"))
      .filter(eq / lit(nPerms.toDouble) >= threshold)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
      .localCheckpoint()

    val (recBatch, recMax) = BucketSwap.readFrontier(indexPath, "_ingest_frontier")
    if (batchId > recBatch) {
      val stats = batch.agg(min(col("doc_id")), max(col("doc_id"))).head()
      if (!stats.isNullAt(0)) {
        require(stats.getLong(0) > recMax,
          s"ingestion-order contract broken: batch $batchId min doc_id " +
            s"${stats.getLong(0)} <= already-indexed max $recMax — cluster " +
            "maintenance assumes doc-id-ordered ingestion; re-ingest " +
            "out-of-order data through a full rebuild instead")
        bands.repartition(indexBuckets, col("bucket"))
          .write.mode("append").partitionBy("bucket").parquet(indexPath)
        BucketSwap.writeFrontier(indexPath, "_ingest_frontier", batchId,
          math.max(recMax, stats.getLong(1)))
      }
    }

    val mc = readClusterMap(spark, mapPath).select(col("doc_id").as("mid"), col("cluster"))
    // ONE streamed pass over the map resolves every endpoint's stored
    // cluster (inner BHJ with the delta-bounded endpoint set broadcast;
    // a right-outer with the preserved side broadcast is unsupported and
    // would silently fall back to a full-map shuffle join). Unresolved
    // endpoints represent themselves in the two tiny left joins after.
    val endpoints = pairs.select(col("a").as("d"))
      .unionAll(pairs.select(col("b").as("d"))).distinct()
    val reps = mc.join(broadcast(endpoints), col("mid") === col("d"))
      .select(col("mid"), col("cluster")).localCheckpoint()
    val contracted = pairs
      .join(broadcast(reps.as("fa")), col("a") === col("fa.mid"), "left")
      .select(coalesce(col("fa.cluster"), col("a")).as("ra"), col("b"))
      .join(broadcast(reps.as("fb")), col("b") === col("fb.mid"), "left")
      .select(col("ra"), coalesce(col("fb.cluster"), col("b")).as("rb"))
      .filter(col("ra") =!= col("rb"))
      .select(least(col("ra"), col("rb")).as("doc_a"),
        greatest(col("ra"), col("rb")).as("doc_b"))
      .distinct()
    // CC on the CONTRACTED graph runs on the DRIVER (iteration-altitude
    // rule): the edge set is delta-bounded and its node->label output is
    // collected below regardless, while a distributed CC pays seconds of
    // durable-checkpoint machinery per invocation for a graph of dozens
    // of nodes. Union-by-min (hi -> lo) makes every root the component
    // MINIMUM, which is exactly the stored label semantics. A deployment
    // whose deltas outgrow the driver swaps in [[connectedComponents]].
    val edgesArr = contracted.collect().map(r => (r.getLong(0), r.getLong(1)))
    val relabels: Array[(Long, Long)] =
      if (edgesArr.isEmpty) Array.empty
      else {
        val parent = scala.collection.mutable.Map.empty[Long, Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var c = x
          while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        edgesArr.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
        }
        edgesArr.flatMap { case (a, b) => Seq(a, b) }.distinct.map(n => n -> find(n))
      }

    if (relabels.nonEmpty) {
      val nodes = relabels.map(_._1)
      val touched = relabels.flatMap { case (n, l) =>
        Seq((n % mapBuckets).toInt, (l % mapBuckets).toInt) }.distinct.sorted.toSeq
      val relabelDf = broadcast(
        spark.createDataFrame(relabels.toSeq).toDF("node", "nlabel"))
      val oldRows = readClusterMap(spark, mapPath)
        .filter(col("cbucket").isin(touched.map(Integer.valueOf): _*))
      val relabeled = oldRows.join(relabelDf, col("cluster") === col("node"), "left")
        .select(col("doc_id"), coalesce(col("nlabel"), col("cluster")).as("cluster"))
      // nodes already present as cluster labels get RELABELED rows; the
      // rest (old singletons, batch docs) are INSERTED. The probe is
      // node-bounded: a node in the map is by construction its own
      // cluster's label, and that label's rows live in a touched bucket.
      val present = oldRows
        .filter(col("cluster").isin(nodes.map(java.lang.Long.valueOf): _*))
        .select(col("cluster")).distinct().collect().map(_.getLong(0)).toSet
      val inserts = relabels.toSeq.collect {
        case (n, l) if !present.contains(n) => (n, l) }
      val content =
        if (inserts.isEmpty) relabeled
        else relabeled.unionByName(
          spark.createDataFrame(inserts).toDF("doc_id", "cluster"))
      val sizes = content.groupBy(col("cluster")).agg(count(lit(1)).as("cluster_size"))
      val out = content.join(sizes, "cluster")
        .select(col("doc_id"), col("cluster"), col("cluster_size"))
        .withColumn("cbucket", mapBucketCol(col("cluster")))
      out.repartition(math.max(1, touched.size), col("cbucket"))
        .write.mode("overwrite").partitionBy("cbucket").parquet(s"$mapPath.merge")
      BucketSwap.swap(mapPath, "cbucket", touched)
    }
    BucketSwap.writeFrontier(mapPath, "_cluster_frontier", batchId, 0L)
    }
    true
  }

  /** Streaming document ingestion maintaining the persisted cluster map
    * — the streaming composition of [[maintainClusterMap]] (round-12
    * directive #5), i.e. the [[graft.ops.Similarity.streamingKnnIngest]]
    * shape for the dedup family: each micro-batch of documents merges
    * into the map artifact through foreachBatch under the same
    * `_cluster_frontier` replay-absorption, ingestion-order, and
    * aside-swap crash guarantees, so a killed and restarted stream
    * resumes exactly where the artifacts say (foreachBatch is
    * at-least-once; the replayed batch id is absorbed). AvailableNow +
    * maxFilesPerTrigger=1: one ordered chunk file per micro-batch,
    * mirroring continuous crawl ingest.
    */
  def streamingClusterIngest(spark: org.apache.spark.sql.SparkSession,
                             chunks: String,
                             schema: org.apache.spark.sql.types.StructType,
                             indexPath: String, mapPath: String,
                             threshold: Double, checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(chunks).select(col("doc_id"), col("text"))
    val q = stream.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maintainClusterMap(batch.sparkSession, indexPath, mapPath, batch,
          threshold, batchId)
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Build the maintenance exercise's PREFIX state — LSH index +
    * cluster map over the original documents (doc_id < the copy shift)
    * — as an on-disk artifact under `root`. One from-scratch CC, the
    * cost [[clusterMaintenanceRun]] deliberately does NOT re-measure
    * (the artifact convention: build cost belongs to
    * `dedup_clusters_star`, the maintenance query measures the
    * incremental path).
    */
  def buildClusterMaintPrefix(spark: org.apache.spark.sql.SparkSession,
                              docs: DataFrame, threshold: Double,
                              root: String): (String, String) = {
    val idx = s"$root/index"
    val map = s"$root/map"
    val corpus = nearDupCorpus(docs.select(col("doc_id"), col("text")))
    writeLshIndex(corpus.filter(col("doc_id") < 1000000L), idx)
    writeClusterMap(
      nearDupClustersStars(corpus.filter(col("doc_id") < 1000000L), threshold), map)
    (idx, map)
  }


  /** End-to-end incremental-maintenance exercise over the standard
    * near-dup corpus: the PREFIX artifacts (from
    * [[buildClusterMaintPrefix]], process-cached by the caller) are
    * HARDLINKED to a fresh scratch root — maintenance mutates only by
    * writing new files and swapping directory entries, so the links are
    * safe ([[BucketSwap.linkTree]]) and near-free, where a byte copy
    * dominated the fixture-scale board — and the shifted near-dup
    * copies arrive as two ordered ingest batches merged delta-only
    * through [[maintainClusterMap]]. Returns the final persisted map;
    * the oracle is the FROM-SCRATCH rebuild over the full corpus, so
    * the correctness gate proves incremental ≡ rebuild (the artifact
    * riders' proof shape). What the bench measures is therefore the two
    * incremental merges — the maintenance path, not the prefix build or
    * its staging.
    */
  def clusterMaintenanceRun(spark: org.apache.spark.sql.SparkSession,
                            docs: DataFrame, threshold: Double,
                            prefixIdx: String, prefixMap: String): DataFrame = {
    val root = graft.Scratch.dir("graft-cluster-maint")
    val idx = s"$root/index"
    val map = s"$root/map"
    BucketSwap.linkTree(prefixIdx, idx)
    BucketSwap.linkTree(prefixMap, map)
    val corpus = nearDupCorpus(docs.select(col("doc_id"), col("text")))
    val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cut1 = 1000000L + (mx + 1) / 2
    maintainClusterMap(spark, idx, map,
      corpus.filter(col("doc_id") >= 1000000L && col("doc_id") < cut1), threshold, 0L)
    maintainClusterMap(spark, idx, map,
      corpus.filter(col("doc_id") >= cut1), threshold, 1L)
    spark.read.parquet(map)
      .select(col("doc_id"), col("cluster"), col("cluster_size"))
      .orderBy("doc_id")
  }

  // ----------------------------------------------- benchmark contamination

  /** Train/test contamination scan: which corpus documents share 3-token
    * shingles with a benchmark/eval set (train-side decontamination, the
    * step every LLM data pipeline runs before training). The benchmark
    * here is the deterministic subset doc_id % `benchMod` == 0 — in
    * production it is the eval suite's text.
    *
    * Scale shape: the benchmark feature set is tiny relative to the
    * corpus and is BROADCAST; the corpus feature stream joins against it
    * map-side (no corpus shuffle), then one aggregation keyed by doc
    * yields overlap counts. A corpus doc is flagged when it shares ≥
    * `minShared` distinct shingles with any benchmark material.
    */
  def benchmarkContamination(docs: DataFrame, benchMod: Int, minShared: Int): DataFrame = {
    val feats = docFeatures(docs)
    val bench = feats.filter(col("doc_id") % benchMod === 0)
      .select(col("doc_id").as("bench_id"), col("feat"))
    feats.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(bench), "feat")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("feat")).as("n_shared_shingles"),
        count_distinct(col("bench_id")).as("n_bench_docs"))
      .withColumn("contaminated", col("n_shared_shingles") >= minShared)
      .orderBy(col("doc_id"))
  }

  def benchmarkContaminationSql(benchMod: Int, minShared: Int): String =
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |$featSql,
       |bench AS (SELECT doc_id AS bench_id, feat FROM feat WHERE doc_id % $benchMod = 0)
       |SELECT f.doc_id,
       |       count(DISTINCT f.feat) AS n_shared_shingles,
       |       count(DISTINCT b.bench_id) AS n_bench_docs,
       |       count(DISTINCT f.feat) >= $minShared AS contaminated
       |FROM feat f JOIN bench b ON f.feat = b.feat
       |WHERE f.doc_id % $benchMod <> 0
       |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin

  // ------------------------------------------- bloom-filtered contamination

  private val bloomBits = 4096
  private val bloomWordBits = 32 // 32 bits per BIGINT word: shifts never hit the sign bit

  /** Bloom-filter pre-filtered contamination scan — the 100 TB shape of
    * [[benchmarkContamination]]. The benchmark shingle set is folded into
    * a `bloomBits`-bit filter (≤ bloomBits/32 words — constant-size state,
    * vs the broadcast hash set whose size tracks the benchmark corpus);
    * the corpus probes the broadcast filter map-side and only
    * bloom-candidate shingles reach the per-doc aggregation, so the
    * shuffle carries candidate hits, not the corpus feature stream. The
    * exact join then runs ONLY over bloom-candidate docs, measuring the
    * filter's false-positive margin in the output (n_bloom ≥ n_exact
    * always: Bloom filters have no false negatives — the invariant
    * BloomContaminationSpec asserts).
    *
    * Build and probe share the [[PortableHash.bloomPerms]] (a·x+b) mod P
    * family and plain integer bit math, so DuckDB reconstructs the exact
    * filter words and the whole thing is hash-checked, which Spark's
    * built-in `BloomFilter` sketch (opaque bytes) would not allow.
    */
  def bloomContamination(docs: DataFrame, benchMod: Int, minShared: Int): DataFrame = {
    import PortableHash.{bloomPerms, minhashPerm}
    // persist: the hashed feature frame feeds FOUR subtrees (bloom build,
    // probe, benchmark hash set, exact verify) and Spark has no CSE across
    // them — uncached, the corpus would tokenize+shingle twice and the
    // benchmark twice. Same caller-evicts convention as minhashLsh.
    // distinct on (doc_id, h): two distinct shingles colliding to one
    // 60-bit tokenHash would otherwise double the per-(doc,h) probe count
    // and fail the n_set = perms membership test — breaking the
    // no-false-negative invariant (and double-counting n_exact)
    val th = Caches.tracked(docFeatures(docs)
      .select(col("doc_id"), PortableHash.tokenHash(col("feat")).as("h"))
      .distinct()
      .persist())
    val idxArr = array(bloomPerms.map { case (a, b) =>
      minhashPerm(col("h"), a, b) % lit(bloomBits.toLong)
    }: _*)
    val bloom = th.filter(col("doc_id") % benchMod === 0)
      .select(explode(idxArr).as("idx"))
      .select(expr(s"idx div $bloomWordBits").as("word"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(idx % $bloomWordBits AS INT))").as("mask"))
      .groupBy(col("word")).agg(expr("bit_or(mask)").as("w"))
    val probe = th.filter(col("doc_id") % benchMod =!= 0)
      .select(col("doc_id"), col("h"), explode(idxArr).as("idx"))
      .join(broadcast(bloom), expr(s"idx div $bloomWordBits") === col("word"))
      .filter(expr(s"(w & shiftleft(CAST(1 AS BIGINT), CAST(idx % $bloomWordBits AS INT))) <> 0"))
      .groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n_set"))
      .filter(col("n_set") === bloomPerms.size)
    // persisted: consumed by the exact verify's semi-join AND the final
    // left join — and it is the frame the whole operator exists to keep
    // small (bloom-candidate docs only)
    val candidates = probe.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bloom"))
      .filter(col("n_bloom") >= minShared)
      .persist()
    Caches.tracked(candidates)
    val benchH = th.filter(col("doc_id") % benchMod === 0).select(col("h")).distinct()
    // the exact verify runs ONLY over bloom-candidate docs (the semi-join
    // prunes the corpus stream before the benchmark join) — that pruning
    // is the entire point of the pre-filter at scale
    val exact = th.filter(col("doc_id") % benchMod =!= 0)
      .join(broadcast(candidates.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .join(broadcast(benchH), "h")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_exact"))
    candidates.join(exact, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_bloom"),
        coalesce(col("n_exact"), lit(0L)).as("n_exact"),
        (coalesce(col("n_exact"), lit(0L)) >= minShared).as("contaminated"))
      .orderBy("doc_id")
  }

  def bloomContaminationSql(benchMod: Int, minShared: Int): String = {
    import PortableHash.{bloomPerms, minhashPermSql}
    val idxs = bloomPerms.map { case (a, b) =>
      s"(${minhashPermSql("h", a, b)}) % $bloomBits"
    }.mkString(", ")
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |$featSql,
       |th AS (SELECT DISTINCT doc_id, ${PortableHash.tokenHashSql("feat")} AS h FROM feat),
       |member AS (
       |  SELECT unnest([$idxs]) AS idx FROM th WHERE doc_id % $benchMod = 0),
       |bloom AS (
       |  SELECT idx // $bloomWordBits AS word,
       |         bit_or(CAST(1 AS BIGINT) << CAST(idx % $bloomWordBits AS INTEGER)) AS w
       |  FROM member GROUP BY 1),
       |probe AS (
       |  SELECT doc_id, h, unnest([$idxs]) AS idx
       |  FROM th WHERE doc_id % $benchMod <> 0),
       |hit AS (
       |  SELECT p.doc_id, p.h
       |  FROM probe p JOIN bloom b ON p.idx // $bloomWordBits = b.word
       |  WHERE (b.w & (CAST(1 AS BIGINT) << CAST(p.idx % $bloomWordBits AS INTEGER))) <> 0
       |  GROUP BY p.doc_id, p.h HAVING count(*) = ${bloomPerms.size}),
       |cand AS (
       |  SELECT doc_id, count(*) AS n_bloom FROM hit
       |  GROUP BY doc_id HAVING count(*) >= $minShared),
       |bench_h AS (SELECT DISTINCT h FROM th WHERE doc_id % $benchMod = 0),
       |exact AS (
       |  SELECT t.doc_id, count(*) AS n_exact
       |  FROM th t JOIN bench_h b ON t.h = b.h
       |  WHERE t.doc_id % $benchMod <> 0 GROUP BY t.doc_id)
       |SELECT c.doc_id, c.n_bloom,
       |       coalesce(e.n_exact, 0) AS n_exact,
       |       coalesce(e.n_exact, 0) >= $minShared AS contaminated
       |FROM cand c LEFT JOIN exact e ON c.doc_id = e.doc_id
       |ORDER BY c.doc_id""".stripMargin
  }

  // --------------------------------------------------- embedding near-dup

  /** Embedding near-duplicates: pairwise cosine ≥ threshold, blocked by
    * the `label` column (cluster id) so the self-join is per-block — the
    * blocked-pairwise pattern that survives scale (global all-pairs does
    * not). Cosine is computed in DOUBLE with a left-fold dot product
    * (deterministic order ⇒ bit-stable across partitionings) and rounded
    * to 6 dp BEFORE thresholding so both engines agree at the boundary.
    */
  def embeddingNearDup(emb: DataFrame, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    graft.functions.VectorFunctions.register(emb.sparkSession)
    val e = emb.select(col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dotD(col("v"), col("v"))))
    e.as("a")
      .join(e.as("b"), col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(dotD(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  def embeddingNearDupSql(threshold: Double): String =
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
       |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
       |  FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= $threshold
       |ORDER BY vec_a, vec_b""".stripMargin

  // ------------------------------------------- random-hyperplane (cosine) LSH

  /** Deterministic pseudo-random hyperplane component for bit `j`,
    * dimension `d`: a splitmix64 step over the flat index, mapped onto
    * [-1, 1). Data-independent (all LSH needs) and a pure function of
    * (j, d), so the SAME literal constants are embedded in the Spark plan
    * and rendered into the oracle SQL — zero cross-engine arithmetic to
    * diverge. Signs of projections onto symmetric (not necessarily
    * Gaussian) directions preserve the angular-collision property
    * Pr[sign match] = 1 − θ/π that makes the banding math work.
    */
  private def hyperplaneComponent(j: Int, d: Int): Double = {
    var z = j.toLong * 1000003L + d + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    2.0 * ((z >>> 11).toDouble / (1L << 53).toDouble) - 1.0
  }

  private def hyperplane(j: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(hyperplaneComponent(j, _))

  private def hyperplaneSqlLit(j: Int, dim: Int): String =
    hyperplane(j, dim).mkString("[", ", ", "]")

  /** Random-hyperplane (cosine) LSH near-duplicates over embeddings — the
    * vector-space member of the LSH family ([[minhashLsh]] = Jaccard over
    * shingles, [[simhashPairs]] = Hamming over text features, this =
    * angle over embeddings). Each vector gets `nBits` sign bits (one per
    * hyperplane projection); bits pack into `nBits/bandBits` band values;
    * vectors sharing any band value become candidates; candidates are
    * verified by exact cosine ≥ threshold. Unlike [[embeddingNearDup]]
    * (which blocks on a trusted `label` column) this needs NO prior
    * blocking key — the signature IS the blocking key, which is the form
    * that works when no cluster labels exist.
    *
    * Projections are rounded to 6 dp BEFORE the sign test (the repo-wide
    * boundary convention) so ulp-level fold differences between engines
    * cannot flip a bit.
    *
    * Scale shape: signatures are one codegen'd map-only projection
    * (nBits dot products against broadcast-literal hyperplanes); the
    * bucket self-join shuffles on (band, value) exactly like the MinHash
    * band join; verification joins the candidate pairs back to the
    * narrow persisted (vec_id, v, norm) frame. Nothing is all-pairs. At
    * fixture scale bandBits=4 keeps recall high; a production corpus
    * widens bands (16+ bits ⇒ 65k+ buckets per band) — selectivity is a
    * parameter, not a structural change.
    */
  def hyperplaneLsh(emb: DataFrame, nBits: Int, bandBits: Int,
                    dim: Int, threshold: Double): DataFrame = {
    require(nBits % bandBits == 0, s"bandBits $bandBits must divide nBits $nBits")
    import graft.functions.VectorFunctions.dotD
    graft.functions.VectorFunctions.register(emb.sparkSession)
    // persisted: feeds the signature projection once and the verify join
    // twice; caller evicts via Caches.releaseCaches()
    val e = Caches.tracked(emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dotD(col("v"), col("v"))))
      .persist())
    val bits: Seq[Column] = (0 until nBits).map { j =>
      (round(dotD(col("v"), lit(hyperplane(j, dim))), 6) >= 0).cast("int")
    }
    val nBands = nBits / bandBits
    val bandStructs = (0 until nBands).map { g =>
      val value = (0 until bandBits)
        .map(i => bits(g * bandBits + i) * lit(1 << i))
        .reduce(_ + _).cast("long")
      struct(lit(g).as("band"), value.as("bval"))
    }
    val sig = e.select(col("vec_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("vec_id"), col("bs.band").as("band"), col("bs.bval").as("bval"))
    val cand = sig.as("a")
      .join(sig.as("b"), col("a.band") === col("b.band") &&
        col("a.bval") === col("b.bval") && col("a.vec_id") < col("b.vec_id"))
      .groupBy(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .agg(count(lit(1)).as("n_bands"))
    cand.join(e.as("x"), col("vec_a") === col("x.vec_id"))
      .join(e.as("y"), col("vec_b") === col("y.vec_id"))
      .select(col("vec_a"), col("vec_b"), col("n_bands"),
        round(dotD(col("x.v"), col("y.v")) / (col("x.norm") * col("y.norm")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Shared CTE text for the hyperplane-LSH oracle: `e` (prepared
    * vectors), `bits` (sign bits against the SAME literal hyperplanes the
    * Spark plan embeds), `sig` (band values), `cand` (bucket join),
    * `verified` (exact-cosine check).
    */
  private def hyperplaneCteSql(nBits: Int, bandBits: Int,
                               dim: Int, threshold: Double): String = {
    val nBands = nBits / bandBits
    val bitCols = (0 until nBits).map { j =>
      s"CASE WHEN round(list_dot_product(v, ${hyperplaneSqlLit(j, dim)}), 6) >= 0 THEN 1 ELSE 0 END AS b$j"
    }.mkString(",\n|         ")
    val bandSelects = (0 until nBands).map { g =>
      val value = (0 until bandBits).map(i => s"${1 << i} * b${g * bandBits + i}").mkString(" + ")
      s"SELECT vec_id, $g AS band, CAST($value AS BIGINT) AS bval FROM bits"
    }.mkString("\n|  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
       |  FROM embeddings),
       |bits AS (
       |  SELECT vec_id,
       |         $bitCols
       |  FROM e),
       |sig AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, count(*) AS n_bands
       |  FROM sig a JOIN sig b
       |    ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
       |  GROUP BY 1, 2),
       |verified AS (
       |  SELECT c.vec_a, c.vec_b, c.n_bands,
       |         round(list_dot_product(x.v, y.v) / (x.norm * y.norm), 6) AS cosine
       |  FROM cand c JOIN e x ON c.vec_a = x.vec_id
       |              JOIN e y ON c.vec_b = y.vec_id
       |  WHERE round(list_dot_product(x.v, y.v) / (x.norm * y.norm), 6) >= $threshold)""".stripMargin
  }

  def hyperplaneLshSql(nBits: Int, bandBits: Int, dim: Int, threshold: Double): String =
    s"""${hyperplaneCteSql(nBits, bandBits, dim, threshold)}
       |SELECT vec_a, vec_b, n_bands, cosine FROM verified
       |ORDER BY vec_a, vec_b""".stripMargin

  /** Recall of the hyperplane-LSH pass against the exact all-pairs
    * baseline — the number you tune (nBits, bandBits) against, mirroring
    * [[Similarity.recallAudit]] for IVF. One row: exact pair count, LSH
    * pair count (verified, so every LSH pair IS an exact pair — precision
    * is 1 by construction and recall is the only free metric), recall.
    *
    * Scale shape: the audit's exact side is all-pairs and runs on a
    * SAMPLE at corpus scale (here: the whole 500-vector fixture); the
    * LSH side reuses the production path unchanged.
    */
  def hyperplaneRecall(emb: DataFrame, nBits: Int, bandBits: Int,
                       dim: Int, threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions.dotD
    val lsh = hyperplaneLsh(emb, nBits, bandBits, dim, threshold)
      .agg(count(lit(1)).as("n_lsh"))
    val e = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dotD(col("v"), col("v"))))
    val exact = e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(round(dotD(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm")), 6) >= threshold)
      .agg(count(lit(1)).as("n_exact"))
    // both sides are one-row aggregates — the crossJoin is a broadcast of
    // a scalar, the accepted pattern for composing audit counters
    exact.crossJoin(lsh)
      .select(col("n_exact"), col("n_lsh"),
        round(col("n_lsh").cast("double") / nullif(col("n_exact"), lit(0L)).cast("double"), 4)
          .as("recall"))
  }

  def hyperplaneRecallSql(nBits: Int, bandBits: Int, dim: Int, threshold: Double): String =
    s"""${hyperplaneCteSql(nBits, bandBits, dim, threshold)},
       |lsh AS (SELECT count(*) AS n_lsh FROM verified),
       |exact AS (
       |  SELECT count(*) AS n_exact
       |  FROM e a JOIN e b ON a.vec_id < b.vec_id
       |  WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= $threshold)
       |SELECT e.n_exact, l.n_lsh,
       |       round(CAST(l.n_lsh AS DOUBLE) / CAST(nullif(e.n_exact, 0) AS DOUBLE), 4) AS recall
       |FROM exact e, lsh l""".stripMargin

  // --------------------------------------------- duplicate span detection

  /** Cross-document duplicate SPAN detection — substring-level dedup in
    * the suffix-array style (find the duplicated REGIONS inside documents,
    * not just whole-document near-dup pairs; the operation that removes a
    * boilerplate header or a quoted paragraph while keeping the rest of
    * the doc). Whole-doc strategies above can't see a 20-token run shared
    * between two otherwise-different pages; this is the operator that can.
    *
    * Distributed re-expression of the suffix-array scan: a positional
    * 3-shingle is "duplicated" when its hash occurs in ≥ 2 distinct docs;
    * per doc, maximal runs of duplicated shingle positions merge into
    * spans (gaps-and-islands: a new island starts when the next duplicated
    * start position no longer touches the previous shingle's 3-token
    * extent). Only spans ≥ `minSpanTokens` are reported — chance 3-gram
    * collisions produce isolated short islands, genuine duplication
    * produces long runs, so the span-length threshold is the precision
    * knob (suffix-array dedup uses 50-token spans at corpus scale).
    *
    * Scale shape: one positional-shingle explode (≈ tokens-per-corpus
    * rows, the same frame size MinHash already pays), a two-phase
    * distinct+count on the shingle hash (map-side partials — the df
    * relation is shingle-vocabulary-sized, not corpus-sized), a hash join
    * of positions against the duplicated-hash set, and ONE window per doc
    * ordered by position (the per-doc sort is bounded by doc length).
    * Nothing is all-pairs; nothing is driver-side.
    *
    * Output: one row per (doc, span): token-index [span_start, span_end)
    * (0-based, end-exclusive), span_tokens = length, n_dup_shingles =
    * duplicated shingle starts inside the span.
    */
  def duplicateSpans(docs: DataFrame, minSpanTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 3 // shingle width, shared with the whole dedup family
    // persisted: the tokenize+shingle+hash explode is the expensive pass
    // and BOTH consumers below (the duplicated-hash census and the
    // position join) re-derived it in full (2 corpus scans -> 1)
    val sh = Caches.tracked(docs
      .select(col("doc_id"),
        posexplode(Tokenize.shingles3(Tokenize.tokens(col("text")))))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        PortableHash.tokenHash(col("col")).as("h"))
      .persist())
    // duplicated = hash in ≥ 2 distinct docs; distinct-then-count keeps
    // both phases partial-merged (no count(distinct) expand)
    val dup = sh.select("doc_id", "h").distinct()
      .groupBy("h").agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2).select("h")
    val hits = sh.join(dup, "h").select("doc_id", "pos")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val islands = hits
      .withColumn("gap",
        when(col("pos") - lag("pos", 1).over(byPos) > k, 1).otherwise(0))
      .withColumn("island", sum("gap").over(byPos))
    islands.groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max("pos") + k).as("span_end"),
        count(lit(1)).as("n_dup_shingles"))
      .withColumn("span_tokens", col("span_end") - col("span_start"))
      .filter(col("span_tokens") >= minSpanTokens)
      .select("doc_id", "span_start", "span_end", "span_tokens", "n_dup_shingles")
      .orderBy("doc_id", "span_start")
  }

  def duplicateSpansSql(minSpanTokens: Int): String =
    s"""WITH toks AS (
       |  SELECT doc_id, ${Tokenize.tokensSql("text")} AS toks FROM documents),
       |shl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(toks) >= 3
       |           THEN [{'pos': CAST(i - 1 AS BIGINT),
       |                  'h': ${PortableHash.tokenHashSql("toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]")}}
       |                 FOR i IN range(1, len(toks) - 1)]
       |           ELSE [] END AS ss
       |  FROM toks),
       |sh AS (SELECT doc_id, unnest(ss, recursive := true) FROM shl),
       |dup AS (
       |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM sh)
       |  GROUP BY h HAVING count(*) >= 2),
       |hits AS (SELECT s.doc_id, s.pos FROM sh s JOIN dup d ON s.h = d.h),
       |islands AS (
       |  SELECT doc_id, pos,
       |         SUM(CASE WHEN prev IS NULL OR pos - prev > 3 THEN 1 ELSE 0 END)
       |           OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM (SELECT doc_id, pos,
       |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
       |        FROM hits))
       |SELECT doc_id, min(pos) AS span_start, max(pos) + 3 AS span_end,
       |       max(pos) + 3 - min(pos) AS span_tokens,
       |       count(*) AS n_dup_shingles
       |FROM islands
       |GROUP BY doc_id, island
       |HAVING max(pos) + 3 - min(pos) >= $minSpanTokens
       |ORDER BY doc_id, span_start""".stripMargin

  // --------------------------------------- cross-source duplication matrix

  /** Which SOURCES duplicate each other: the LSH near-dup pair relation
    * aggregated into a source-pair matrix (n_pairs + distinct docs
    * involved per unordered source pair). This is the provenance view a
    * corpus owner reads before dropping a source — heavy within-source
    * duplication means a source re-crawls itself (dedup it in place);
    * heavy cross-source duplication means two sources mirror each other
    * (keep one). Pair sources are canonicalized with least/greatest so
    * (A,B) and (B,A) land in one cell.
    *
    * Scale shape: the pair relation is tiny next to the corpus; its two
    * provenance lookups are keyed joins on doc_id against the corpus
    * spine (shuffle-join at scale — the spine is NOT assumed
    * broadcastable), then one partial-combined aggregate on the
    * source-pair key. The planted near-dup copies ([[nearDupCorpus]])
    * map back to their origin doc's source via id mod the copy offset.
    */
  def crossSourceDup(docs: DataFrame, threshold: Double): DataFrame = {
    val pairs = minhashLsh(nearDupCorpus(docs), threshold)
      .select(col("doc_a"), col("doc_b"))
    val src = docs.select(col("doc_id"), col("source"))
    val withSrc = pairs
      .join(src.as("sa"), pairs("doc_a") % 1000000L === col("sa.doc_id"))
      .join(src.as("sb"), pairs("doc_b") % 1000000L === col("sb.doc_id"))
      .select(least(col("sa.source"), col("sb.source")).as("source_lo"),
        greatest(col("sa.source"), col("sb.source")).as("source_hi"),
        col("doc_a"), col("doc_b"))
    withSrc.groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("doc_a")).as("n_docs_a"),
        count_distinct(col("doc_b")).as("n_docs_b"))
      .orderBy(col("source_lo"), col("source_hi"))
  }

  def crossSourceDupSql(threshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corpus AS ($nearDupCorpusSql),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b
       |  FROM cand c JOIN sig x ON c.doc_a = x.doc_id
       |              JOIN sig y ON c.doc_b = y.doc_id
       |  WHERE ($eq) / 16.0 >= $threshold),
       |src AS (SELECT doc_id, source FROM documents),
       |tagged AS (
       |  SELECT least(sa.source, sb.source) AS source_lo,
       |         greatest(sa.source, sb.source) AS source_hi,
       |         p.doc_a, p.doc_b
       |  FROM pairs p JOIN src sa ON p.doc_a % 1000000 = sa.doc_id
       |               JOIN src sb ON p.doc_b % 1000000 = sb.doc_id)
       |SELECT source_lo, source_hi, count(*) AS n_pairs,
       |       count(DISTINCT doc_a) AS n_docs_a,
       |       count(DISTINCT doc_b) AS n_docs_b
       |FROM tagged GROUP BY source_lo, source_hi
       |ORDER BY source_lo, source_hi""".stripMargin
  }

  // ----------------------------------------------------- leakage-safe split

  /** Train/validation/test assignment that cannot leak near-duplicates
    * across splits: the unit of assignment is the near-dup CLUSTER, not
    * the document. Every doc resolves to its cluster id (its own id when
    * unclustered), the cluster id is hashed to a stable percent bucket,
    * and the whole cluster lands in one split — the standard fix for
    * eval contamination via near-identical train/test docs (doc-level
    * random splits put two copies of the same page on both sides). The
    * output is the per-split audit: doc/cluster counts plus
    * `n_leaked_clusters`, the number of clusters straddling splits —
    * structurally zero here, and the column is the PROOF (computed from
    * the assignment, not asserted).
    *
    * Scale shape: clustering as [[nearDupClusters]] (keyed label
    * propagation); the split decision is a pure hash projection on the
    * cluster id; the audit is one aggregate per cluster then one per
    * split. Adding corpus requires no re-split of old clusters — the
    * hash is content-independent and stable.
    */
  def leakageSafeSplit(docs: DataFrame, threshold: Double,
                       testPct: Int, valPct: Int): DataFrame = {
    val corpus = nearDupCorpus(docs)
    leakageSafeSplitFrom(corpus, clustersFor(corpus, threshold), testPct, valPct)
  }

  /** Per-doc split assignment (doc_id, cluster, split) over a precomputed
    * cluster frame — the projection both [[leakageSafeSplitFrom]] and the
    * composed pipeline aggregate over. */
  def splitAssignment(corpus: DataFrame, clustersIn: DataFrame,
                      testPct: Int, valPct: Int): DataFrame =
    corpus.select(col("doc_id"))
      .join(clustersIn.select(col("doc_id"), col("cluster")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .withColumn("bucket",
        PortableHash.tokenHash(col("cluster").cast("string")) % 100)
      .withColumn("split",
        when(col("bucket") < testPct, "test")
          .when(col("bucket") < testPct + valPct, "validation")
          .otherwise("train"))

  /** [[leakageSafeSplit]] over a precomputed cluster frame ([[clustersFor]]). */
  def leakageSafeSplitFrom(corpus: DataFrame, clustersIn: DataFrame,
                           testPct: Int, valPct: Int): DataFrame = {
    val assigned = splitAssignment(corpus, clustersIn, testPct, valPct)
    val perCluster = assigned.groupBy(col("cluster"))
      .agg(count_distinct(col("split")).as("n_splits"))
    assigned.join(perCluster, Seq("cluster"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("cluster")).as("n_clusters"),
        count_distinct(when(col("n_splits") > 1, col("cluster"))).as("n_leaked_clusters"))
      .orderBy(col("split"))
  }

  def leakageSafeSplitSql(threshold: Double, testPct: Int, valPct: Int): String =
    s"""${clustersCteSql(threshold)},
       |assigned AS (
       |  SELECT cr.doc_id,
       |         coalesce(c.cluster, cr.doc_id) AS cluster,
       |         (${PortableHash.tokenHashSql("CAST(coalesce(c.cluster, cr.doc_id) AS VARCHAR)")}) % 100 AS bucket
       |  FROM corpus cr LEFT JOIN comp c ON cr.doc_id = c.id),
       |labeled AS (
       |  SELECT doc_id, cluster,
       |         CASE WHEN bucket < $testPct THEN 'test'
       |              WHEN bucket < ${testPct + valPct} THEN 'validation'
       |              ELSE 'train' END AS split
       |  FROM assigned),
       |per_cluster AS (
       |  SELECT cluster, count(DISTINCT split) AS n_splits FROM labeled GROUP BY cluster)
       |SELECT l.split, count(*) AS n_docs,
       |       count(DISTINCT l.cluster) AS n_clusters,
       |       count(DISTINCT CASE WHEN p.n_splits > 1 THEN l.cluster END) AS n_leaked_clusters
       |FROM labeled l JOIN per_cluster p ON l.cluster = p.cluster
       |GROUP BY l.split ORDER BY l.split""".stripMargin

  // ------------------------------------------------ composed curation pass

  /** One-pass curation audit: a SINGLE cluster build ([[clustersFor]])
    * feeds keep-one canonicalization, dedup-discounted token accounting,
    * and the leakage-safe split — the session shape a real pipeline runs,
    * vs the per-query isolation of `dedup_canonical` /
    * `dedup_effective_tokens` / `dedup_leakage_split`, each of which
    * rebuilds LSH+CC from scratch. The output is a one-row audit spanning
    * all three riders; wall-clock vs the sum of the three standalone
    * queries is the shared-prefix win made visible in the bench.
    *
    * Scale shape: the CC prefix runs once (checkpoint-cadence durable);
    * each rider adds only joins/aggregates keyed on doc or cluster id
    * against the persisted cluster frame. The leak audit's one-row result
    * broadcasts onto the one-row main aggregate.
    */
  def curationPipeline(docs: DataFrame, threshold: Double,
                       testPct: Int, valPct: Int): DataFrame = {
    val corpus = Caches.tracked(nearDupCorpus(docs).persist())
    val clusters = clustersFor(corpus, threshold)
    val canon = canonicalDocsFrom(corpus, clusters)
      .select(col("doc_id"), col("cluster"), col("is_canonical"))
    val toks = corpus.select(col("doc_id"),
      size(Tokenize.tokens(col("text"))).cast("long").as("tokens"))
    val assigned = splitAssignment(corpus, clusters, testPct, valPct)
    val leaks = assigned.groupBy(col("cluster"))
      .agg(count_distinct(col("split")).as("n_splits"))
      .agg(sum(when(col("n_splits") > 1, 1L).otherwise(0L)).as("n_leaked_clusters"))
    canon
      .join(toks, Seq("doc_id"))
      .join(assigned.select(col("doc_id"), col("split")), Seq("doc_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("cluster")).as("n_clusters"),
        sum(col("is_canonical").cast("long")).as("n_canonical"),
        sum(col("tokens")).as("raw_tokens"),
        sum(when(col("cluster") === col("doc_id"), col("tokens")).otherwise(0L))
          .as("kept_tokens"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
        sum(when(col("split") === "validation", 1L).otherwise(0L)).as("n_validation"),
        sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"))
      .crossJoin(broadcast(leaks))
  }

  def curationPipelineSql(threshold: Double, testPct: Int, valPct: Int): String =
    s"""${clustersCteSql(threshold)},
       |lens AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS doc_len FROM corpus),
       |alld AS (
       |  SELECT l.doc_id, coalesce(c.cluster, l.doc_id) AS cluster, l.doc_len
       |  FROM lens l LEFT JOIN comp c ON l.doc_id = c.id),
       |canon AS (
       |  SELECT doc_id, cluster,
       |         CASE WHEN row_number() OVER (PARTITION BY cluster
       |                ORDER BY doc_len DESC, doc_id) = 1
       |              THEN 1 ELSE 0 END AS is_canonical
       |  FROM alld),
       |toks AS (SELECT doc_id, CAST(len(${Tokenize.tokensSql("text")}) AS BIGINT) AS tokens
       |         FROM corpus),
       |labeled AS (
       |  SELECT doc_id, cluster,
       |         CASE WHEN b < $testPct THEN 'test'
       |              WHEN b < ${testPct + valPct} THEN 'validation'
       |              ELSE 'train' END AS split
       |  FROM (SELECT doc_id, cluster,
       |               (${PortableHash.tokenHashSql("CAST(cluster AS VARCHAR)")}) % 100 AS b
       |        FROM alld)),
       |per_cluster AS (
       |  SELECT cluster, count(DISTINCT split) AS n_splits FROM labeled GROUP BY cluster),
       |leaks AS (SELECT CAST(sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |            AS n_leaked_clusters FROM per_cluster)
       |SELECT count(*) AS n_docs,
       |       count(DISTINCT n.cluster) AS n_clusters,
       |       CAST(sum(n.is_canonical) AS BIGINT) AS n_canonical,
       |       CAST(sum(t.tokens) AS BIGINT) AS raw_tokens,
       |       CAST(sum(CASE WHEN n.cluster = n.doc_id THEN t.tokens ELSE 0 END) AS BIGINT)
       |         AS kept_tokens,
       |       CAST(sum(CASE WHEN s.split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       |       CAST(sum(CASE WHEN s.split = 'validation' THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_validation,
       |       CAST(sum(CASE WHEN s.split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
       |       (SELECT n_leaked_clusters FROM leaks) AS n_leaked_clusters
       |FROM canon n JOIN toks t ON n.doc_id = t.doc_id
       |             JOIN labeled s ON n.doc_id = s.doc_id""".stripMargin

  // ------------------------------------------------- hybrid (cross-modal)

  /** Hybrid near-dup audit: LEXICAL recall, SEMANTIC precision. LSH
    * banding over the plain document corpus proposes candidate pairs
    * (the cheap, high-recall lexical stage); each candidate is then
    * scored by BOTH the 16-slot signature agreement (est_jaccard) and
    * the embedding cosine of the two docs (doc_id ↔ vec_id), with
    * `accepted` = cosine ≥ threshold — the modern dedup-pipeline shape
    * where an embedding model adjudicates what token overlap proposed.
    * Pairs where either side lacks an embedding are dropped (inner
    * join): the audit is defined where both modalities exist.
    *
    * Scale shape: candidate count is LSH-bucket-bounded (never
    * all-pairs); the embedding join touches only candidate ids — two
    * hash joins against the vector table, no vector shuffle beyond
    * them. All scoring is the repo's standard rounded-cosine /
    * integer-ratio arithmetic.
    */
  def hybridVerify(docs: DataFrame, emb: DataFrame, cosThreshold: Double): DataFrame = {
    graft.functions.VectorFunctions.register(docs.sparkSession)
    import graft.functions.VectorFunctions.dotD
    val sig = Caches.tracked(
      minhashSignatures(docs.select(col("doc_id"), col("text"))).persist())
    val eq = (0 until 16).map(i =>
      when(col(s"x.s$i") === col(s"y.s$i"), 1).otherwise(0): Column).reduce(_ + _)
    val ev = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))
    val cand = lshCandidates(sig).as("c")
      .join(sig.as("x"), col("c.doc_a") === col("x.doc_id"))
      .join(sig.as("y"), col("c.doc_b") === col("y.doc_id"))
      .select(col("c.doc_a"), col("c.doc_b"), (eq / 16.0).as("est_jaccard"))
    cand
      .join(ev.select(col("vec_id").as("doc_a"), col("v").as("va"), col("nrm").as("na")), "doc_a")
      .join(ev.select(col("vec_id").as("doc_b"), col("v").as("vb"), col("nrm").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        round(dotD(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("cosine"))
      .withColumn("accepted", col("cosine") >= cosThreshold)
      .orderBy("doc_a", "doc_b")
  }

  def hybridVerifySql(cosThreshold: Double): String = {
    val eq = (0 until 16).map(i => s"(CASE WHEN x.s$i = y.s$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH corpus AS (SELECT doc_id, text FROM documents),
       |$sigSql,
       |$bandsSql,
       |$candSql,
       |scored AS (
       |  SELECT c.doc_a, c.doc_b, ($eq) / 16.0 AS est_jaccard
       |  FROM cand c JOIN sig x ON c.doc_a = x.doc_id
       |              JOIN sig y ON c.doc_b = y.doc_id),
       |ev AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings)
       |SELECT s.doc_a, s.doc_b, s.est_jaccard,
       |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine,
       |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= $cosThreshold AS accepted
       |FROM scored s
       |JOIN ev a ON a.vec_id = s.doc_a
       |JOIN ev b ON b.vec_id = s.doc_b
       |ORDER BY s.doc_a, s.doc_b""".stripMargin
  }

  /** Bitext-mining candidates: cross-LANGUAGE near-duplicate pairs in
    * embedding space — the hyperplane-LSH pipeline restricted to pairs
    * whose documents carry different `lang` labels (translation-pair
    * candidates; same-language matches are ordinary near-dups and
    * excluded). The multilingual-corpus curation op: mine parallel data
    * without any lexical overlap assumption.
    *
    * Scale shape: identical to [[hyperplaneLsh]] (sign-bit map-only
    * projection, band bucket join, exact verify on candidates only);
    * the lang attachment is two |docs|-bounded hash joins on the
    * candidate ids.
    */
  def bitextCandidates(docs: DataFrame, emb: DataFrame, nBits: Int,
                       bandBits: Int, dim: Int, threshold: Double): DataFrame = {
    val langs = docs.select(col("doc_id"), col("lang"))
    hyperplaneLsh(emb, nBits, bandBits, dim, threshold)
      .join(langs.select(col("doc_id").as("vec_a"), col("lang").as("lang_a")), "vec_a")
      .join(langs.select(col("doc_id").as("vec_b"), col("lang").as("lang_b")), "vec_b")
      .filter(col("lang_a") =!= col("lang_b"))
      .select(col("vec_a"), col("vec_b"), col("lang_a"), col("lang_b"),
        col("n_bands"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  def bitextCandidatesSql(nBits: Int, bandBits: Int, dim: Int,
                          threshold: Double): String =
    s"""${hyperplaneCteSql(nBits, bandBits, dim, threshold)}
       |SELECT v.vec_a, v.vec_b, da.lang AS lang_a, db.lang AS lang_b,
       |       v.n_bands, v.cosine
       |FROM verified v
       |JOIN documents da ON da.doc_id = v.vec_a
       |JOIN documents db ON db.doc_id = v.vec_b
       |WHERE da.lang <> db.lang
       |ORDER BY v.vec_a, v.vec_b""".stripMargin
}
