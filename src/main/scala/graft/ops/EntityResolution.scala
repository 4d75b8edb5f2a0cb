package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): match dirty/free-text records back
  * to a canonical registry — the data-cleaning operation a training-data
  * pipeline runs when merging catalog-shaped sources that spell the same
  * entity differently.
  *
  * The classic two-stage shape:
  *   1. BLOCK on a reliable structured attribute (here `p_brand`) so the
  *      pairing is per-block, never registry × records. At 100 TB the
  *      block join shuffles both sides on the key; a skewed block salts
  *      or falls back to df-bounded token blocking ([[Dedup.containment]]
  *      shows that device) — the structure is a parameter, the invariant
  *      is "no unblocked pairing".
  *   2. VERIFY candidates with an edit-distance bound. `levenshtein` is a
  *      codegen'd built-in in Spark AND a native function in the oracle
  *      engine, so the verify stage is cross-engine value-checked.
  *
  * Best match per dirty record = lowest distance, ties to the lowest
  * entity id (duplicate names inside a block stay deterministic).
  */
object EntityResolution {

  /** Deterministic "dirty" reading of each registry name: delete one
    * character at a position keyed by the entity id. Pure projection —
    * the fixture supplies the registry; the corruption is reproduced
    * verbatim in the oracle, so the resolver is graded on real string
    * algebra, not on a lucky generator.
    */
  private val dirtyExpr =
    "concat(substr(name, 1, del_pos - 1), substr(name, del_pos + 1, length(name)))"

  /** Resolve every dirty record against the registry: block, verify
    * levenshtein ≤ `maxDist`, rank (distance, entity_id).
    *
    * Blocking is (brand × 2-char prefix) ∪ (brand × 2-char suffix), not
    * brand alone: one edit touches contiguous characters, so any pair
    * within distance 1 shares an INTACT 2-char prefix or suffix — the
    * segment union loses zero recall (the general k-edit form needs k+1
    * segments) while cutting the candidate pairing from |block|² to the
    * sum over much finer char buckets. Measured 12.7 s → ~1 s at sf0.1.
    * A length guard (|Δlen| ≤ maxDist) prunes before the distance
    * computation; pairs found by both segments dedupe BEFORE levenshtein.
    *
    * Output per dirty record: the matched entity, the edit distance, and
    * how many in-block candidates survived the verify (n_candidates > 1
    * ⇒ ambiguous name — the rows a human reviews). Because the segment
    * union is recall-lossless, the output — including n_candidates — is
    * identical to the plain brand-blocked formulation the oracle uses.
    */
  def resolve(part: DataFrame, maxDist: Int): DataFrame = {
    require(maxDist == 1, "prefix/suffix segment blocking covers maxDist = 1")
    val registry = part.select(col("p_partkey").as("entity_id"),
      lower(col("p_name")).as("name"), col("p_brand").as("blk"))
    def seg(df: DataFrame, c: String): DataFrame = df
      .withColumn("pre", substring(col(c), 1, 2))
      .withColumn("suf", expr(s"substr($c, length($c) - 1, 2)"))
    val reg = seg(registry, "name")
    val dirty = seg(registry
      .withColumn("del_pos", (col("entity_id") % length(col("name"))) + 1)
      .select((col("entity_id") + 1000000L).as("dirty_id"),
        expr(dirtyExpr).as("dirty_name"), col("blk")), "dirty_name")
    def half(key: String) = dirty.as("d").join(reg.as("r"),
        col("d.blk") === col("r.blk") && col(s"d.$key") === col(s"r.$key") &&
          abs(length(col("d.dirty_name")) - length(col("r.name"))) <= maxDist)
      .select(col("dirty_id"), col("entity_id"), col("dirty_name"), col("name"))
    val verified = half("pre").union(half("suf")).distinct()
      .withColumn("dist", levenshtein(col("dirty_name"), col("name")))
      .filter(col("dist") <= maxDist)
    val byDirty = Window.partitionBy(col("dirty_id"))
    val ranked = verified
      .withColumn("rk", row_number().over(
        byDirty.orderBy(col("dist"), col("entity_id"))))
      .withColumn("n_candidates", count(lit(1)).over(byDirty))
    ranked.filter(col("rk") === 1)
      .select(col("dirty_id"), col("entity_id").as("matched_id"),
        col("dist").cast("long").as("dist"), col("n_candidates"))
      .orderBy("dirty_id")
  }

  def resolveSql(maxDist: Int): String =
    s"""WITH registry AS (
       |  SELECT p_partkey AS entity_id, lower(p_name) AS name, p_brand AS blk
       |  FROM part),
       |dirty AS (
       |  SELECT entity_id + 1000000 AS dirty_id,
       |         concat(substr(name, 1, CAST(del_pos - 1 AS INTEGER)),
       |                substr(name, CAST(del_pos + 1 AS INTEGER), length(name))) AS dirty_name,
       |         blk
       |  FROM (SELECT entity_id, name, blk,
       |               (entity_id % length(name)) + 1 AS del_pos FROM registry)),
       |verified AS (
       |  SELECT d.dirty_id, r.entity_id,
       |         levenshtein(d.dirty_name, r.name) AS dist
       |  FROM dirty d JOIN registry r ON d.blk = r.blk
       |  WHERE levenshtein(d.dirty_name, r.name) <= $maxDist),
       |ranked AS (
       |  SELECT dirty_id, entity_id, dist,
       |         row_number() OVER (PARTITION BY dirty_id ORDER BY dist, entity_id) AS rk,
       |         count(*) OVER (PARTITION BY dirty_id) AS n_candidates
       |  FROM verified)
       |SELECT dirty_id, entity_id AS matched_id, CAST(dist AS BIGINT) AS dist, n_candidates
       |FROM ranked WHERE rk = 1
       |ORDER BY dirty_id""".stripMargin

  /** Blocking-design audit for the [[resolve]] workload — recall and
    * candidate volume of each blocking scheme WITHOUT materializing a
    * single candidate pair: ground truth is free (each dirty record's
    * true entity is its own source row), so per-scheme recall is a
    * row-local key comparison, and candidate volume is the exact
    * Σ_key |dirty_key|·|registry_key| product of two grouped counts —
    * the same count-product device as the KMV join-cardinality exact
    * path. This is the table an ER engineer reads before choosing a
    * blocking key: brand alone never loses a match but pays ~|block|²
    * pairing; prefix/suffix segments cut volume ~100× and the UNION
    * row shows the segment-union argument (recall back to 100%, volume
    * still far below brand-only) with inclusion–exclusion on the
    * (blk, pre, suf) triple for the overlap.
    *
    * Scale shape: two grouped counts per scheme joined on the block
    * key (key-cardinality-bounded frames), one row-local covered fold —
    * nothing pairwise anywhere; output is 4 rows.
    */
  def blockingRecall(part: DataFrame): DataFrame = {
    val registry = part.select(col("p_partkey").as("entity_id"),
      lower(col("p_name")).as("name"), col("p_brand").as("blk"))
    val reg = registry
      .withColumn("pre", substring(col("name"), 1, 2))
      .withColumn("suf", expr("substr(name, length(name) - 1, 2)"))
    val dirty = registry
      .withColumn("del_pos", (col("entity_id") % length(col("name"))) + 1)
      .withColumn("dname", expr(dirtyExpr))
      .withColumn("tpre", substring(col("name"), 1, 2))
      .withColumn("tsuf", expr("substr(name, length(name) - 1, 2)"))
      .withColumn("dpre", substring(col("dname"), 1, 2))
      .withColumn("dsuf", expr("substr(dname, length(dname) - 1, 2)"))
      .withColumn("cov_pre", (col("dpre") === col("tpre")).cast("long"))
      .withColumn("cov_suf", (col("dsuf") === col("tsuf")).cast("long"))
    val covs = dirty.agg(count(lit(1)).as("n"),
      sum(col("cov_pre")).as("c_pre"), sum(col("cov_suf")).as("c_suf"),
      sum(greatest(col("cov_pre"), col("cov_suf"))).as("c_union"))
    def volume(dKeys: Seq[String], rKeys: Seq[String], as: String): DataFrame = {
      val d = dirty.groupBy(dKeys.map(col): _*).agg(count(lit(1)).as("cd"))
      val r = reg.groupBy(rKeys.map(col): _*).agg(count(lit(1)).as("cr"))
      val cond = dKeys.zip(rKeys).map { case (a, b) => d(a) === r(b) }.reduce(_ && _)
      d.join(r, cond).agg(coalesce(sum(col("cd") * col("cr")), lit(0L)).as(as))
    }
    val vb = volume(Seq("blk"), Seq("blk"), "v_brand")
    val vp = volume(Seq("blk", "dpre"), Seq("blk", "pre"), "v_pre")
    val vs = volume(Seq("blk", "dsuf"), Seq("blk", "suf"), "v_suf")
    val v2 = volume(Seq("blk", "dpre", "dsuf"), Seq("blk", "pre", "suf"), "v_both")
    val one = covs.crossJoin(vb).crossJoin(vp).crossJoin(vs).crossJoin(v2)
      .withColumn("v_union", col("v_pre") + col("v_suf") - col("v_both"))
    one.select(col("n"), explode(array(
        struct(lit("brand").as("scheme"), col("n").as("covered"),
          col("v_brand").as("pairs")),
        struct(lit("brand_prefix").as("scheme"), col("c_pre").as("covered"),
          col("v_pre").as("pairs")),
        struct(lit("brand_suffix").as("scheme"), col("c_suf").as("covered"),
          col("v_suf").as("pairs")),
        struct(lit("prefix_suffix_union").as("scheme"), col("c_union").as("covered"),
          col("v_union").as("pairs")))).as("s"))
      .select(col("s.scheme").as("scheme"), col("n").as("n_records"),
        col("s.covered").as("n_covered"),
        expr("CAST((1000000 * s.covered) DIV n AS BIGINT)").as("recall_ppm"),
        col("s.pairs").as("candidate_pairs"),
        expr("CAST((1000 * s.pairs) DIV n AS BIGINT)").as("pairs_per_record_milli"))
      .orderBy("scheme")
  }

  val blockingRecallSql: String =
    s"""WITH registry AS (
       |  SELECT p_partkey AS entity_id, lower(p_name) AS name, p_brand AS blk
       |  FROM part),
       |reg AS (
       |  SELECT *, substr(name, 1, 2) AS pre,
       |         substr(name, length(name) - 1, 2) AS suf
       |  FROM registry),
       |dirty AS (
       |  SELECT entity_id, blk, name,
       |         concat(substr(name, 1, CAST(del_pos - 1 AS INTEGER)),
       |                substr(name, CAST(del_pos + 1 AS INTEGER), length(name))) AS dname
       |  FROM (SELECT entity_id, name, blk,
       |               (entity_id % length(name)) + 1 AS del_pos FROM registry)),
       |dk AS (
       |  SELECT *, substr(name, 1, 2) AS tpre,
       |         substr(name, length(name) - 1, 2) AS tsuf,
       |         substr(dname, 1, 2) AS dpre,
       |         substr(dname, length(dname) - 1, 2) AS dsuf
       |  FROM dirty),
       |covs AS (
       |  SELECT count(*) AS n,
       |         CAST(sum(CASE WHEN dpre = tpre THEN 1 ELSE 0 END) AS BIGINT) AS c_pre,
       |         CAST(sum(CASE WHEN dsuf = tsuf THEN 1 ELSE 0 END) AS BIGINT) AS c_suf,
       |         CAST(sum(CASE WHEN dpre = tpre OR dsuf = tsuf THEN 1 ELSE 0 END)
       |              AS BIGINT) AS c_union
       |  FROM dk),
       |vb AS (
       |  SELECT CAST(coalesce(sum(d.cd * r.cr), 0) AS BIGINT) AS v_brand
       |  FROM (SELECT blk, count(*) AS cd FROM dk GROUP BY blk) d
       |  JOIN (SELECT blk, count(*) AS cr FROM reg GROUP BY blk) r ON d.blk = r.blk),
       |vp AS (
       |  SELECT CAST(coalesce(sum(d.cd * r.cr), 0) AS BIGINT) AS v_pre
       |  FROM (SELECT blk, dpre, count(*) AS cd FROM dk GROUP BY 1, 2) d
       |  JOIN (SELECT blk, pre, count(*) AS cr FROM reg GROUP BY 1, 2) r
       |    ON d.blk = r.blk AND d.dpre = r.pre),
       |vs AS (
       |  SELECT CAST(coalesce(sum(d.cd * r.cr), 0) AS BIGINT) AS v_suf
       |  FROM (SELECT blk, dsuf, count(*) AS cd FROM dk GROUP BY 1, 2) d
       |  JOIN (SELECT blk, suf, count(*) AS cr FROM reg GROUP BY 1, 2) r
       |    ON d.blk = r.blk AND d.dsuf = r.suf),
       |v2 AS (
       |  SELECT CAST(coalesce(sum(d.cd * r.cr), 0) AS BIGINT) AS v_both
       |  FROM (SELECT blk, dpre, dsuf, count(*) AS cd FROM dk GROUP BY 1, 2, 3) d
       |  JOIN (SELECT blk, pre, suf, count(*) AS cr FROM reg GROUP BY 1, 2, 3) r
       |    ON d.blk = r.blk AND d.dpre = r.pre AND d.dsuf = r.suf),
       |one AS (
       |  SELECT covs.*, vb.v_brand, vp.v_pre, vs.v_suf, v2.v_both,
       |         vp.v_pre + vs.v_suf - v2.v_both AS v_union
       |  FROM covs, vb, vp, vs, v2),
       |rows_out AS (
       |  SELECT 'brand' AS scheme, n, CAST(n AS BIGINT) AS covered, v_brand AS pairs FROM one
       |  UNION ALL
       |  SELECT 'brand_prefix', n, c_pre, v_pre FROM one
       |  UNION ALL
       |  SELECT 'brand_suffix', n, c_suf, v_suf FROM one
       |  UNION ALL
       |  SELECT 'prefix_suffix_union', n, c_union, v_union FROM one)
       |SELECT scheme, n AS n_records, covered AS n_covered,
       |       CAST((1000000 * covered) // n AS BIGINT) AS recall_ppm,
       |       pairs AS candidate_pairs,
       |       CAST((1000 * pairs) // n AS BIGINT) AS pairs_per_record_milli
       |FROM rows_out ORDER BY scheme""".stripMargin

  /** Near-duplicate invoice detection — numeric/temporal blocked ER,
    * the fraud-screen sibling of the name-based [[resolve]]: two orders
    * of the SAME customer whose totals differ by ≤ priceTol and whose
    * order dates are within dayTol days.
    *
    * Blocking: $100 price bands; the probe side also emits its two
    * neighbor bands, so a qualifying pair can never straddle out of
    * reach (band width ≥ priceTol — the pigeonhole argument the dedup
    * prefix join documents), and DISTINCT collapses the double-match of
    * same-band pairs. The join shuffles on (custkey, band) — never an
    * all-pairs product, and fan-out per key is basket-bounded.
    */
  def nearDupInvoices(orders: DataFrame, priceTol: Double, dayTol: Int): DataFrame = {
    require(priceTol <= 100.0, s"band width 100 must cover priceTol, got $priceTol")
    val base = orders.select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
      col("o_totalprice").as("price"),
      expr("unix_micros(o_orderdate) div 86400000000").as("day"),
      floor(col("o_totalprice") / 100).cast("long").as("pb"))
    val probe = base.withColumn("band", explode(array(col("pb") - 1, col("pb"), col("pb") + 1)))
    val pairs = base.as("a")
      .join(probe.as("b"),
        col("a.ck") === col("b.ck") && col("a.pb") === col("b.band") &&
          col("a.ok") < col("b.ok"))
      .filter(abs(col("a.price") - col("b.price")) <= priceTol &&
        abs(col("a.day") - col("b.day")) <= dayTol)
      .select(col("a.ck").as("custkey"),
        col("a.ok").as("order_a"), col("b.ok").as("order_b"),
        col("a.price").as("price_a"), col("b.price").as("price_b"),
        round(abs(col("a.price") - col("b.price")), 2).as("price_diff"),
        abs(col("a.day") - col("b.day")).as("day_gap"))
      .distinct()
    pairs.orderBy("custkey", "order_a", "order_b")
  }

  def nearDupInvoicesSql(priceTol: Double, dayTol: Int): String =
    s"""WITH base AS (
       |  SELECT o_custkey AS ck, o_orderkey AS ok, o_totalprice AS price,
       |         epoch_us(o_orderdate) // 86400000000 AS day,
       |         CAST(floor(o_totalprice / 100) AS BIGINT) AS pb
       |  FROM orders),
       |probe AS (
       |  SELECT ck, ok, price, day, unnest([pb - 1, pb, pb + 1]) AS band FROM base)
       |SELECT DISTINCT a.ck AS custkey, a.ok AS order_a, b.ok AS order_b,
       |       a.price AS price_a, b.price AS price_b,
       |       round(abs(a.price - b.price), 2) AS price_diff,
       |       abs(a.day - b.day) AS day_gap
       |FROM base a JOIN probe b
       |  ON a.ck = b.ck AND a.pb = b.band AND a.ok < b.ok
       |WHERE abs(a.price - b.price) <= $priceTol
       |  AND abs(a.day - b.day) <= $dayTol
       |ORDER BY custkey, order_a, order_b""".stripMargin

  /** Fellegi–Sunter match-weight estimation by EM — the UNSUPERVISED
    * calibration step a record-linkage pipeline runs before [[resolve]]
    * can score: given brand-blocked candidate pairs and three cheap
    * agreement features (first name token, second name token, size
    * within ±1), estimate per-feature m = P(agree | match) and
    * u = P(agree | non-match) plus the match prior, with no labels.
    * The published m/u and agreement/disagreement weight ratios are what
    * a production linker (Splink-style) thresholds on.
    *
    * Parity device — fixed-point EM in non-negative BIGINT ppm (the
    * [[graft.ops.Analytics.markovStationary]] altitude rule): the DATA
    * pass is one blocked self-join folded to the 2³-pattern census
    * (map-side combine → 8 rows); the EM state is SCHEMA-bounded
    * (7 scalars), so iteration runs on the driver in Scala `/` ≡ DuckDB
    * `//` arithmetic and the oracle unrolls rounds as chained CTEs over
    * the same census. E-step conditional probabilities chain
    * multiply-then-truncate per factor (each partial ≤ 1e12 — no
    * overflow); M-step sums are pre-scaled by 1000 before the ppm blow-up
    * so Σn·w·1e6 stays under 2⁶³ at any fixture size (documented bound:
    * n_pairs ≤ 9e12). No logarithm, no float anywhere — every round is
    * bit-identical across engines.
    *
    * Scale shape: the only data-sized work is the blocked pair census
    * (shuffle on brand; block width is vocabulary-bounded; at 100 TB the
    * block key sharpens exactly as [[resolve]] documents — the EM itself
    * never sees more than 8 rows).
    */
  def emWeights(part: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 8, s"rounds must be in [1,8]: $rounds")
    val f = part.select(col("p_partkey").as("k"), col("p_brand").as("blk"),
      expr("split_part(p_name, ' ', 1)").as("t1"),
      expr("split_part(p_name, ' ', 2)").as("t2"),
      col("p_size").cast("long").as("sz"))
    val census = f.as("a").join(f.as("b"),
        col("a.blk") === col("b.blk") && col("a.k") < col("b.k"))
      .select(
        (col("a.t1") === col("b.t1")).cast("int").as("g1"),
        (col("a.t2") === col("b.t2")).cast("int").as("g2"),
        (abs(col("a.sz") - col("b.sz")) <= 1L).cast("int").as("g3"))
      .groupBy(col("g1"), col("g2"), col("g3")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (Array(r.getInt(0), r.getInt(1), r.getInt(2)), r.getLong(3)))
    val M = 1000000L
    var p = 10000L
    var m = Array(800000L, 800000L, 800000L)
    var u = Array(200000L, 200000L, 200000L)
    val nPairs = census.map(_._2).sum
    for (_ <- 1 to rounds) {
      // E-step: per pattern, w = P(match | γ) in ppm. The factor chain
      // truncates after EACH multiply — the oracle nests the same way.
      val ws = census.map { case (g, n) =>
        val a = (0 to 2).foldLeft(p)((acc, i) =>
          acc * (if (g(i) == 1) m(i) else M - m(i)) / M)
        val b = (0 to 2).foldLeft(M - p)((acc, i) =>
          acc * (if (g(i) == 1) u(i) else M - u(i)) / M)
        (g, n, a * M / math.max(a + b, 1L))
      }
      val s = ws.map { case (_, n, w) => n * w }.sum
      val su = ws.map { case (_, n, w) => n * (M - w) }.sum
      p = s / math.max(nPairs, 1L)
      m = (0 to 2).map { i =>
        val si = ws.collect { case (g, n, w) if g(i) == 1 => n * w }.sum
        (si / 1000L) * M / math.max(s / 1000L, 1L)
      }.toArray
      u = (0 to 2).map { i =>
        val si = ws.collect { case (g, n, w) if g(i) == 1 => n * (M - w) }.sum
        (si / 1000L) * M / math.max(su / 1000L, 1L)
      }.toArray
    }
    val spark = part.sparkSession
    import spark.implicits._
    Seq("name_tok1", "name_tok2", "size_within1").zipWithIndex.map { case (name, i) =>
      (name, m(i), u(i),
        m(i) * M / math.max(u(i), 1L),
        (M - m(i)) * M / math.max(M - u(i), 1L),
        p, nPairs)
    }.toDF("feature", "m_ppm", "u_ppm", "w_agree_ppm", "w_disagree_ppm",
      "p_match_ppm", "n_pairs")
      .orderBy(col("feature"))
  }

  def emWeightsSql(rounds: Int): String = {
    val iters = (1 to rounds).map { i =>
      s"""w$i AS (
         |  SELECT g.g1, g.g2, g.g3, g.n,
         |    CAST((a * 1000000) // greatest(a + b, 1) AS BIGINT) AS w
         |  FROM (
         |    SELECT g.g1, g.g2, g.g3, g.n,
         |      (((r.p
         |         * (CASE WHEN g.g1 = 1 THEN r.m1 ELSE 1000000 - r.m1 END) // 1000000)
         |         * (CASE WHEN g.g2 = 1 THEN r.m2 ELSE 1000000 - r.m2 END) // 1000000)
         |         * (CASE WHEN g.g3 = 1 THEN r.m3 ELSE 1000000 - r.m3 END) // 1000000) AS a,
         |      ((((1000000 - r.p)
         |         * (CASE WHEN g.g1 = 1 THEN r.u1 ELSE 1000000 - r.u1 END) // 1000000)
         |         * (CASE WHEN g.g2 = 1 THEN r.u2 ELSE 1000000 - r.u2 END) // 1000000)
         |         * (CASE WHEN g.g3 = 1 THEN r.u3 ELSE 1000000 - r.u3 END) // 1000000) AS b
         |    FROM pat g CROSS JOIN r${i - 1} r) g),
         |r$i AS (
         |  SELECT
         |    CAST(sum(n * w) // greatest(sum(n), 1) AS BIGINT) AS p,
         |    CAST((CAST(sum(CASE WHEN g1 = 1 THEN n * w ELSE 0 END) AS BIGINT) // 1000)
         |         * 1000000 // greatest(CAST(sum(n * w) AS BIGINT) // 1000, 1) AS BIGINT) AS m1,
         |    CAST((CAST(sum(CASE WHEN g2 = 1 THEN n * w ELSE 0 END) AS BIGINT) // 1000)
         |         * 1000000 // greatest(CAST(sum(n * w) AS BIGINT) // 1000, 1) AS BIGINT) AS m2,
         |    CAST((CAST(sum(CASE WHEN g3 = 1 THEN n * w ELSE 0 END) AS BIGINT) // 1000)
         |         * 1000000 // greatest(CAST(sum(n * w) AS BIGINT) // 1000, 1) AS BIGINT) AS m3,
         |    CAST((CAST(sum(CASE WHEN g1 = 1 THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) // 1000)
         |         * 1000000 // greatest(CAST(sum(n * (1000000 - w)) AS BIGINT) // 1000, 1) AS BIGINT) AS u1,
         |    CAST((CAST(sum(CASE WHEN g2 = 1 THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) // 1000)
         |         * 1000000 // greatest(CAST(sum(n * (1000000 - w)) AS BIGINT) // 1000, 1) AS BIGINT) AS u2,
         |    CAST((CAST(sum(CASE WHEN g3 = 1 THEN n * (1000000 - w) ELSE 0 END) AS BIGINT) // 1000)
         |         * 1000000 // greatest(CAST(sum(n * (1000000 - w)) AS BIGINT) // 1000, 1) AS BIGINT) AS u3
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (
       |  SELECT p_partkey AS k, p_brand AS blk,
       |         split_part(p_name, ' ', 1) AS t1, split_part(p_name, ' ', 2) AS t2,
       |         CAST(p_size AS BIGINT) AS sz
       |  FROM part),
       |pat AS (
       |  SELECT CAST(a.t1 = b.t1 AS INT) AS g1, CAST(a.t2 = b.t2 AS INT) AS g2,
       |         CAST(abs(a.sz - b.sz) <= 1 AS INT) AS g3, count(*) AS n
       |  FROM f a JOIN f b ON a.blk = b.blk AND a.k < b.k
       |  GROUP BY 1, 2, 3),
       |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_pairs FROM pat),
       |r0 AS (SELECT CAST(10000 AS BIGINT) AS p,
       |              CAST(800000 AS BIGINT) AS m1, CAST(800000 AS BIGINT) AS m2,
       |              CAST(800000 AS BIGINT) AS m3,
       |              CAST(200000 AS BIGINT) AS u1, CAST(200000 AS BIGINT) AS u2,
       |              CAST(200000 AS BIGINT) AS u3),
       |$iters
       |SELECT f.feature, f.m_ppm, f.u_ppm,
       |       CAST(f.m_ppm * 1000000 // greatest(f.u_ppm, 1) AS BIGINT) AS w_agree_ppm,
       |       CAST((1000000 - f.m_ppm) * 1000000
       |            // greatest(1000000 - f.u_ppm, 1) AS BIGINT) AS w_disagree_ppm,
       |       r.p AS p_match_ppm, tot.n_pairs
       |FROM (
       |  SELECT 'name_tok1' AS feature, m1 AS m_ppm, u1 AS u_ppm FROM r$rounds
       |  UNION ALL SELECT 'name_tok2', m2, u2 FROM r$rounds
       |  UNION ALL SELECT 'size_within1', m3, u3 FROM r$rounds) f
       |CROSS JOIN r$rounds r CROSS JOIN tot
       |ORDER BY feature""".stripMargin
  }
}
