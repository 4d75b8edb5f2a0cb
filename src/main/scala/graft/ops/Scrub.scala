package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact emails, URLs,
  * phone numbers and long ID-like digit runs, keeping per-category
  * counts as the audit trail (the compliance artifact a data pipeline
  * must emit alongside the scrubbed text).
  *
  * Pure per-row projections — regexp count + chained regexp_replace —
  * so the operator is map-only at any corpus size: no shuffle, no UDF,
  * fully inside whole-stage codegen.
  *
  * Patterns are written in the common Java-regex ∩ RE2 dialect
  * (character classes, bounded repeats, \b word boundaries — no
  * lookarounds, which RE2 lacks) so Spark and the DuckDB oracle execute
  * the SAME expressions; redactions apply in a fixed order (url →
  * email → phone → id) in both engines.
  *
  * The fixture corpus contains no PII, so [[taintedCorpus]] plants
  * synthetic PII deterministically from doc_id (the [[Dedup.nearDupCorpus]]
  * device) — every planted category is value-checked end-to-end.
  */
object Scrub {

  /** (name, pattern, replacement) in application order. The categories
    * are disjoint by construction on the tainted fixture (fixture ids
    * are < 6 digits, planted ID runs are ≥ 9).
    */
  val rules: Seq[(String, String, String)] = Seq(
    ("urls", """https://\S+""", "<URL>"),
    ("emails", """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}""", "<EMAIL>"),
    ("phones", """\b[0-9]{3}-[0-9]{4}\b""", "<PHONE>"),
    ("ids", """\b[0-9]{6,}\b""", "<ID>"))

  /** Fixture docs with synthetic PII appended by doc_id rule —
    * reproduced verbatim in the oracle.
    */
  def taintedCorpus(docs: DataFrame): DataFrame = {
    val id = col("doc_id").cast("string")
    def planted(mod: Int, c: Column): Column =
      when(col("doc_id") % mod === 0, c).otherwise(lit(""))
    docs.select(col("doc_id"), concat(
      col("text"),
      planted(5, concat(lit(" contact user"), id, lit("@example.com"))),
      planted(7, concat(lit(" visit https://site"), id, lit(".example.org/p"), id)),
      planted(11, concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))),
      planted(13, concat(lit(" ref "), (col("doc_id") * 7919L + 123456789L).cast("string")))
    ).as("text"))
  }

  // NOTE: continuation `||` stays at END of line — a leading `||` would
  // lose its first pipe to the EMBEDDING query's stripMargin
  val taintedCorpusSql: String =
    """SELECT doc_id,
      |  text ||
      |  CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN ' visit https://site' || CAST(doc_id AS VARCHAR) || '.example.org/p' || CAST(doc_id AS VARCHAR) ELSE '' END ||
      |  CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
      |  CASE WHEN doc_id % 13 = 0 THEN ' ref ' || CAST(doc_id * 7919 + 123456789 AS VARCHAR) ELSE '' END
      |  AS text
      |FROM documents""".stripMargin

  /** Per-doc scrub: category counts (on the original text) + the
    * redacted text's fingerprint + total redactions.
    */
  def scrubPii(docs: DataFrame): DataFrame = {
    val counts = rules.map { case (name, pat, _) =>
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long").as(s"n_$name")
    }
    val scrubbed = rules.foldLeft(col("text")) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    docs.select(
      Seq(col("doc_id")) ++ counts ++ Seq(
        md5(scrubbed.cast("binary")).as("scrubbed_md5")): _*)
      .withColumn("n_redactions",
        rules.map(r => col(s"n_${r._1}")).reduce(_ + _))
      .orderBy("doc_id")
  }

  val scrubPiiSql: String = {
    val counts = rules.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, '$pat')) AS BIGINT) AS n_$name"
    }.mkString(",\n  ")
    val scrubbed = rules.foldLeft("text") { case (c, (_, pat, repl)) =>
      s"regexp_replace($c, '$pat', '$repl', 'g')"
    }
    val total = rules.map(r => s"n_${r._1}").mkString(" + ")
    s"""WITH tainted AS ($taintedCorpusSql),
       |c AS (
       |  SELECT doc_id,
       |  $counts,
       |  md5($scrubbed) AS scrubbed_md5
       |  FROM tainted)
       |SELECT doc_id, n_urls, n_emails, n_phones, n_ids, scrubbed_md5,
       |       n_urls + n_emails + n_phones + n_ids AS n_redactions
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** k-anonymity audit across the generalization ladder: ROLLUP over the
    * quasi-identifier columns (nation, market segment, account-balance
    * band) gives every suppress-from-the-right generalization level in
    * ONE aggregate, and a second tiny aggregate per level reports how
    * identifiable the release would be — group count, smallest group,
    * groups under k, and the share of rows living in those groups. The
    * standard release decision: publish at the first level whose
    * rows-at-risk share is acceptable.
    *
    * Scale shape: rollup's Expand multiplies rows by (#QI + 1) = 4, all
    * absorbed by map-side partial aggregation into |distinct QI combos|
    * partials; the per-level summary aggregates |groups| rows. No
    * windows, no joins. The suppression level is recovered from the
    * rollup NULLs (QI columns are non-null by fixture contract), which
    * keeps the SQL portable — no grouping_id() dialect dependence.
    */
  def kAnonymity(customer: DataFrame, k: Int): DataFrame = {
    val qi = customer.select(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
    val groups = qi.rollup(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("g_n"))
      .withColumn("n_suppressed",
        col("bal_band").isNull.cast("int") + col("segment").isNull.cast("int") +
          col("nation").isNull.cast("int"))
    groups.groupBy(col("n_suppressed"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("g_n")).as("min_group_n"),
        sum(when(col("g_n") < k, 1L).otherwise(0L)).as("at_risk_groups"),
        sum(when(col("g_n") < k, col("g_n")).otherwise(0L)).as("rows_at_risk"),
        sum(col("g_n")).as("n_rows"))
      .withColumn("pct_rows_at_risk",
        round(col("rows_at_risk").cast("double") * 100d / col("n_rows").cast("double"), 6))
      .orderBy(col("n_suppressed"))
  }

  /** l-diversity audit — the refinement k-anonymity misses: a class can
    * be k-large yet expose its sensitive attribute when every member
    * shares one value. Equivalence classes = (nation, segment); the
    * sensitive attribute = the $1000 account-balance band. Per class:
    * size k, distinct sensitive values l, the dominant band's share
    * (homogeneity-attack risk), and the `diverse` flag l ≥ minL.
    * Integer counts + one exact-ratio double; one partial-agged groupBy
    * chain, no window.
    */
  def lDiversity(customer: DataFrame, minL: Int): DataFrame = {
    val qi = customer.select(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
    val cells = qi.groupBy(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("c"))
    cells.groupBy(col("nation"), col("segment"))
      .agg(sum(col("c")).as("k"),
        count(lit(1)).as("l"),
        max(col("c")).as("dominant_n"))
      .select(col("nation"), col("segment"), col("k"), col("l"),
        round(col("dominant_n").cast("double") / col("k").cast("double"), 6)
          .as("dominant_share"),
        (col("l") >= minL).as("diverse"))
      .orderBy("nation", "segment")
  }

  def lDiversitySql(minL: Int): String =
    s"""WITH qi AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
       |  FROM customer),
       |cells AS (
       |  SELECT nation, segment, bal_band, count(*) AS c
       |  FROM qi GROUP BY 1, 2, 3)
       |SELECT nation, segment,
       |       CAST(sum(c) AS BIGINT) AS k,
       |       count(*) AS l,
       |       round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS dominant_share,
       |       count(*) >= $minL AS diverse
       |FROM cells GROUP BY nation, segment
       |ORDER BY nation, segment""".stripMargin

  /** Oracle SQL for [[kAnonymity]]. */
  def kAnonymitySql(k: Int): String =
    s"""WITH qi AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
       |  FROM customer),
       |groups AS (
       |  SELECT nation, segment, bal_band, count(*) AS g_n,
       |         CAST(bal_band IS NULL AS INT) + CAST(segment IS NULL AS INT) +
       |           CAST(nation IS NULL AS INT) AS n_suppressed
       |  FROM qi GROUP BY ROLLUP (nation, segment, bal_band))
       |SELECT n_suppressed, count(*) AS n_groups, min(g_n) AS min_group_n,
       |       CAST(sum(CASE WHEN g_n < $k THEN 1 ELSE 0 END) AS BIGINT) AS at_risk_groups,
       |       CAST(sum(CASE WHEN g_n < $k THEN g_n ELSE 0 END) AS BIGINT) AS rows_at_risk,
       |       CAST(sum(g_n) AS BIGINT) AS n_rows,
       |       round(CAST(sum(CASE WHEN g_n < $k THEN g_n ELSE 0 END) AS DOUBLE) * 100
       |             / CAST(sum(g_n) AS DOUBLE), 6) AS pct_rows_at_risk
       |FROM groups GROUP BY n_suppressed ORDER BY n_suppressed""".stripMargin

  /** t-closeness audit — the final rung of the release-privacy ladder
    * (k-anonymity bounds class SIZE, l-diversity bounds sensitive-value
    * COUNT, t-closeness bounds the sensitive-value DISTRIBUTION): per
    * equivalence class (nation, segment), the total-variation distance
    * between the class's account-balance-band distribution and the
    * GLOBAL band distribution. A class can be k-large and l-diverse yet
    * still leak (e.g. 90% of its members in the top band when the
    * population has 10% there) — t-closeness is the audit that catches
    * it.
    *
    * TVD instead of the paper's EMD on purpose — the [[graft.ops
    * .TextAnalysis.sourceTvd]] device: ½·Σ|p−q| cross-multiplies into
    * EXACT BIGINT (Σ|c·N − C·k| over the global band alphabet, then one
    * truncating DIV by 2·k·N; no data-dependent float). BIGINT budget:
    * each term ≤ k·N and the 1e6 ppm scaling holds while k·N ≤ ~9e12 —
    * at any realistic class size the per-class k caps it far below.
    *
    * Scale shape: one groupBy to class×band cells, one tiny global-band
    * aggregate broadcast-cross-joined against the |classes|-bounded
    * class list (bands missing from a class still contribute |0·N−C·k|,
    * so the grid is classes × global bands), two partial-agged
    * aggregates. No window, no data-sized join.
    */
  def tCloseness(customer: DataFrame, tPpm: Long): DataFrame = {
    val qi = customer.select(
      col("c_nationkey").as("nation"),
      col("c_mktsegment").as("segment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
    val cells = qi.groupBy(col("nation"), col("segment"), col("bal_band"))
      .agg(count(lit(1)).as("c"))
    val cellsC = Caches.tracked(cells.persist())
    val global = cellsC.groupBy(col("bal_band")).agg(sum(col("c")).as("cg"))
    val classes = cellsC.groupBy(col("nation"), col("segment")).agg(sum(col("c")).as("k"))
    val n = broadcast(global.agg(sum(col("cg")).as("n_total")))
    classes.join(broadcast(global))
      .join(cellsC, Seq("nation", "segment", "bal_band"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(n)
      .groupBy(col("nation"), col("segment"), col("k"), col("n_total"))
      .agg(sum(when(col("c") > 0L, 1L).otherwise(0L)).as("n_bands"),
        sum(abs(col("c") * col("n_total") - col("cg") * col("k"))).as("s"))
      .select(col("nation"), col("segment"), col("k"), col("n_bands"),
        expr("CAST((1000000 * s) DIV (2 * k * n_total) AS BIGINT)").as("t_ppm"),
        expr(s"CAST((1000000 * s) DIV (2 * k * n_total) AS BIGINT) <= $tPpm").as("t_close"))
      .orderBy(col("nation"), col("segment"))
  }

  def tClosenessSql(tPpm: Long): String =
    s"""WITH qi AS (
       |  SELECT c_nationkey AS nation, c_mktsegment AS segment,
       |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
       |  FROM customer),
       |cells AS (
       |  SELECT nation, segment, bal_band, count(*) AS c FROM qi GROUP BY 1, 2, 3),
       |global AS (
       |  SELECT bal_band, CAST(sum(c) AS BIGINT) AS cg FROM cells GROUP BY 1),
       |classes AS (
       |  SELECT nation, segment, CAST(sum(c) AS BIGINT) AS k FROM cells GROUP BY 1, 2),
       |n AS (SELECT CAST(sum(cg) AS BIGINT) AS n_total FROM global),
       |j AS (
       |  SELECT cl.nation, cl.segment, cl.k, n.n_total, g.cg,
       |         coalesce(ce.c, 0) AS c
       |  FROM classes cl CROSS JOIN global g CROSS JOIN n
       |  LEFT JOIN cells ce ON ce.nation = cl.nation AND ce.segment = cl.segment
       |                    AND ce.bal_band = g.bal_band)
       |SELECT nation, segment, k,
       |       CAST(sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bands,
       |       CAST((1000000 * CAST(sum(abs(c * n_total - cg * k)) AS BIGINT))
       |            // (2 * k * n_total) AS BIGINT) AS t_ppm,
       |       CAST((1000000 * CAST(sum(abs(c * n_total - cg * k)) AS BIGINT))
       |            // (2 * k * n_total) AS BIGINT) <= $tPpm AS t_close
       |FROM j GROUP BY nation, segment, k, n_total
       |ORDER BY nation, segment""".stripMargin

  /** Right-to-erasure propagation audit: given a deterministic purge set
    * (pk ≡ 17 mod 131 stands in for the uploaded request list), report
    * per table how the purge lands at BOTH layers a CDC pipeline must
    * erase — the raw changelog (events to redact) and the materialized
    * state (rows to delete) — plus an order-independent checksum of the
    * retained state, the artifact a compliance job files as proof.
    *
    * Scale shape: one pass over the changelog (conditional sums) plus the
    * standard one-shuffle LWW materialize; the checksum is a SUM of
    * per-row [[graft.functions.PortableHash]] values in DECIMAL(38,0)
    * (commutative — the [[graft.cdc.ChangelogApply.reconcileRanges]]
    * device), so no ordering constraint ever forms. The wide sum stays
    * INTERNAL: the output column is `sum % 9007199254740881` (a prime
    * below 2^53) cast to BIGINT, so the exposed value survives any
    * float64 round-trip in a downstream reader exactly — raw
    * DECIMAL(38,0) outputs rendered differently across readers once the
    * sum exceeded the 53-bit mantissa (see build notes, round-7).
    */
  def gdprPurge(changelog: DataFrame): DataFrame = {
    val flagged = col("pk") % 131 === 17
    // integral cents key, NOT a decimal-cast string: floor(value * 100) is
    // IEEE-identical in Spark and DuckDB, whereas double→DECIMAL(18,2)
    // tie-rounds differently (Spark HALF_UP on the shortest decimal repr,
    // DuckDB binary-double scaling) and diverges on .xx5-landing values
    val rowHash = graft.functions.PortableHash.tokenHash(
      concat_ws("|", col("pk"), col("pos"), floor(col("value") * 100).cast("long")))
      .cast("decimal(38,0)")
    val ev = changelog.groupBy(col("tbl")).agg(
      count(lit(1)).as("n_events"),
      sum(when(flagged, 1L).otherwise(0L)).as("n_events_redacted"))
    val st = graft.cdc.ChangelogApply.materialize(changelog).groupBy(col("tbl")).agg(
      count(lit(1)).as("n_state_rows"),
      sum(when(flagged, 1L).otherwise(0L)).as("n_state_purged"),
      (sum(when(!flagged, rowHash).otherwise(lit(0).cast("decimal(38,0)")))
        % lit(9007199254740881L)).cast("long")
        .as("retained_checksum"))
    ev.join(st, "tbl").orderBy("tbl")
  }

  /** Oracle SQL for [[gdprPurge]] given a changelog CTE body. */
  def gdprPurgeSql(clCte: String): String = {
    val h = "CAST(concat('0x', substr(md5(concat_ws('|', pk, pos, " +
      "CAST(floor(value * 100) AS BIGINT))), 1, 15)) AS BIGINT)"
    s"""WITH cl AS ($clCte),
       |ev AS (
       |  SELECT tbl, count(*) AS n_events,
       |         CAST(sum(CASE WHEN pk % 131 = 17 THEN 1 ELSE 0 END) AS BIGINT) AS n_events_redacted
       |  FROM cl GROUP BY tbl),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY tbl, pk ORDER BY pos DESC) AS rn
       |  FROM cl),
       |state AS (SELECT tbl, pk, pos, value FROM ranked WHERE rn = 1 AND op <> 'D'),
       |st AS (
       |  SELECT tbl, count(*) AS n_state_rows,
       |         CAST(sum(CASE WHEN pk % 131 = 17 THEN 1 ELSE 0 END) AS BIGINT) AS n_state_purged,
       |         CAST(sum(CASE WHEN pk % 131 = 17 THEN CAST(0 AS DECIMAL(38,0))
       |                  ELSE CAST($h AS DECIMAL(38,0)) END)
       |              % 9007199254740881 AS BIGINT) AS retained_checksum
       |  FROM state GROUP BY tbl)
       |SELECT e.tbl, e.n_events, e.n_events_redacted,
       |       s.n_state_rows, s.n_state_purged, s.retained_checksum
       |FROM ev e JOIN st s ON e.tbl = s.tbl
       |ORDER BY e.tbl""".stripMargin
  }
}
