package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One edge of a foreign-key graph for [[Profiling.orphanAudit]]. */
final case class FkEdge(
    childName: String,
    child: DataFrame,
    fk: String,
    parentName: String,
    parent: DataFrame,
    pk: String)

/** Single-pass-per-column profiling — the ANALYZE-TABLE shape every
  * ingest pipeline runs before trusting a new source: per-column
  * non-null count, exact distinct count, and min/max.
  *
  * Scale shape: one UNION branch per column, each an aggregate over a
  * single-column projection — the parquet scan reads exactly that
  * column, and the exact COUNT(DISTINCT) runs as a two-phase partial
  * distinct (the shuffle carries distinct values, not rows). The
  * obvious alternative — all distincts in ONE aggregate — plans as
  * Expand, multiplying every row by the distinct-column count before
  * the first partial (measured 15.7 s vs ~1 s on 600k rows × 8
  * columns). Exact multi-column distinct profiling at 100 TB would use
  * the mergeable KMV sketch ([[Sketches]], ~k·8 B per column) — this
  * operator is the exact reference the sketch is graded against.
  */
object Profiling {

  def tableProfile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    val branches =
      numCols.map { c =>
        df.select(col(c)).agg(
          lit(c).as("col_name"),
          count(col(c)).as("n_nonnull"),
          count_distinct(col(c)).as("n_distinct"),
          min(col(c)).cast("double").as("min_num"),
          max(col(c)).cast("double").as("max_num"),
          lit(null).cast("string").as("min_str"),
          lit(null).cast("string").as("max_str"))
      } ++ strCols.map { c =>
        df.select(col(c)).agg(
          lit(c).as("col_name"),
          count(col(c)).as("n_nonnull"),
          count_distinct(col(c)).as("n_distinct"),
          lit(null).cast("double").as("min_num"),
          lit(null).cast("double").as("max_num"),
          min(col(c)).as("min_str"),
          max(col(c)).as("max_str"))
      }
    branches.reduce(_ unionAll _).orderBy("col_name")
  }

  /** Oracle SQL: the same per-column aggregates, unioned. */
  def tableProfileSql(table: String, numCols: Seq[String], strCols: Seq[String]): String = {
    val rows = numCols.map(c =>
      s"SELECT '$c' AS col_name, count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct, " +
        s"CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num, " +
        s"CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM $table") ++
      strCols.map(c =>
        s"SELECT '$c', count($c), count(DISTINCT $c), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
          s"min($c), max($c) FROM $table")
    s"""${rows.mkString("\n  UNION ALL\n")}
       |ORDER BY col_name""".stripMargin
  }

  /** Referential-integrity audit over a foreign-key graph: per edge, the
    * number of child rows (and distinct keys) whose FK has no matching
    * parent. Zero on a consistent warehouse — the audit's PASS state —
    * and exact counts on a corrupted ingest batch.
    *
    * Scale shape: each edge aggregates the child per key FIRST (map-side
    * partials shrink the shuffle to distinct keys), then a LEFT ANTI
    * join against the parent's key projection — never the raw child
    * rows against the parent. Edges are independent branches of one
    * union, so Spark schedules them concurrently.
    */
  def orphanAudit(edges: Seq[FkEdge]): DataFrame =
    edges.map { e =>
      e.child.groupBy(col(e.fk).as("k")).agg(count(lit(1)).as("n"))
        .join(e.parent.select(col(e.pk).as("k")).distinct(), Seq("k"), "left_anti")
        .agg(
          coalesce(sum(col("n")), lit(0L)).as("n_orphan_rows"),
          count(lit(1)).as("n_orphan_keys"))
        .select(
          lit(e.childName).as("child_tbl"),
          lit(e.fk).as("fk"),
          lit(e.parentName).as("parent_tbl"),
          col("n_orphan_rows"),
          col("n_orphan_keys"))
    }.reduce(_ unionAll _).orderBy("child_tbl", "fk")

  /** Oracle: (childName, childRelationSql, fk, parentName, parentRelationSql, pk). */
  def orphanAuditSql(edges: Seq[(String, String, String, String, String, String)]): String = {
    val rows = edges.map { case (cn, cRel, fk, pn, pRel, pk) =>
      s"""SELECT '$cn' AS child_tbl, '$fk' AS fk, '$pn' AS parent_tbl,
         |  CAST(coalesce(sum(n), 0) AS BIGINT) AS n_orphan_rows,
         |  CAST(count(*) AS BIGINT) AS n_orphan_keys
         |FROM (SELECT $fk AS k, count(*) AS n FROM $cRel GROUP BY 1) c
         |WHERE NOT EXISTS (SELECT 1 FROM $pRel p WHERE p.$pk = c.k)""".stripMargin
    }
    s"""${rows.mkString("\nUNION ALL\n")}
       |ORDER BY child_tbl, fk""".stripMargin
  }

  final case class FdCandidate(name: String, df: DataFrame, det: Seq[String], dep: String)

  /** Approximate functional-dependency audit — for each DECLARED
    * candidate FD `det → dep`, the g3 violation measure: the minimum
    * number of rows to delete so the FD holds exactly (per determinant
    * group, everything except the plurality dependent value violates).
    * This is the profiling pass a schema-discovery / data-contract
    * pipeline runs to find which "keys" actually determine which
    * attributes, and how dirty the near-FDs are. A key FD reports 0
    * violations; a fabricated FD reports a large ppm.
    *
    * Scale shape: per FD, two partial-aggregated shuffles over only the
    * FD's columns (pruned scan): groupBy(det, dep) counts, then a
    * per-det max/sum, then one global fold — never a self-join, never a
    * distinct-pairs materialization. All outputs exact integers
    * (truncating-DIV ppm).
    */
  def fdAudit(fds: Seq[FdCandidate]): DataFrame =
    fds.map { f =>
      val detCols = f.det.map(col)
      f.df.groupBy(detCols :+ col(f.dep): _*).agg(count(lit(1)).as("n"))
        .groupBy(detCols: _*)
        .agg(sum(col("n")).as("nr"), max(col("n")).as("keep"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("nr")).as("n_rows"), sum(col("keep")).as("n_keep"))
        .select(lit(f.name).as("fd"), col("n_groups"), col("n_rows"), col("n_keep"),
          (col("n_rows") - col("n_keep")).as("n_violations"),
          expr("CAST((1000000 * (n_rows - n_keep)) DIV n_rows AS BIGINT)")
            .as("violation_ppm"))
    }.reduce(_ unionAll _).orderBy("fd")

  /** Oracle rows: (name, relationSql, detCols, depCol). */
  def fdAuditSql(fds: Seq[(String, String, Seq[String], String)]): String = {
    val rows = fds.map { case (name, rel, det, dep) =>
      val detList = det.mkString(", ")
      s"""SELECT '$name' AS fd,
         |  CAST(count(*) AS BIGINT) AS n_groups,
         |  CAST(sum(nr) AS BIGINT) AS n_rows,
         |  CAST(sum(keep) AS BIGINT) AS n_keep,
         |  CAST(sum(nr) - sum(keep) AS BIGINT) AS n_violations,
         |  CAST((1000000 * (sum(nr) - sum(keep))) // sum(nr) AS BIGINT) AS violation_ppm
         |FROM (
         |  SELECT $detList, sum(n) AS nr, max(n) AS keep
         |  FROM (SELECT $detList, $dep, count(*) AS n FROM $rel GROUP BY $detList, $dep) c
         |  GROUP BY $detList) g""".stripMargin
    }
    s"""SELECT * FROM (
       |${rows.mkString("\nUNION ALL\n")}
       |) ORDER BY fd""".stripMargin
  }

  /** Benford's-law first-digit audit over order totals — the classic
    * fabricated-data screen: naturally-occurring amounts follow
    * P(d) = log₁₀(1 + 1/d); synthetic or tampered ledgers don't. Output
    * is the observed vs expected share per leading digit with absolute
    * deviation — a data-quality artifact, not a verdict.
    *
    * Scale shape: one 9-group partial-merged aggregate; the total for
    * shares is a window over the NINE digit rows. The leading digit is
    * extracted from the BIGINT's decimal string (floor first — Spark's
    * double→long cast truncates where DuckDB's rounds, the one cast the
    * two engines disagree on).
    */
  /** Declarative expectation suite — the data-contract gate an ingest
    * pipeline runs before publishing a batch (not-null, range, set
    * membership, key uniqueness, cross-field bounds), evaluated as ONE
    * conditional aggregate per table plus the distinct-count the
    * uniqueness rules need. A NULL failing a range/set rule counts as a
    * violation (`coalesce(pred, false)`), matching contract semantics.
    *
    * Scale shape: one partial-agged scan per table; the per-rule ledger
    * is built by exploding a literal rule array off the single aggregate
    * row — no per-rule re-scan, no join. FK reachability lives in
    * [[orphanAudit]]; this suite is the single-table contract layer.
    */
  def expectations(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    def failed(pred: Column) =
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L))
    def rule(name: String, tbl: String, n: Column, f: Column) =
      struct(lit(name).as("rule"), lit(tbl).as("tbl"),
        n.as("n_checked"), f.cast("long").as("n_failed"))
    val o = orders.agg(
      count(lit(1)).as("n"),
      failed(col("o_custkey").isNotNull).as("f_nn"),
      failed(col("o_totalprice") > 0).as("f_pos"),
      failed(col("o_orderpriority").isin(prios: _*)).as("f_set"),
      failed(col("o_orderdate").cast("date")
        .between(lit("1990-01-01").cast("date"), lit("2005-12-31").cast("date"))).as("f_rng"),
      (count(lit(1)) - count_distinct(col("o_orderkey"))).as("f_uni"))
    val li = lineitem.agg(
      count(lit(1)).as("n"),
      failed(col("l_discount").between(0.0, 1.0)).as("f_disc"),
      failed(col("l_quantity") > 0).as("f_qty"),
      // composite key packed integrally (l_linenumber < 100 by contract)
      (count(lit(1)) - count_distinct(col("l_orderkey") * 100 + col("l_linenumber"))).as("f_uni"))
    val oRules = o.select(explode(array(
      rule("o_custkey_not_null", "orders", col("n"), col("f_nn")),
      rule("o_totalprice_positive", "orders", col("n"), col("f_pos")),
      rule("o_orderpriority_in_set", "orders", col("n"), col("f_set")),
      rule("o_orderdate_in_range", "orders", col("n"), col("f_rng")),
      rule("o_orderkey_unique", "orders", col("n"), col("f_uni")))).as("r"))
    val liRules = li.select(explode(array(
      rule("li_discount_unit_interval", "lineitem", col("n"), col("f_disc")),
      rule("li_quantity_positive", "lineitem", col("n"), col("f_qty")),
      rule("li_pk_unique", "lineitem", col("n"), col("f_uni")))).as("r"))
    oRules.unionByName(liRules)
      .select(col("r.rule").as("rule"), col("r.tbl").as("tbl"),
        col("r.n_checked").as("n_checked"), col("r.n_failed").as("n_failed"),
        (col("r.n_failed") === 0L).as("pass"),
        round(col("r.n_failed").cast("double") /
          nullif(col("r.n_checked").cast("double"), lit(0.0)), 6).as("fail_rate"))
      .orderBy("rule")
  }

  def expectationsSql: String = {
    val prios = "'1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'"
    def f(pred: String) =
      s"CAST(sum(CASE WHEN coalesce($pred, false) THEN 0 ELSE 1 END) AS BIGINT)"
    s"""WITH o AS (
       |  SELECT count(*) AS n,
       |         ${f("o_custkey IS NOT NULL")} AS f_nn,
       |         ${f("o_totalprice > 0")} AS f_pos,
       |         ${f(s"o_orderpriority IN ($prios)")} AS f_set,
       |         ${f("CAST(o_orderdate AS DATE) BETWEEN DATE '1990-01-01' AND DATE '2005-12-31'")} AS f_rng,
       |         count(*) - count(DISTINCT o_orderkey) AS f_uni
       |  FROM orders),
       |li AS (
       |  SELECT count(*) AS n,
       |         ${f("l_discount BETWEEN 0.0 AND 1.0")} AS f_disc,
       |         ${f("l_quantity > 0")} AS f_qty,
       |         count(*) - count(DISTINCT l_orderkey * 100 + l_linenumber) AS f_uni
       |  FROM lineitem),
       |rules AS (
       |  SELECT 'o_custkey_not_null' AS rule, 'orders' AS tbl, n AS n_checked, f_nn AS n_failed FROM o
       |  UNION ALL SELECT 'o_totalprice_positive', 'orders', n, f_pos FROM o
       |  UNION ALL SELECT 'o_orderpriority_in_set', 'orders', n, f_set FROM o
       |  UNION ALL SELECT 'o_orderdate_in_range', 'orders', n, f_rng FROM o
       |  UNION ALL SELECT 'o_orderkey_unique', 'orders', n, f_uni FROM o
       |  UNION ALL SELECT 'li_discount_unit_interval', 'lineitem', n, f_disc FROM li
       |  UNION ALL SELECT 'li_quantity_positive', 'lineitem', n, f_qty FROM li
       |  UNION ALL SELECT 'li_pk_unique', 'lineitem', n, f_uni FROM li)
       |SELECT rule, tbl, CAST(n_checked AS BIGINT) AS n_checked,
       |       CAST(n_failed AS BIGINT) AS n_failed,
       |       n_failed = 0 AS pass,
       |       round(CAST(n_failed AS DOUBLE) / nullif(CAST(n_checked AS DOUBLE), 0.0), 6)
       |         AS fail_rate
       |FROM rules ORDER BY rule""".stripMargin
  }

  def benfordAudit(orders: DataFrame): DataFrame = {
    val v = floor(col("o_totalprice")).cast("long")
    val digit = substring(v.cast("string"), 1, 1).cast("int")
    val byDigit = orders.filter(col("o_totalprice") >= 1.0)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    byDigit
      .withColumn("share",
        round(col("n").cast("double") / sum(col("n")).over(w).cast("double"), 6))
      .withColumn("benford",
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0)), 6))
      .select(col("digit"), col("n"), col("share"), col("benford"),
        round(abs(col("share") - col("benford")), 6).as("abs_dev"))
      .orderBy("digit")
  }

  val benfordAuditSql: String =
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
      |  FROM orders WHERE o_totalprice >= 1.0),
      |g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit)
      |SELECT digit, n,
      |       round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6) AS share,
      |       round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6) AS benford,
      |       round(abs(round(CAST(n AS DOUBLE) / CAST(sum(n) OVER () AS DOUBLE), 6)
      |                 - round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 6)), 6) AS abs_dev
      |FROM g ORDER BY digit""".stripMargin

  /** Distribution-drift audit: Population Stability Index of `value` per
    * event type between the first and second halves of the stream (split
    * at the midpoint event time). PSI = Σ (pᵢ − qᵢ)·ln(pᵢ/qᵢ) over 10
    * equal-width bins spanning the type's observed range; the standard
    * release gate before retraining on refreshed data (< 0.1 stable,
    * > 0.25 drifted).
    *
    * Laplace-smoothed bin shares ((c+1)/(N+10)) keep empty bins finite
    * without dropping them — an asymmetric occupancy difference is
    * precisely the drift signal. Scale shape: the midpoint and per-type
    * ranges are tiny one-row/|types|-row aggregates broadcast back; bin
    * counts partial-aggregate map-side into ≤ 10·|types| partials; both
    * halves bin in the SAME single scan (conditional sums, no
    * per-half subtrees). All bin/half arithmetic is written identically
    * in both engines, so the binning is bit-reproducible; only the final
    * 10-term PSI sum is rounded (6 dp).
    */
  def psiDrift(events: DataFrame): DataFrame = {
    val us = expr("unix_micros(ts)")
    val mid = events.agg(expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("mid_us"))
    val ranges = events.groupBy(col("event_type"))
      .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
    val byBin = events
      .crossJoin(broadcast(mid))
      .join(broadcast(ranges), "event_type")
      .withColumn("bin",
        when(col("mx") > col("mn"),
          least(floor((col("value") - col("mn")) * lit(10.0) / (col("mx") - col("mn"))), lit(9L)))
          .otherwise(lit(0L)))
      .groupBy(col("event_type"), col("bin"))
      .agg(
        sum(when(us <= col("mid_us"), 1L).otherwise(0L)).as("c_p"),
        sum(when(us > col("mid_us"), 1L).otherwise(0L)).as("c_q"))
    val totals = byBin.groupBy(col("event_type"))
      .agg(sum(col("c_p")).as("n_p"), sum(col("c_q")).as("n_q"))
    val p = (col("c_p") + lit(1L)).cast("double") / (col("n_p") + lit(10L)).cast("double")
    val q = (col("c_q") + lit(1L)).cast("double") / (col("n_q") + lit(10L)).cast("double")
    // each bin's PSI term is rounded to 12 dp and summed in DECIMAL: the
    // per-term round absorbs JVM-vs-libm last-ulp ln() differences, and
    // the exact decimal sum makes the total independent of partial-agg
    // order (an unrounded double sum could flip the final 6 dp boundary
    // on a hostile fixture)
    byBin.join(broadcast(totals), "event_type")
      .groupBy(col("event_type"))
      .agg(round(sum(round((p - q) * log(p / q), 12).cast("decimal(38,12)"))
        .cast("double"), 6).as("psi"),
        count(lit(1)).as("n_bins"))
      .orderBy(col("event_type"))
  }

  /** Oracle SQL for [[psiDrift]]. */
  val psiDriftSql: String =
    """WITH mid AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid_us FROM events),
      |ranges AS (SELECT event_type, min(value) AS mn, max(value) AS mx
      |           FROM events GROUP BY event_type),
      |by_bin AS (
      |  SELECT e.event_type,
      |         CASE WHEN r.mx > r.mn
      |              THEN least(CAST(floor((e.value - r.mn) * 10.0 / (r.mx - r.mn)) AS BIGINT), 9)
      |              ELSE 0 END AS bin,
      |         CAST(sum(CASE WHEN epoch_us(e.ts) <= m.mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c_p,
      |         CAST(sum(CASE WHEN epoch_us(e.ts) > m.mid_us THEN 1 ELSE 0 END) AS BIGINT) AS c_q
      |  FROM events e JOIN ranges r ON e.event_type = r.event_type CROSS JOIN mid m
      |  GROUP BY 1, 2),
      |totals AS (
      |  SELECT event_type, CAST(sum(c_p) AS BIGINT) AS n_p, CAST(sum(c_q) AS BIGINT) AS n_q
      |  FROM by_bin GROUP BY event_type)
      |SELECT b.event_type,
      |       round(CAST(sum(CAST(round((CAST(c_p + 1 AS DOUBLE) / CAST(n_p + 10 AS DOUBLE)
      |                  - CAST(c_q + 1 AS DOUBLE) / CAST(n_q + 10 AS DOUBLE))
      |                 * ln((CAST(c_p + 1 AS DOUBLE) / CAST(n_p + 10 AS DOUBLE))
      |                      / (CAST(c_q + 1 AS DOUBLE) / CAST(n_q + 10 AS DOUBLE))), 12)
      |             AS DECIMAL(38,12))) AS DOUBLE), 6) AS psi,
      |       count(*) AS n_bins
      |FROM by_bin b JOIN totals t ON b.event_type = t.event_type
      |GROUP BY b.event_type ORDER BY b.event_type""".stripMargin

  /** Behavioral-mix profile per user cohort (user_id mod 10): Shannon
    * entropy and Gini impurity of each cohort's event-type distribution.
    * Gini is exact-integer rational arithmetic; the entropy terms are
    * the PSI device — each −p·ln(p) rounded to 9 dp and summed in
    * DECIMAL so engine/shuffle order cannot move the total, with the
    * final 6 dp rounding well above the per-term ulp noise.
    */
  def entropyProfile(events: DataFrame): DataFrame = {
    val ct = events
      .groupBy((col("user_id") % 10).cast("long").as("cohort"), col("event_type"))
      .agg(count(lit(1)).as("n_ct"))
    val tot = ct.groupBy(col("cohort"))
      .agg(sum(col("n_ct")).as("n_c"), count(lit(1)).as("n_types"),
        sum(col("n_ct") * col("n_ct")).as("ss"))
    val p = col("n_ct").cast("double") / col("n_c").cast("double")
    ct.join(broadcast(tot), "cohort")
      .select(col("cohort"), col("n_c"), col("n_types"), col("ss"),
        round(-p * log(p), 9).cast("decimal(18,9)").as("term"))
      .groupBy(col("cohort"))
      .agg(max(col("n_c")).as("n_events"), max(col("n_types")).as("n_types"),
        round(sum(col("term")).cast("double"), 6).as("entropy"),
        round(lit(1.0) - max(col("ss")).cast("double") /
          (max(col("n_c")) * max(col("n_c"))).cast("double"), 6).as("gini"))
      .orderBy("cohort")
  }

  val entropyProfileSql: String =
    """WITH ct AS (
      |  SELECT user_id % 10 AS cohort, event_type, count(*) AS n_ct
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT cohort, CAST(sum(n_ct) AS BIGINT) AS n_c, count(*) AS n_types,
      |         CAST(sum(n_ct * n_ct) AS BIGINT) AS ss
      |  FROM ct GROUP BY cohort),
      |terms AS (
      |  SELECT ct.cohort, t.n_c, t.n_types, t.ss,
      |         CAST(round(-(CAST(ct.n_ct AS DOUBLE) / CAST(t.n_c AS DOUBLE))
      |                    * ln(CAST(ct.n_ct AS DOUBLE) / CAST(t.n_c AS DOUBLE)), 9)
      |              AS DECIMAL(18,9)) AS term
      |  FROM ct JOIN tot t USING (cohort))
      |SELECT cohort, max(n_c) AS n_events, max(n_types) AS n_types,
      |       round(CAST(sum(term) AS DOUBLE), 6) AS entropy,
      |       round(1.0 - CAST(max(ss) AS DOUBLE)
      |             / CAST(max(n_c) * max(n_c) AS DOUBLE), 6) AS gini
      |FROM terms GROUP BY cohort ORDER BY cohort""".stripMargin

  /** Class-balance audit of a labeled training set — the check a
    * classifier pipeline runs before trusting its sampling: per-label
    * exact counts, share in parts-per-million (truncating integral
    * divide), and the chi-square-against-uniform statistic
    * χ² = Σ_c (k·n_c − n)² / (n·k) in exact ppm as a constant column
    * (the pagerank-l1 rider shape). The squared terms aggregate in
    * DECIMAL(38,0) (HUGEINT in the oracle), so there is no float or
    * rounding boundary anywhere. Scale shape: one partial-agged
    * groupBy to |labels| rows; totals and the statistic are
    * label-bounded broadcasts.
    */
  def labelBalance(emb: DataFrame): DataFrame = {
    val g = emb.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    val tot = g.agg(sum(col("n_vecs")).as("n"), count(lit(1)).as("k"))
    val gg = g.crossJoin(broadcast(tot))
    val chi = gg
      .agg(sum(expr("CAST(k * n_vecs - n AS DECIMAL(38,0)) * (k * n_vecs - n)")).as("ss"),
        max(col("n")).as("nn"), max(col("k")).as("kk"))
      .select(expr(
        "CAST((1000000 * ss) DIV CAST(nn * kk AS DECIMAL(38,0)) AS BIGINT)")
        .as("chi2_ppm"))
    gg.select(col("label"), col("n_vecs"),
        expr("CAST((1000000 * n_vecs) DIV n AS BIGINT)").as("share_ppm"))
      .crossJoin(broadcast(chi))
      .orderBy("label")
  }

  val labelBalanceSql: String =
    """WITH g AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label),
      |t AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n, count(*) AS k FROM g),
      |c AS (
      |  SELECT CAST((1000000 * sum(CAST(t.k * g.n_vecs - t.n AS HUGEINT)
      |                             * (t.k * g.n_vecs - t.n)))
      |              // (t.n * t.k) AS BIGINT) AS chi2_ppm
      |  FROM g, t GROUP BY t.n, t.k)
      |SELECT g.label, g.n_vecs,
      |       CAST((1000000 * g.n_vecs) // t.n AS BIGINT) AS share_ppm,
      |       c.chi2_ppm
      |FROM g, t, c ORDER BY g.label""".stripMargin

  /** Candidate-key / uniqueness profile of the orders table: per column,
    * exact distinct count, uniqueness in ppm, and the is_key verdict —
    * the schema-discovery pass a CDC pipeline runs before choosing
    * replication keys (the reference trusts the declared PK; an auditor
    * verifies it).
    *
    * Scale shape: ONE aggregation pass computes every column's exact
    * count(DISTINCT) together (Spark plans the multi-distinct as a
    * single Expand of factor |columns| — schema-bounded — with
    * partial aggregation); the per-column rows are then unpivoted from
    * the one-row result. No per-column scan.
    */
  def keyCandidates(orders: DataFrame): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val agg = orders.agg(count(lit(1)).as("n_rows"),
      cols.map(c => countDistinct(col(c)).as(s"d_$c")): _*)
    val stacked = cols.map(c => s"'$c', d_$c").mkString(", ")
    agg.select(col("n_rows"),
        expr(s"stack(${cols.size}, $stacked) AS (column_name, n_distinct)"))
      .select(col("column_name"), col("n_rows"), col("n_distinct"),
        expr("CAST((1000000 * n_distinct) DIV n_rows AS BIGINT)").as("uniqueness_ppm"),
        (col("n_distinct") === col("n_rows")).as("is_key"))
      .orderBy("column_name")
  }

  val keyCandidatesSql: String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val branches = cols.map { c =>
      s"SELECT '$c' AS column_name, n_rows, d_$c AS n_distinct FROM agg"
    }.mkString("\n      |  UNION ALL ")
    s"""WITH agg AS (
       |  SELECT count(*) AS n_rows,
       |         ${cols.map(c => s"count(DISTINCT $c) AS d_$c").mkString(",\n      |         ")}
       |  FROM orders),
       |u AS (
       |  $branches)
       |SELECT column_name, n_rows, CAST(n_distinct AS BIGINT) AS n_distinct,
       |       CAST((1000000 * n_distinct) // n_rows AS BIGINT) AS uniqueness_ppm,
       |       n_distinct = n_rows AS is_key
       |FROM u ORDER BY column_name""".stripMargin
  }

  /** Join-cardinality (fan-out) histogram of the orders→lineitem 1:N
    * edge — the number every join/skew/memory plan at 100 TB is sized
    * by: per distinct child count, how many parents, cumulatively. The
    * explicit fanout-0 row (parents with NO children) is included —
    * it's the row an inner join silently drops and an audit must see.
    *
    * Scale shape: one grouped count over the fact table, then a census
    * fold (|distinct fanout values| rows — domain-bounded) with one
    * cumulative window over the census; share in exact ppm.
    */
  def fanoutProfile(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perParent = lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("c"))
    val census = perParent.groupBy(col("c").as("fanout"))
      .agg(count(lit(1)).as("n_parents"))
    val totals = orders.agg(count(lit(1)).as("n_orders"))
      .crossJoin(perParent.agg(count(lit(1)).as("n_matched")))
    val zero = totals.select(lit(0L).as("fanout"),
      (col("n_orders") - col("n_matched")).as("n_parents"))
    Ranks.overGlobalOrder(zero.unionAll(census), Seq(col("fanout").asc),
        cumSums = Seq("cum_parents" -> col("n_parents")))
      .crossJoin(broadcast(totals.select(col("n_orders"))))
      .select(col("fanout"), col("n_parents"), col("cum_parents"),
        expr("CAST((1000000 * cum_parents) DIV n_orders AS BIGINT)").as("cum_ppm"))
      .orderBy("fanout")
  }

  val fanoutProfileSql: String =
    """WITH per_parent AS (
      |  SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1),
      |census AS (
      |  SELECT c AS fanout, count(*) AS n_parents FROM per_parent GROUP BY 1),
      |totals AS (
      |  SELECT (SELECT count(*) FROM orders) AS n_orders,
      |         (SELECT count(*) FROM per_parent) AS n_matched),
      |rows_all AS (
      |  SELECT CAST(0 AS BIGINT) AS fanout,
      |         CAST(n_orders - n_matched AS BIGINT) AS n_parents
      |  FROM totals
      |  UNION ALL
      |  SELECT fanout, n_parents FROM census),
      |cum AS (
      |  SELECT fanout, n_parents,
      |         CAST(sum(n_parents) OVER (ORDER BY fanout
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |           AS cum_parents
      |  FROM rows_all)
      |SELECT fanout, n_parents, cum_parents,
      |       CAST((1000000 * cum_parents) // t.n_orders AS BIGINT) AS cum_ppm
      |FROM cum, totals t ORDER BY fanout""".stripMargin

  /** Chi-square independence test + Cramér's V between two categorical
    * columns of the document registry (lang × source) — the association
    * audit a curation pipeline runs before stratifying on one column and
    * assuming the other stays balanced ([[psiDrift]]'s two-column
    * sibling: PSI scores a SHIFT of one distribution; this scores the
    * COUPLING of two).
    *
    * Exactness: each cell contributes (N·o − r·c)²·1e6 ∕ (N·r·c) with the
    * square computed in DECIMAL(38,0) (Spark) ≡ HUGEINT (DuckDB) and the
    * truncating DIV ≡ `//` on the non-negative square — no doubles
    * anywhere, so shuffle order and libm can never move the statistic.
    * V² (not V) is published: V adds a sqrt = a last-ulp hazard, V² in
    * ppm stays integral. The zero-observed cells missing from the
    * grouped census are restored by the census-grid left join (expected
    * counts are nonzero there; dropping them understates χ²).
    *
    * Scale shape: ONE scan partial-aggregates to the (lang, source)
    * census — alphabet-bounded, ≤ |langs|·|sources| rows — and every
    * join after that is a broadcast of a census frame.
    */
  def cramersV(documents: DataFrame): DataFrame = {
    val cells = Caches.tracked(documents
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o")).persist())
    val byLang = cells.groupBy(col("lang")).agg(sum(col("o")).cast("long").as("r"))
    val bySrc = cells.groupBy(col("source")).agg(sum(col("o")).cast("long").as("c"))
    val tot = cells.agg(sum(col("o")).cast("long").as("n"),
      countDistinct(col("lang")).cast("long").as("n_langs"),
      countDistinct(col("source")).cast("long").as("n_sources"))
    broadcast(byLang).crossJoin(broadcast(bySrc))
      .join(broadcast(cells), Seq("lang", "source"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("cell_ppm", expr(
        """CAST(CAST(n * o - r * c AS DECIMAL(38,0)) * (n * o - r * c) * 1000000
          |     DIV (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)""".stripMargin))
      .groupBy(col("n"), col("n_langs"), col("n_sources"))
      .agg(sum(col("cell_ppm")).cast("long").as("chi2_ppm"))
      .select(col("n"), col("n_langs"), col("n_sources"),
        ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
        col("chi2_ppm"),
        // dof = 0 (a single-level categorical) would divide by zero: Spark
        // DIV yields NULL where DuckDB // errors — guard BOTH engines with
        // the same CASE (V² is meaningless at dof 0 anyway; report 0).
        expr("""CAST(CASE WHEN least(n_langs - 1, n_sources - 1) = 0 THEN 0
               |     ELSE chi2_ppm DIV (n * least(n_langs - 1, n_sources - 1))
               |     END AS BIGINT)""".stripMargin)
          .as("v2_ppm"))
  }

  val cramersVSql: String =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
      |rr AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |cc AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
      |               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
      |               CAST(count(DISTINCT source) AS BIGINT) AS n_sources
      |        FROM cells),
      |grid AS (
      |  SELECT rr.lang, cc.source, rr.r, cc.c, COALESCE(cells.o, 0) AS o
      |  FROM rr CROSS JOIN cc
      |  LEFT JOIN cells ON cells.lang = rr.lang AND cells.source = cc.source),
      |cell AS (
      |  SELECT t.n, t.n_langs, t.n_sources,
      |         CAST(CAST(t.n * g.o - g.r * g.c AS HUGEINT)
      |              * (t.n * g.o - g.r * g.c) * 1000000
      |              // (CAST(t.n AS HUGEINT) * g.r * g.c) AS BIGINT) AS cell_ppm
      |  FROM grid g CROSS JOIN tot t)
      |SELECT n, n_langs, n_sources,
      |       (n_langs - 1) * (n_sources - 1) AS dof,
      |       CAST(sum(cell_ppm) AS BIGINT) AS chi2_ppm,
      |       CAST(CASE WHEN least(n_langs - 1, n_sources - 1) = 0 THEN 0
      |            ELSE sum(cell_ppm) // (n * least(n_langs - 1, n_sources - 1))
      |            END AS BIGINT) AS v2_ppm
      |FROM cell GROUP BY n, n_langs, n_sources""".stripMargin
}
