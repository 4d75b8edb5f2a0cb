package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Whitespace tokenization shared by every text operator, with a DuckDB
  * rendering that produces the identical token list — the contract that
  * makes dedup/fingerprint/language-ID oracle-checkable.
  *
  * Kept deliberately minimal (lower + split on runs of whitespace + drop
  * empties): Java regex `\s` and RE2 `\s` agree on ASCII whitespace, and
  * the fixtures are ASCII. Anything fancier (Unicode categories) would
  * silently diverge between engines.
  */
object Tokenize {

  /** All tokens, in document order. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  def tokensSql(e: String): String =
    s"list_filter(string_split_regex(lower($e), '\\s+'), t -> t <> '')"

  /** Distinct token set (order irrelevant — used for set semantics). */
  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  def distinctTokensSql(e: String): String = s"list_distinct(${tokensSql(e)})"

  /** Token 3-shingles (word n-grams), empty when fewer than 3 tokens.
    * Guarded: Spark's `sequence(0, n)` with negative n would emit a
    * DESCENDING sequence, so short docs must short-circuit to [].
    */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** DuckDB rendering; `toks` must be a plain column NAME (it is repeated).
    * DuckDB lists are 1-indexed; `range(a, b)` excludes b.
    */
  def shingles3Sql(toks: String): String =
    s"""CASE WHEN len($toks) >= 3
       | THEN [$toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]
       |       FOR i IN range(1, len($toks) - 1)]
       | ELSE [] END""".stripMargin.replace("\n", " ")
}
