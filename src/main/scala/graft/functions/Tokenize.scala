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
    *
    * Built with `zip_with` over three slices, NOT
    * `transform(sequence(...), i => element_at(toks, i)...)`: a lambda
    * body referencing the (unbound) token-array expression re-evaluates
    * it PER ELEMENT — with 3 references per shingle that is ~150 full
    * text re-splits per row (measured 42s vs 3s on 10k fixture docs).
    * The slice formulation evaluates the token expression O(1) times per
    * row and stays a pure projection (no window, no shuffle).
    *
    * Guarded: Spark's `sequence(a, b)` with b < a emits a DESCENDING
    * sequence, so short docs must short-circuit to [].
    */
  def shingles3(toks: Column): Column = {
    val n = size(toks)
    when(n >= 3,
      zip_with(
        zip_with(slice(toks, lit(1), n - 2), slice(toks, lit(2), n - 2), (a, b) => concat_ws(" ", a, b)),
        slice(toks, lit(3), n - 2),
        (ab, c) => concat_ws(" ", ab, c)))
      .otherwise(array().cast("array<string>"))
  }

  /** Adjacent token pairs (word bigrams), empty when fewer than 2 tokens.
    * Same zip_with-over-slices device as [[shingles3]] (and the same
    * descending-`sequence` guard).
    */
  def bigrams(toks: Column): Column = {
    val n = size(toks)
    when(n >= 2,
      zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
  }

  def bigramsSql(toks: String): String =
    s"""CASE WHEN len($toks) >= 2
       | THEN [$toks[i] || ' ' || $toks[i+1] FOR i IN range(1, len($toks))]
       | ELSE [] END""".stripMargin.replace("\n", " ")

  /** DuckDB rendering; `toks` must be a plain column NAME (it is repeated).
    * DuckDB lists are 1-indexed; `range(a, b)` excludes b.
    */
  def shingles3Sql(toks: String): String =
    s"""CASE WHEN len($toks) >= 3
       | THEN [$toks[i] || ' ' || $toks[i+1] || ' ' || $toks[i+2]
       |       FOR i IN range(1, len($toks) - 1)]
       | ELSE [] END""".stripMargin.replace("\n", " ")
}
