package graft

/** Dump-schema invariants the correctness gate depends on.
  *
  * The gate hashes the parquet dump and the DuckDB result after reading
  * both through independent readers; any value class whose rendering is
  * reader-dependent breaks the compare while the math is identical. The
  * one class seen in practice: DECIMAL wider than 18 digits (sums past
  * float64's 53-bit mantissa). This spec walks EVERY registered query's
  * output schema at sf0.001 and fails on any wide decimal, nested types
  * included — the machine check that prevents the class from recurring.
  */
class SchemaInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no query dump schema exposes DecimalType precision > 18") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      SparkEntry.wideDecimalColumns(fn(spark, dir).schema).map(c => s"$name → $c")
    }
    assert(offenders.isEmpty,
      s"wide DECIMAL in dump schema (export `sum % 9007199254740881` as BIGINT " +
        s"instead):\n  ${offenders.mkString("\n  ")}")
  }

  test("queries and oracleSql keys line up") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracleSql entries without a query: ${(o -- q).mkString(", ")}")
    // Symmetric: a registered query with no oracle ships un-compared. There
    // are no intentionally oracle-less queries today; add to this allowlist
    // only with a written reason.
    val exemptFromOracle = Set.empty[String]
    val ungated = q -- o -- exemptFromOracle
    assert(ungated.isEmpty, s"queries without an oracleSql entry: ${ungated.mkString(", ")}")
  }
}
