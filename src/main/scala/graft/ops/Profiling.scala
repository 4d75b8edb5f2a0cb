package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
