package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the ANALYZE-TABLE shape every ingest
  * pipeline runs before trusting a new source: per-column non-null
  * count, exact distinct count, and min/max, computed in ONE scan.
  *
  * Scale shape: all 4·k aggregates ride one table pass; Spark plans the
  * multiple exact COUNT(DISTINCT)s as a single Expand + two-phase
  * aggregate — the expansion multiplies rows by the distinct-column
  * count before the first partial, which is the honest cost of EXACT
  * multi-column distincts (production profiling at 100 TB swaps these
  * for the mergeable KMV sketch, [[Sketches]], at ~k·8 bytes per
  * column; this operator is the exact reference the sketch is checked
  * against). min/max/count partials are constant-size per column.
  */
object Profiling {

  def tableProfile(df: DataFrame, numCols: Seq[String], strCols: Seq[String]): DataFrame = {
    val aggs = numCols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("double").as(s"mn_$c"), max(col(c)).cast("double").as(s"mx_$c"))
    } ++ strCols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"), count_distinct(col(c)).as(s"nd_$c"),
        min(col(c)).as(s"mn_$c"), max(col(c)).as(s"mx_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val numRows = numCols.map(c =>
      s"'$c', nn_$c, nd_$c, mn_$c, mx_$c, CAST(NULL AS STRING), CAST(NULL AS STRING)")
    val strRows = strCols.map(c =>
      s"'$c', nn_$c, nd_$c, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_$c, mx_$c")
    val k = numCols.size + strCols.size
    one.select(expr(
      s"stack($k, ${(numRows ++ strRows).mkString(", ")}) " +
        "AS (col_name, n_nonnull, n_distinct, min_num, max_num, min_str, max_str)"))
      .orderBy("col_name")
  }

  /** Oracle SQL: the same one-pass aggregate, unpivoted per column. */
  def tableProfileSql(table: String, numCols: Seq[String], strCols: Seq[String]): String = {
    val aggs = (numCols.map(c =>
      s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, " +
        s"CAST(min($c) AS DOUBLE) AS mn_$c, CAST(max($c) AS DOUBLE) AS mx_$c") ++
      strCols.map(c =>
        s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, " +
          s"min($c) AS mn_s_$c, max($c) AS mx_s_$c")).mkString(",\n  ")
    val rows = numCols.map(c =>
      s"SELECT '$c' AS col_name, nn_$c AS n_nonnull, nd_$c AS n_distinct, " +
        s"mn_$c AS min_num, mx_$c AS max_num, CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM one") ++
      strCols.map(c =>
        s"SELECT '$c', nn_$c, nd_$c, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_s_$c, mx_s_$c FROM one")
    s"""WITH one AS (SELECT
       |  $aggs
       |FROM $table)
       |${rows.mkString("\n  UNION ALL\n")}
       |ORDER BY col_name""".stripMargin
  }
}
