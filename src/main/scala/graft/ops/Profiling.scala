package graft.ops

import org.apache.spark.sql.DataFrame
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
}
