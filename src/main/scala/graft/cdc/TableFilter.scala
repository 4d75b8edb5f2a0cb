package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import scala.util.matching.Regex

/** Include/exclude table filtering with wildcard patterns.
  *
  * Same semantics as the reference (reference: filter/TableFilter.scala:22-43
  * pattern compile, :51-88 matching, :96-100 batch):
  *   - `*` matches any run of characters, `?` exactly one; any other
  *     pattern is treated as a raw regex (anchored).
  *   - An empty include list means "include everything".
  *   - Exclude always wins over include.
  *
  * Two evaluation modes, both driven by the same compiled rules:
  *   - [[shouldInclude]]: driver-side predicate (used when filtering a
  *     discovered table list, reference: catalog/MySQLCatalogService.scala:78-113).
  *   - [[column]]: a Catalyst predicate over a table-name column, so the
  *     filter participates in pushdown/pruning instead of running per-row
  *     on the driver. At 100 TB this is the difference between a predicate
  *     inside the scan and a collect().
  */
final case class TableFilter(include: Seq[String], exclude: Seq[String]) {

  import TableFilter.Validation

  private def compile(pattern: String): Regex = {
    val isWildcard = pattern.exists(c => c == '*' || c == '?') ||
      !pattern.exists(c => "[](){}^$+|\\".contains(c))
    val body =
      if (isWildcard) pattern.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c if "[](){}^$+|\\.".contains(c) => "\\" + c
        case c => c.toString
      }
      else pattern
    ("^" + body + "$").r
  }

  // lazy so an uncompilable pattern surfaces through `validate` as a
  // reported error, not a constructor throw (the reference validates
  // before compiling too, ConfigLoader.scala:288-300)
  private lazy val includeRx = include.map(compile)
  private lazy val excludeRx = exclude.map(compile)

  def shouldInclude(table: String): Boolean = {
    val in = includeRx.isEmpty || includeRx.exists(_.matches(table))
    in && !excludeRx.exists(_.matches(table))
  }

  def filterTables(tables: Seq[String]): Seq[String] = tables.filter(shouldInclude)

  /** Rule-set validation before the filter goes live (reference:
    * filter/TableFilter.scala:136-176 validateConfig +
    * config/ConfigLoader.scala:288-300 — conflicting include/exclude
    * rules are errors, uncompilable patterns are errors, an empty include
    * list is an everything-matches warning). Runs on the driver at config
    * time, once — never per row.
    */
  def validate: Validation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val conflicts = include.intersect(exclude).distinct
    if (conflicts.nonEmpty)
      errors += s"conflicting rules in both include and exclude: ${conflicts.mkString(", ")}"
    for (p <- include ++ exclude)
      scala.util.Try(compile(p)).failed.foreach { e =>
        errors += s"invalid pattern '$p': ${e.getMessage}"
      }
    // an exclude that re-matches every include is a dead config:
    // nothing can ever pass (the reference only flags literal
    // conflicts; pattern-level shadowing is the same bug one step out)
    if (include.nonEmpty && exclude.contains("*"))
      errors += "exclude '*' rejects every table the include rules admit"
    if (include.isEmpty)
      warnings += "no include rules: every table is included by default"
    val e = errors.result()
    Validation(e.isEmpty, e, warnings.result())
  }

  /** `validate` or throw — the config-load gate (reference rejects the
    * pipeline config on filter errors, ConfigLoader.scala:288-300).
    */
  def validated: TableFilter = {
    val v = validate
    require(v.isValid, v.errors.mkString("; "))
    this
  }

  /** The same rules as a Catalyst Column predicate (uses Java-regex rlike;
    * wildcard-compiled patterns stay in the portable `.*`/`.` subset).
    */
  def column(tableCol: Column): Column = {
    val in =
      if (includeRx.isEmpty) lit(true)
      else includeRx.map(r => tableCol.rlike(r.regex)).reduce(_ || _)
    val ex =
      if (excludeRx.isEmpty) lit(false)
      else excludeRx.map(r => tableCol.rlike(r.regex)).reduce(_ || _)
    in && !ex
  }

  /** Distributed filter statistics: per-table admit/reject decision plus
    * event volume (reference: filter/TableFilter.scala:108-130
    * getFilterStatistics — total/included/excluded with per-group
    * breakdown). The decision rides as a Column predicate inside the
    * aggregation, so the stats job is one shuffle over (tbl) however many
    * billions of events feed it.
    */
  def stats(events: org.apache.spark.sql.DataFrame, tableCol: Column): org.apache.spark.sql.DataFrame =
    events
      .groupBy(tableCol.as("tbl"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("included", column(col("tbl")))
      .select(col("tbl"), col("included"), col("n_events"))
}

object TableFilter {
  /** Outcome of [[TableFilter.validate]]. */
  final case class Validation(isValid: Boolean, errors: Seq[String], warnings: Seq[String])
}
