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

  private val includeRx = include.map(compile)
  private val excludeRx = exclude.map(compile)

  def shouldInclude(table: String): Boolean = {
    val in = includeRx.isEmpty || includeRx.exists(_.matches(table))
    in && !excludeRx.exists(_.matches(table))
  }

  def filterTables(tables: Seq[String]): Seq[String] = tables.filter(shouldInclude)

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
}
