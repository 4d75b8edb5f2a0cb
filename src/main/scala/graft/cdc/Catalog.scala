package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table discovery — the reference's information_schema catalog scan
  * (reference: catalog/MySQLCatalogService.scala:27-76 discoverTables,
  * :136-173 column metadata, :228-249 row counts from
  * information_schema.TABLES). Against a lake directory the same
  * discovery reads parquet footers: table list, column count, schema
  * fingerprint and exact row counts (parquet metadata makes count(*)
  * a footer read, not a scan).
  */
object Catalog {

  final case class TableMeta(table: String, nColumns: Int, columns: Seq[String], nRows: Long)

  /** Discover all parquet tables under a fixture directory. Driver-side
    * by design (catalog ops are metadata-sized); the per-table row count
    * runs as a parquet metadata-only job.
    */
  def discoverTables(spark: SparkSession, dir: String): Seq[TableMeta] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val files = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
    // per-table footer reads + metadata-count jobs are independent —
    // submit them concurrently (Spark's scheduler interleaves the jobs)
    // instead of paying N sequential job round-trips
    val metas = files.toSeq
      .filter(f => f.getName.endsWith(".parquet"))
      .map { f =>
        Future {
          val df = spark.read.parquet(f.getAbsolutePath)
          TableMeta(f.getName.stripSuffix(".parquet"),
            df.schema.length, df.schema.fieldNames.toSeq, df.count())
        }
      }
    Await.result(Future.sequence(metas), Duration.Inf).sortBy(_.table)
  }

  /** The discovery result as a DataFrame, filtered through the same
    * TableFilter used for replication scoping (P5 composed with S6).
    */
  def discovered(spark: SparkSession, dir: String, filter: TableFilter): DataFrame = {
    import spark.implicits._
    discoverTables(spark, dir)
      .filter(t => filter.shouldInclude(t.table))
      .map(t => (t.table, t.nColumns, t.columns.mkString(","), t.nRows))
      .toDF("table_name", "n_columns", "column_list", "n_rows")
      .orderBy("table_name")
  }

  /** Oracle SQL: DuckDB counts over the same physical tables. */
  def discoveredSql(tables: Seq[(String, Seq[String])]): String =
    tables.sortBy(_._1).map { case (t, cols) =>
      s"""SELECT '$t' AS table_name, ${cols.length} AS n_columns,
         |'${cols.mkString(",")}' AS column_list,
         |(SELECT count(*) FROM $t) AS n_rows""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
}
