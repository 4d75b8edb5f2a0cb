package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned JDBC snapshot reads — the bulk-copy half of snapshotting.
  *
  * The reference snapshots a table with ONE streaming `SELECT * FROM t`
  * over a single connection (reference: engine/CDCEngineUtils.scala:104-191,
  * fetchSize 1000 + batched REPLACE INTO). Spark-first, the same copy is
  * `spark.read.jdbc(url, table, partitionColumn, lower, upper,
  * numPartitions, props)` — N executors each scan one PK stride
  * concurrently, which is what turns a 100 TB snapshot from a
  * single-connection pipe into a cluster-wide parallel read. The stride
  * bounds come from the same MIN/MAX/COUNT statistics the PK chunk plan
  * derives ([[graft.ops.Metrics.pkChunks]], reference
  * snapshot/SnapshotWorker.scala:240-297).
  */
object JdbcSnapshot {

  /** `read.jdbc` stride parameters for one table. */
  final case class Partitioning(column: String, lower: Long, upper: Long, numPartitions: Int)

  /** Derive the JDBC partitioning for `tbl` from a PK chunk plan
    * ([[graft.ops.Metrics.pkChunks]] output). Metadata-scale collect:
    * one row per table, never data.
    */
  def partitioningFor(chunks: DataFrame, tbl: String, pkColumn: String): Partitioning = {
    val row = chunks.filter(col("tbl") === tbl)
      .agg(min(col("chunk_lo")).as("lo"), max(col("chunk_hi")).as("hi"),
        max(col("n_chunks")).as("n"))
      .head()
    require(!row.isNullAt(0), s"no chunk plan rows for table $tbl")
    Partitioning(pkColumn, row.getLong(0), row.getLong(1), row.getLong(2).toInt)
  }

  /** Partitioned snapshot scan: every partition reads one PK stride
    * `[lower + k*width, lower + (k+1)*width)` in parallel.
    */
  def read(spark: SparkSession, url: String, table: String, p: Partitioning,
           props: Map[String, String] = Map.empty): DataFrame = {
    val jp = new java.util.Properties()
    props.foreach { case (k, v) => jp.setProperty(k, v) }
    spark.read.jdbc(url, table, p.column, p.lower, p.upper, p.numPartitions, jp)
  }
}
