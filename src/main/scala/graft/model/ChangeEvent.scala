package graft.model

import org.apache.spark.sql.types._

/** Core CDC data model, re-expressed for Spark.
  *
  * Mirrors the reference's abstractions (see SURVEY.md §1.1):
  *   - `ChangeEvent(tableId, operation, primaryKey, before, after, ts, position)`
  *     (reference: model/ChangeEvent.scala:16-24)
  *   - `TableId(database, table)` (reference: model/TableId.scala:9-11)
  *   - `BinlogPosition` with total order (reference: model/BinlogPosition.scala:7-66)
  *
  * Design departures (Spark-first):
  *   - The log position is a single monotone Long (`pos`). The reference's
  *     GTID/file+offset duality collapses to one orderable column; in a live
  *     DSv2 source it would be the Structured Streaming Offset.
  *   - Row payloads are typed columns, not Map[String, Any]: the changelog
  *     envelope carries the table's columns directly (schema registry =
  *     parquet footer / JDBC metadata, broadcast once — replacing the
  *     reference's blocking per-event TrieMap cache,
  *     MySQLEventNormalizer.scala:27,164-171).
  */
final case class TableId(database: String, table: String) {
  override def toString = s"$database.$table"
}

object Op {
  val Insert = "I"
  val Update = "U"
  val Delete = "D"
  val all: Seq[String] = Seq(Insert, Update, Delete)
}

/** Typed changelog row used by the Dataset API paths and the streaming
  * pipeline tests. `payload` holds the row's value column(s); harness
  * fixtures use a single numeric value column.
  */
final case class ChangeEvent(
    tbl: String,
    pk: Long,
    op: String,
    ts: java.sql.Timestamp,
    pos: Long,
    value: Double
)

object ChangeEvent {
  /** Canonical envelope schema for DataFrame paths. */
  val envelopeSchema: StructType = StructType(Seq(
    StructField("tbl", StringType),
    StructField("pk", LongType),
    StructField("op", StringType),
    StructField("ts", TimestampType),
    StructField("pos", LongType),
    StructField("value", DoubleType)
  ))
}
