package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event normalization: raw event rows → canonical changelog envelope
  * (tbl, pk, op, ts, pos, value).
  *
  * Mirrors the reference's P1-P4 pipeline stage
  * (reference: normalizer/MySQLEventNormalizer.scala:29-162 — raw binlog
  * event → typed ChangeEvent with op-dependent before/after), expressed as
  * a single declarative projection so Catalyst can push the whole thing
  * into the parquet scan (column pruning + predicate pushdown instead of
  * the reference's per-event callback).
  *
  * Fixture mapping (the harness has no live binlog): the driver's `events`
  * table plays the raw changelog. `event_id` is the total-ordered log
  * position (the reference's BinlogPosition), `user_id` the primary key,
  * and `event_type` determines the operation:
  *   signup → Insert, error → Delete, anything else → Update.
  * Rows shard across four logical tables t0..t3 by pk so the table-filter
  * and routing operators have multi-table input to work on.
  *
  * Unlike the reference — which drops all but the first row of a multi-row
  * binlog event (`rows.head`, MySQLEventNormalizer.scala:74,108,143, a
  * documented bug) — a DataFrame projection normalizes every row.
  */
object Normalizer {

  val opCol: Column =
    when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error", "D")
      .otherwise("U")

  /** SQL equivalent of [[opCol]] for oracle generation. */
  val opSql: String =
    "CASE WHEN event_type = 'signup' THEN 'I' WHEN event_type = 'error' THEN 'D' ELSE 'U' END"

  val tblCol: Column = concat(lit("t"), (col("user_id") % 4).cast("string"))
  val tblSql: String = "'t' || CAST(user_id % 4 AS VARCHAR)"

  /** Normalize the raw `events` fixture into the changelog envelope. */
  def normalize(rawEvents: DataFrame): DataFrame =
    rawEvents.select(
      tblCol.as("tbl"),
      col("user_id").as("pk"),
      opCol.as("op"),
      col("ts"),
      col("event_id").as("pos"),
      col("value")
    )

  /** Oracle-SQL rendering of [[normalize]] over the `events` table. */
  val normalizeSql: String =
    s"""SELECT $tblSql AS tbl, user_id AS pk, $opSql AS op, ts,
       |       event_id AS pos, value
       |FROM events""".stripMargin
}
