package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Dead-letter routing: decode failures are DATA, not exceptions. A
  * 100 TB/day changelog always carries some unparseable payloads and
  * events for tables that were never registered; a pipeline that throws
  * on them stops replicating everything else (the reference logs the bad
  * event and drops it, normalizer/MySQLEventNormalizer.scala:186-196 —
  * losing the evidence). Here every event gets a disposition column and
  * the bad ones stay queryable: route `ok` to the apply path, the rest to
  * a quarantine sink for replay after the fix.
  *
  * Classification is a single projection (no shuffle, no UDF):
  * `from_json` under PERMISSIVE mode yields a null struct for malformed
  * JSON, which IS the parseability test — codegen'd, scan-local.
  */
object DeadLetter {

  /** Envelope + `disposition` ∈ {ok, unregistered_table, null_payload,
    * unparseable}. Parseability is judged under the registry's unified
    * field set with the standard corrupt-record column: PERMISSIVE
    * `from_json` never throws, it lands malformed input in
    * `_corrupt_record` — a null struct test would miss it (Spark yields
    * an all-null ROW for malformed JSON, indistinguishable from `{}`).
    */
  def classify(envelope: DataFrame, reg: SchemaRegistry,
               payloadCol: String = "payload_json"): DataFrame = {
    val probe = StructType(reg.unifiedFields.toArray)
      .add("_corrupt_record", org.apache.spark.sql.types.StringType)
    envelope.withColumn("disposition",
      when(!col("tbl").isin(reg.tables: _*), lit("unregistered_table"))
        .when(col(payloadCol).isNull, lit("null_payload"))
        .when(from_json(col(payloadCol), probe,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record"))
          .getField("_corrupt_record").isNotNull, lit("unparseable"))
        .otherwise(lit("ok")))
  }

  /** Per-table quarantine accounting — the health panel a replication
    * operator watches (n_ok collapses through map-side partials; the
    * DLQ counts are tiny by construction).
    */
  def stats(classified: DataFrame): DataFrame =
    classified.groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_events"),
        count(when(col("disposition") === "ok", 1)).as("n_ok"),
        count(when(col("disposition") === "unparseable", 1)).as("n_unparseable"),
        count(when(col("disposition") === "unregistered_table", 1)).as("n_unregistered"))
      .orderBy("tbl")
}
