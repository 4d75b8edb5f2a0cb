package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** Streaming as-of enrichment — the streaming counterpart of
  * [[graft.cdc.ChangelogApply.asOfLookupWide]]: every change event is
  * enriched with the dimension version valid immediately BEFORE it
  * (the SCD2 interval containing `pos − 1`), i.e. updates and deletes
  * carry the row image they superseded, inserts after a delete carry
  * NULL (the key did not exist).
  *
  * Incremental maintenance composes the two bucketed stores:
  *
  *   1. each micro-batch folds into the SCD2 history store
  *      ([[StreamingScd2.applyBatch]] — order-insensitive event merge);
  *   2. the buckets the batch touched are re-enriched AGAINST THE MERGED
  *      HISTORY and rewritten in an enriched-output store.
  *
  * Step 2 makes the output a per-bucket materialized view of the SCD2
  * store: an out-of-order event landing between two existing versions
  * re-splits their intervals, and the bucket rewrite CORRECTS the
  * enrichment of every event downstream of the split — so the final
  * store converges to the batch formulation under ANY batch split or
  * order (the invariance the spec proves), and a crash-replay rewrites
  * identical bytes (the enriched bucket is a pure function of the SCD2
  * bucket). Per-batch cost is O(touched buckets), not O(state).
  */
object StreamingEnrich {

  /** Enriched-store payload beyond (tbl, pk, op, ts, pos). */
  val payloadCols: Seq[String] = Seq("value", "prev_value", "prev_from_pos")

  val enrichedSchema: StructType = graft.model.ChangeEvent.envelopeSchema
    .add("prev_value", DoubleType)
    .add("prev_from_pos", LongType)

  /** The temporal join itself: events × history on the same key with the
    * validity interval containing `pos − 1`. Equi-keys drive the join;
    * the interval predicate filters the ≤ versions-per-key matches — at
    * most one version interval can contain any position. With
    * `bucketed = true` both sides carry a `bucket` column and share one
    * hash(bucket) partitioning, so the join (keys prefixed with bucket)
    * adds no exchange; the output keeps `bucket` for the aligned write.
    */
  def enrichAgainst(history: DataFrame, events: DataFrame,
                    bucketed: Boolean = false): DataFrame = {
    val probe = col("e.pos") - 1
    val keyEq =
      if (bucketed) col("e.bucket") === col("v.bucket") &&
        col("e.tbl") === col("v.tbl") && col("e.pk") === col("v.pk")
      else col("e.tbl") === col("v.tbl") && col("e.pk") === col("v.pk")
    val out = Seq(col("e.tbl").as("tbl"), col("e.pk").as("pk"), col("e.op").as("op"),
      col("e.ts").as("ts"), col("e.pos").as("pos"), col("e.value").as("value"),
      col("v.value").as("prev_value"), col("v.valid_from_pos").as("prev_from_pos"))
    events.as("e").join(history.as("v"),
      keyEq && col("v.valid_from_pos") <= probe &&
        (col("v.valid_to_pos").isNull || col("v.valid_to_pos") > probe),
      "left")
      .select((if (bucketed) col("e.bucket").as("bucket") +: out else out): _*)
  }

  /** foreachBatch body: fold into SCD2, then rewrite the enrichment of
    * every touched bucket from the merged history. The touched-bucket
    * probe is bounded by nBuckets (same scalar-probe shape as
    * [[StreamingApply.applyBatchWith]]).
    */
  def applyBatch(scd2Dir: String, outDir: String,
                 nBuckets: Int = StreamingApply.defaultBuckets)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // persisted: consumed by the SCD2 fold AND the touched probe — the
    // probe would otherwise re-run the source scan + normalize
    val b = batch.persist()
    try {
      StreamingScd2.applyBatch(scd2Dir, nBuckets)(b, batchId)
      val touched = b
        .select(StreamingApply.bucketOf(nBuckets).as("bucket")).distinct()
        .collect().map(_.getLong(0).toInt).toSet
      if (touched.nonEmpty) {
        // the merged history of the touched buckets (events + intervals,
        // tombstones included) — written by the applyBatch above. ONE
        // repartition on bucket feeds both join sides: with bucket in the
        // join keys, hash(bucket) partitioning satisfies the join's
        // distribution, so the temporal join adds no further exchange.
        val hist = StreamingApply.stateBefore(spark, scd2Dir, batchId + 1,
            Some(touched), StreamingScd2.payloadCols, StreamingScd2.stateSchema)
          .withColumn("bucket", StreamingApply.bucketOf(nBuckets))
          .repartition(nBuckets, col("bucket"))
        val events = hist.select("bucket", "tbl", "pk", "op", "ts", "pos", "value")
        val versions = hist.filter(col("op") =!= "D")
          .select(col("bucket"), col("tbl"), col("pk"), col("value"),
            col("pos").as("valid_from_pos"), col("valid_to_pos"))
        // aligned write: the join output is already hash(bucket)
        // partitioned — writeVersion's repartition would re-shuffle it
        enrichAgainst(versions, events, bucketed = true)
          .select((Seq("tbl", "pk", "op", "ts", "pos") ++ payloadCols :+ "bucket")
            .map(col): _*)
          .write.partitionBy("bucket")
          .mode("overwrite").parquet(s"$outDir/v=$batchId")
        StreamingApply.compact(spark, outDir, buckets = Some(touched))
      }
    } finally { b.unpersist(); () }
  }

  /** The enriched changelog: latest version of every output bucket. */
  def enrichedEvents(spark: SparkSession, outDir: String): DataFrame =
    StreamingApply.stateBefore(spark, outDir, Long.MaxValue, None,
      payloadCols, enrichedSchema)

  /** Batch-formulation oracle: the same temporal join expressed over the
    * one-shot SCD2 window — what the incremental store must converge to.
    */
  def batchSql(clCte: String): String =
    s"""WITH cl AS ($clCte),
       |seq AS (
       |  SELECT tbl, pk, op, value, pos,
       |         lead(pos) OVER (PARTITION BY tbl, pk ORDER BY pos) AS valid_to_pos
       |  FROM cl),
       |hist AS (
       |  SELECT tbl, pk, value, pos AS valid_from_pos, valid_to_pos
       |  FROM seq WHERE op <> 'D')
       |SELECT e.tbl, e.pk, e.op, e.ts, e.pos, e.value,
       |       v.value AS prev_value, v.valid_from_pos AS prev_from_pos
       |FROM cl e LEFT JOIN hist v
       |  ON e.tbl = v.tbl AND e.pk = v.pk
       | AND v.valid_from_pos <= e.pos - 1
       | AND (v.valid_to_pos IS NULL OR v.valid_to_pos > e.pos - 1)
       |ORDER BY e.tbl, e.pk, e.pos""".stripMargin

  /** Bounded streaming run (mirrors [[StreamingScd2.runAvailableNow]]). */
  def runAvailableNow(
      spark: SparkSession,
      changelogDir: String,
      schema: StructType,
      normalize: DataFrame => DataFrame,
      scd2Dir: String,
      outDir: String,
      checkpointDir: String,
      nBuckets: Int = StreamingApply.defaultBuckets,
      prepartition: Int = 0): Unit = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(changelogDir)
    val q = (if (prepartition > 0) src.repartition(prepartition) else src)
      .transform(normalize)
      .writeStream
      .foreachBatch(applyBatch(scd2Dir, outDir, nBuckets) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
