package graft.streaming

import graft.cdc.ChangelogApply
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming changelog apply — the streaming half of the
  * engine (reference: pipeline/CDCStreamPipeline.scala:58-131, the Pekko
  * GraphDSL topology binlogSource → normalize → Partition(64) → apply →
  * offsetCommit).
  *
  * Spark-first mapping:
  *   - micro-batching = `Trigger.AvailableNow` / `ProcessingTime`
  *     (reference's `groupedWithin(100, 1s)`, R3);
  *   - keyed routing = the shuffle inside the per-batch merge (R1/R2);
  *   - per-key ordering = the merge is ORDER-INSENSITIVE (max_by pos), so
  *     no cross-batch ordering guarantee is needed at all — the risk
  *     called out in SURVEY.md §7.4(1) is eliminated by construction, not
  *     by serializing batches the way the reference's `mapAsync(1)` does;
  *   - offsets = the checkpoint log (reference's RECEIVED/APPLIED/
  *     COMMITTED machine, coordinator/DefaultOffsetCoordinator.scala);
  *   - idempotent re-run = state version v(batchId) is a pure function of
  *     v(prev) + batch, written by overwrite — replaying a batch rewrites
  *     the same bytes (reference gets this from upsert-by-PK,
  *     README.md:524-552).
  *
  * State layout: `stateDir/v=<batchId>` parquet, tombstones retained
  * (op='D' rows kept so later batches can't resurrect deleted keys);
  * [[currentState]] drops them at read. A compaction pass would prune old
  * versions in production; the harness keeps them for inspectability.
  */
object StreamingApply {

  private val stateCols = Seq("tbl", "pk", "op", "ts", "pos", "value")

  /** Merge a changelog micro-batch into prior state. Both sides carry
    * tombstones; output keeps them. Order-insensitive and associative —
    * merge(merge(s, b1), b2) == merge(s, b1 ⊎ b2) — which is what makes
    * any batch split/order safe.
    */
  def mergeState(prev: DataFrame, batch: DataFrame): DataFrame =
    prev.select(stateCols.map(col): _*)
      .unionByName(batch.select(stateCols.map(col): _*))
      .groupBy(col("tbl"), col("pk"))
      .agg(max_by(struct(col("op"), col("ts"), col("pos"), col("value")), col("pos")).as("last"))
      .select(col("tbl"), col("pk"), col("last.op").as("op"), col("last.ts").as("ts"),
        col("last.pos").as("pos"), col("last.value").as("value"))

  private def emptyState(spark: SparkSession): DataFrame =
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      graft.model.ChangeEvent.envelopeSchema)

  private def versionDirs(spark: SparkSession, stateDir: String): Seq[(Long, String)] = {
    val d = new java.io.File(stateDir)
    if (!d.exists()) Nil
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .map(f => (f.getName.stripPrefix("v=").toLong, f.getAbsolutePath))
      .sortBy(_._1)
  }

  /** State as of the latest version strictly below `beforeBatch` (replay
    * of batch N must not read N's own partial output).
    */
  def stateBefore(spark: SparkSession, stateDir: String, beforeBatch: Long): DataFrame =
    versionDirs(spark, stateDir).filter(_._1 < beforeBatch).lastOption match {
      case Some((_, path)) => spark.read.parquet(path)
      case None => emptyState(spark)
    }

  /** The foreachBatch body: v(batchId) := merge(v(prev), batch). Public
    * so the idempotence property is unit-testable without a stream.
    */
  def applyBatch(stateDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = stateBefore(spark, stateDir, batchId)
    mergeState(prev, batch)
      .repartition(col("tbl"), col("pk"))
      .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
  }

  /** Latest materialized state, tombstones dropped. */
  def currentState(spark: SparkSession, stateDir: String): DataFrame =
    versionDirs(spark, stateDir).lastOption match {
      case Some((_, path)) => spark.read.parquet(path).filter(col("op") =!= "D")
      case None => emptyState(spark)
    }

  /** Run a bounded streaming apply over a directory of changelog parquet
    * files (one micro-batch per file via maxFilesPerTrigger=1 — multiple
    * genuinely independent micro-batches, arbitrary file order) and block
    * until drained.
    */
  def runAvailableNow(
      spark: SparkSession,
      changelogDir: String,
      schema: org.apache.spark.sql.types.StructType,
      normalize: DataFrame => DataFrame,
      stateDir: String,
      checkpointDir: String): Unit = {
    val q = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(changelogDir)
      .transform(normalize)
      .writeStream
      .foreachBatch(applyBatch(stateDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
