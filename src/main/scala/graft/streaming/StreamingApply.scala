package graft.streaming

import graft.functions.PortableHash
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
  *   - idempotent re-run = each touched bucket's v(batchId) is a pure
  *     function of that bucket's v(prev) + batch, written by overwrite —
  *     replaying a batch rewrites the same bytes (reference gets this
  *     from upsert-by-PK, README.md:524-552).
  *
  * State layout — BUCKETED versions, the 100 TB-safe shape:
  *
  *   stateDir/v=<batchId>/bucket=<b>/part-*.parquet
  *
  * The state is hash-partitioned into `nBuckets` by the portable pk
  * router. A micro-batch merges and rewrites ONLY the buckets its keys
  * touch — O(|touched state|) per batch, not O(|whole state|): a 1-second
  * batch updating 0.1% of a 100 TB keyspace reads and writes ~0.1% of the
  * buckets instead of rewriting the world (the round-1 design's flaw).
  * Untouched buckets keep serving their previous version. Tombstones are
  * retained inside the state (op='D' rows kept so later batches can't
  * resurrect deleted keys); [[currentState]] drops them at read.
  *
  * Retention: [[compact]] keeps the newest `keepVersions` versions per
  * bucket (default 2 — enough for Structured Streaming's replay window,
  * which only ever re-runs the latest uncommitted batch) and deletes the
  * rest, so state disk stays O(2 · |state|) instead of O(batches).
  * Production path at larger replay windows: Delta/Iceberg MERGE, which
  * gives the same touched-files-only rewrite transactionally.
  */
object StreamingApply {

  private val stateCols = Seq("tbl", "pk", "op", "ts", "pos", "value")

  /** State buckets. 32 matches the harness cores; at cluster scale this
    * would be sized so one bucket ≈ one comfortable task (e.g. 4096).
    */
  val defaultBuckets = 32

  /** Portable bucket assignment — same router as [[graft.cdc.Routing]],
    * so "all history of a pk lives in one bucket" is the same guarantee
    * the reference's EventRouter gives (router/EventRouter.scala:25-32).
    */
  def bucketOf(nBuckets: Int) = PortableHash.routerPartition(col("pk"), nBuckets)

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

  /** All (version, bucket, path) triples on disk, oldest version first. */
  private def bucketVersions(stateDir: String): Seq[(Long, Int, String)] = {
    val d = new java.io.File(stateDir)
    if (!d.exists()) Nil
    else for {
      v <- d.listFiles().toSeq.filter(f => f.isDirectory && f.getName.startsWith("v="))
      ver = v.getName.stripPrefix("v=").toLong
      b <- v.listFiles().toSeq.filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    } yield (ver, b.getName.stripPrefix("bucket=").toInt, b.getAbsolutePath)
  }.sortBy(t => (t._1, t._2))

  /** Latest version path per bucket among versions strictly below
    * `beforeBatch` (replay of batch N must not read N's own output).
    */
  private def latestPerBucket(stateDir: String, beforeBatch: Long): Map[Int, String] =
    bucketVersions(stateDir)
      .filter(_._1 < beforeBatch)
      .groupBy(_._2)
      .map { case (b, vs) => b -> vs.maxBy(_._1)._3 }

  /** State as of the latest version strictly below `beforeBatch`,
    * restricted to `buckets` (None = all buckets).
    */
  def stateBefore(spark: SparkSession, stateDir: String, beforeBatch: Long,
                  buckets: Option[Set[Int]] = None): DataFrame = {
    val paths = latestPerBucket(stateDir, beforeBatch)
      .filter { case (b, _) => buckets.forall(_.contains(b)) }
      .values.toSeq
    if (paths.isEmpty) emptyState(spark)
    else spark.read.parquet(paths: _*).select(stateCols.map(col): _*)
  }

  /** Write a full state frame as one bucketed version — the seeding path
    * for snapshot/catchup phases (Engine) and the write half of
    * [[applyBatch]].
    */
  def writeVersion(state: DataFrame, stateDir: String, version: Long,
                   nBuckets: Int = defaultBuckets): Unit =
    state.select(stateCols.map(col): _*)
      .withColumn("bucket", bucketOf(nBuckets))
      .repartition(col("bucket"))
      .write.partitionBy("bucket")
      .mode("overwrite").parquet(s"$stateDir/v=$version")

  /** The foreachBatch body: for each bucket touched by the batch,
    * v(batchId)/bucket := merge(latest(bucket), batch ∩ bucket). Public so
    * the idempotence property is unit-testable without a stream.
    *
    * The touched-bucket probe is a driver-side collect BOUNDED BY
    * nBuckets (a few ints, never data rows) — the same legitimate scalar
    * probe shape as Watermark.latestPosition.
    */
  def applyBatch(stateDir: String, nBuckets: Int = defaultBuckets)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(stateCols.map(col): _*)
      .withColumn("bucket", bucketOf(nBuckets)).persist()
    try {
      val touched = b.select(col("bucket")).distinct()
        .collect().map(_.getLong(0).toInt).toSet
      if (touched.nonEmpty) {
        val prev = stateBefore(spark, stateDir, batchId, Some(touched))
        writeVersion(mergeState(prev, b), stateDir, batchId, nBuckets)
      }
      compact(stateDir)
    } finally b.unpersist()
  }

  /** Drop superseded bucket versions, keeping the newest `keepVersions`
    * per bucket (≥ 2 so a crash-replay of the latest batch still finds
    * its predecessor). Empty v= dirs are removed once drained.
    */
  def compact(stateDir: String, keepVersions: Int = 2): Unit = {
    require(keepVersions >= 2, "replay of the latest batch needs its predecessor")
    bucketVersions(stateDir).groupBy(_._2).foreach { case (_, vs) =>
      vs.sortBy(-_._1).drop(keepVersions).foreach { case (_, _, path) =>
        deleteRecursively(new java.io.File(path))
      }
    }
    val d = new java.io.File(stateDir)
    if (d.exists()) d.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v="))
      .filter(f => f.listFiles().forall(c => !c.getName.startsWith("bucket=")))
      .foreach(deleteRecursively)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Latest materialized state (latest version of every bucket),
    * tombstones dropped.
    */
  def currentState(spark: SparkSession, stateDir: String): DataFrame =
    stateBefore(spark, stateDir, Long.MaxValue).filter(col("op") =!= "D")

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
