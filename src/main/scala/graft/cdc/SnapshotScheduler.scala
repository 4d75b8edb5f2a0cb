package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-concurrency snapshot scheduling as a deterministic wave plan.
  *
  * The reference runs an actor tick loop: every interval it takes
  * `maxConcurrentTasks - running` pending tasks in submission order and
  * spawns a worker per task (reference: snapshot/SnapshotScheduler.scala:115-122
  * config, :220-251 ProcessPendingTasks admission). Spark-first, the same
  * admission policy over a known chunk set collapses to a pure plan:
  * number the chunks in submission order, then `wave = seq div k`,
  * `slot = seq mod k` — wave w is exactly the set of tasks the reference
  * would have running together once the pool drains uniformly, and the
  * executor-side analogue is simply "submit wave w, barrier, submit w+1".
  *
  * The input is [[graft.ops.Metrics.pkChunks]] output (N tables × M
  * chunks) — snapshot METADATA, thousands of rows at the extreme, so the
  * global-order window here is a driver-scale sort, never a data shuffle.
  */
object SnapshotScheduler {

  /** Assign every (tbl, chunk) task its wave and slot under a
    * `maxConcurrent` admission cap. Submission order is (tbl, chunk_id) —
    * the discovery order the reference enqueues in.
    */
  def waves(chunks: DataFrame, maxConcurrent: Int): DataFrame = {
    require(maxConcurrent > 0, s"maxConcurrent must be positive: $maxConcurrent")
    val order = Window.orderBy(col("tbl"), col("chunk_id"))
    chunks
      .withColumn("task_seq", row_number().over(order).cast("long") - 1L)
      .withColumn("wave", floor(col("task_seq") / lit(maxConcurrent.toLong)).cast("long"))
      .withColumn("slot", (col("task_seq") % lit(maxConcurrent.toLong)).cast("long"))
  }

  /** Oracle SQL over the same chunk CTE ([[graft.ops.Metrics.pkChunksSql]]
    * nests as a subquery).
    */
  def wavesSql(chunksSql: String, maxConcurrent: Int): String =
    s"""WITH chunks AS ($chunksSql),
       |seqd AS (
       |  SELECT *, row_number() OVER (ORDER BY tbl, chunk_id) - 1 AS task_seq
       |  FROM chunks)
       |SELECT tbl, chunk_id, chunk_lo, chunk_hi,
       |       CAST(task_seq AS BIGINT) AS task_seq,
       |       CAST(floor(task_seq / $maxConcurrent) AS BIGINT) AS wave,
       |       CAST(task_seq % $maxConcurrent AS BIGINT) AS slot
       |FROM seqd""".stripMargin
}
