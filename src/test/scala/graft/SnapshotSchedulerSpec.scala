package graft

import graft.cdc.SnapshotScheduler
import graft.ops.Metrics
import org.apache.spark.sql.functions._

/** Bounded-concurrency wave plan: admission cap respected, every chunk
  * scheduled exactly once, waves fill in submission order (reference
  * admission loop, snapshot/SnapshotScheduler.scala:220-251).
  */
class SnapshotSchedulerSpec extends SparkSpec {

  import spark.implicits._

  private val maxConcurrent = 4

  private def plan() = {
    // 3 tables with different key populations → uneven chunk counts
    val changelog = (0L until 300L).map { i =>
      (s"t${i % 3}", i / 3 * (i % 3 + 1), "I", i, i * 1.0)
    }.toDF("tbl", "pk", "op", "pos", "value")
    SnapshotScheduler.waves(Metrics.pkChunks(changelog, 25L), maxConcurrent)
  }

  test("every chunk is scheduled exactly once, task_seq is dense") {
    val p = plan().collect()
    val seqs = p.map(_.getAs[Long]("task_seq")).sorted
    assert(seqs.toSeq == (0L until p.length.toLong))
    val chunkKeys = p.map(r => (r.getAs[String]("tbl"), r.getAs[Long]("chunk_id")))
    assert(chunkKeys.distinct.length == p.length)
  }

  test("no wave exceeds maxConcurrent; all but the last are full") {
    val sizes = plan().groupBy("wave").agg(count(lit(1)).as("n"))
      .orderBy("wave").as[(Long, Long)].collect()
    assert(sizes.forall(_._2 <= maxConcurrent))
    assert(sizes.dropRight(1).forall(_._2 == maxConcurrent),
      s"non-final wave underfilled: ${sizes.toSeq}")
    assert(sizes.map(_._1).toSeq == (0L until sizes.length.toLong))
  }

  test("waves admit in submission order: earlier (tbl, chunk) never waits behind later") {
    val p = plan().orderBy("tbl", "chunk_id")
      .select("wave").as[Long].collect()
    assert(p.toSeq == p.sorted.toSeq, "wave assignment must be monotone in submission order")
  }

  test("slots within a wave are distinct (one worker per slot)") {
    val dup = plan().groupBy("wave", "slot").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup == 0)
  }
}
