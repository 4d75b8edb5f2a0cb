package graft

import graft.streaming.StreamingAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.Row

import scala.collection.mutable

/** Per-batch dimension enrichment: each micro-batch joins against the
  * dimension AS OF that batch — an update to the dimension between
  * batches must be visible to the next batch and invisible to the prior.
  */
class EnrichmentSpec extends SparkSpec {

  import spark.implicits._

  test("dimension updates take effect at the next micro-batch boundary") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_enrich").toString
    val dimPath = s"$tmp/dim"
    Seq((1L, "v1-one"), (2L, "v1-two")).toDF("key", "name")
      .write.mode("overwrite").parquet(dimPath)

    val ms = MemoryStream[(Long, Double)](spark, numPartitions = 1)
    val seen = mutable.ArrayBuffer.empty[(Long, Long, String)] // (batch, key, name)
    val q = StreamingAnalytics.runEnrichedStream(
      ms.toDF().toDF("key", "value"), dimPath, "key", s"$tmp/ckpt") { (df, id) =>
      df.select("key", "name").collect().foreach {
        case Row(k: Long, n: String) => seen.synchronized { seen += ((id, k, n)) }
        case Row(k: Long, null) => seen.synchronized { seen += ((id, k, "<none>")) }
      }
    }
    try {
      ms.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      // dimension update between batches: key 1 renamed, key 3 appears
      Seq((1L, "v2-one"), (2L, "v2-two"), (3L, "v2-three")).toDF("key", "name")
        .write.mode("overwrite").parquet(dimPath)
      ms.addData((1L, 11.0), (3L, 31.0))
      q.processAllAvailable()
    } finally q.stop()

    val byBatch = seen.groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val batches = byBatch.keys.toSeq.sorted
    assert(batches.size == 2)
    assert(byBatch(batches(0)) == Map(1L -> "v1-one", 3L -> "<none>"))
    assert(byBatch(batches(1)) == Map(1L -> "v2-one", 3L -> "v2-three"))
  }
}
