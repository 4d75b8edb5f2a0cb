package graft

import graft.model.ChangeEvent
import graft.ops.StreamMetricsListener
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

class StreamMetricsSpec extends SparkSpec {

  import spark.implicits._

  test("listener folds progress into counters and health") {
    val listener = new StreamMetricsListener
    spark.streams.addListener(listener)
    try {
      val ms = MemoryStream[ChangeEvent](spark, numPartitions = 1)
      val q = ms.toDF().writeStream.format("memory").queryName("met_out")
        .trigger(Trigger.ProcessingTime(0)).start()
      try {
        for (i <- 0 until 3) {
          ms.addData((0 until 10).map(j =>
            ChangeEvent("t0", j.toLong, "I", new Timestamp(i * 1000L), i * 10L + j, 1.0)))
          q.processAllAvailable()
        }
      } finally q.stop()
      // listener events are async; wait for them to drain
      val deadline = System.currentTimeMillis() + 10000
      while (listener.snapshot("total_rows") < 30 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      val snap = listener.snapshot
      assert(snap("total_rows") == 30.0)
      assert(snap("n_batches") >= 3.0)
      assert(snap("latency_p50_ms") <= snap("latency_p99_ms"))
      assert(snap("latency_p99_ms") > 0.0)
      assert(listener.health().errorRate == 0.0)
    } finally spark.streams.removeListener(listener)
  }
}
