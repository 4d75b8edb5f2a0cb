package graft

import graft.sinks.JdbcApplyWorker
import graft.streaming.Conflation
import graft.streaming.Conflation.ChangeIn
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import java.sql.DriverManager

/** The full CDC loop against a real database: stream → conflated deltas
  * → executor-side JDBC apply → Derby, with replay convergence. This is
  * the reference's end-to-end path (binlog → worker → MySQL upsert)
  * assembled from the Spark-native pieces.
  */
class StreamToJdbcSpec extends SparkSpec {

  import spark.implicits._

  private val url = "jdbc:derby:memory:streamdb;create=true"

  private def resetTable(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE t_state") catch { case _: Exception => () }
      st.execute("CREATE TABLE t_state (pk BIGINT PRIMARY KEY, val DOUBLE)")
      st.close()
    } finally conn.close()
  }

  private def tableState(): Map[Long, Double] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT pk, val FROM t_state")
      Iterator.continually(rs).takeWhile(_.next()).map(r => r.getLong(1) -> r.getDouble(2)).toMap
    } finally conn.close()
  }

  test("stream -> conflate -> jdbc apply lands on the LWW state; replay converges") {
    resetTable()
    val batches = Seq(
      Seq(ChangeIn("t", 1L, "I", 0L, 1.0), ChangeIn("t", 2L, "I", 1L, 2.0),
        ChangeIn("t", 1L, "U", 2L, 1.5)),
      Seq(ChangeIn("t", 2L, "D", 3L, 0.0), ChangeIn("t", 3L, "I", 4L, 3.0)),
      Seq(ChangeIn("t", 1L, "U", 5L, 1.9), ChangeIn("t", 3L, "U", 6L, 3.0))) // 3: no-op write
    val ms = MemoryStream[ChangeIn](spark, numPartitions = 1)
    val q = Conflation.conflatedDeltas(ms.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Conflation.Delta], _: Long) =>
        val frame = b.toDF()
          .select(col("pk"), coalesce(col("value"), lit(0.0)).as("val"), col("op"))
        JdbcApplyWorker.applyBatch(frame, url, "t_state", Seq("pk"), Seq("val"))
      }
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val expected = Map(1L -> 1.9, 3L -> 3.0)
    assert(tableState() == expected)
    // crash-replay: re-deliver the whole history through a fresh stream
    // over the SAME table — conflation state is new, so every key
    // re-emits, and the idempotent upsert/delete must converge, not dupe
    val ms2 = MemoryStream[ChangeIn](spark, numPartitions = 1)
    val q2 = Conflation.conflatedDeltas(ms2.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Conflation.Delta], _: Long) =>
        val frame = b.toDF()
          .select(col("pk"), coalesce(col("value"), lit(0.0)).as("val"), col("op"))
        JdbcApplyWorker.applyBatch(frame, url, "t_state", Seq("pk"), Seq("val"))
      }
      .outputMode(OutputMode.Update).start()
    try {
      ms2.addData(batches.flatten: _*); q2.processAllAvailable()
    } finally q2.stop()
    assert(tableState() == expected, "replay must rewrite the same bytes")
  }
}
