package graft

import graft.ops.Metrics
import graft.sinks.{ConnectorRegistry, JdbcSnapshot}
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** Partitioned JDBC snapshot against a real (embedded Derby) database:
  * the read is split into PK strides and the stride bounds derive from
  * the chunk plan — the Spark-parallel replacement for the reference's
  * single-connection SELECT * copy (engine/CDCEngineUtils.scala:104-191).
  */
class JdbcSnapshotSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:snapdb;create=true"

  private def seedTable(n: Int): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE events_src") catch { case _: Exception => () }
      st.execute("CREATE TABLE events_src (pk BIGINT PRIMARY KEY, val DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO events_src VALUES (?, ?)")
      (0 until n).foreach { i =>
        ins.setLong(1, i.toLong); ins.setDouble(2, i * 1.5); ins.addBatch()
      }
      ins.executeBatch()
      st.close(); ins.close()
    } finally conn.close()
  }

  test("partitioned jdbc read covers the table across N strides") {
    seedTable(120)
    val p = JdbcSnapshot.Partitioning("pk", 0L, 120L, 4)
    val df = JdbcSnapshot.read(spark, url, "events_src", p)
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 120)
    assert(df.agg(sum(col("pk"))).head.getLong(0) == (0 until 120).sum.toLong)
  }

  test("stride bounds derive from the PK chunk plan") {
    import spark.implicits._
    val changelog = (0L until 100L).map(i => ("events_src", i, "I", i, 1.0))
      .toDF("tbl", "pk", "op", "pos", "value")
    val plan = Metrics.pkChunks(changelog, 25L)
    val p = JdbcSnapshot.partitioningFor(plan, "events_src", "pk")
    assert(p == JdbcSnapshot.Partitioning("pk", 0L, 100L, 4))
  }

  test("apply worker upserts/deletes a merged batch; replay is idempotent") {
    import graft.sinks.JdbcApplyWorker
    import spark.implicits._
    seedTable(5) // pk 0..4, val = pk * 1.5
    // merged batch: update pk 1, delete pk 2, insert pk 10, delete absent pk 99
    val batch = Seq(
      (1L, 100.0, "U"), (2L, 0.0, "D"), (10L, 10.5, "I"), (99L, 0.0, "D")
    ).toDF("pk", "val", "op")
    def applyOnce(): Unit =
      JdbcApplyWorker.applyBatch(batch, url, "events_src", Seq("pk"), Seq("val"))
    def state(): Map[Long, Double] = {
      val conn = DriverManager.getConnection(url)
      try {
        val rs = conn.createStatement().executeQuery("SELECT pk, val FROM events_src")
        Iterator.continually(rs).takeWhile(_.next()).map(r => r.getLong(1) -> r.getDouble(2)).toMap
      } finally conn.close()
    }
    applyOnce()
    val expected = Map(0L -> 0.0, 1L -> 100.0, 3L -> 4.5, 4L -> 6.0, 10L -> 10.5)
    assert(state() == expected)
    applyOnce() // replay: same bytes, no dupes, no resurrections
    assert(state() == expected)
  }

  test("jdbc-snapshot connector reads through the registry SPI") {
    seedTable(60)
    val df = ConnectorRegistry.source("jdbc-snapshot").read(spark, Map(
      "url" -> url, "table" -> "events_src", "partitionColumn" -> "pk",
      "lowerBound" -> "0", "upperBound" -> "60", "numPartitions" -> "3"))
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 60)
  }
}
