package graft

import graft.cdc.{ChangelogApply, Engine, Normalizer}
import graft.model.ChangeEvent
import graft.ops.Metrics
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** E2E lifecycle (INIT→SNAPSHOT→CATCHUP→STREAMING over real parquet
  * micro-batches) + observe-based metrics.
  */
class EngineAndMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(tbl: String, pk: Long, op: String, pos: Long, v: Double) =
    ChangeEvent(tbl, pk, op, new Timestamp(pos * 1000), pos, v)

  private val events = Seq(
    ev("t0", 1, "I", 0, 1.0), ev("t0", 2, "I", 1, 2.0), ev("t1", 1, "I", 2, 10.0),
    ev("t0", 1, "U", 3, 1.5), ev("t0", 2, "D", 4, 0.0), ev("t1", 1, "U", 5, 11.0),
    ev("t0", 3, "I", 6, 3.0), ev("t0", 1, "U", 7, 1.9), ev("t1", 2, "I", 8, 20.0))

  test("lifecycle: snapshot + catchup + streaming equals one-shot batch LWW") {
    val dir = Files.createTempDirectory("graft_engine").toString
    // changelog arrives as 3 files → 3 streaming micro-batches
    events.toDF().repartition(3, pmod(col("pos"), lit(3)))
      .write.parquet(s"$dir/changelog")
    val result = Engine.run(spark, s"$dir/changelog", identity,
      low = 3L, high = 6L, workDir = s"$dir/work")
    val got = Engine.currentState(spark, result)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    val direct = ChangelogApply.materialize(events.toDF())
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got == direct)
  }

  test("live lifecycle: JDBC snapshot + catchup + jdbc-cdc tail equals one-shot LWW") {
    // the upstream server is a RUNNING Derby; all three phases read it
    // over real JDBC (partitioned snapshot strides, then the streaming
    // source's admission-capped polls)
    val url = "jdbc:derby:memory:engine_live;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE CHANGELOG (pos BIGINT PRIMARY KEY, tbl VARCHAR(8), " +
        "pk BIGINT, op VARCHAR(1), ts_us BIGINT, value DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO CHANGELOG VALUES (?, ?, ?, ?, ?, ?)")
    events.foreach { e =>
      ps.setLong(1, e.pos); ps.setString(2, e.tbl); ps.setLong(3, e.pk)
      ps.setString(4, e.op); ps.setLong(5, e.ts.getTime * 1000); ps.setDouble(6, e.value)
      ps.addBatch()
    }
    ps.executeBatch(); conn.close()
    val decode = (df: org.apache.spark.sql.DataFrame) => df
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("tbl", "pk", "op", "ts", "pos", "value")
    val dir = Files.createTempDirectory("graft_engine_live").toString
    val result = Engine.runLive(spark, url, "CHANGELOG", "pos", decode,
      low = 3L, high = 6L, workDir = s"$dir/work",
      numPartitions = 2, maxPerBatch = 2) // ≥ 2 streaming polls for pos 6-8
    val got = Engine.currentState(spark, result)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    val direct = ChangelogApply.materialize(events.toDF())
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(got == direct)
  }

  test("lifecycle over the WIDE envelope: full row images survive snapshot/catchup/streaming") {
    val dir = Files.createTempDirectory("graft_engine_w").toString
    val wide = events.toDF()
      .withColumn("name", concat(lit("row"), col("pk")))
      .withColumn("qty", col("pos") * 10L)
    val payload = Seq("name", "qty", "value")
    wide.repartition(3, pmod(col("pos"), lit(3))).write.parquet(s"$dir/changelog")
    val result = Engine.run(spark, s"$dir/changelog", identity,
      low = 3L, high = 6L, workDir = s"$dir/work", payloadCols = payload)
    val got = Engine.currentState(spark, result, payload)
      .collect().map(r => (r.getAs[String]("tbl"), r.getAs[Long]("pk")) ->
        ((r.getAs[String]("name"), r.getAs[Long]("qty"), r.getAs[Double]("value")))).toMap
    val direct = ChangelogApply.materializeWide(wide, payload)
      .collect().map(r => (r.getAs[String]("tbl"), r.getAs[Long]("pk")) ->
        ((r.getAs[String]("name"), r.getAs[Long]("qty"), r.getAs[Double]("value")))).toMap
    assert(got == direct)
    assert(got(("t0", 1L)) == (("row1", 70L, 1.9)))
  }

  test("re-running the engine over the same changelog is idempotent (crash-restart)") {
    val dir = Files.createTempDirectory("graft_engine2").toString
    events.toDF().repartition(3, pmod(col("pos"), lit(3)))
      .write.parquet(s"$dir/changelog")
    def runOnce(): Map[(String, Long), Double] = {
      val r = Engine.run(spark, s"$dir/changelog", identity,
        low = 3L, high = 6L, workDir = s"$dir/work")
      Engine.currentState(spark, r)
        .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getDouble(5)).toMap
    }
    val first = runOnce()
    // second run reuses the same workDir: snapshot/catchup overwrite, the
    // streaming phase replays from its checkpoint (no new files → no-op)
    val second = runOnce()
    assert(first == second)
    assert(first == ChangelogApply.materialize(events.toDF())
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap)
  }

  test("phase transitions are validated") {
    assert(Engine.validTransition(Engine.Init, Engine.Snapshot))
    assert(Engine.validTransition(Engine.Snapshot, Engine.Catchup))
    assert(Engine.validTransition(Engine.Catchup, Engine.Streaming))
    assert(!Engine.validTransition(Engine.Snapshot, Engine.Streaming))
    assert(!Engine.validTransition(Engine.Streaming, Engine.Snapshot))
  }

  test("observe-based counters ride the job (no second pass)") {
    val (df, obs) = Metrics.observed(events.toDF())
    df.write.mode("overwrite").parquet(
      Files.createTempDirectory("graft_obs").toString + "/out")
    val m = obs.get
    assert(m("n_events") == 9L)
    assert(m("n_inserts") == 5L && m("n_updates") == 3L && m("n_deletes") == 1L)
    assert(m("min_pos") == 0L && m("max_pos") == 8L)
  }

  test("watermark persistence round-trips atomically and overwrites") {
    import graft.cdc.Watermark
    import graft.cdc.Watermark.SnapshotWatermarks
    val dir = Files.createTempDirectory("graft_wm").toString
    assert(Watermark.loadWatermarks(dir).isEmpty)
    Watermark.persistWatermarks(dir, SnapshotWatermarks(3L, 9L, 1723450000000L))
    assert(Watermark.loadWatermarks(dir).contains(SnapshotWatermarks(3L, 9L, 1723450000000L)))
    Watermark.persistWatermarks(dir, SnapshotWatermarks(9L, 20L, 1723450001000L))
    assert(Watermark.loadWatermarks(dir).contains(SnapshotWatermarks(9L, 20L, 1723450001000L)))
  }

  test("pk chunking covers every key exactly once") {
    val chunks = Metrics.pkChunks(events.toDF(), 2L).collect()
    for (t <- Seq("t0", "t1")) {
      val tc = chunks.filter(_.getString(0) == t)
      val keys = events.filter(_.tbl == t).map(_.pk).distinct
      for (k <- keys)
        assert(tc.count(c => k >= c.getAs[Long]("chunk_lo") && k < c.getAs[Long]("chunk_hi")) == 1,
          s"key $k of $t")
    }
  }
}
