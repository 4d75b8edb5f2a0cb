package graft

import java.sql.DriverManager

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end DBLog composition against a LIVE database: a chunked
  * snapshot taken at STAGGERED log cuts WHILE the `graft-jdbc-cdc` tail
  * keeps flowing, then catchup + LWW reconcile. This is the whole
  * snapshot-interleaving device run as one system — previously each half
  * was proven alone (`JdbcCdcSourceSpec` for the live tail,
  * `cdc_interleaved_snapshot` for the batch audit); here the snapshot
  * reads race real writes to the same running Derby instance.
  *
  * Reference semantics: the engine schedules PK-range snapshot chunks
  * beside the streaming changelog, each chunk consistent at its own
  * (progressively later) log position, and relies on the LWW merge being
  * associative/order-insensitive so snapshot ⊎ tail equals the state a
  * one-shot replay of the full log produces (reference
  * engine/CDCEngine.scala:496-606, docs/SNAPSHOT_CATCHUP.md:16-100).
  *
  * The writer applies every event to BOTH the state table and the
  * changelog (what a database does); chunk reads go through Spark's JDBC
  * source with the PK range pushed down; the tail is the DSv2 source
  * polling the same live changelog into a foreachBatch buffer. Between
  * phases the spec asserts the tail has already delivered the writes
  * that happened since the previous chunk — the interleaving is real,
  * not staged after the fact.
  */
class DbLogEndToEndSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:dblog_e2e;create=true"

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(url)
    try c.createStatement().execute(sql) finally c.close()
  }

  /** Apply one event the way a database would: mutate STATE and append
    * the changelog record in the same session. */
  private def write(events: Seq[(Long, Long, String, Double)]): Unit = {
    val c = DriverManager.getConnection(url)
    try {
      val ins = c.prepareStatement("INSERT INTO STATE VALUES (?, ?)")
      val upd = c.prepareStatement("UPDATE STATE SET value = ? WHERE pk = ?")
      val del = c.prepareStatement("DELETE FROM STATE WHERE pk = ?")
      val log = c.prepareStatement("INSERT INTO CHANGELOG VALUES (?, 't0', ?, ?, ?)")
      events.foreach { case (pos, pk, op, v) =>
        op match {
          case "I" => ins.setLong(1, pk); ins.setDouble(2, v); ins.executeUpdate()
          case "U" => upd.setDouble(1, v); upd.setLong(2, pk); upd.executeUpdate()
          case "D" => del.setLong(1, pk); del.executeUpdate()
        }
        log.setLong(1, pos); log.setLong(2, pk); log.setString(3, op)
        log.setDouble(4, v); log.executeUpdate()
      }
    } finally c.close()
  }

  /** Spark-JDBC chunk read with the PK range pushed into the database —
    * the snapshot side of the composition. */
  private def readChunk(lo: Long, hi: Long): Seq[(Long, Double)] =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", s"SELECT pk, value FROM STATE WHERE pk BETWEEN $lo AND $hi")
      .load()
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  test("chunked snapshot at staggered cuts during a live tail reconciles to one-shot LWW") {
    exec("CREATE TABLE STATE (pk BIGINT PRIMARY KEY, value DOUBLE)")
    exec("CREATE TABLE CHANGELOG (pos BIGINT PRIMARY KEY, tbl VARCHAR(8), " +
      "pk BIGINT, op VARCHAR(1), value DOUBLE)")

    // tail buffer: pos -> (pk, op, value); TrieMap because foreachBatch
    // collects on query threads
    val tail = new scala.collection.concurrent.TrieMap[Long, (Long, String, Double)]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dblog_e2e").toString
    var expectedPos = 0L
    def assertCaughtUp(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      q.processAllAvailable()
      assert(tail.keySet.max == expectedPos,
        s"tail behind the database: at ${tail.keySet.max}, writes at $expectedPos")
    }

    // phase 0 — pre-snapshot history: 30 inserts + churn (updates, a
    // delete that stays deleted until after its chunk's cut, a
    // delete+reinsert) so chunk reads see non-trivial LWW state
    write((1L to 30L).map(pk => (pk, pk, "I", pk * 1.0)))
    write(Seq((31L, 5L, "U", 5.5), (32L, 12L, "D", 0.0), (33L, 25L, "U", 25.5),
      (34L, 7L, "D", 0.0), (35L, 7L, "I", 7.7)))
    expectedPos = 35L

    val q = spark.readStream.format("graft-jdbc-cdc")
      .option("url", url).option("table", "CHANGELOG")
      .option("posColumn", "pos").option("maxPerBatch", "16")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select("pos", "pk", "op", "value").collect().foreach { r =>
          tail.put(r.getLong(0), (r.getLong(1), r.getString(2), r.getDouble(3))); ()
        }
      }
      .option("checkpointLocation", s"$ckpt/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()

    val chunks = Seq((0, 1L, 10L), (1, 11L, 20L), (2, 21L, 30L))
    val snapshots = scala.collection.mutable.Map[Int, (Long, Seq[(Long, Double)])]()
    try {
      // chunk 0 at cut=35, then MORE writes land before chunk 1's cut —
      // including to chunk-0 pks, which only the tail can deliver
      assertCaughtUp(q)
      snapshots(0) = (expectedPos, readChunk(1L, 10L))
      write(Seq((36L, 3L, "U", 3.3), (37L, 15L, "U", 15.5), (38L, 12L, "I", 12.2),
        (39L, 28L, "D", 0.0)))
      expectedPos = 39L

      assertCaughtUp(q) // tail delivered 36-39 BEFORE chunk 1 is read
      snapshots(1) = (expectedPos, readChunk(11L, 20L))
      write(Seq((40L, 18L, "D", 0.0), (41L, 22L, "U", 22.2), (42L, 3L, "U", 3.9)))
      expectedPos = 42L

      assertCaughtUp(q)
      snapshots(2) = (expectedPos, readChunk(21L, 30L))
      // post-snapshot tail: every chunk needs catchup from here
      write(Seq((43L, 1L, "U", 1.1), (44L, 15L, "D", 0.0), (45L, 28L, "I", 28.8),
        (46L, 30L, "U", 30.3)))
      expectedPos = 46L
      assertCaughtUp(q)
    } finally q.stop()
    assert(tail.size == 46, s"tail should hold every changelog row: ${tail.size}")

    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    val full = tail.toSeq.map { case (pos, (pk, op, v)) => ("t0", pk, op, ts, pos, v) }
      .toDF("tbl", "pk", "op", "ts", "pos", "value")

    // reconcile per chunk: snapshot rows replayed as inserts AT the cut
    // + tail events strictly after the cut, LWW-merged, must equal the
    // one-shot materialization of the full log restricted to the chunk
    val direct = cdc.ChangelogApply.materialize(full)
      .select("pk", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    chunks.foreach { case (c, lo, hi) =>
      val (cut, snapRows) = snapshots(c)
      val snapDf = snapRows.map { case (pk, v) => ("t0", pk, "I", ts, cut, v) }
        .toDF("tbl", "pk", "op", "ts", "pos", "value")
      val tailDf = full.filter(col("pos") > lit(cut) &&
        col("pk").between(lo, hi))
      val merged = cdc.ChangelogApply.materialize(snapDf.unionByName(tailDf))
        .select("pk", "value").collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      val expected = direct.filter { case (pk, _) => pk >= lo && pk <= hi }
      assert(merged == expected, s"chunk $c diverged (cut=$cut)")
    }

    // the batch audit over the SAME live-captured changelog agrees:
    // every (tbl, chunk) row of the interleaved-snapshot invariant holds
    val audit = cdc.ChangelogApply.interleavedSnapshot(full, chunks.size).collect()
    assert(audit.nonEmpty && audit.forall(_.getAs[Boolean]("consistent")),
      "interleavedSnapshot audit flagged an inconsistent chunk on the live log")
  }

  test("streaming consistent-cut: frontier exported per micro-batch is monotone and lands on the batch answer") {
    val u = "jdbc:derby:memory:dblog_cut;create=true"
    val c0 = DriverManager.getConnection(u)
    c0.createStatement().execute("CREATE TABLE CHANGELOG (pos BIGINT PRIMARY KEY, " +
      "tbl VARCHAR(8), pk BIGINT, op VARCHAR(1), value DOUBLE)")
    c0.close()
    def log(rows: Seq[(Long, String, Long, String, Double)]): Unit = {
      val c = DriverManager.getConnection(u)
      try {
        val ps = c.prepareStatement("INSERT INTO CHANGELOG VALUES (?, ?, ?, ?, ?)")
        rows.foreach { case (pos, tbl, pk, op, v) =>
          ps.setLong(1, pos); ps.setString(2, tbl); ps.setLong(3, pk)
          ps.setString(4, op); ps.setDouble(5, v); ps.executeUpdate()
        }
      } finally c.close()
    }
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // two interleaved tables so the frontier is a real cross-table min,
    // not just "latest position"
    log(Seq((1L, "t0", 1L, "I", 1.0), (2L, "t1", 1L, "I", 10.0),
      (3L, "t0", 2L, "I", 2.0), (4L, "t1", 2L, "I", 20.0)))
    val buf = new scala.collection.concurrent.TrieMap[Long, (String, Long, String, Double)]()
    // per-micro-batch frontier export: (frontier, per-table checksum rows)
    val exports = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Map[String, Long])]()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_dblog_cut").toString
    def cutOf(df: org.apache.spark.sql.DataFrame) =
      cdc.ChangelogApply.consistentCut(df).collect()
        .map(r => (r.getAs[String]("tbl"), r.getAs[Long]("frontier"),
          r.getAs[Long]("state_checksum"))).toSeq
    def bufDf = buf.toSeq.map { case (pos, (tbl, pk, op, v)) => (tbl, pk, op, ts, pos, v) }
      .toDF("tbl", "pk", "op", "ts", "pos", "value")
    val q = spark.readStream.format("graft-jdbc-cdc")
      .option("url", u).option("table", "CHANGELOG").option("posColumn", "pos")
      .option("maxPerBatch", "3")
      .load()
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          buf.put(r.getAs[Long]("pos"), (r.getAs[String]("tbl"),
            r.getAs[Long]("pk"), r.getAs[String]("op"), r.getAs[Double]("value"))); ()
        }
        // the frontier export INSIDE the apply loop — what a live deploy
        // would publish to the warehouse after each micro-batch
        val rows = cutOf(bufDf)
        if (rows.nonEmpty)
          exports.add((rows.head._2, rows.map(r => r._1 -> r._3).toMap)); ()
      }
      .option("checkpointLocation", s"$ckpt/ckpt")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      q.processAllAvailable()
      log(Seq((5L, "t0", 1L, "U", 1.5), (6L, "t1", 1L, "D", 0.0),
        (7L, "t0", 3L, "I", 3.0)))
      q.processAllAvailable()
      log(Seq((8L, "t1", 3L, "I", 30.0), (9L, "t0", 2L, "D", 0.0)))
      q.processAllAvailable()
    } finally q.stop()
    val seq = exports.toArray(Array.empty[(Long, Map[String, Long])]).toSeq
    assert(seq.nonEmpty)
    // frontiers never move backwards across micro-batches
    assert(seq.map(_._1) == seq.map(_._1).sorted,
      s"frontier regressed across batches: ${seq.map(_._1)}")
    // the final in-loop export equals the one-shot batch answer computed
    // from the DATABASE's own changelog — the stream reached the same
    // consistent state the batch path sees
    val dbLog = spark.read.format("jdbc").option("url", u)
      .option("query", "SELECT pos, tbl, pk, op, value FROM CHANGELOG").load()
      .select(col("tbl"), col("pk"), col("op"), lit(ts).as("ts"),
        col("pos"), col("value"))
    assert(seq.last._2 == cutOf(dbLog).map(r => r._1 -> r._3).toMap)
    assert(buf.size == 9)
  }
}
