package graft

import graft.streaming.Conflation
import graft.streaming.Conflation.{ChangeIn, Delta}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Conflated delta stream (R6): one delta per key per batch, no-op
  * writes throttled, replays absorbed.
  */
class ConflationSpec extends SparkSpec {

  import spark.implicits._

  private def run(batches: Seq[Seq[ChangeIn]]): Seq[Delta] = {
    val ms = MemoryStream[ChangeIn](spark, numPartitions = 1)
    val name = s"conflate_out_${System.nanoTime()}"
    val q = Conflation.conflatedDeltas(ms.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      spark.table(name).as[Delta].collect().toSeq
    } finally q.stop()
  }

  test("N updates to one key in a batch emit ONE delta carrying the last value") {
    val got = run(Seq(Seq(
      ChangeIn("t0", 1L, "I", 0L, 1.0),
      ChangeIn("t0", 1L, "U", 1L, 2.0),
      ChangeIn("t0", 1L, "U", 2L, 3.0))))
    assert(got == Seq(Delta("t0", 1L, "I", 2L, Some(3.0), None)))
  }

  test("no-op write (same value) is throttled; genuine change emits U with prev") {
    val got = run(Seq(
      Seq(ChangeIn("t0", 1L, "I", 0L, 5.0)),
      Seq(ChangeIn("t0", 1L, "U", 1L, 5.0)),   // value unchanged → silence
      Seq(ChangeIn("t0", 1L, "U", 2L, 7.0))))  // real change
    assert(got == Seq(
      Delta("t0", 1L, "I", 0L, Some(5.0), None),
      Delta("t0", 1L, "U", 2L, Some(7.0), Some(5.0))))
  }

  test("delete emits D once; delete of a dead key is silent; re-insert emits I") {
    val got = run(Seq(
      Seq(ChangeIn("t0", 1L, "I", 0L, 1.0)),
      Seq(ChangeIn("t0", 1L, "D", 1L, 0.0)),
      Seq(ChangeIn("t0", 1L, "D", 2L, 0.0)),   // already dead → silence
      Seq(ChangeIn("t0", 1L, "I", 3L, 9.0))))  // resurrection
    assert(got == Seq(
      Delta("t0", 1L, "I", 0L, Some(1.0), None),
      Delta("t0", 1L, "D", 1L, None, Some(1.0)),
      Delta("t0", 1L, "I", 3L, Some(9.0), None)))
  }

  test("replayed positions are absorbed (effectively-once)") {
    val b = Seq(ChangeIn("t0", 1L, "I", 0L, 1.0), ChangeIn("t0", 1L, "U", 1L, 2.0))
    val got = run(Seq(b, b)) // same batch content delivered twice
    assert(got == Seq(Delta("t0", 1L, "I", 1L, Some(2.0), None)))
  }

  test("losslessness: folding the delta stream reproduces the LWW state (property)") {
    // throttling must never lose information: a consumer that applies
    // only the emitted deltas must land on exactly the LWW state of the
    // full changelog.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      var pos = 0L
      val batches = Seq.fill(4) {
        Seq.fill(rnd.nextInt(12)) {
          pos += 1
          val pk = rnd.nextInt(5).toLong
          val op = rnd.nextInt(10) match { case 0 | 1 => "D"; case _ => "U" }
          ChangeIn("t0", pk, op, pos, (rnd.nextInt(3) + 1).toDouble)
        }
      }
      val deltas = run(batches)
      // consumer-side fold of the delta stream
      val fromDeltas = deltas.sortBy(_.pos).foldLeft(Map.empty[Long, Double]) {
        (m, d) => if (d.op == "D") m - d.pk else m + (d.pk -> d.value.get)
      }
      // ground truth: LWW over the full changelog
      val all = batches.flatten
      val truth = all.groupBy(_.pk).flatMap { case (pk, evs) =>
        val last = evs.maxBy(_.pos)
        if (last.op == "D") None else Some(pk -> last.value)
      }
      assert(fromDeltas == truth, s"trial $trial: deltas=$deltas")
    }
  }

  test("incremental aggregate maintenance: folding deltas == recomputing from state (property)") {
    import graft.streaming.IncrementalAgg
    val rnd = new scala.util.Random(7)
    var pos = 0L
    val batches = Seq.fill(3) {
      Seq.fill(15) {
        pos += 1
        val tbl = s"t${rnd.nextInt(2)}"
        val pk = rnd.nextInt(4).toLong
        val op = if (rnd.nextInt(8) == 0) "D" else "U"
        ChangeIn(tbl, pk, op, pos, (rnd.nextInt(9) + 1).toDouble)
      }
    }
    // capture deltas PER micro-batch (foreachBatch attribution)
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Seq[Delta]]
    val ms = MemoryStream[ChangeIn](spark, numPartitions = 1)
    val q = graft.streaming.Conflation.conflatedDeltas(ms.toDS())
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Delta], _: Long) =>
        val rows = b.collect().toSeq
        if (rows.nonEmpty) perBatch.synchronized { perBatch += rows }; ()
      }
      .outputMode(OutputMode.Update).start()
    try {
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
    } finally q.stop()
    val empty = Seq.empty[(String, Long, Double)].toDF("tbl", "n_rows", "sum_value")
    // per-batch incremental fold
    val incremental = perBatch.foldLeft(empty) { (agg, ds) =>
      IncrementalAgg.applyDeltas(agg, ds.toDS().toDF())
    }.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // ground truth: aggregate of the LWW state of the full changelog
    val truth = batches.flatten.groupBy(e => (e.tbl, e.pk)).values.map(_.maxBy(_.pos))
      .filter(_.op != "D").toSeq.groupBy(_.tbl)
      .map { case (t, rows) => t -> ((rows.size.toLong, rows.map(_.value).sum)) }
    assert(incremental.filter(_._2._1 > 0) == truth,
      s"incremental=$incremental truth=$truth")
  }

  test("independent keys conflate independently in one batch") {
    val got = run(Seq(Seq(
      ChangeIn("t0", 1L, "I", 0L, 1.0),
      ChangeIn("t1", 1L, "I", 1L, 2.0),
      ChangeIn("t0", 2L, "I", 2L, 3.0))))
    assert(got.toSet == Set(
      Delta("t0", 1L, "I", 0L, Some(1.0), None),
      Delta("t1", 1L, "I", 1L, Some(2.0), None),
      Delta("t0", 2L, "I", 2L, Some(3.0), None)))
  }
}
