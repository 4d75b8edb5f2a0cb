package graft

import graft.cdc.{ChangelogApply, Watermark}
import graft.model.ChangeEvent
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.sql.Timestamp

/** CDC correctness laws (SURVEY.md §5.3): replaying a changelog over a
  * snapshot equals folding the ops directly; apply is idempotent; the
  * snapshot/catchup window algebra absorbs the duplicate range.
  *
  * Property style: ScalaCheck generators sampled with a fixed seed (the
  * scalatestplus bridge isn't in the offline cache) — deterministic, and
  * each failure prints the offending sample.
  */
class CdcSemanticsSpec extends SparkSpec {

  private def df(events: Seq[ChangeEvent]): DataFrame = {
    import spark.implicits._
    events.toDF()
  }

  /** Deterministic samples from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genOps: Gen[List[(String, Double)]] = Gen.listOfN(12,
    Gen.zip(Gen.oneOf("I", "U", "D"), Gen.choose(0.0, 100.0)))

  private val genKeyed: Gen[Map[Long, List[(String, Double)]]] =
    Gen.mapOfN(4, Gen.zip(Gen.choose(0L, 5L), genOps)).suchThat(_.nonEmpty)

  private def mkEvents(opsPerKey: Map[Long, List[(String, Double)]]): Seq[ChangeEvent] = {
    var pos = 0L
    // interleave keys round-robin so per-key order ≠ global order
    val queues = scala.collection.mutable.Map(
      opsPerKey.view.mapValues(v => scala.collection.mutable.Queue(v: _*)).toMap.toSeq: _*)
    val out = Seq.newBuilder[ChangeEvent]
    while (queues.values.exists(_.nonEmpty)) {
      for (k <- queues.keys.toSeq.sorted if queues(k).nonEmpty) {
        val (op, v) = queues(k).dequeue()
        out += ChangeEvent("t0", k, op, new Timestamp(pos * 1000), pos, v)
        pos += 1
      }
    }
    out.result()
  }

  /** Reference semantics: driver-side sequential fold per key. */
  private def foldState(events: Seq[ChangeEvent]): Map[(String, Long), Double] =
    events.sortBy(_.pos).foldLeft(Map.empty[(String, Long), Double]) { (st, e) =>
      e.op match {
        case "D" => st - ((e.tbl, e.pk))
        case _ => st + ((e.tbl, e.pk) -> e.value)
      }
    }

  test("LWW materialization equals sequential per-key fold (property)") {
    for (m <- samples(genKeyed, 8) if m.values.exists(_.nonEmpty)) {
      val events = mkEvents(m)
      val got = ChangelogApply.materialize(df(events))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
      assert(got == foldState(events), s"events=$events")
    }
  }

  test("materialize is idempotent: state(changelog ⊎ changelog) == state(changelog)") {
    val events = mkEvents(Map(1L -> List(("I", 1.0), ("U", 2.0)), 2L -> List(("I", 5.0), ("D", 0.0))))
    val once = ChangelogApply.materialize(df(events)).collect().toSet
    val twice = ChangelogApply.materialize(df(events).unionAll(df(events))).collect().toSet
    assert(once == twice)
  }

  test("snapshot+catchup equals direct LWW at the high watermark (property)") {
    for (m <- samples(genKeyed, 8) if m.values.exists(_.nonEmpty)) {
      val events = mkEvents(m)
      val cl = df(events)
      val maxPos = events.map(_.pos).max + 1
      for (low <- Seq(0L, maxPos / 3, maxPos)) {
        val got = Watermark.snapshotThenCatchup(cl, low, maxPos)
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(5)).toMap
        assert(got == foldState(events), s"low=$low events=$events")
      }
    }
  }

  test("watermark lifecycle: completed/active/expired per table, stats roll up") {
    import spark.implicits._
    // t_done advanced past high=20, t_mid stalled inside [10,20),
    // t_old has nothing at/after low=10 → expired bracket
    val cl = Seq(
      ("t_done", 1L, "I", 5L, 1.0), ("t_done", 1L, "U", 15L, 2.0), ("t_done", 2L, "U", 25L, 3.0),
      ("t_mid", 1L, "I", 8L, 1.0), ("t_mid", 2L, "I", 12L, 2.0),
      ("t_old", 1L, "I", 3L, 1.0), ("t_old", 2L, "I", 7L, 2.0)
    ).toDF("tbl", "pk", "op", "pos", "value")
    val lc = Watermark.lifecycle(cl, 10L, 20L)
      .select("tbl", "status", "n_snapshot_events", "n_catchup_events")
      .as[(String, String, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(lc("t_done") == ("completed", 1L, 1L))
    assert(lc("t_mid") == ("active", 1L, 1L))
    assert(lc("t_old") == ("expired", 2L, 0L))
    val stats = Watermark.lifecycleStats(cl, 10L, 20L)
      .select("status", "n_tables").as[(String, Long)].collect().toMap
    assert(stats == Map("completed" -> 1L, "active" -> 1L, "expired" -> 1L))
  }

  test("catchup over an overlapping window is absorbed (duplicate replay safe)") {
    val events = mkEvents(Map(1L -> List(("I", 1.0), ("U", 2.0), ("U", 3.0)), 2L -> List(("I", 9.0))))
    val cl = df(events)
    val maxPos = events.map(_.pos).max + 1
    // replay [0, high) over a snapshot that already saw everything < high
    val got = Watermark.snapshotThenCatchup(cl, 0L, maxPos).collect().toSet
    val direct = ChangelogApply.materialize(cl).collect().toSet
    assert(got == direct)
  }

  test("log compaction preserves materialized state and is a fixpoint (property)") {
    for (m <- samples(genKeyed, 8) if m.values.exists(_.nonEmpty)) {
      val events = mkEvents(m)
      val cl = df(events)
      val compacted = ChangelogApply.compactLog(cl, 0.6)
      // the defining law: replicas replaying the compacted log reach the
      // same state as replicas that consumed everything
      val fromFull = ChangelogApply.materialize(cl).collect().toSet
      val fromCompacted = ChangelogApply.materialize(
        compacted.drop("is_tombstone")).collect().toSet
      assert(fromFull == fromCompacted, s"events=$events")
      // direct model check: survivors are exactly the per-key latest,
      // minus delete-tombstones at or below the retention frontier
      val posns = events.map(_.pos)
      val frontier = posns.min + math.floor(0.6 * (posns.max - posns.min)).toLong
      val expected = events.groupBy(e => (e.tbl, e.pk)).values
        .map(_.maxBy(_.pos))
        .filterNot(e => e.op == "D" && e.pos <= frontier)
        .map(e => ((e.tbl, e.pk), (e.op, e.pos, e.op == "D"))).toMap
      val got = compacted.collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getString(2), r.getLong(4), r.getBoolean(6)))).toMap
      assert(got == expected, s"frontier=$frontier events=$events")
    }
  }

  test("interleaved snapshot: every chunk consistent under cut-straddling deletes (property)") {
    // adversarial fixed cases first: deletes landing before/after the cut
    // and dead-at-cut resurrections are exactly where a naive chunked
    // snapshot loses rows
    def ev(pk: Long, op: String, pos: Long, v: Double) =
      ChangeEvent("t0", pk, op, new Timestamp(pos * 1000), pos, v)
    val crafted = Seq(
      ev(0L, "I", 0L, 1.0), ev(0L, "D", 9L, 0.0),                     // deleted in the tail
      ev(1L, "I", 1L, 2.0), ev(1L, "D", 2L, 0.0),                     // dead at every cut
      ev(2L, "I", 3L, 3.0), ev(2L, "D", 4L, 0.0), ev(2L, "I", 10L, 4.0), // resurrected in tail
      ev(3L, "U", 11L, 5.0),                                          // born after the last cut
      ev(7L, "I", 5L, 6.0))                                           // untouched survivor
    val out = ChangelogApply.interleavedSnapshot(df(crafted), 4).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Boolean]("consistent")),
      s"crafted case inconsistent: ${out.mkString("\n")}")
    // property sweep: random interleaved per-key op sequences, several
    // chunk counts
    samples(genKeyed, 6).zipWithIndex.foreach { case (keyed, i) =>
      val events = mkEvents(keyed)
      if (events.nonEmpty) {
        val res = ChangelogApply.interleavedSnapshot(df(events), 1 + i % 5).collect()
        assert(res.forall(_.getAs[Boolean]("consistent")), s"sample $i: $events")
      }
    }
  }

  test("delete then re-insert resurrects the key with the new value") {
    val events = Seq(
      ChangeEvent("t0", 7L, "I", new Timestamp(0), 0L, 1.0),
      ChangeEvent("t0", 7L, "D", new Timestamp(1000), 1L, 0.0),
      ChangeEvent("t0", 7L, "I", new Timestamp(2000), 2L, 42.0))
    val got = ChangelogApply.materialize(df(events)).collect()
    assert(got.length == 1 && got(0).getDouble(5) == 42.0)
  }

  test("snapshot diff: I/U/D/resurrect/unchanged classified against the mid-log cut") {
    def ev(pk: Long, op: String, pos: Long, v: Double) =
      ChangeEvent("t0", pk, op, new Timestamp(pos * 1000), pos, v)
    // pos spans 0..10 → cut = 5
    val events = Seq(
      ev(1L, "I", 0L, 1.0), ev(1L, "U", 6L, 2.0),  // updated after cut → U
      ev(2L, "I", 1L, 5.0), ev(2L, "D", 7L, 0.0),  // deleted after cut → D
      ev(3L, "I", 8L, 7.0),                         // born after cut → I
      ev(4L, "I", 2L, 9.0),                         // unchanged → absent
      ev(5L, "I", 3L, 1.0), ev(5L, "D", 4L, 0.0), ev(5L, "I", 9L, 3.0), // dead at cut, resurrected → I
      ev(6L, "U", 10L, 4.0))                        // only ever after cut → I
    val got = ChangelogApply.snapshotDiff(df(events)).collect()
      .map(r => r.getLong(1) -> (r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(got == Map(
      1L -> (("U", Some(1.0), Some(2.0))),
      2L -> (("D", Some(5.0), None)),
      3L -> (("I", None, Some(7.0))),
      5L -> (("I", None, Some(3.0))),
      6L -> (("I", None, Some(4.0)))), s"got $got")
  }
}
