package graft

import graft.cdc.ChangelogApply
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Laws for the round-5 additions: SCD2 history (interval chaining,
  * delete-closes-version) and the Bloom contamination pre-filter
  * (no false negatives vs the exact scan).
  */
class Scd2AndBloomSpec extends SparkSpec {

  private def cl(rows: (String, Long, String, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("tbl", "pk", "op", "pos", "value")
      .withColumn("ts", timestamp_micros(col("pos") * 1000000L))
      .select("tbl", "pk", "op", "ts", "pos", "value")
  }

  test("scd2: versions chain, delete closes the last version, current flagged") {
    val history = cl(
      ("t0", 1L, "I", 10L, 1.0), ("t0", 1L, "U", 20L, 2.0), ("t0", 1L, "U", 35L, 3.0),
      ("t0", 2L, "I", 11L, 9.0), ("t0", 2L, "D", 40L, 0.0),
      ("t1", 1L, "I", 5L, 7.0))
    val got = ChangelogApply.scd2(history)
      .orderBy("tbl", "pk", "valid_from_pos")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
    assert(got.toSeq == Seq(
      ("t0", 1L, 10L, Some(20L), false),
      ("t0", 1L, 20L, Some(35L), false),
      ("t0", 1L, 35L, None, true),
      ("t0", 2L, 11L, Some(40L), false), // closed by the delete, not current
      ("t1", 1L, 5L, None, true)))
  }

  test("scd2: versions never overlap; gaps appear only across a delete") {
    val raw = (1 to 40).map { i =>
      ("t" + (i % 3), (i % 5).toLong, if (i % 7 == 0) "D" else "U", i.toLong * 3, i.toDouble)
    }
    val deletes = raw.filter(_._3 == "D").map(e => ((e._1, e._2), e._4)).toSet
    val vs = ChangelogApply.scd2(cl(raw: _*))
      .orderBy("tbl", "pk", "valid_from_pos").collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    vs.foreach { case (key, iv) =>
      iv.sliding(2).foreach {
        case Seq((_, Some(to)), (from2, _)) =>
          assert(to <= from2) // never overlapping
          // a gap means a delete closed the chain at `to` and a later
          // event re-opened the key — otherwise versions chain exactly
          if (to != from2) assert(deletes.contains((key, to)))
        case _ => ()
      }
      // every interval but the last is closed
      assert(iv.dropRight(1).forall(_._2.isDefined))
    }
  }

  test("bloom contamination: superset of exact scan (no false negatives)") {
    import spark.implicits._
    // 97·k ids are the benchmark; planted overlaps share long spans
    val span = Seq.tabulate(30)(i => s"w${i % 11} t$i").mkString(" ")
    val docs = (
      Seq((0L, span + " bench only tail"), (97L, "other bench doc " + span)) ++
      (1L to 20L).map(i => (i, s"noise$i " * 10 + (if (i <= 5) span else s"disjoint text $i about nothing shared")))
    ).toDF("doc_id", "text")
    val bloom = Dedup.bloomContamination(docs, 97, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Dedup.benchmarkContamination(docs, 97, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every exactly-contaminated doc must appear among bloom candidates,
    // and the bloom count can only over-count (false positives), never under
    exact.filter(_._2 >= 3).keys.foreach { id =>
      assert(bloom.contains(id), s"doc $id lost by the bloom pre-filter")
      assert(bloom(id)._1 >= bloom(id)._2)
    }
    // docs 1..5 carry the planted span → contaminated; 6..20 must not be
    (1L to 5L).foreach(id => assert(bloom.get(id).exists(_._2 >= 3)))
    assert(bloom.get(10L).forall(_._2 < 3))
  }
}
