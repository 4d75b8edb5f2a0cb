package graft

import graft.ops.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

/** Training-data curation ops: repetition gate, contamination scan,
  * stratified rate sampling.
  */
class CurationOpsSpec extends SparkSpec {

  import spark.implicits._

  test("repetition: duplicate-free text scores 0; a looped phrase is caught") {
    val docs = Seq(
      (1L, "one two three four five six"),            // 4 shingles, all distinct
      (2L, "ab cd ef ab cd ef ab cd ef"),             // heavy 3-cycle
      (3L, "xy zz")                                   // < 3 tokens → no shingles
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got(0) == ((1L, 4L, 4L, 1L, 0.0)))
    // doc 2: 7 shingles, 3 distinct ("ab cd ef" x3, "cd ef ab" x2, "ef ab cd" x2)
    assert(got(1) == ((2L, 7L, 3L, 3L, 0.571429)))
    assert(got(2) == ((3L, 0L, 0L, 0L, 0.0)))
  }

  test("contamination: doc sharing a benchmark phrase is flagged, clean doc is absent") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),   // benchmark (id % 97 == 0)
      (1L, "alpha beta gamma delta other words"),    // 2 shared shingles
      (2L, "totally different content here now"),    // clean
      (3L, "alpha beta gamma delta epsilon more")    // 3 shared → contaminated
    ).toDF("doc_id", "text")
    val got = Dedup.benchmarkContamination(docs, 97, 3)
      .select("doc_id", "n_shared_shingles", "contaminated")
      .as[(Long, Long, Boolean)].collect().toMap2
    assert(got == Map(1L -> (2L, false), 3L -> (3L, true)))
  }

  test("stratified rates: deterministic, repartition-invariant, nested") {
    val df = (0L until 2000L).map(i => (s"c${i % 3}", i)).toDF("cls", "id")
    val s5 = Sampling.stratified(df, "cls", "id", Map("c0" -> 5, "c1" -> 5, "c2" -> 5))
      .select("id").as[Long].collect().toSet
    val s10 = Sampling.stratified(df, "cls", "id", Map("c0" -> 10, "c1" -> 10, "c2" -> 10))
      .select("id").as[Long].collect().toSet
    assert(s10.subsetOf(s5), "1-in-10 must be nested inside 1-in-5")
    val reparted = Sampling.stratified(df.repartition(17), "cls", "id",
      Map("c0" -> 5, "c1" -> 5, "c2" -> 5)).select("id").as[Long].collect().toSet
    assert(reparted == s5, "sample must not depend on partitioning")
    val summary = Sampling.stratifiedSummary(df, "cls", "id", Map("c0" -> 1, "c1" -> 1000000))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(summary.find(_._1 == "c0").get._3 == summary.find(_._1 == "c0").get._2,
      "rate 1 keeps the stratum whole")
    assert(summary.find(_._1 == "c2").get._3 == summary.find(_._1 == "c2").get._2,
      "default rate 1 keeps unlisted strata whole")
  }

  private implicit class Tuples3ToMap(rows: Array[(Long, Long, Boolean)]) {
    def toMap2: Map[Long, (Long, Boolean)] = rows.map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("CDC chunking: a head insertion leaves every chunk past the edit shared") {
    import graft.ops.Curation
    // content-defined boundaries are decided by local 3-gram hashes, so
    // doc 2 = doc 1 with ONE token prepended re-fingerprints only the
    // chunk containing the edit; every later chunk is byte-identical.
    // (Fixed-stride chunks would ALL shift — that contrast is the point.)
    val base = (1 to 240).map(i => s"w${(i * 7) % 41}").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, "zz " + base),
      (3L, (1 to 240).map(i => s"q${(i * 5) % 43}").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val got = Curation.cdcChunkDedup(docs, 16L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (n1, s1) = got(1L); val (n2, s2) = got(2L)
    assert(n1 > 3, s"enough chunks to make the claim meaningful: $got")
    assert(s1 >= n1 - 1 && s2 >= n2 - 1,
      s"all chunks past the edited head must keep their fingerprints: $got")
    assert(got(3L)._2 == 0L, s"unrelated doc shares nothing: $got")
    graft.ops.Caches.releaseCaches()
  }
}
