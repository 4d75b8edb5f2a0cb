package graft

import graft.ops.{Multimodal, TextAnalysis}
import org.apache.spark.sql.DataFrame

class TextAndMultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  test("language id picks the language with most marker hits; und when none") {
    val got = TextAnalysis.languageId(docs(
      1L -> "the cat is in the house and that is fine",
      2L -> "el perro la casa de que los gatos una maravilla por fin",
      3L -> "zzz qqq xxx")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("token counts: ws vs bpe-ish segmentation") {
    val r = TextAnalysis.tokenCounts(docs(1L -> "Hello, world! 42 spark")).collect()(0)
    assert(r.getAs[Long]("ws_tokens") == 4L)
    // hello , world ! 42 spark → 6 bpe-ish tokens
    assert(r.getAs[Long]("bpe_tokens") == 6L)
  }

  test("fingerprint: whitespace-insensitive, case-insensitive, order-sensitive") {
    val got = TextAnalysis.fingerprint(docs(
      1L -> "alpha beta gamma", 2L -> "  ALPHA   beta\tgamma ", 3L -> "gamma beta alpha"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == got(2L))
    assert(got(1L) != got(3L))
  }

  test("quality: longer stopword-rich text scores higher than symbol soup") {
    val got = TextAnalysis.qualityScore(docs(
      1L -> ("the cat is on the mat and the dog is in the house " * 4),
      2L -> "@@@ ### !!! %%% ^^^")).collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(got(1L) > got(2L))
  }

  test("multimodal stub decode is deterministic and byte-accurate") {
    val d = docs(1L -> "hello world", 2L -> "hello world", 3L -> "different payload")
    val got = Multimodal.featurize(d).collect()
    assert(got(0).getAs[Long]("n_bytes") == 11L)
    // identical payloads decode identically (pure function of bytes)
    assert(got(0).getAs[Long]("feature64") == got(1).getAs[Long]("feature64"))
    assert(got(0).getAs[Long]("feature64") != got(2).getAs[Long]("feature64"))
    val w = got(0).getAs[Int]("width"); val h = got(0).getAs[Int]("height")
    assert(w >= 64 && w < 1088 && h >= 64 && h < 1088)
  }

  test("frame sampling strides the payload and caps frames") {
    val r = Multimodal.sampleFrames(
      Multimodal.payloads(docs(1L -> ("ab" * 100))), 32, 8).collect()(0)
    // 200 bytes / 32 stride = 7 frames — under the cap
    assert(r.getAs[Long]("n_frames") == 7L)
    val capped = Multimodal.sampleFrames(
      Multimodal.payloads(docs(1L -> ("x" * 1000))), 32, 8).collect()(0)
    assert(capped.getAs[Long]("n_frames") == 8L)
  }
}
