package graft

import graft.ops.{Multimodal, TextAnalysis}
import org.apache.spark.sql.DataFrame

class TextAndMultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame = rows.toDF("doc_id", "text")

  test("source-normalized quality: ranks span [0,1e6] per source, flips where gates disagree") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextAnalysis.sourceNormalizedQuality(fixture, 0.65).collect()
    val bySrc = got.groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      val pcts = rows.map(_.getLong(3)).sorted
      assert(pcts.head == 0L && pcts.last == 1000000L, s"$src rank span: ${pcts.toSeq}")
      // pass_source is the top half by within-source rank: ranks with
      // (rk-1)*1e6 DIV (n-1) >= 500000
      val n = rows.length
      val expectPass = (0 until n).count(r => r.toLong * 1000000L / math.max(n - 1, 1) >= 500000L)
      assert(rows.count(_.getBoolean(5)) == expectPass, s"$src pass_source count")
    }
    got.foreach { r =>
      assert(r.getBoolean(6) == (r.getBoolean(4) != r.getBoolean(5)),
        s"flipped must be the gate disagreement: $r")
    }
    // the audit is non-vacuous on the fixture only if SOME source is
    // skewed against the global gate; tolerate zero flips but require
    // the quality column to vary (guards a degenerate fixture silently
    // trivializing the ranks)
    assert(got.map(_.getDouble(2)).distinct.length > 1)
  }

  test("context packing: per-query prefix property, exact running sums, budget boundary") {
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = graft.ops.Retrieval.contextPacking(fixture, 10, 256L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (q, rs) =>
      val byRank = rs.sortBy(_._2)
      // running sum is exactly the prefix sum of per-doc token costs
      byRank.foldLeft(0L) { case (acc, (_, _, dt, cum, packed)) =>
        assert(cum == acc + dt, s"$q: cum must be the prefix sum")
        assert(packed == (cum <= 256L), s"$q: packed is the budget boundary")
        cum
      }
      // packing is a PREFIX: once a rank overflows, no later rank packs
      val flags = byRank.map(_._5)
      assert(!flags.dropWhile(identity).contains(true), s"$q: non-prefix packing")
    }
    // non-vacuous on the fixture: the budget both admits and truncates
    assert(rows.exists(_._5) && rows.exists(!_._5))
  }

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

  test("audio codec: WAV round-trip is sample-exact and header-faithful") {
    import Multimodal._
    val ids = Seq(0L, 1L, 5L, 256L)
    val feats = audioFeatures(audioPayloads(
      ids.toDF("doc_id"))).collect().map(f => f.doc_id -> f).toMap
    for (id <- ids) {
      val f = feats(id)
      // header fields survive the container round-trip
      assert(f.sample_rate == (8000 + (id % 3) * 4000).toInt)
      assert(f.n_samples == 256 + id % 257)
      // recompute features straight from the formula — any endianness /
      // sign-extension / offset defect in the codec path shifts these
      val smp = (0 until f.n_samples.toInt).map(i => ((i * 37 + id * 101) % 4096 - 2048).toInt)
      assert(f.amp_sum == smp.map(_.toLong).sum)
      assert(f.peak == smp.map(s => math.abs(s).toLong).max)
      assert(f.zero_cross == smp.sliding(2).count(p => (p(0) < 0) != (p(1) < 0)))
      assert(f.zero_cross > 0, "sawtooth must actually cross zero")
    }
  }

  test("video demux decodes only the sampled frames") {
    import Multimodal._
    val p = videoPayloads(Seq(1L).toDF("doc_id")).collect()(0)
    // locate frame 1's blob through the container header and corrupt it
    val bb = java.nio.ByteBuffer.wrap(p.payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(4) // magic
    val nf = bb.getInt // id=1 → 4 frames
    val offs = Array.fill(nf)(bb.getInt)
    val blobStart = 8 + 4 * nf
    val corrupted = p.payload.clone()
    java.util.Arrays.fill(corrupted, blobStart + offs(1), blobStart + offs(2), 0xAB.toByte)
    val ds = Seq(VideoPayload(1L, corrupted)).toDS()
    // step=2 never touches frame 1 → the corruption is invisible
    val frames = sampleVideoFrames(ds, 2, 4).collect()
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    // step=1 samples it → the decode failure surfaces
    assertThrows[Exception](sampleVideoFrames(ds, 1, 4).collect())
  }

  test("bm25: rarer-term match on shorter doc outranks; ranks contiguous per query") {
    val rows = TextAnalysis.bm25TopK(docs(
      1L -> "spark join spark",
      2L -> "spark query",
      3L -> "filter scan scan"), 5).collect()
    val byQ = rows.groupBy(_.getString(0))
    // only the workload queries whose terms occur in the corpus emit rows
    assert(byQ.keySet == Set("spark query join", "fast scan filter"))
    val sq = byQ("spark query join").sortBy(_.getLong(3))
      .map(r => (r.getLong(1), r.getAs[Double]("bm25"), r.getLong(3)))
    // d2 matches 'spark' plus the rarest term 'query' on a shorter doc →
    // outranks d1's double-'spark' + 'join'; d3 matches nothing
    assert(sq.map(_._1).toSeq == Seq(2L, 1L))
    assert(sq.map(_._3).toSeq == Seq(1L, 2L))
    assert(sq(0)._2 > sq(1)._2)
    val fs = byQ("fast scan filter")
    assert(fs.map(_.getLong(1)).toSeq == Seq(3L) && fs.head.getLong(3) == 1L)
  }

  test("quality: longer stopword-rich text scores higher than symbol soup") {
    val got = TextAnalysis.qualityScore(docs(
      1L -> ("the cat is on the mat and the dog is in the house " * 4),
      2L -> "@@@ ### !!! %%% ^^^")).collect().map(r => r.getLong(0) -> r.getAs[Double]("quality")).toMap
    assert(got(1L) > got(2L))
  }

  test("bigram LM: interpolated probabilities match hand computation") {
    // corpus "a b a b": uni a:2 b:2 (N=4); bigrams "a b":2 "b a":1;
    // C(a·)=2, C(b·)=1 → p(b|a)=0.75·(2/2)+0.25·(2/4)=0.875
    //                    p(a|b)=0.75·(1/1)+0.25·(2/4)=0.875
    val got = TextAnalysis.bigramLogprob(docs(1L -> "a b a b"), 0.75).collect()(0)
    assert(got.getAs[Long]("n_bigrams") == 3L)
    assert(math.abs(got.getAs[Double]("mean_logprob") - math.log(0.875)) < 1e-5)
    // a fluent doc (seen bigrams) outscores one with unseen transitions
    val two = TextAnalysis.bigramLogprob(docs(
      1L -> "x y x y x y x y", 2L -> "y y x x y y x x"), 0.75)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("mean_logprob")).toMap
    assert(two(1L) > two(2L))
  }

  test("vocab coverage: monotone in size, saturates at full vocab") {
    val got = TextAnalysis.vocabCoverage(docs(
      1L -> "a a a a b b c", 2L -> "a b c d"), Seq(1, 2, 8))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(4))).toMap
    // counts: a:5 b:3 c:2 d:1 (total 11)
    assert(got(1) == ((1L, 5L, math.rint(5.0 / 11 * 1e6) / 1e6)))
    assert(got(2) == ((2L, 8L, math.rint(8.0 / 11 * 1e6) / 1e6)))
    assert(got(8) == ((4L, 11L, 1.0))) // only 4 distinct terms exist
  }

  test("multimodal: payloads are real PNGs; ImageIO round-trip is lossless") {
    val d = docs(0L -> "a", 5L -> "b", 12L -> "c")
    val payloads = Multimodal.imagePayloads(d).collect()
    // PNG magic bytes — the payload is a genuine encoded image
    payloads.foreach { p =>
      assert(p.payload.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47),
        s"doc ${p.doc_id} payload is not PNG")
    }
    val dec = new Multimodal.ImageIoDecoder
    payloads.foreach { p =>
      val img = dec.decode(p)
      val (w, h) = ((8 + p.doc_id % 9).toInt, (8 + (p.doc_id * 7) % 9).toInt)
      assert(img.width == w && img.height == h)
      // every decoded sample equals the synthesis formula (losslessness)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.px(y * w + x) == ((x * 31 + y * 17 + p.doc_id * 13) % 256).toInt,
          s"pixel ($x,$y) of doc ${p.doc_id} corrupted by the codec round-trip")
    }
  }

  test("multimodal features: position-weighted sums over decoded pixels") {
    val got = Multimodal.featurize(docs(3L -> "x")).collect()(0)
    val (w, h) = ((8 + 3 % 9), (8 + (3 * 7) % 9))
    val px = for (y <- 0 until h; x <- 0 until w) yield (x * 31 + y * 17 + 3 * 13) % 256
    assert(got.getAs[Int]("width") == w && got.getAs[Int]("height") == h)
    assert(got.getAs[Long]("n_px") == w.toLong * h)
    assert(got.getAs[Long]("px_sum") == px.map(_.toLong).sum)
    assert(got.getAs[Long]("px_weighted") ==
      px.zipWithIndex.map { case (v, i) => v.toLong * (i + 1) }.sum)
  }

  test("sharpness: Laplacian census matches the formula; flat images score zero") {
    val got = Multimodal.sharpness(docs(3L -> "x")).collect()(0)
    val (w, h) = ((8 + 3 % 9), (8 + (3 * 7) % 9))
    def p(x: Int, y: Int): Long = (x * 31 + y * 17 + 3 * 13) % 256
    val ls = for (y <- 1 until h - 1; x <- 1 until w - 1)
      yield 4 * p(x, y) - p(x - 1, y) - p(x + 1, y) - p(x, y - 1) - p(x, y + 1)
    assert(got.getAs[Long]("n_interior") == (w - 2).toLong * (h - 2))
    assert(got.getAs[Long]("lap_sum") == ls.sum)
    assert(got.getAs[Long]("lap_sq_sum") == ls.map(l => l * l).sum)
    // a constant raster has zero Laplacian response everywhere
    val flat = new Multimodal.Decoder {
      def decode(q: Multimodal.MediaPayload) =
        Multimodal.DecodedImage(8, 8, Array.fill(64)(200))
    }
    val z = Multimodal.laplacianStats(
      Multimodal.imagePayloads(docs(1L -> "x")), () => flat).collect()(0)
    assert(z.lap_sum == 0L && z.lap_sq_sum == 0L && z.n_interior == 36L)
  }

  test("color histogram: buckets match the formula; flat image is single-tone") {
    val got = Multimodal.colorHistogram(docs(3L -> "x")).collect()(0)
    val (w, h) = ((8 + 3 % 9), (8 + (3 * 7) % 9))
    val px = for (y <- 0 until h; x <- 0 until w) yield (x * 31 + y * 17 + 3 * 13) % 256
    val c = (0 to 7).map(b => px.count(_ / 32 == b).toLong)
    (0 to 7).foreach(b => assert(got.getAs[Long](s"h$b") == c(b), s"bucket $b: $got"))
    val bestCount = c.max
    assert(got.getAs[Long]("mode_bucket") == c.indexOf(bestCount).toLong,
      "modal bucket ties to the smallest index")
    val n = w.toLong * h
    assert(got.getAs[Long]("simpson_ppm") == 1000000L * c.map(x => x * x).sum / (n * n))
    // constant raster: all mass in bucket 200/32 = 6, simpson = 1e6
    val flat = new Multimodal.Decoder {
      def decode(q: Multimodal.MediaPayload) =
        Multimodal.DecodedImage(8, 8, Array.fill(64)(200))
    }
    val z = Multimodal.colorHistogramStats(
      Multimodal.imagePayloads(docs(1L -> "x")), () => flat).collect()(0)
    assert(z.h6 == 64L && z.mode_bucket == 6L && z.simpson_ppm == 1000000L)
  }

  test("query expansion: feedback terms join the query and can promote a doc") {
    // corpus engineered so 'spark query join' retrieves d1/d2 first;
    // their shared strong term 'shuffle' (absent from the query) is the
    // top expansion candidate and must appear in expanded_terms
    val rows = graft.ops.Retrieval.queryExpansion(docs(
      1L -> "spark join shuffle shuffle",
      2L -> "spark query shuffle shuffle",
      3L -> "shuffle shuffle shuffle stage",
      4L -> "filter scan"), fdbk = 2, expand = 1, k = 4).collect()
    val sq = rows.filter(_.getString(0) == "spark query join")
    assert(sq.nonEmpty)
    assert(sq.forall(_.getString(4) == "shuffle"),
      s"the feedback docs' dominant non-query term expands the query: ${sq.toSeq}")
    // d3 matches ONLY the expansion term, so it can now be retrieved
    assert(sq.exists(_.getLong(1) == 3L),
      s"expansion must recall the doc matching no original term: ${sq.toSeq}")
  }

  test("multimodal resize: stride downsample bounds the longer side") {
    val got = Multimodal.resize(docs(8L -> "x"), 8).collect()(0) // 16x... image
    val (w, h) = ((8 + 8 % 9), (8 + (8 * 7) % 9)) // 16, 14
    val step = (math.max(w, h) + 7) / 8
    assert(got.getAs[Int]("w_in") == w && got.getAs[Int]("h_in") == h)
    assert(got.getAs[Int]("w_out") == (w - 1) / step + 1)
    assert(got.getAs[Int]("h_out") == (h - 1) / step + 1)
    assert(got.getAs[Int]("w_out") <= 8 && got.getAs[Int]("h_out") <= 8)
    // sampled sum matches the formula at strided coordinates
    val expSum = (for (y <- 0 until (h - 1) / step + 1; x <- 0 until (w - 1) / step + 1)
      yield ((x * step) * 31 + (y * step) * 17 + 8 * 13) % 256).map(_.toLong).sum
    assert(got.getAs[Long]("px_sum_out") == expSum)
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

  test("phash: planted noisy twins pair up; unrelated images stay apart") {
    import spark.implicits._
    val ids = (1L to 12L).toDF("doc_id")
    val pairs = Multimodal.phashPairs(ids, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val twins = pairs.filter { case (a, b, _) => b - a == 1000000L }
    // the clamped +5 noise moves few grid samples: most twins survive the
    // hamming <= 3 verify (deterministic corpus, deterministic outcome)
    assert(twins.length >= 9, s"expected >= 9/12 twins, got: ${twins.toSeq}")
    assert(twins.forall(_._3 <= 3))
    // different source images are decorrelated by the multiplicative
    // pixel formula — no cross pairs at this threshold
    val cross = pairs.filterNot { case (a, b, _) => b - a == 1000000L }
    assert(cross.isEmpty, s"unrelated images paired: ${cross.toSeq}")
    ops.Caches.releaseCaches()
  }

  test("source TVD: hand value exact; identical sources read zero; disjoint read 1e6") {
    import spark.implicits._
    val d = Seq(
      (1L, "x x y", "a"), (2L, "x y y", "b"),
      (3L, "x x y", "c"),                      // c == a's distribution
      (4L, "z z", "d")                         // disjoint support
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.TextAnalysis.sourceTvd(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("tvd_ppm")).toMap
    // TVD(a,b) = 1/2(|2/3-1/3| + |1/3-2/3|) = 1/3 → 333333 ppm truncated
    assert(got(("a", "b")) == 333333L, got)
    assert(got(("a", "c")) == 0L, s"identical distributions: $got")
    assert(got(("a", "d")) == 1000000L, s"disjoint support is the max: $got")
    graft.ops.Caches.releaseCaches()
  }

  test("letterbox: measured borders equal the synthesized frame; content census exact") {
    // id 4: w=16, h=12+20%7=16? (4*5)%7=6 → h=18... compute in-test from
    // the same arithmetic instead of hand constants
    val id = 4L
    val got = Multimodal.letterboxDetect(docs(id -> "x")).collect()(0)
    val (w, h) = ((12 + id % 7).toInt, (12 + (id * 5) % 7).toInt)
    val (bt, bb, bl, br) =
      ((id % 3).toInt, ((id * 7) % 3).toInt, ((id * 3) % 3).toInt, ((id * 11) % 3).toInt)
    assert(got.getAs[Int]("width") == w && got.getAs[Int]("height") == h)
    assert(got.getAs[Long]("top_border") == bt && got.getAs[Long]("bottom_border") == bb)
    assert(got.getAs[Long]("left_border") == bl && got.getAs[Long]("right_border") == br)
    val inner = for (y <- bt until h - bb; x <- bl until w - br)
      yield 16 + ((x * 31 + y * 17 + id * 13) % 240)
    assert(got.getAs[Long]("n_content") == inner.size.toLong)
    assert(got.getAs[Long]("content_sum") == inner.map(_.toLong).sum)
    assert(got.getAs[Long]("border_ppm") ==
      1000000L * (w.toLong * h - inner.size) / (w.toLong * h))
  }

  test("letterbox: a dark pixel INSIDE content does not extend a border") {
    // 4x4 raster: row 0 dark (border), row 1 has one dark pixel among
    // bright ones — the scan must stop at the first non-dark row/column
    val px = Array(
      0, 0, 0, 0,
      200, 0, 200, 200,
      200, 200, 200, 200,
      200, 200, 200, 200)
    val dec = new Multimodal.Decoder {
      def decode(q: Multimodal.MediaPayload) = Multimodal.DecodedImage(4, 4, px)
    }
    val got = Multimodal.letterboxStats(
      Multimodal.letterboxPayloads(docs(1L -> "x")), () => dec).collect()(0)
    assert(got.top_border == 1L && got.bottom_border == 0L)
    assert(got.left_border == 0L && got.right_border == 0L)
    assert(got.n_content == 11L && got.content_sum == 2200L)
  }

  test("burstiness: a clumped token reads far above 1e6, a constant one reads 0") {
    // 'a' appears 4× in one doc of four (clumped); 'b' once per doc
    val d = docs(0L -> "a a a a b", 1L -> "b", 2L -> "b", 3L -> "b")
    val got = TextAnalysis.burstiness(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // 'a': n=4, sc=4, sc2=16 → (4·16 − 16)·1e6 / (4·4) = 3e6
    assert(got("a") == ((1L, 4L, 3000000L, 1000L)), got)
    // 'b': sc=4, sc2=4 → Fano 0 (deterministic is sub-Poisson)
    assert(got("b") == ((4L, 4L, 0L, 1000L)), got)
  }

  test("vocab growth: first-occurrence ranks drive the checkpoint counts exactly") {
    val d = Seq((0L, "x y z", "s"), (1L, "x y z w", "s"), (2L, "x y z", "s"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.vocabGrowth(d, Seq(1, 2, 3)).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // doc0: {x y z}; doc1 adds {y z w}; doc2 adds nothing
    assert(got(1L) == ((1L, 1L, 1L, 1000000L)), got)
    assert(got(2L) == ((2L, 2L, 3L, 666666L)), got)
    assert(got(3L) == ((3L, 2L, 4L, 500000L)), got)
  }
}
