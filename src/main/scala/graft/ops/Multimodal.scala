package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns next to typed metadata
  * — the lakehouse pattern for multimodal training data. The codec is
  * REAL: payloads are PNG bytes, encoded and decoded with the JDK's
  * ImageIO (zero extra dependencies), held one-instance-per-partition
  * through `mapPartitions` — exactly how a libjpeg/ffmpeg binding would
  * be held. The harness ships no binary fixtures, so [[imagePayloads]]
  * manufactures deterministic grayscale images from `doc_id` (pixel
  * value = fixed formula of (x, y, doc_id)) and encodes them to real
  * PNGs; because PNG is lossless, the DuckDB oracle reproduces the
  * decoded features straight from the pixel formula — parity proves the
  * whole encode → decode → featurize path, not a fake.
  *
  * Audio takes the same real-codec path through the JDK's
  * `javax.sound.sampled` WAV support ([[audioPayloads]] /
  * [[JavaSoundDecoder]]): PCM-in-WAV is lossless, so the oracle
  * recomputes clip features from the integer sample formula.
  *
  * Video has two rungs: [[sampleFrames]] keeps the pure-projection
  * byte-stride form, and [[sampleVideoFrames]] demuxes a real container
  * (offset-table header over PNG frame blobs) and ImageIO-decodes ONLY
  * the sampled frames — the bounded-IO property a 100 TB video column
  * needs from its demuxer.
  */
object Multimodal {

  /** One media record entering the decode stage. */
  final case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** A decoded raster: row-major 8-bit grayscale samples. */
  final case class DecodedImage(width: Int, height: Int, px: Array[Int])

  /** Decoded per-image features. `px_sum` is the plain sample sum;
    * `px_weighted` weights each sample by its 1-based row-major index —
    * position-sensitive, so a transposed/flipped decode fails parity.
    */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_px: Long,
      px_sum: Long,
      px_weighted: Long)

  /** Stride-resized image summary (nearest-neighbor downsample). */
  final case class ResizedImage(
      doc_id: Long,
      w_in: Int,
      h_in: Int,
      w_out: Int,
      h_out: Int,
      px_sum_out: Long,
      px_md5: String)

  /** Decoder SPI — constructed once per partition, never per row (real
    * codecs are expensive to initialize; ImageIO itself benefits from
    * disabling its temp-file cache once per instance).
    */
  trait Decoder extends Serializable {
    def decode(p: MediaPayload): DecodedImage
  }

  /** The real JDK codec: ImageIO PNG/BMP decode to an 8-bit gray raster. */
  final class ImageIoDecoder extends Decoder {
    ImageIO.setUseCache(false) // in-memory streams; no temp-file cache
    def decode(p: MediaPayload): DecodedImage = {
      val img = ImageIO.read(new ByteArrayInputStream(p.payload))
      require(img != null, s"payload of doc ${p.doc_id} is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { px(y * w + x) = raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      DecodedImage(w, h, px)
    }
  }

  /** Deterministic synthetic image per doc: width/height and every pixel
    * are fixed functions of `doc_id`, encoded as a REAL grayscale PNG.
    * This is the fixture path standing in for a binary media column; the
    * formula is what lets the SQL oracle verify the lossless round-trip.
    */
  def imagePayloads(docs: DataFrame): Dataset[MediaPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + (id * 7) % 9).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            raster.setSample(x, y, 0, ((x * 31 + y * 17 + id * 13) % 256).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        MediaPayload(id, bos.toByteArray)
      }
    }
  }

  /** The decode stage: one decoder per partition, streamed (no
    * materialize-the-partition), typed output schema — the typed-Dataset
    * equivalent of a Pandas-UDF/mapInPandas decode.
    */
  def extractFeatures(payloads: Dataset[MediaPayload],
                      newDecoder: () => Decoder = () => new ImageIoDecoder): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val dec = newDecoder() // per-partition init (real codecs are costly)
      it.map { p =>
        val d = dec.decode(p)
        var sum = 0L
        var weighted = 0L
        var i = 0
        while (i < d.px.length) {
          sum += d.px(i)
          weighted += d.px(i).toLong * (i + 1)
          i += 1
        }
        MediaFeatures(p.doc_id, d.width, d.height, d.px.length.toLong, sum, weighted)
      }
    }
  }

  /** Full featurize pipeline: synth image → PNG encode → ImageIO decode →
    * pixel features, ordered for the oracle.
    */
  def featurize(docs: DataFrame): DataFrame =
    extractFeatures(imagePayloads(docs)).toDF().orderBy("doc_id")

  /** The oracle reproduces the decoded features from the pixel formula —
    * valid because the PNG round-trip is bit-lossless; any encode/decode
    * defect (stride, channel order, gamma) breaks the hash.
    */
  val featurizeSql: String =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS width, 8 + (doc_id * 7) % 9 AS height
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, width, height,
      |    [((i % width) * 31 + (i // width) * 17 + doc_id * 13) % 256
      |     FOR i IN range(0, width * height)] AS pxs
      |  FROM g)
      |SELECT doc_id,
      |  CAST(width AS INTEGER) AS width, CAST(height AS INTEGER) AS height,
      |  CAST(width * height AS BIGINT) AS n_px,
      |  CAST(list_aggregate(pxs, 'sum') AS BIGINT) AS px_sum,
      |  CAST(list_aggregate([pxs[i + 1] * (i + 1) FOR i IN range(0, width * height)], 'sum') AS BIGINT) AS px_weighted
      |FROM px ORDER BY doc_id""".stripMargin

  /** Per-image 4-neighbor Laplacian census over INTERIOR pixels — all
    * integer-exact (see [[laplacianStats]]); `sharpness` derives from
    * the two sums in one fixed double expression at the output edge.
    */
  final case class LaplacianStats(
      doc_id: Long,
      width: Int,
      height: Int,
      n_interior: Long,
      lap_sum: Long,
      lap_sq_sum: Long)

  /** Variance-of-Laplacian sharpness — the standard blur filter an
    * image-curation pipeline runs before training (a defocused image's
    * Laplacian response collapses toward zero). Per image: the 4-neighbor
    * Laplacian L = 4·p − p_left − p_right − p_up − p_down over interior
    * pixels, accumulated as exact integer Σ L and Σ L² (|L| ≤ 6·255, so
    * the sums stay far below 2^53); variance = (n·ΣL² − (ΣL)²)/n² is one
    * fixed double expression both engines evaluate identically on those
    * exact integers. Decode goes through the REAL ImageIO codec; the
    * oracle recomputes the same census from the pixel formula (valid
    * because the PNG round-trip is bit-lossless), so a stride, channel
    * or boundary defect in the stencil breaks the match.
    */
  def laplacianStats(payloads: Dataset[MediaPayload],
                     newDecoder: () => Decoder = () => new ImageIoDecoder): Dataset[LaplacianStats] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val dec = newDecoder()
      it.map { p =>
        val d = dec.decode(p)
        val (w, h) = (d.width, d.height)
        var n = 0L; var s = 0L; var sq = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val l = 4L * d.px(y * w + x) - d.px(y * w + x - 1) - d.px(y * w + x + 1) -
              d.px((y - 1) * w + x) - d.px((y + 1) * w + x)
            n += 1; s += l; sq += l * l
            x += 1
          }
          y += 1
        }
        LaplacianStats(p.doc_id, w, h, n, s, sq)
      }
    }
  }

  /** Full sharpness pipeline: synth image → PNG encode → ImageIO decode →
    * Laplacian census → variance, ordered for the oracle. Fixture images
    * are ≥ 8×8, so the interior is never empty.
    */
  def sharpness(docs: DataFrame): DataFrame =
    laplacianStats(imagePayloads(docs)).toDF()
      .withColumn("sharpness",
        round((col("n_interior") * col("lap_sq_sum") - col("lap_sum") * col("lap_sum"))
          .cast("double") / (col("n_interior") * col("n_interior")).cast("double"), 6))
      .orderBy("doc_id")

  /** Oracle: the same census from the pixel formula. The synthetic pixel
    * is linear in (x, y) modulo 256, so the Laplacian is zero except
    * where the modulus wraps between stencil neighbors — a deterministic
    * nonzero pattern that exercises every term of the stencil.
    */
  val sharpnessSql: String =
    """WITH g AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 7) % 9 AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(1, w - 1)) AS x FROM g),
      |pix AS (SELECT doc_id, w, h, x, unnest(range(1, h - 1)) AS y FROM xs),
      |lap AS (
      |  SELECT doc_id, w, h,
      |    (4 * ((x * 31 + y * 17 + doc_id * 13) % 256)
      |     - (((x - 1) * 31 + y * 17 + doc_id * 13) % 256)
      |     - (((x + 1) * 31 + y * 17 + doc_id * 13) % 256)
      |     - ((x * 31 + (y - 1) * 17 + doc_id * 13) % 256)
      |     - ((x * 31 + (y + 1) * 17 + doc_id * 13) % 256)) AS l
      |  FROM pix)
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  count(*) AS n_interior,
      |  CAST(sum(l) AS BIGINT) AS lap_sum,
      |  CAST(sum(l * l) AS BIGINT) AS lap_sq_sum,
      |  round(CAST(count(*) * sum(l * l) - sum(l) * sum(l) AS DOUBLE)
      |        / CAST(count(*) * count(*) AS DOUBLE), 6) AS sharpness
      |FROM lap GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  final case class SobelStats(
      doc_id: Long,
      width: Int,
      height: Int,
      n_interior: Long,
      n_edges: Long,
      grad_l1_sum: Long)

  /** Sobel edge census — the text-vs-photo / synthetic-content signal a
    * visual curation gate reads (screenshots and rendered text have a
    * sharply higher edge fraction than natural photos). Per interior
    * pixel the 3×3 Sobel responses gx, gy accumulate as the exact L1
    * gradient mass Σ(|gx|+|gy|), and a pixel is an edge when
    * |gx|+|gy| ≥ `threshold` (|gx| ≤ 4·255, so everything is small
    * integer arithmetic). Decode goes through the REAL ImageIO codec;
    * the oracle recomputes the census from the pixel formula (the PNG
    * round-trip is bit-lossless), so any stride/boundary/kernel defect
    * breaks the match.
    */
  def sobelStats(payloads: Dataset[MediaPayload], threshold: Int,
                 newDecoder: () => Decoder = () => new ImageIoDecoder): Dataset[SobelStats] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val dec = newDecoder()
      it.map { p =>
        val d = dec.decode(p)
        val (w, h) = (d.width, d.height)
        def px(x: Int, y: Int): Long = d.px(y * w + x).toLong
        var n = 0L; var ne = 0L; var gsum = 0L
        var y = 1
        while (y < h - 1) {
          var x = 1
          while (x < w - 1) {
            val gx = (px(x + 1, y - 1) + 2L * px(x + 1, y) + px(x + 1, y + 1)) -
              (px(x - 1, y - 1) + 2L * px(x - 1, y) + px(x - 1, y + 1))
            val gy = (px(x - 1, y + 1) + 2L * px(x, y + 1) + px(x + 1, y + 1)) -
              (px(x - 1, y - 1) + 2L * px(x, y - 1) + px(x + 1, y - 1))
            val g = math.abs(gx) + math.abs(gy)
            n += 1; gsum += g
            if (g >= threshold) ne += 1
            x += 1
          }
          y += 1
        }
        SobelStats(p.doc_id, w, h, n, ne, gsum)
      }
    }
  }

  /** Full pipeline: synth image → PNG encode → REAL ImageIO decode →
    * Sobel census; edge fraction in exact ppm by truncating DIV. */
  def edgeDensity(docs: DataFrame, threshold: Int): DataFrame =
    sobelStats(imagePayloads(docs), threshold).toDF()
      .withColumn("edge_ppm",
        expr("CAST((1000000 * n_edges) DIV n_interior AS BIGINT)"))
      .orderBy("doc_id")

  def edgeDensitySql(threshold: Int): String =
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 7) % 9 AS h
       |  FROM documents),
       |xs AS (SELECT doc_id, w, h, unnest(range(1, w - 1)) AS x FROM g),
       |pix AS (SELECT doc_id, w, h, x, unnest(range(1, h - 1)) AS y FROM xs),
       |sob AS (
       |  SELECT doc_id, w, h,
       |    abs((((x + 1) * 31 + (y - 1) * 17 + doc_id * 13) % 256
       |         + 2 * (((x + 1) * 31 + y * 17 + doc_id * 13) % 256)
       |         + ((x + 1) * 31 + (y + 1) * 17 + doc_id * 13) % 256)
       |        - (((x - 1) * 31 + (y - 1) * 17 + doc_id * 13) % 256
       |           + 2 * (((x - 1) * 31 + y * 17 + doc_id * 13) % 256)
       |           + ((x - 1) * 31 + (y + 1) * 17 + doc_id * 13) % 256))
       |    + abs((((x - 1) * 31 + (y + 1) * 17 + doc_id * 13) % 256
       |           + 2 * ((x * 31 + (y + 1) * 17 + doc_id * 13) % 256)
       |           + ((x + 1) * 31 + (y + 1) * 17 + doc_id * 13) % 256)
       |          - (((x - 1) * 31 + (y - 1) * 17 + doc_id * 13) % 256
       |             + 2 * ((x * 31 + (y - 1) * 17 + doc_id * 13) % 256)
       |             + ((x + 1) * 31 + (y - 1) * 17 + doc_id * 13) % 256)) AS g
       |  FROM pix)
       |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |  count(*) AS n_interior,
       |  CAST(sum(CASE WHEN g >= $threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_edges,
       |  CAST(sum(g) AS BIGINT) AS grad_l1_sum,
       |  CAST((1000000 * sum(CASE WHEN g >= $threshold THEN 1 ELSE 0 END))
       |       // count(*) AS BIGINT) AS edge_ppm
       |FROM sob GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin

  /** Per-image 8-bucket intensity histogram (bucket = px DIV 32) with
    * the two decisions a visual-curation gate reads off it: the modal
    * bucket (largest count, smallest bucket on ties — a flat/banner
    * image concentrates in one bucket) and the Simpson collision mass
    * `simpson_ppm = 10⁶·Σc² DIV n²` (1e6/8 = uniform, → 1e6 =
    * single-tone) — the division-free uniformity score, no
    * data-dependent logarithm (entropy's ln differs across libm in the
    * last ulp; Σc² is exact integer on both engines).
    */
  final case class ColorHistogram(
      doc_id: Long, width: Int, height: Int,
      h0: Long, h1: Long, h2: Long, h3: Long,
      h4: Long, h5: Long, h6: Long, h7: Long,
      mode_bucket: Long, simpson_ppm: Long)

  def colorHistogramStats(payloads: Dataset[MediaPayload],
                          newDecoder: () => Decoder = () => new ImageIoDecoder): Dataset[ColorHistogram] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val dec = newDecoder()
      it.map { p =>
        val d = dec.decode(p)
        val c = new Array[Long](8)
        var i = 0
        while (i < d.px.length) { c(d.px(i) / 32) += 1; i += 1 }
        var mode = 0
        var ssq = 0L
        var b = 0
        while (b < 8) {
          if (c(b) > c(mode)) mode = b // strict >: ties keep the smaller bucket
          ssq += c(b) * c(b)
          b += 1
        }
        val n = d.px.length.toLong
        ColorHistogram(p.doc_id, d.width, d.height,
          c(0), c(1), c(2), c(3), c(4), c(5), c(6), c(7),
          mode.toLong, 1000000L * ssq / (n * n))
      }
    }
  }

  /** Full pipeline: synth image → PNG encode → REAL ImageIO decode →
    * histogram census, ordered for the oracle (which rebuilds the same
    * counts from the pixel formula — the bit-lossless-round-trip device
    * of [[featurize]]/[[sharpness]]).
    */
  def colorHistogram(docs: DataFrame): DataFrame =
    colorHistogramStats(imagePayloads(docs)).toDF().orderBy("doc_id")

  val colorHistogramSql: String = {
    val hcols = (0 to 7).map(b =>
      s"CAST(sum(CASE WHEN bucket = $b THEN c ELSE 0 END) AS BIGINT) AS h$b").mkString(",\n  ")
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 7) % 9 AS h
       |  FROM documents),
       |pix AS (SELECT doc_id, w, h, unnest(range(0, w * h)) AS i FROM g),
       |bk AS (
       |  SELECT doc_id, w, h,
       |         (((i % w) * 31 + (i // w) * 17 + doc_id * 13) % 256) // 32 AS bucket
       |  FROM pix),
       |cnt AS (SELECT doc_id, w, h, bucket, count(*) AS c FROM bk GROUP BY ALL)
       |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |  $hcols,
       |  CAST(arg_max(bucket, c * 10 - bucket) AS BIGINT) AS mode_bucket,
       |  CAST((1000000 * sum(c * c)) // (w * h * w * h) AS BIGINT) AS simpson_ppm
       |FROM cnt GROUP BY doc_id, w, h ORDER BY doc_id""".stripMargin
  }

  /** Synthetic images WITH a letterbox: formula pixels (always ≥ 16)
    * inside a known black border of 0–2 rows/columns per side derived
    * from the id — the frame geometry the oracle recomputes
    * arithmetically while the operator must MEASURE it from the decoded
    * raster.
    */
  def letterboxPayloads(docs: DataFrame): Dataset[MediaPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { id =>
        val w = (12 + id % 7).toInt
        val h = (12 + (id * 5) % 7).toInt
        val bt = (id % 3).toInt; val bb = ((id * 7) % 3).toInt
        val bl = ((id * 3) % 3).toInt; val br = ((id * 11) % 3).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val inside = x >= bl && x < w - br && y >= bt && y < h - bb
            val v = if (inside) (16 + ((x * 31 + y * 17 + id * 13) % 240)).toInt else 0
            raster.setSample(x, y, 0, v)
            x += 1
          }
          y += 1
        }
        val bos = new ByteArrayOutputStream()
        ImageIO.write(img, "png", bos)
        MediaPayload(id, bos.toByteArray)
      }
    }
  }

  final case class LetterboxStats(
      doc_id: Long, width: Int, height: Int,
      top_border: Long, bottom_border: Long,
      left_border: Long, right_border: Long,
      n_content: Long, content_sum: Long, border_ppm: Long)

  /** Letterbox/pillarbox detection — the crop-before-train pass a visual
    * curation pipeline runs so black bars don't become spurious features:
    * per side, the count of leading/trailing all-dark (≤ threshold 8)
    * rows/columns of the DECODED raster, plus the content census
    * (`n_content`, `content_sum` over bright pixels) and the integral
    * `border_ppm` wasted-area score. All outputs exact integers; the
    * oracle recomputes them from the synthesis formula (interior pixels
    * are ≥ 16, so measured borders equal the synthesized geometry — any
    * decode/stride/scan defect breaks the hash).
    */
  def letterboxStats(payloads: Dataset[MediaPayload],
                     newDecoder: () => Decoder = () => new ImageIoDecoder): Dataset[LetterboxStats] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    val thr = 8
    payloads.mapPartitions { it =>
      val dec = newDecoder()
      it.map { p =>
        val d = dec.decode(p)
        val w = d.width; val h = d.height
        def rowDark(y: Int): Boolean = {
          var x = 0
          while (x < w) { if (d.px(y * w + x) > thr) return false; x += 1 }
          true
        }
        def colDark(x: Int): Boolean = {
          var y = 0
          while (y < h) { if (d.px(y * w + x) > thr) return false; y += 1 }
          true
        }
        var top = 0
        while (top < h && rowDark(top)) top += 1
        var bottom = 0
        while (bottom < h - top && rowDark(h - 1 - bottom)) bottom += 1
        var left = 0
        while (left < w && colDark(left)) left += 1
        var right = 0
        while (right < w - left && colDark(w - 1 - right)) right += 1
        var nContent = 0L
        var contentSum = 0L
        var i = 0
        while (i < d.px.length) {
          if (d.px(i) > thr) { nContent += 1L; contentSum += d.px(i) }
          i += 1
        }
        val n = w.toLong * h
        LetterboxStats(p.doc_id, w, h, top.toLong, bottom.toLong,
          left.toLong, right.toLong, nContent, contentSum,
          1000000L * (n - nContent) / n)
      }
    }
  }

  /** Full pipeline: synth bordered image → PNG encode → REAL ImageIO
    * decode → border scan, ordered for the oracle.
    */
  def letterboxDetect(docs: DataFrame): DataFrame =
    letterboxStats(letterboxPayloads(docs)).toDF().orderBy("doc_id")

  val letterboxDetectSql: String =
    """WITH g AS (
      |  SELECT doc_id, 12 + doc_id % 7 AS w, 12 + (doc_id * 5) % 7 AS h,
      |         doc_id % 3 AS bt, (doc_id * 7) % 3 AS bb,
      |         (doc_id * 3) % 3 AS bl, (doc_id * 11) % 3 AS br
      |  FROM documents),
      |pix AS (SELECT *, unnest(range(0, w * h)) AS i FROM g),
      |v AS (
      |  SELECT doc_id, w, h, bt, bb, bl, br,
      |         CASE WHEN (i % w) >= bl AND (i % w) < w - br
      |                AND (i // w) >= bt AND (i // w) < h - bb
      |              THEN 16 + (((i % w) * 31 + (i // w) * 17 + doc_id * 13) % 240)
      |              ELSE 0 END AS px
      |  FROM pix)
      |SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |  CAST(bt AS BIGINT) AS top_border, CAST(bb AS BIGINT) AS bottom_border,
      |  CAST(bl AS BIGINT) AS left_border, CAST(br AS BIGINT) AS right_border,
      |  CAST(count(*) FILTER (WHERE px > 8) AS BIGINT) AS n_content,
      |  CAST(sum(px) AS BIGINT) AS content_sum,
      |  CAST((1000000 * (w * h - count(*) FILTER (WHERE px > 8))) // (w * h) AS BIGINT)
      |    AS border_ppm
      |FROM v GROUP BY doc_id, w, h, bt, bb, bl, br ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------------ audio

  /** One audio record entering the decode stage. */
  final case class AudioPayload(doc_id: Long, payload: Array[Byte])

  /** A decoded clip: header sample rate + signed 16-bit samples. */
  final case class DecodedAudio(sampleRate: Int, samples: Array[Int])

  /** Decoded per-clip features — all integer-exact so the oracle can
    * recompute them from the sample formula without float drift.
    */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      n_samples: Long,
      amp_sum: Long,
      abs_sum: Long,
      peak: Long,
      zero_cross: Long)

  trait AudioDecoder extends Serializable {
    def decode(p: AudioPayload): DecodedAudio
  }

  /** The real JDK audio codec: `javax.sound.sampled.AudioSystem` parses
    * the RIFF/WAVE container (chunk walk, fmt validation) — the audio
    * sibling of [[ImageIoDecoder]], zero extra dependencies.
    */
  final class JavaSoundDecoder extends AudioDecoder {
    def decode(p: AudioPayload): DecodedAudio = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(p.payload))
      try {
        val fmt = in.getFormat
        require(fmt.getChannels == 1 && fmt.getSampleSizeInBits == 16,
          s"doc ${p.doc_id}: expected 16-bit mono PCM, got $fmt")
        val bytes = in.readAllBytes()
        val bb = ByteBuffer.wrap(bytes)
          .order(if (fmt.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Int](bytes.length / 2)
        var i = 0
        while (i < out.length) { out(i) = bb.getShort(i * 2).toInt; i += 1 }
        DecodedAudio(fmt.getSampleRate.toInt, out)
      } finally in.close()
    }
  }

  /** Deterministic synthetic clip per doc: length, sample rate and every
    * sample are fixed integer functions of `doc_id` (a wrapping sawtooth
    * — it crosses zero, so `zero_cross` is a real signal), written
    * through the REAL WAV encoder. PCM-in-WAV is lossless, so the oracle
    * recomputes features from the formula; any container/endianness/
    * sign-extension defect in the codec path breaks the hash.
    */
  def audioPayloads(docs: DataFrame): Dataset[AudioPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val n = (256 + id % 257).toInt
        val sr = (8000 + (id % 3) * 4000).toFloat
        val pcm = new Array[Byte](n * 2)
        val bb = ByteBuffer.wrap(pcm).order(ByteOrder.LITTLE_ENDIAN)
        var i = 0
        while (i < n) {
          bb.putShort(i * 2, (((i * 37 + id * 101) % 4096) - 2048).toShort)
          i += 1
        }
        val format = new AudioFormat(sr, 16, 1, true, false)
        val ais = new AudioInputStream(new ByteArrayInputStream(pcm), format, n.toLong)
        val bos = new ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        AudioPayload(id, bos.toByteArray)
      }
    }
  }

  /** The audio decode stage: one codec per partition, streamed, typed
    * output — same contract as [[extractFeatures]] for images.
    */
  def audioFeatures(payloads: Dataset[AudioPayload],
                    newDecoder: () => AudioDecoder = () => new JavaSoundDecoder)
      : Dataset[AudioFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val dec = newDecoder()
      it.map { p =>
        val d = dec.decode(p)
        var sum = 0L
        var abs = 0L
        var peak = 0L
        var zc = 0L
        var i = 0
        while (i < d.samples.length) {
          val s = d.samples(i)
          sum += s
          abs += math.abs(s)
          peak = math.max(peak, math.abs(s).toLong)
          if (i > 0 && (d.samples(i - 1) < 0) != (s < 0)) zc += 1
          i += 1
        }
        AudioFeatures(p.doc_id, d.sampleRate, d.samples.length.toLong, sum, abs, peak, zc)
      }
    }
  }

  /** Full audio pipeline: synth PCM → WAV encode → AudioSystem decode →
    * sample features, ordered for the oracle.
    */
  def audioFeaturize(docs: DataFrame): DataFrame =
    audioFeatures(audioPayloads(docs)).toDF().orderBy("doc_id")

  val audioFeaturizeSql: String =
    """WITH g AS (
      |  SELECT doc_id, 256 + doc_id % 257 AS n, 8000 + (doc_id % 3) * 4000 AS sr
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, n, sr,
      |    [((i * 37 + doc_id * 101) % 4096) - 2048 FOR i IN range(0, n)] AS smp
      |  FROM g)
      |SELECT doc_id,
      |  CAST(sr AS INTEGER) AS sample_rate,
      |  CAST(n AS BIGINT) AS n_samples,
      |  CAST(list_aggregate(smp, 'sum') AS BIGINT) AS amp_sum,
      |  CAST(list_aggregate([abs(x) FOR x IN smp], 'sum') AS BIGINT) AS abs_sum,
      |  CAST(list_aggregate([abs(x) FOR x IN smp], 'max') AS BIGINT) AS peak,
      |  CAST(list_aggregate([CASE WHEN (smp[i] < 0) <> (smp[i + 1] < 0) THEN 1 ELSE 0 END
      |                       FOR i IN range(1, n)], 'sum') AS BIGINT) AS zero_cross
      |FROM s ORDER BY doc_id""".stripMargin

  /** Per-clip voice-activity summary — frame-level energy gating over the
    * decoded samples (frame = 64 samples, voiced iff Σ|s| > 65536, i.e.
    * mean |amplitude| above half-scale for the ±2048 sawtooth), plus the
    * run-length features a segmentation stage consumes: first voiced
    * frame (NULL when silent throughout) and the longest voiced run.
    */
  final case class AudioVad(
      doc_id: Long,
      n_frames: Long,
      n_voiced: Long,
      first_voiced: Option[Long],
      longest_run: Long)

  /** Frame size in samples and the voiced threshold on the frame's
    * Σ|sample| — shared literals with the oracle.
    */
  val VadFrame = 64
  val VadThreshold = 65536L

  /** VAD over the REAL codec path: synth WAV → AudioSystem decode →
    * per-frame integer energies → gaps-and-islands run features, all
    * integer-exact so the oracle recomputes them from the sample
    * formula. Only FULL frames count (the trailing partial frame is
    * dropped — mirrored by `n DIV 64` in the oracle).
    *
    * Scale shape: one `mapPartitions` decode pass (codec lifecycle, the
    * repo's only sanctioned mapPartitions use), per-clip state is a few
    * counters — no shuffle at all until the final orderBy for the dump.
    */
  def audioVad(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = audioPayloads(docs).mapPartitions { it =>
      val dec = new JavaSoundDecoder
      it.map { p =>
        val d = dec.decode(p)
        val nf = d.samples.length / VadFrame
        var voiced = 0L
        var first: Option[Long] = None
        var run = 0L
        var best = 0L
        var f = 0
        while (f < nf) {
          var s = 0L
          var i = f * VadFrame
          val end = i + VadFrame
          while (i < end) { s += math.abs(d.samples(i)); i += 1 }
          if (s > VadThreshold) {
            voiced += 1
            if (first.isEmpty) first = Some(f + 1L)
            run += 1
            if (run > best) best = run
          } else run = 0
          f += 1
        }
        AudioVad(p.doc_id, nf.toLong, voiced, first, best)
      }
    }
    feats.toDF()
      .withColumn("voiced_ratio",
        round(col("n_voiced").cast("double") / col("n_frames").cast("double"), 6))
      .orderBy("doc_id")
  }

  /** Near-full-scale threshold for [[audioClipping]]: |s| ≥ 2040 on the
    * synthetic ±2048 sawtooth stands in for |s| ≥ 32760 on real ±32768
    * int16 — the "within 8 counts of rail" clipping heuristic.
    */
  val ClipThreshold: Int = 2040

  /** Clipping census per clip — the audio-quality gate a speech corpus
    * runs before training (clipped segments corrupt spectral features):
    * peak amplitude, samples at/above the near-rail threshold, the
    * clipped fraction in ppm, and the LONGEST consecutive clipped run
    * (sustained rail contact is the true clipping signature; isolated
    * peaks are just loud). Decode through the REAL WAV codec per
    * partition (the [[audioVad]] contract); every metric is an integer,
    * so the oracle recomputes them from the synthesis formula with the
    * gaps-and-islands run device — any codec-path defect breaks the
    * hash.
    */
  def audioClipping(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = audioPayloads(docs).mapPartitions { it =>
      val dec = new JavaSoundDecoder
      it.map { p =>
        val d = dec.decode(p)
        var peak = 0L
        var nClip = 0L
        var run = 0L
        var best = 0L
        var i = 0
        while (i < d.samples.length) {
          val a = math.abs(d.samples(i).toLong)
          if (a > peak) peak = a
          if (a >= ClipThreshold) {
            nClip += 1; run += 1; if (run > best) best = run
          } else run = 0
          i += 1
        }
        (p.doc_id, d.samples.length.toLong, peak, nClip, best)
      }
    }
    feats.toDF("doc_id", "n_samples", "peak", "n_clipped", "longest_run")
      .withColumn("clipped_ppm",
        expr("CAST((1000000 * n_clipped) DIV n_samples AS BIGINT)"))
      .orderBy("doc_id")
  }

  val audioClippingSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, 256 + doc_id % 257 AS n FROM documents),
       |s AS (
       |  SELECT doc_id, n,
       |    [abs(((i * 37 + doc_id * 101) % 4096) - 2048) FOR i IN range(0, n)] AS amp
       |  FROM g),
       |pos AS (SELECT doc_id, n, unnest(range(1, n + 1)) AS i, amp FROM s),
       |c AS (SELECT doc_id, i FROM pos WHERE amp[i] >= $ClipThreshold),
       |isl AS (
       |  SELECT doc_id, i,
       |         i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM c),
       |runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, grp),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_clipped FROM c GROUP BY doc_id),
       |rmax AS (SELECT doc_id, CAST(max(run) AS BIGINT) AS longest_run FROM runs GROUP BY doc_id)
       |SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_samples,
       |       CAST(list_max(s.amp) AS BIGINT) AS peak,
       |       coalesce(agg.n_clipped, 0) AS n_clipped,
       |       coalesce(rmax.longest_run, 0) AS longest_run,
       |       CAST((1000000 * coalesce(agg.n_clipped, 0)) // s.n AS BIGINT) AS clipped_ppm
       |FROM s LEFT JOIN agg ON agg.doc_id = s.doc_id
       |       LEFT JOIN rmax ON rmax.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  val audioVadSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, 256 + doc_id % 257 AS n FROM documents),
       |s AS (
       |  SELECT doc_id, n // $VadFrame AS nf,
       |    [((i * 37 + doc_id * 101) % 4096) - 2048 FOR i IN range(0, n)] AS smp
       |  FROM g),
       |fr AS (SELECT doc_id, nf, unnest(range(1, nf + 1)) AS f, smp FROM s),
       |fe AS (
       |  SELECT doc_id, nf, f,
       |    list_aggregate([abs(x) FOR x IN list_slice(smp, (f - 1) * $VadFrame + 1, f * $VadFrame)], 'sum') AS fa
       |  FROM fr),
       |vv AS (SELECT doc_id, f FROM fe WHERE fa > $VadThreshold),
       |isl AS (
       |  SELECT doc_id, f,
       |         f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
       |  FROM vv),
       |runs AS (SELECT doc_id, count(*) AS run FROM isl GROUP BY doc_id, grp),
       |va AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_voiced,
       |         CAST(min(f) AS BIGINT) AS first_voiced
       |  FROM vv GROUP BY doc_id),
       |rmax AS (SELECT doc_id, CAST(max(run) AS BIGINT) AS longest_run FROM runs GROUP BY doc_id)
       |SELECT s.doc_id, CAST(s.nf AS BIGINT) AS n_frames,
       |       coalesce(va.n_voiced, 0) AS n_voiced,
       |       va.first_voiced,
       |       coalesce(rmax.longest_run, 0) AS longest_run,
       |       round(CAST(coalesce(va.n_voiced, 0) AS DOUBLE) / CAST(s.nf AS DOUBLE), 6) AS voiced_ratio
       |FROM s LEFT JOIN va ON va.doc_id = s.doc_id
       |       LEFT JOIN rmax ON rmax.doc_id = s.doc_id
       |ORDER BY s.doc_id""".stripMargin

  // ------------------------------------------------------------------ video

  /** One video record entering the demux stage. */
  final case class VideoPayload(doc_id: Long, payload: Array[Byte])

  /** One sampled, decoded frame. */
  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int, height: Int, px_sum: Long)

  /** MJPEG-style container for the video path: `GMJ1` magic, little-endian
    * int32 frame count, an int32 offset table (blob-relative), then the
    * PNG frame blobs back-to-back. Not a standard codec — the JDK ships
    * no demuxer — but the demux CONTRACT is the real one: the offset
    * table lets [[sampleVideoFrames]] slice and decode ONLY the sampled
    * frames, never touching the rest of the payload, which is the
    * property that makes frame sampling affordable on a 100 TB video
    * column.
    */
  private val videoMagic = Array[Byte]('G', 'M', 'J', '1')

  def videoPayloads(docs: DataFrame): Dataset[VideoPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { id =>
        val nf = (3 + id % 4).toInt
        val w = (4 + id % 3).toInt
        val h = (4 + (id + 1) % 3).toInt
        val blobs = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              raster.setSample(x, y, 0, ((x * 7 + y * 11 + f * 19 + id * 23) % 256).toInt)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          bos.toByteArray
        }
        val header = ByteBuffer.allocate(4 + 4 + 4 * nf).order(ByteOrder.LITTLE_ENDIAN)
        header.put(videoMagic).putInt(nf)
        var off = 0
        blobs.foreach { b => header.putInt(off); off += b.length }
        val out = new ByteArrayOutputStream()
        out.write(header.array())
        blobs.foreach(out.write)
        VideoPayload(id, out.toByteArray)
      }
    }
  }

  /** Demux + sparse decode: parse the header, pick frames `0, step,
    * 2·step, …` (at most `maxFrames`), slice each one's blob via the
    * offset table and decode it with the real ImageIO codec. Unsampled
    * frames are never decoded — bounded work per record regardless of
    * clip length.
    */
  def sampleVideoFrames(payloads: Dataset[VideoPayload], step: Int, maxFrames: Int)
      : Dataset[VideoFrame] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.flatMap { p =>
        val bb = ByteBuffer.wrap(p.payload).order(ByteOrder.LITTLE_ENDIAN)
        val magic = new Array[Byte](4)
        bb.get(magic)
        require(java.util.Arrays.equals(magic, videoMagic),
          s"doc ${p.doc_id}: not a GMJ1 container")
        val nf = bb.getInt
        val offsets = Array.fill(nf)(bb.getInt)
        val blobStart = 4 + 4 + 4 * nf
        (0 until nf by step).take(maxFrames).map { f =>
          val from = blobStart + offsets(f)
          val until = if (f + 1 < nf) blobStart + offsets(f + 1) else p.payload.length
          val img = ImageIO.read(new ByteArrayInputStream(
            java.util.Arrays.copyOfRange(p.payload, from, until)))
          require(img != null, s"doc ${p.doc_id} frame $f: undecodable blob")
          val raster = img.getRaster
          var sum = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
            y += 1
          }
          VideoFrame(p.doc_id, f, img.getWidth, img.getHeight, sum)
        }
      }
    }
  }

  /** Full video pipeline: synth frames → container encode → demux →
    * sparse ImageIO decode, ordered for the oracle.
    */
  def videoFrameFeatures(docs: DataFrame, step: Int, maxFrames: Int): DataFrame =
    sampleVideoFrames(videoPayloads(docs), step, maxFrames)
      .toDF().orderBy("doc_id", "frame_idx")

  def videoFrameFeaturesSql(step: Int, maxFrames: Int): String =
    s"""WITH g AS (
       |  SELECT doc_id, 3 + doc_id % 4 AS nf,
       |         4 + doc_id % 3 AS w, 4 + (doc_id + 1) % 3 AS h
       |  FROM documents),
       |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS frame_idx FROM g),
       |sampled AS (
       |  SELECT * FROM f
       |  WHERE frame_idx % $step = 0 AND frame_idx // $step < $maxFrames)
       |SELECT doc_id,
       |  CAST(frame_idx AS INTEGER) AS frame_idx,
       |  CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       |  CAST(list_aggregate(
       |    [((i % w) * 7 + (i // w) * 11 + frame_idx * 19 + doc_id * 23) % 256
       |     FOR i IN range(0, w * h)], 'sum') AS BIGINT) AS px_sum
       |FROM sampled ORDER BY doc_id, frame_idx""".stripMargin

  /** Real image resize: decode the PNG, nearest-neighbor downsample by an
    * integer stride so the longer side fits `maxSide`, fingerprint the
    * resized raster. Bounded output per record (≤ maxSide² samples), pure
    * per-row work — no shuffle at any corpus size. The md5 runs over the
    * 2-hex-chars-per-sample row-major rendering (a deterministic
    * serialization both engines can produce).
    */
  def resize(docs: DataFrame, maxSide: Int): DataFrame = {
    require(maxSide > 0, s"maxSide must be positive: $maxSide")
    val spark = docs.sparkSession
    import spark.implicits._
    imagePayloads(docs).mapPartitions { it =>
      val dec = new ImageIoDecoder
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { p =>
        val d = dec.decode(p)
        val step = (math.max(d.width, d.height) + maxSide - 1) / maxSide
        val wOut = (d.width - 1) / step + 1
        val hOut = (d.height - 1) / step + 1
        val sb = new StringBuilder(wOut * hOut * 2)
        var sum = 0L
        var y = 0
        while (y < hOut) {
          var x = 0
          while (x < wOut) {
            val v = d.px(y * step * d.width + x * step)
            sum += v
            sb.append(f"$v%02x")
            x += 1
          }
          y += 1
        }
        md.reset()
        val hex = md.digest(sb.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
        ResizedImage(p.doc_id, d.width, d.height, wOut, hOut, sum, hex)
      }
    }.toDF().orderBy("doc_id")
  }

  def resizeSql(maxSide: Int): String =
    s"""WITH g AS (
       |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 7) % 9 AS h
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, w, h, (greatest(w, h) + $maxSide - 1) // $maxSide AS step FROM g),
       |o AS (
       |  SELECT doc_id, w, h, step,
       |         (w - 1) // step + 1 AS w_out, (h - 1) // step + 1 AS h_out
       |  FROM s),
       |px AS (
       |  SELECT doc_id, w, h, w_out, h_out,
       |    [(((i % w_out) * step) * 31 + ((i // w_out) * step) * 17 + doc_id * 13) % 256
       |     FOR i IN range(0, w_out * h_out)] AS pxs
       |  FROM o)
       |SELECT doc_id,
       |  CAST(w AS INTEGER) AS w_in, CAST(h AS INTEGER) AS h_in,
       |  CAST(w_out AS INTEGER) AS w_out, CAST(h_out AS INTEGER) AS h_out,
       |  CAST(list_aggregate(pxs, 'sum') AS BIGINT) AS px_sum_out,
       |  md5(list_aggregate([lpad(lower(hex(p)), 2, '0') FOR p IN pxs], 'string_agg', '')) AS px_md5
       |FROM px ORDER BY doc_id""".stripMargin

  /** Manufacture a binary payload column from the text fixture — the
    * video-shaped path ([[sampleFrames]]) strides raw payload bytes.
    */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** Frame sampling for video-like payloads: every `step`-th byte of the
    * payload as a hex "frame" — the batch-shape part of frame extraction
    * (striding, bounded output). A real grab needs a demuxer the JDK
    * doesn't ship; the [[Decoder]] SPI is where one would slot in.
    */
  def sampleFrames(payloads: DataFrame, step: Int, maxFrames: Int): DataFrame =
    payloads.select(col("doc_id"),
      // empty payloads must short-circuit: sequence(0, -1) would emit a
      // DESCENDING [0, -1] (the build-notes pitfall) and fabricate frames
      when(length(col("payload")) === 0, array().cast("array<string>"))
        .otherwise(slice(
          transform(
            sequence(lit(0), floor((length(col("payload")) - 1) / step).cast("int")),
            i => hex(col("payload").substr((i * step + 1).cast("int"), lit(1)))),
          1, maxFrames)).as("frames"))
      .select(col("doc_id"), size(col("frames")).cast("long").as("n_frames"),
        concat_ws(",", col("frames")).as("frame_hex"))
      .orderBy("doc_id")

  def sampleFramesSql(step: Int, maxFrames: Int): String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    [upper(hex(substr(text, i * $step + 1, 1))) FOR i IN range(0, (strlen(text) - 1) // $step + 1)][1:$maxFrames] AS frames
       |  FROM documents)
       |SELECT doc_id, CAST(len(frames) AS BIGINT) AS n_frames,
       |       list_aggregate(frames, 'string_agg', ',') AS frame_hex
       |FROM f ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ perceptual-hash dedup

  /** Average-hash signature split into four 16-bit bands (b0 = grid rows
    * 0-1 … b3 = rows 6-7). Bands instead of one 64-bit word keep every
    * value positive (no sign-bit shift) and double as the LSH blocking
    * key: hamming ≤ 3 pigeonholes into ≥ 1 identical band.
    */
  final case class PhashSig(img_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Twin corpus for image near-dup: per doc, a base image and a
    * lightly-noised copy under img_id + 1000000 (the [[graft.ops.Dedup]]
    * planted-duplicate device in pixel space). The pixel formula is
    * MULTIPLICATIVE in doc_id — unlike [[imagePayloads]]'s additive
    * formula, two different docs' images are decorrelated, not constant
    * offsets of each other, so only planted twins land near in hash
    * space. Noise: +5 (clamped at 255) on the ~1/11 of pixels where
    * (x + y + id) ≡ 0 mod 11.
    */
  def phashPayloads(docs: DataFrame): Dataset[MediaPayload] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long]
      .flatMap(id => Seq(id, id + 1000000L))
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { imgId =>
          val pert = imgId >= 1000000L
          val src = if (pert) imgId - 1000000L else imgId
          val w = (16 + src % 9).toInt
          val h = (16 + (src * 7) % 9).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val base = ((x * 31L + y * 17L + 7L) * ((src % 97L) + 3L) + src * 13L) % 256L
              val v =
                if (pert && (x + y + src) % 11L == 0L) math.min(base + 5L, 255L)
                else base
              raster.setSample(x, y, 0, v.toInt)
              x += 1
            }
            y += 1
          }
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          MediaPayload(imgId, bos.toByteArray)
        }
      }
  }

  /** Average-hash over the REAL decode: sample an 8×8 grid
    * (x = ⌊col·w/8⌋, y = ⌊row·h/8⌋), threshold each sample against the
    * integral grid mean, pack bits row-major into the four band words.
    */
  def perceptualHashes(payloads: Dataset[MediaPayload],
                       newDecoder: () => Decoder = () => new ImageIoDecoder): Dataset[PhashSig] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.mapPartitions { it =>
      val dec = newDecoder()
      it.map { p =>
        val d = dec.decode(p)
        val s = new Array[Long](64)
        var sum = 0L
        var i = 0
        while (i < 64) {
          val x = (i % 8) * d.width / 8
          val y = (i / 8) * d.height / 8
          s(i) = d.px(y * d.width + x).toLong
          sum += s(i)
          i += 1
        }
        val m = sum / 64
        def band(b: Int): Long = {
          var v = 0L
          var j = 0
          while (j < 16) { if (s(b * 16 + j) > m) v |= (1L << j); j += 1 }
          v
        }
        PhashSig(p.doc_id, band(0), band(1), band(2), band(3))
      }
    }
  }

  /** Image near-dup pairs: banded blocking on the signature (each band
    * is an exact-match bucket key), then hamming-verify ≤ maxHamming —
    * the [[graft.ops.Dedup.simhashPairs]] candidate shape applied to a
    * REAL codec path. The signature frame is corpus-count rows of five
    * longs; the self-join explodes only band buckets, never all pairs.
    */
  def phashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val sigs = Caches.tracked(perceptualHashes(phashPayloads(docs)).toDF().persist())
    val bands = sigs.select(col("img_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "bv")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.img_id") < col("b.img_id"))
      .select(col("a.img_id").as("doc_a"), col("b.img_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.toDF("doc_a", "a0", "a1", "a2", "a3"), "doc_a")
      .join(sigs.toDF("doc_b", "c0", "c1", "c2", "c3"), "doc_b")
      .withColumn("hamming",
        (bit_count(col("a0").bitwiseXOR(col("c0"))) +
          bit_count(col("a1").bitwiseXOR(col("c1"))) +
          bit_count(col("a2").bitwiseXOR(col("c2"))) +
          bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Oracle: rebuilds the signatures from the pixel formula (valid
    * because the PNG round-trip is bit-lossless — the [[featurizeSql]]
    * contract) and mirrors the banding + hamming verify.
    */
  def phashPairsSql(maxHamming: Int): String = {
    val bandCols = (0 until 4).map { b =>
      s"""CAST(list_aggregate([CASE WHEN s[${b * 16} + j + 1] > m THEN 1 << j ELSE 0 END
         |      FOR j IN range(0, 16)], 'sum') AS BIGINT) AS b$b""".stripMargin
    }.mkString(",\n    ")
    val bandRows = (0 until 4).map { b =>
      s"SELECT img_id, $b AS band, b$b AS bv FROM bands"
    }.mkString("\n  UNION ALL\n  ")
    val ham = (0 until 4).map(b => s"bit_count(xor(x.b$b, y.b$b))").mkString(" + ")
    s"""WITH base AS (SELECT doc_id AS src FROM documents),
       |imgs AS (
       |  SELECT src, src AS img_id, 0 AS pert FROM base
       |  UNION ALL
       |  SELECT src, src + 1000000, 1 FROM base),
       |dims AS (
       |  SELECT img_id, src, pert, 16 + src % 9 AS w, 16 + (src * 7) % 9 AS h
       |  FROM imgs),
       |coords AS (
       |  SELECT img_id, src, pert, w, h,
       |    [((i % 8) * w) // 8 FOR i IN range(0, 64)] AS xs,
       |    [((i // 8) * h) // 8 FOR i IN range(0, 64)] AS ys
       |  FROM dims),
       |samp AS (
       |  SELECT img_id,
       |    [((xs[i + 1] * 31 + ys[i + 1] * 17 + 7) * ((src % 97) + 3) + src * 13) % 256
       |     + CASE WHEN pert = 1 AND (xs[i + 1] + ys[i + 1] + src) % 11 = 0
       |            THEN 5 ELSE 0 END
       |     FOR i IN range(0, 64)] AS s0
       |  FROM coords),
       |clamped AS (
       |  SELECT img_id, [least(s0[i + 1], 255) FOR i IN range(0, 64)] AS s
       |  FROM samp),
       |withm AS (
       |  SELECT img_id, s, list_aggregate(s, 'sum') // 64 AS m FROM clamped),
       |bands AS (
       |  SELECT img_id,
       |    $bandCols
       |  FROM withm),
       |bandrows AS (
       |  $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.img_id AS doc_a, b.img_id AS doc_b
       |  FROM bandrows a JOIN bandrows b
       |    ON a.band = b.band AND a.bv = b.bv AND a.img_id < b.img_id)
       |SELECT c.doc_a, c.doc_b, CAST($ham AS INTEGER) AS hamming
       |FROM cand c JOIN bands x ON c.doc_a = x.img_id
       |            JOIN bands y ON c.doc_b = y.img_id
       |WHERE $ham <= $maxHamming
       |ORDER BY c.doc_a, c.doc_b""".stripMargin
  }

  /** Scene-cut detection over the demuxed container: SAD (sum of
    * absolute per-pixel differences) between each pair of CONSECUTIVE
    * decoded frames, a cut flagged when mean per-pixel change exceeds
    * `tauPerPx`. Unlike [[sampleVideoFrames]]'s sparse path this decodes
    * every frame — the honest cost of temporal analysis — but clips are
    * bounded (the offset table bounds per-record work), and all SAD
    * arithmetic is integer-exact so the oracle recomputes it from the
    * synth formula through the real codec round-trip.
    */
  final case class SceneCuts(doc_id: Long, n_frames: Int, n_cuts: Long,
      max_sad: Long, sum_sad: Long)

  def videoSceneCuts(docs: DataFrame, tauPerPx: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = videoPayloads(docs).mapPartitions { it =>
      ImageIO.setUseCache(false)
      it.map { p =>
        val bb = ByteBuffer.wrap(p.payload).order(ByteOrder.LITTLE_ENDIAN)
        val magic = new Array[Byte](4)
        bb.get(magic)
        require(java.util.Arrays.equals(magic, videoMagic),
          s"doc ${p.doc_id}: not a GMJ1 container")
        val nf = bb.getInt
        val offsets = Array.fill(nf)(bb.getInt)
        val blobStart = 4 + 4 + 4 * nf
        def decode(f: Int): Array[Int] = {
          val from = blobStart + offsets(f)
          val until = if (f + 1 < nf) blobStart + offsets(f + 1) else p.payload.length
          val img = ImageIO.read(new ByteArrayInputStream(
            java.util.Arrays.copyOfRange(p.payload, from, until)))
          require(img != null, s"doc ${p.doc_id} frame $f: undecodable blob")
          val r = img.getRaster
          val out = new Array[Int](img.getWidth * img.getHeight)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              out(y * img.getWidth + x) = r.getSample(x, y, 0); x += 1
            }
            y += 1
          }
          out
        }
        var prev = decode(0)
        var cuts = 0L
        var maxSad = 0L
        var sumSad = 0L
        var f = 1
        while (f < nf) {
          val cur = decode(f)
          var sad = 0L
          var i = 0
          while (i < cur.length) { sad += math.abs(cur(i) - prev(i)); i += 1 }
          if (sad > tauPerPx.toLong * cur.length) cuts += 1
          if (sad > maxSad) maxSad = sad
          sumSad += sad
          prev = cur
          f += 1
        }
        SceneCuts(p.doc_id, nf, cuts, maxSad, sumSad)
      }
    }
    feats.toDF()
      .select(col("doc_id"), col("n_frames"), col("n_cuts"), col("max_sad"),
        round(col("sum_sad").cast("double") /
          (col("n_frames") - 1).cast("double"), 4).as("mean_sad"))
      .orderBy("doc_id")
  }

  def videoSceneCutsSql(tauPerPx: Int): String =
    s"""WITH g AS (
       |  SELECT doc_id, CAST(3 + doc_id % 4 AS INTEGER) AS nf,
       |         4 + doc_id % 3 AS w, 4 + (doc_id + 1) % 3 AS h
       |  FROM documents),
       |pairs AS (SELECT doc_id, nf, w, h, unnest(range(1, nf)) AS f FROM g),
       |sads AS (
       |  SELECT doc_id, nf, w, h, f,
       |    CAST(list_aggregate(
       |      [abs(((i % w) * 7 + (i // w) * 11 + f * 19 + doc_id * 23) % 256
       |           - ((i % w) * 7 + (i // w) * 11 + (f - 1) * 19 + doc_id * 23) % 256)
       |       FOR i IN range(0, w * h)], 'sum') AS BIGINT) AS sad
       |  FROM pairs)
       |SELECT doc_id, max(nf) AS n_frames,
       |       CAST(sum(CASE WHEN sad > $tauPerPx * w * h THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       |       CAST(max(sad) AS BIGINT) AS max_sad,
       |       round(CAST(sum(sad) AS DOUBLE) / CAST(max(nf) - 1 AS DOUBLE), 4) AS mean_sad
       |FROM sads GROUP BY doc_id ORDER BY doc_id""".stripMargin
}
