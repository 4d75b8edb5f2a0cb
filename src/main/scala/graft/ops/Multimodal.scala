package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` payload columns next to typed metadata
  * — the lakehouse pattern for multimodal training data. The Spark-side
  * machinery here is real and tested: payload schema, per-partition
  * decoder lifecycle (`mapPartitions` with one decoder instance per
  * partition — exactly how a JNI image codec would be held), deterministic
  * batch shape. The codec itself is a STUB (this container ships no
  * image/audio libraries): [[StubDecoder]] derives width/height/features
  * from the payload bytes deterministically, so the pipeline is
  * end-to-end verifiable while the decode call is swappable for a real
  * libjpeg/ffmpeg binding.
  *
  * The harness has no binary fixtures, so [[payloads]] manufactures the
  * payload column from `documents.text` (utf-8 bytes) — the plumbing is
  * identical for real media bytes.
  */
object Multimodal {

  /** One media record entering the decode stage. */
  final case class MediaPayload(doc_id: Long, payload: Array[Byte])

  /** Decoded features leaving it. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      feature64: Long,
      thumb_hex: String)

  /** Decoder SPI — a real implementation wraps libjpeg/ffmpeg/etc. and is
    * expensive to construct, hence one instance per partition, never per
    * row.
    */
  trait Decoder extends Serializable {
    def decode(p: MediaPayload): MediaFeatures
  }

  /** Deterministic fake decode: md5-derived "dimensions" and "feature".
    * Byte-for-byte reproducible in SQL (md5 over the same bytes), so even
    * the stub is oracle-checked. Swap for a real codec in production.
    */
  final class StubDecoder extends Decoder {
    private val md = java.security.MessageDigest.getInstance("MD5")
    def decode(p: MediaPayload): MediaFeatures = {
      md.reset()
      val hex = md.digest(p.payload).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      MediaFeatures(
        doc_id = p.doc_id,
        n_bytes = p.payload.length.toLong,
        width = (64 + h % 1024).toInt,
        height = (64 + (h / 1024) % 1024).toInt,
        feature64 = h,
        thumb_hex = hex.substring(0, 16))
    }
  }

  /** Manufacture the binary payload column from the text fixture. */
  def payloads(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** The decode stage: one decoder per partition, streamed (no
    * materialize-the-partition), typed output schema. This is the exact
    * shape a Pandas-UDF/mapInPandas decode takes in PySpark — here as a
    * typed `mapPartitions` so it rides Spark's Dataset encoders.
    */
  def extractFeatures(payloads: DataFrame): Dataset[MediaFeatures] = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.as[MediaPayload].mapPartitions { it =>
      val dec = new StubDecoder // per-partition init (real codecs are costly)
      it.map(dec.decode)
    }
  }

  /** Full featurize pipeline over documents, ordered for the oracle. */
  def featurize(docs: DataFrame): DataFrame =
    extractFeatures(payloads(docs)).toDF().orderBy("doc_id")

  /** DuckDB mirror of the stub decode (text is ASCII in the fixtures, so
    * md5(text) == md5(utf8 bytes)).
    */
  val featurizeSql: String =
    s"""SELECT doc_id,
       |  CAST(strlen(text) AS BIGINT) AS n_bytes,
       |  CAST(64 + CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1024 AS INTEGER) AS width,
       |  CAST(64 + (CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) // 1024) % 1024 AS INTEGER) AS height,
       |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS feature64,
       |  substr(md5(text), 1, 16) AS thumb_hex
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Frame sampling for video-like payloads: every `step`-th byte of the
    * payload as a hex "frame" — the batch-shape part of frame extraction
    * (striding, bounded output) with the real grab stubbed.
    */
  def sampleFrames(payloads: DataFrame, step: Int, maxFrames: Int): DataFrame =
    payloads.select(col("doc_id"),
      // empty payloads must short-circuit: sequence(0, -1) would emit a
      // DESCENDING [0, -1] (the CLAUDE.md pitfall) and fabricate frames
      when(length(col("payload")) === 0, array().cast("array<string>"))
        .otherwise(slice(
          transform(
            sequence(lit(0), floor((length(col("payload")) - 1) / step).cast("int")),
            i => hex(col("payload").substr((i * step + 1).cast("int"), lit(1)))),
          1, maxFrames)).as("frames"))
      .select(col("doc_id"), size(col("frames")).cast("long").as("n_frames"),
        concat_ws(",", col("frames")).as("frame_hex"))
      .orderBy("doc_id")

  /** Resize/downsample stage: bound every payload to ≤ `maxUnits`
    * samples by stride-sampling (step = ⌈n/maxUnits⌉). This is the stub
    * standing in for a codec resize (libjpeg scaled decode / ffmpeg
    * scale filter slot into the [[Decoder]] SPI); the Spark-side
    * contract — bounded output size per record, deterministic content,
    * pure projection (no shuffle, no UDF) — is the real, tested part.
    * Output fingerprinted so the oracle checks the exact resized content.
    *
    * The stub's sampling unit is the CHARACTER of the string-decoded
    * payload (lengths, stride and md5 all measured over characters —
    * never mixed with byte counts; the fixture is ASCII so the decode is
    * lossless). A real codec implementation samples bytes/pixels inside
    * [[Decoder]], where byte semantics belong.
    */
  def resize(payloads: DataFrame, maxUnits: Int): DataFrame = {
    val chars = col("payload").cast("string")
    val n = length(chars)
    payloads
      .select(col("doc_id"), chars.as("chars"), n.as("n_in"),
        greatest(lit(1), ceil(n.cast("double") / maxUnits).cast("int")).as("step"))
      .select(col("doc_id"), col("n_in").cast("long").as("n_chars_in"),
        when(col("n_in") === 0, lit(""))
          .otherwise(concat_ws("", slice(
            transform(
              sequence(lit(0), ((col("n_in") - 1) / col("step")).cast("int")),
              i => col("chars").substr((i * col("step") + 1).cast("int"), lit(1))),
            1, maxUnits))).as("resized"))
      .select(col("doc_id"), col("n_chars_in"),
        length(col("resized")).cast("long").as("n_chars_out"),
        md5(col("resized").cast("binary")).as("resized_md5"))
      .orderBy("doc_id")
  }

  def resizeSql(maxUnits: Int): String =
    s"""WITH p AS (
       |  SELECT doc_id, text AS chars, length(text) AS n_in,
       |         greatest(1, CAST(ceil(CAST(length(text) AS DOUBLE) / $maxUnits) AS INTEGER)) AS step
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, n_in,
       |    CASE WHEN n_in = 0 THEN ''
       |         ELSE list_aggregate(
       |           [substr(chars, i * step + 1, 1) FOR i IN range(0, (n_in - 1) // step + 1)][1:$maxUnits],
       |           'string_agg', '') END AS resized
       |  FROM p)
       |SELECT doc_id, CAST(n_in AS BIGINT) AS n_chars_in,
       |       CAST(length(resized) AS BIGINT) AS n_chars_out,
       |       md5(resized) AS resized_md5
       |FROM r ORDER BY doc_id""".stripMargin

  def sampleFramesSql(step: Int, maxFrames: Int): String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    [upper(hex(substr(text, i * $step + 1, 1))) FOR i IN range(0, (strlen(text) - 1) // $step + 1)][1:$maxFrames] AS frames
       |  FROM documents)
       |SELECT doc_id, CAST(len(frames) AS BIGINT) AS n_frames,
       |       list_aggregate(frames, 'string_agg', ',') AS frame_hex
       |FROM f ORDER BY doc_id""".stripMargin
}
