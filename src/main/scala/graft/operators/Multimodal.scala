package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Determinism

/** Multimodal column plumbing: opaque `binary` payloads with typed
  * metadata, and batch feature extraction over partitions.
  *
  * The real engine treats image/audio/video as binary columns plus a typed
  * metadata struct and runs decode/feature-extraction as partition-batched
  * UDFs. **The default lane is [[decodeReal]]/[[extractDecoded]]**: REAL
  * stdlib decoders in [[MediaCodecs]] for WAV PCM, PPM P6, BMP 24-bit,
  * PNG (full chunk walk + Inflater + all five scanline filters), JPEG
  * (the JDK's own ImageIO baseline codec), GIF (from-scratch LZW), MP3
  * frame-header metadata, MP4 box-walk metadata, and Y4M raw video
  * (REAL per-frame sample decode). Payloads that need a codec library
  * NOT in this container (MP3 PCM, compressed-video samples) route to
  * the byte-stat fallback inside the same lane. [[fakeDecode]] is kept
  * ONLY as the v1 oracle-checked contract stub for fully-opaque payloads
  * (its byte-stat outputs are a subset of what the opaque fallback of
  * [[decodeReal]] computes) — new callers should use [[extractDecoded]].
  * Extending to another compressed format means adding one pure function.
  *
  * Scale notes: media rows are large — the media column must stay OUT of
  * every shuffle. Feature extraction is a narrow `mapPartitions`; anything
  * downstream joins on `(doc_id)` against the small feature table, never
  * the payload.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, media: Array[Byte], width: Int, height: Int)

  case class MediaFeatures(doc_id: Long, n_bytes: Long, byte_sum: Long,
      head_byte: Int, aspect_e3: Long, feature_version: String)

  /** Wrap a text corpus as fake media rows (UTF-8 payload + synthetic
    * dimensions derived from the portable hash — oracle-reproducible). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("application/octet-stream").as("mime"),
      col("text").cast("binary").as("media"),
      (lit(320) + pmod(Determinism.seeded("w", col("doc_id")), lit(320))).cast("int").as("width"),
      (lit(240) + pmod(Determinism.seeded("h", col("doc_id")), lit(240))).cast("int").as("height"))

  /** v1 contract STUB (superseded by [[decodeReal]] — kept only for the
    * oracle-pinned v1 feature query): deterministic byte statistics so the
    * partition-batched plumbing is exercised end-to-end. */
  def fakeDecode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.media.length) { sum += (r.media(i) & 0xff); i += 1 }
      MediaFeatures(r.doc_id, r.media.length.toLong, sum,
        if (r.media.nonEmpty) r.media(0) & 0xff else -1,
        math.floorDiv(r.width.toLong * 1000L, r.height.toLong),
        "fake-v1")
    }

  /** v1-contract feature extraction (narrow; media never shuffles).
    * Prefer [[extractDecoded]] — the real-codec lane. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(fakeDecode)
  }

  /** One decoded-feature row per media payload; `kind` marks which real
    * decoder fired (`wav`/`ppm`/`bmp`) or `opaque` for everything else —
    * opaque rows still carry the byte statistics, so the lane subsumes
    * [[fakeDecode]]'s contract. */
  case class DecodedMediaRow(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, sample_rate: Int,
      n_samples: Long, duration_ms: Long, mean_r: Int, mean_g: Int,
      mean_b: Int, rms_e3: Long, byte_sum: Long, feature_version: String)

  /** REAL decode for the uncompressed containers ([[MediaCodecs]]: WAV
    * PCM, PPM P6, BMP 24-bit — pure stdlib byte parsing, no codec
    * library), byte-stat fallback for compressed/opaque payloads. Corrupt
    * or truncated media degrades to the fallback, never throws. */
  def decodeReal(rows: Iterator[MediaRow]): Iterator[DecodedMediaRow] =
    rows.map { r =>
      var sum = 0L
      var i = 0
      while (i < r.media.length) { sum += (r.media(i) & 0xff); i += 1 }
      val nb = r.media.length.toLong
      MediaCodecs.decode(r.media) match {
        case Some(d) => DecodedMediaRow(r.doc_id, d.kind, nb, d.width, d.height,
          d.channels, d.sampleRate, d.nSamples, d.durationMs,
          d.meanR, d.meanG, d.meanB, d.rmsE3, sum, "codec-v1")
        case None => DecodedMediaRow(r.doc_id, "opaque", nb,
          0, 0, 0, 0, 0L, 0L, 0, 0, 0, 0L, sum, "codec-v1")
      }
    }

  /** Partition-batched REAL decoding (narrow; media never shuffles). */
  def extractDecoded(spark: SparkSession, media: DataFrame): Dataset[DecodedMediaRow] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions(decodeReal)
  }

  /** Frame-sampling stub: picks `n` deterministic offsets in [0, nBytes) —
    * the real implementation samples video frames at these positions. */
  def frameOffsets(docId: Long, nBytes: Long, n: Int): Seq[Long] =
    if (nBytes <= 0) Nil
    else (0 until n).map(i => (i.toLong * nBytes) / n)

  /** Column form of frame sampling — the metadata plane of the operator:
    * sampling POSITIONS derive from `(n_bytes, n)` alone, so the plan
    * explodes a tiny per-row offsets array computed from metadata and the
    * media payload never enters the generate/shuffle (decoding the frame
    * at each offset is the stubbed codec step). */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"frame count must be >= 1, got $n")
    media
      .select(col("doc_id"), length(col("media")).cast("long").as("n_bytes"))
      .filter(col("n_bytes") > 0)
      .select(col("doc_id"), col("n_bytes"),
        posexplode(expr(s"transform(sequence(0, ${n - 1}), i -> (CAST(i AS BIGINT) * n_bytes) div $n)")))
      .toDF("doc_id", "n_bytes", "frame_idx", "offset")
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"), col("offset"))
  }

  /** Aspect-preserving resize plan (fit into `maxW`×`maxH`, never
    * upscale): pure integer floor arithmetic over the metadata struct —
    * exact on any engine; the pixel resample itself is the stubbed codec
    * step. Landscape fits the width, portrait the height. */
  def resizePlan(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.select(col("doc_id"), col("width"), col("height"),
      when(col("width") <= maxW && col("height") <= maxH,
        struct(col("width").as("w"), col("height").as("h")))
        .when(col("width") * maxH >= col("height") * maxW,
          struct(lit(maxW).as("w"),
            floor(col("height").cast("long") * maxW / col("width")).cast("int").as("h")))
        .otherwise(
          struct(floor(col("width").cast("long") * maxH / col("height")).cast("int").as("w"),
            lit(maxH).as("h"))).as("out"))
      .select(col("doc_id"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("out.w").cast("long").as("out_w"), col("out.h").cast("long").as("out_h"))
}
