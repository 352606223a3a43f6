package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multimodal columns for training-data pipelines: media travel as opaque
 * `binary` payloads plus TYPED metadata columns; decoding happens only at
 * partition level in batch shape (the posture that scales to 100 TB —
 * codecs never run inside SQL expressions, and payload bytes never shuffle
 * for metadata-only operations).
 *
 * Two decode arms share the same partition-batched plumbing:
 *
 *  - [[decodeImageMeta]] is a REAL image decode — `javax.imageio` (the
 *    JDK's built-in PNG/JPEG/GIF/BMP codecs, no external dependency)
 *    reads each payload inside `mapPartitions`, yielding true pixel
 *    dimensions, channel count, and a magic-byte MIME sniff; undecodable
 *    payloads come back flagged, never thrown (one corrupt crawl byte
 *    must not kill a 100 TB decode pass);
 *  - [[decodeMeta]] keeps the deterministic STUB arm (dimensions from the
 *    payload's sha-256) for codecs this container lacks (audio/video) —
 *    the plumbing is identical, so swapping a stub for a codec call
 *    changes one function, exactly as [[decodeImageMeta]] demonstrates.
 */
object Multimodal {

  final case class DecodedMeta(
      id: Long, mime: String, width_px: Int, height_px: Int, n_bytes: Long)

  /** sha-256 hex of a payload (matches Spark's `sha2(bin, 256)` and
    * DuckDB's `sha256`). */
  private def sha256Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      .map("%02x".format(_)).mkString

  /** The stub "decode": dimensions from the first two hex chars of the
    * payload digest — deterministic, engine-reproducible, and shaped like a
    * real decode result. */
  def stubDims(shaHex: String): (Int, Int) = (
    64 + (shaHex.charAt(0).toInt % 16) * 4,
    64 + (shaHex.charAt(1).toInt % 16) * 4)

  /** Binary payload + cheap metadata, pure column expressions (no decode):
    * bytes, digest, mime tag. */
  def asBinaryWithMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("payload"),
      octet_length(col(payloadCol).cast("binary")).cast("bigint").as("n_bytes"),
      sha2(col(payloadCol).cast("binary"), 256).as("sha256"),
      lit("application/octet-stream").as("mime"))

  /**
   * Partition-level batch "decode": binary payloads → typed media metadata
   * via `mapPartitions` (the Scala analogue of `mapInPandas` — one iterator
   * per partition, codec state amortized across the batch, no per-row UDF).
   */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens ONCE here (a real codec would init)
        it.map { case (id, payload) =>
          val sha = sha256Hex(payload)
          val (w, h) = stubDims(sha)
          DecodedMeta(id, "image/x-stub", w, h, payload.length.toLong)
        }
      }
      .toDF()
  }

  final case class ImageMeta(
      id: Long, mime: String, width_px: Int, height_px: Int,
      n_channels: Int, n_bytes: Long, decode_ok: Boolean)

  /** Magic-byte MIME sniff — runs BEFORE any codec touches the payload, so
    * even an undecodable row carries its container type. */
  private[graft] def sniffMime(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N'
        && b(3) == 'G') "image/png"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      "image/jpeg"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F'
        && b(3) == '8') "image/gif"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "image/bmp"
    else "application/octet-stream"

  /**
   * REAL partition-level batch image decode: `javax.imageio` reads each
   * binary payload's HEADER inside `mapPartitions` — codec/registry setup
   * and the disk-cache opt-out happen once per partition, payload bytes
   * never shuffle, and the output is the typed metadata row downstream
   * planning runs on. Header-only deliberately: `ImageReader.getWidth`/
   * `getHeight`/`getImageTypes` never allocate the pixel raster, so a
   * metadata pass over 100 TB pays bytes-scanned, not pixels-decoded —
   * and a decompression bomb (a few-KB PNG declaring 60000×60000) cannot
   * OOM an executor the way a full `ImageIO.read` raster allocation
   * could. A payload no reader accepts (or that throws mid-parse) yields
   * `decode_ok = false` with zeroed dimensions — corrupt crawl bytes are
   * data, not exceptions.
   */
  def decodeImageMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec setup: no temp-file cache on executors
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          val mime = sniffMime(payload)
          var meta: ImageMeta = null
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(payload))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (readers.hasNext) {
                val r = readers.next()
                try {
                  r.setInput(iis)
                  val (w, h) = (r.getWidth(0), r.getHeight(0))
                  val types = r.getImageTypes(0)
                  val ch = if (types.hasNext)
                    types.next().getColorModel.getNumComponents else 0
                  meta = ImageMeta(id, mime, w, h, ch,
                    payload.length.toLong, decode_ok = true)
                } finally r.dispose()
              }
            } finally if (iis != null) iis.close()
          } catch { case _: Exception => () }
          if (meta == null)
            ImageMeta(id, mime, 0, 0, 0, payload.length.toLong,
              decode_ok = false)
          else meta
        }
      }
      .toDF()
  }

  final case class AudioMeta(
      id: Long, mime: String, sample_rate_hz: Int, n_channels: Int,
      n_frames: Long, duration_ms: Long, n_bytes: Long, decode_ok: Boolean)

  /**
   * REAL partition-level batch audio decode: `javax.sound.sampled` (the
   * JDK's built-in WAV/AIFF/AU parsers, no external dependency) reads
   * each payload's header inside `mapPartitions`, yielding true sample
   * rate, channel count, frame count, and duration — the audio analogue
   * of [[decodeImageMeta]], closing the second modality with a real
   * codec. Duration is integer milliseconds (⌊frames·1000/rate⌋ — exact,
   * engine-reproducible). Unparseable payloads flag `decode_ok = false`.
   */
  def decodeAudioMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val mime =
            if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I'
              && payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W'
              && payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E')
              "audio/wav"
            else if (payload.length >= 4 && payload(0) == 'F' && payload(1) == 'O'
              && payload(2) == 'R' && payload(3) == 'M') "audio/aiff"
            else "application/octet-stream"
          try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(payload))
            val fmt = in.getFormat
            val frames = in.getFrameLength
            val rate = fmt.getSampleRate.toInt
            in.close()
            // NOT_SPECIFIED (-1) frame length or a non-positive rate
            // means the header did NOT yield the metadata this operator
            // exists to report — that is a failed decode, not a success
            // with a negative frame count poisoning downstream planning
            if (frames < 0 || rate <= 0)
              AudioMeta(id, mime, 0, 0, 0L, 0L, payload.length.toLong,
                decode_ok = false)
            else
              AudioMeta(id, mime, rate, fmt.getChannels, frames,
                frames * 1000L / rate, payload.length.toLong,
                decode_ok = true)
          } catch {
            case _: Exception =>
              AudioMeta(id, mime, 0, 0, 0L, 0L, payload.length.toLong,
                decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** Resize planning: pure integer metadata math (aspect-preserving fit to
    * `maxDim`), no payload access — runs as codegen'd expressions. */
  def resizePlan(df: DataFrame, maxDim: Int): DataFrame = {
    // explicit floor: Spark's int cast truncates but DuckDB's rounds, so the
    // oracle-portable form floors the double division in both engines
    val longest = greatest(col("width_px"), col("height_px"))
    df.withColumn("target_w",
        when(longest <= maxDim, col("width_px"))
          .otherwise(floor((col("width_px") * maxDim) / longest)).cast("int"))
      .withColumn("target_h",
        when(longest <= maxDim, col("height_px"))
          .otherwise(floor((col("height_px") * maxDim) / longest)).cast("int"))
  }

  /** Frame sampling plan for frame-indexed media: every `everyK`-th frame
    * index below `nFramesCol`, as exploded (id, frame_idx) rows —
    * `sequence` + `explode`, fully distributed, no payload access. */
  def sampleFrames(df: DataFrame, idCol: String, nFramesCol: String,
      everyK: Int): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      explode(sequence(lit(0), col(nFramesCol).cast("int") - 1,
        lit(everyK))).as("frame_idx"))
}
