package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
 *  - [[decodeAudioMeta]] (javax.sound.sampled WAV/AIFF headers) and
 *    [[decodeVideoMeta]] (an ISO BMFF `moov` atom walk — real container
 *    structure, no codec needed for a metadata pass) close the other two
 *    modalities with the same plumbing;
 *  - [[decodeMeta]] keeps the deterministic STUB arm (dimensions from the
 *    payload's sha-256) as the plumbing exemplar: swapping a stub for a
 *    codec call changes one function, as the three real arms demonstrate.
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

  // =====================================================================
  // Perceptual image hashes — the image analogue of MinHash/SimHash
  // =====================================================================

  final case class ImageHash(
      id: Long, dhash: Long, phash: Long, decode_ok: Boolean)

  /** Decompression-bomb guard for the FULL-raster decode the perceptual
    * hashes need (unlike [[decodeImageMeta]]'s header-only pass): a
    * few-KB payload declaring 60000×60000 would OOM the executor at
    * raster allocation, so dimensions are checked from the HEADER before
    * any pixel decodes. 16 Mpx ≈ 64 MB ARGB — bounded per task. */
  private val MaxHashPixels = 16L * 1024 * 1024

  /** Integer luma (ITU-R 601 weights, exact integer arithmetic:
    * (299r + 587g + 114b) / 1000 floor) — deterministic across JVMs,
    * restatable in SQL for the no-resample fixtures. */
  private def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xff; val g = (argb >> 8) & 0xff
    val b = argb & 0xff
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Box-average downscale to `tw`×`th`: cell (cx,cy) averages the pixel
    * block [⌊cx·W/tw⌋, ⌊(cx+1)·W/tw⌋) × [⌊cy·H/th⌋, ⌊(cy+1)·H/th⌋),
    * integer sum / count floor. When the image IS `tw`×`th` every cell
    * is exactly one pixel — the identity the fixture oracle exploits. */
  private def boxScale(
      gray: Array[Int], w: Int, h: Int, tw: Int, th: Int): Array[Int] = {
    val out = new Array[Int](tw * th)
    var cy = 0
    while (cy < th) {
      val y0 = cy * h / th; val y1 = math.max(y0 + 1, (cy + 1) * h / th)
      var cx = 0
      while (cx < tw) {
        val x0 = cx * w / tw; val x1 = math.max(x0 + 1, (cx + 1) * w / tw)
        var sum = 0L; var n = 0L; var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { sum += gray(y * w + x); n += 1; x += 1 }
          y += 1
        }
        out(cy * tw + cx) = (sum / n).toInt
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** dHash (difference hash; Krawetz's "kind of like ahash" gradient
    * variant): 9×8 box-scaled luma, bit (y·8+x) set iff cell (x,y) <
    * cell (x+1,y) — 64 comparisons, of which the LAST is dropped so the
    * print stays 63 bits with a clear sign bit (the banding machinery's
    * arithmetic-shift contract, [[Dedup.hammingHashPairs]]). */
  private[graft] def dHashOf(g9x8: Array[Int]): Long = {
    var hash = 0L; var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val idx = y * 8 + x
        if (idx < 63 && g9x8(y * 9 + x) < g9x8(y * 9 + x + 1))
          hash |= 1L << idx
        x += 1
      }
      y += 1
    }
    hash
  }

  /** pHash (DCT hash): 32×32 box-scaled luma → unnormalized 2-D DCT-II
    * → the 8×8 low-frequency block MINUS the DC coefficient (exactly 63
    * values, so the median is a single exact element and the print is 63
    * bits); bit set iff its coefficient exceeds that median. Scale
    * factors cancel in the compare, so the unnormalized sum is the whole
    * transform. */
  private[graft] def pHashOf(g32: Array[Int]): Long = {
    val coef = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0; var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            s += g32(y * 32 + x) *
              math.cos(math.Pi * (2 * x + 1) * u / 64.0) *
              math.cos(math.Pi * (2 * y + 1) * v / 64.0)
            x += 1
          }
          y += 1
        }
        coef(v * 8 + u) = s
        v += 1
      }
      u += 1
    }
    val ac = coef.drop(1) // 63 non-DC coefficients
    val med = ac.sorted.apply(31) // exact middle element of 63
    var hash = 0L; var i = 0
    while (i < 63) {
      if (ac(i) > med) hash |= 1L << i
      i += 1
    }
    hash
  }

  /**
   * Perceptual hashes per image payload — the signature pass of image
   * near-dup dedup (a crawl's meme/logo floods cluster by pHash/dHash
   * exactly as text near-dups cluster by MinHash): full-raster decode
   * behind the bomb guard, integer-luma box downscale, both 63-bit
   * prints per row. Partition-level like [[decodeImageMeta]]: payload
   * bytes never shuffle, only (id, 2×long) rows leave the scan — at
   * 100 TB the hash table is ~16 bytes/image against TBs of pixels.
   * Near-dup candidates come from [[Dedup.hammingHashPairs]] over
   * either print; undecodable payloads flag rather than throw.
   */
  def imageHashes(
      df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) =>
          var out: ImageHash = null
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
                  if (w > 0 && h > 0 && w.toLong * h <= MaxHashPixels) {
                    val im = r.read(0)
                    val gray = new Array[Int](w * h)
                    var y = 0
                    while (y < h) {
                      var x = 0
                      while (x < w) {
                        gray(y * w + x) = luma(im.getRGB(x, y))
                        x += 1
                      }
                      y += 1
                    }
                    out = ImageHash(id,
                      dHashOf(boxScale(gray, w, h, 9, 8)),
                      pHashOf(boxScale(gray, w, h, 32, 32)),
                      decode_ok = true)
                  }
                } finally r.dispose()
              }
            } finally if (iis != null) iis.close()
          } catch { case _: Exception => () }
          if (out == null) ImageHash(id, 0L, 0L, decode_ok = false)
          else out
        }
      }
      .toDF()
  }

  // =====================================================================
  // EXIF walk + GPS-PII strip — structural APP1/TIFF-IFD parse
  // =====================================================================

  final case class ExifMeta(
      id: Long, has_exif: Boolean, orientation: Int, datetime: String,
      gps_present: Boolean, exif_ok: Boolean)

  private def u16(b: Array[Byte], o: Int, le: Boolean): Int =
    if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  private def u32be(b: Array[Byte], o: Int, le: Boolean): Long =
    if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  /** Byte size of one TIFF value of `type` (types 1..12; unknown → 1,
    * which under-reads rather than walking out of bounds). */
  private def tiffTypeSize(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1; case 3 | 8 => 2; case 4 | 9 | 11 => 4
    case 5 | 10 | 12 => 8; case _ => 1
  }

  /** Locate the EXIF APP1 segment of a JPEG: (payload offset of the
    * TIFF header, segment data length) — a marker walk, never a codec. */
  private def findExifTiff(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var o = 2
    while (o + 4 <= b.length && (b(o) & 0xff) == 0xff) {
      val marker = b(o + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / scan data
      val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      if (len < 2 || o + 2 + len > b.length) return None // corrupt length
      if (marker == 0xe1 && len >= 10 &&
          b(o + 4) == 'E' && b(o + 5) == 'x' && b(o + 6) == 'i' &&
          b(o + 7) == 'f' && b(o + 8) == 0 && b(o + 9) == 0)
        return Some((o + 10, len - 8)) // TIFF header starts after Exif\0\0
      o += 2 + len
    }
    None
  }

  /** Walk one IFD, returning (tag → (entryOffset, type, count,
    * valueOrOffset)) for its entries; offsets are TIFF-relative. */
  private def walkIfd(
      b: Array[Byte], tiff: Int, tiffLen: Int, ifdOff: Long, le: Boolean)
      : Seq[(Int, (Int, Int, Long, Long))] = {
    val base = tiff + ifdOff.toInt
    if (ifdOff < 0 || base + 2 > tiff + tiffLen || base + 2 > b.length)
      return Nil
    val n = u16(b, base, le)
    (0 until n).flatMap { i =>
      val e = base + 2 + i * 12
      if (e + 12 > b.length || e + 12 > tiff + tiffLen) None
      else Some((u16(b, e, le),
        (e, u16(b, e + 2, le), u32be(b, e + 4, le), u32be(b, e + 8, le))))
    }
  }

  private val TagOrientation = 0x0112
  private val TagDateTime = 0x0132
  private val TagGpsIfd = 0x8825

  /** ASCII value of a TIFF entry (inline when ≤ 4 bytes, else pointed). */
  private def asciiValue(
      b: Array[Byte], tiff: Int, tiffLen: Int, le: Boolean,
      entry: (Int, Int, Long, Long)): String = {
    val (eOff, tpe, count, vo) = entry
    if (tpe != 2 || count <= 0 || count > 64) return ""
    val at = if (count <= 4) eOff + 8 else tiff + vo.toInt
    if (at < 0 || at + count > b.length || at + count > tiff + tiffLen)
      return ""
    new String(b, at, count.toInt, "US-ASCII").takeWhile(_ != '\u0000')
  }

  /**
   * EXIF metadata walk — the [[parseMp4Moov]] container-walk pattern on
   * JPEG/TIFF: marker scan to the APP1 `Exif\0\0` segment, endian-aware
   * IFD0 walk for orientation and DateTime, GPS presence from the
   * 0x8825 GPS-IFD pointer (coordinates = location PII — the signal the
   * hygiene gate needs BEFORE any pixel work). Corrupt structures flag
   * `exif_ok = false`, never throw; a JPEG without APP1 is
   * `has_exif = false` with defaults.
   */
  def exifMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        try {
          findExifTiff(payload) match {
            case None => ExifMeta(id, has_exif = false, 0, "",
              gps_present = false, exif_ok = true)
            case Some((tiff, tiffLen)) =>
              val le = payload.length >= tiff + 4 &&
                payload(tiff) == 'I' && payload(tiff + 1) == 'I'
              val be = payload.length >= tiff + 4 &&
                payload(tiff) == 'M' && payload(tiff + 1) == 'M'
              if (!le && !be)
                ExifMeta(id, has_exif = true, 0, "", gps_present = false,
                  exif_ok = false)
              else {
                val ifd0 = u32be(payload, tiff + 4, le)
                val entries = walkIfd(payload, tiff, tiffLen, ifd0, le).toMap
                // inline values are LEFT-justified in the 4-byte value
                // field: a big-endian SHORT must be read as u16 at the
                // field start, not as the full u32 (which would yield
                // orientation·65536 on every MM-order camera JPEG)
                val orient = entries.get(TagOrientation)
                  .map { case (eOff, tpe, _, vo) =>
                    if (tpe == 3) u16(payload, eOff + 8, le) else vo.toInt
                  }.getOrElse(0)
                val dt = entries.get(TagDateTime)
                  .map(e => asciiValue(payload, tiff, tiffLen, le, e))
                  .getOrElse("")
                ExifMeta(id, has_exif = true, orient, dt,
                  gps_present = entries.contains(TagGpsIfd), exif_ok = true)
              }
          }
        } catch {
          case _: Exception =>
            ExifMeta(id, has_exif = true, 0, "", gps_present = false,
              exif_ok = false)
        }
      })
      .toDF()
  }

  /**
   * GPS-PII strip: ZERO the GPS data IN PLACE — every GPS-IFD entry's
   * inline value and pointed value region overwrites with zeros, then
   * the GPS-IFD pointer tag in IFD0 rewrites to 0xFFFF (an unknown tag
   * readers skip). Nothing reflows, so every other TIFF offset stays
   * valid and the payload length is unchanged — the same in-place
   * discipline as the WKT shift in the reference's cleanser (structure
   * preserved, values corrected). Non-JPEG / EXIF-less / corrupt
   * payloads pass through byte-identical. Emits (id, payload).
   */
  def stripExifGps(
      df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val out = try {
          findExifTiff(payload) match {
            case None => payload
            case Some((tiff, tiffLen)) =>
              val le = payload.length >= tiff + 4 &&
                payload(tiff) == 'I' && payload(tiff + 1) == 'I'
              val be = payload.length >= tiff + 4 &&
                payload(tiff) == 'M' && payload(tiff + 1) == 'M'
              if (!le && !be) payload
              else {
                val ifd0 = u32be(payload, tiff + 4, le)
                val entries = walkIfd(payload, tiff, tiffLen, ifd0, le)
                entries.find(_._1 == TagGpsIfd) match {
                  case None => payload
                  case Some((_, (eOff, _, _, gpsOff))) =>
                    val b = payload.clone()
                    for ((_, (ge, gt, gc, gvo)) <-
                        walkIfd(b, tiff, tiffLen, gpsOff, le)) {
                      val n = gc * tiffTypeSize(gt)
                      // zero the value, inline or pointed
                      val at = if (n <= 4) ge + 8 else tiff + gvo.toInt
                      var i = 0
                      while (i < n && at + i < b.length &&
                          at + i < tiff + tiffLen) {
                        b(at + i) = 0; i += 1
                      }
                      // zero the entry itself (tag/type/count/value)
                      var j = 0
                      while (j < 12) { b(ge + j) = 0; j += 1 }
                    }
                    // retag the pointer so readers stop resolving it
                    // (0xFFFF is the same two bytes in either byte order)
                    b(eOff) = 0xff.toByte; b(eOff + 1) = 0xff.toByte
                    b
                }
              }
          }
        } catch { case _: Exception => payload }
        (id, out)
      })
      .toDF(idCol, payloadCol)
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

  final case class VideoMeta(
      id: Long, mime: String, width_px: Int, height_px: Int,
      n_tracks: Int, duration_ms: Long, n_bytes: Long, decode_ok: Boolean)

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** ISO BMFF box header at `p` bounded by `end`: (bodyStart, boxSize), or
    * None if malformed/truncated. size==1 reads the 64-bit largesize;
    * size==0 means "to end of enclosing box". */
  private def boxHeader(
      b: Array[Byte], p: Int, end: Int): Option[(Int, Long)] = {
    if (p + 8 > end) return None
    val size = u32(b, p)
    val (bodyStart, boxSize) =
      if (size == 1L) {
        if (p + 16 > end) return None
        (p + 16, u64(b, p + 8))
      } else if (size == 0L) (p + 8, (end - p).toLong)
      else (p + 8, size)
    if (boxSize < (bodyStart - p).toLong || p + boxSize > end) None
    else Some((bodyStart, boxSize))
  }

  /** Walk an MP4 payload's `moov` atom: (width_px, height_px, n_tracks,
    * duration_ms) from `mvhd` (movie timescale + duration, v0 and v1
    * layouts) and each `trak`'s `tkhd` (16.16 fixed-point presentation
    * dims; the movie dims are the max over tracks — audio tracks carry
    * 0×0). Pure structural parse of the container INDEX — no codec, no
    * sample data read — which is exactly the metadata pass shape:
    * bytes-scanned cost, never pixels-decoded. */
  private[graft] def parseMp4Moov(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    // top level: find moov
    var p = 0
    var moov = -1
    var moovEnd = -1
    while (p + 8 <= b.length && moov < 0) {
      boxHeader(b, p, b.length) match {
        case None => return None
        case Some((bs, sz)) =>
          if (boxType(b, p) == "moov") { moov = bs; moovEnd = p + sz.toInt }
          p += sz.toInt
      }
    }
    if (moov < 0) return None
    var q = moov
    var timescale = 0L
    var duration = -1L
    var tracks = 0
    var w = 0
    var h = 0
    while (q + 8 <= moovEnd) {
      boxHeader(b, q, moovEnd) match {
        case None => return None
        case Some((bs, sz)) =>
          val bodyLen = (q + sz).toInt - bs
          boxType(b, q) match {
            case "mvhd" =>
              // field reads are bounded by the box's DECLARED body size —
              // an undersized mvhd is a corrupt container, not license to
              // read the next box's bytes as timescale/duration
              val ver = b(bs) & 0xff
              if (ver == 1) {
                if (bodyLen < 32) return None
                timescale = u32(b, bs + 20); duration = u64(b, bs + 24)
              } else {
                if (bodyLen < 20) return None
                timescale = u32(b, bs + 12); duration = u32(b, bs + 16)
              }
            case "trak" =>
              tracks += 1
              val te = q + sz.toInt
              var r = bs
              while (r + 8 <= te) {
                boxHeader(b, r, te) match {
                  case None => return None
                  case Some((cbs, csz)) =>
                    if (boxType(b, r) == "tkhd") {
                      val off = if ((b(cbs) & 0xff) == 1) 88 else 76
                      if ((r + csz).toInt - cbs < off + 8) return None
                      val tw = (u32(b, cbs + off) >> 16).toInt
                      val th = (u32(b, cbs + off + 4) >> 16).toInt
                      if (tw > w) w = tw
                      if (th > h) h = th
                    }
                    r += csz.toInt
                }
              }
            case _ => ()
          }
          q += sz.toInt
      }
    }
    // an adversarial 64-bit duration must not overflow into a negative
    // "successful" duration_ms
    if (timescale <= 0 || duration < 0 || duration > Long.MaxValue / 1000L) None
    else Some((w, h, tracks, duration * 1000L / timescale))
  }

  /**
   * REAL partition-level batch video CONTAINER decode: an ISO BMFF (MP4)
   * `moov` atom walk inside `mapPartitions` — movie dimensions (max over
   * `tkhd` presentation sizes), track count, and duration from the `mvhd`
   * timescale — closing the third modality the way [[decodeAudioMeta]]
   * closed audio: real bytes, real structure, no codec (this JDK ships no
   * video codec, and a metadata pass needs none — the container INDEX
   * carries everything downstream planning uses). Payloads without a
   * well-formed `moov`/`mvhd` (or with boxes overrunning their parent)
   * flag `decode_ok = false`: corrupt crawl bytes are data, not
   * exceptions.
   */
  def decodeVideoMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val mime =
            if (payload.length >= 12 && payload(4) == 'f' && payload(5) == 't'
              && payload(6) == 'y' && payload(7) == 'p') "video/mp4"
            else "application/octet-stream"
          val parsed =
            try parseMp4Moov(payload)
            catch { case _: Exception => None }
          parsed match {
            case Some((w, h, tracks, durMs)) =>
              VideoMeta(id, mime, w, h, tracks, durMs,
                payload.length.toLong, decode_ok = true)
            case None =>
              VideoMeta(id, mime, 0, 0, 0, 0L,
                payload.length.toLong, decode_ok = false)
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

  /**
   * Interleaved image-text document assembly — the MMC4/OBELICS layout
   * multimodal pretraining consumes (Zhu et al. 2023; Laurençon et al.
   * 2023): a page becomes an ORDERED sequence of text spans and image
   * slots. `<img src=…>` positions substitute to sentinels BEFORE text
   * extraction (so the slots survive block splitting in document
   * order), the extracted text splits on them, and each image slot
   * left-joins the binary SIDECAR table on (page, src) — payload
   * presence rides as a flag, payload bytes never join for this
   * metadata pass (fetch them per slot when training shards
   * materialize). Images that failed to fetch keep their slot with
   * `has_payload = false`: the sequence SHAPE is the training
   * contract, not the fetch success; `src`-less `<img>` tags drop.
   *
   * Output: (idCol, seq, kind ∈ text|image, text, image_src,
   * has_payload), `seq` the document-order ordinal (gaps where empty
   * text spans dropped). One map-side extraction + posexplode + one
   * equi-join of the image SLOTS only against the sidecar.
   */
  def interleave(
      pages: DataFrame, idCol: String, htmlCol: String,
      images: DataFrame, imgIdCol: String, srcCol: String,
      payloadCol: String): DataFrame = {
    val S = "\u0000"
    // crawled HTML can carry stray NUL bytes — strip them BEFORE they
    // can alias the slot sentinel and flip the text/image parity; and
    // src must sit at an ATTRIBUTE boundary (the AnchorOpen rule), or
    // a lazy-loader's data-src placeholder captures as the slot
    val noNul = regexp_replace(col(htmlCol), S, " ")
    val withSlots = regexp_replace(noNul,
      "(?is)<img\\s(?:[^>]*?\\s)?src\\s*=\\s*[\"']([^\"'>]*)[\"'][^>]*>",
      s"$S$$1$S")
    val cleaned = regexp_replace(withSlots, "(?is)<img\\b[^>]*>", " ")
    val segs = split(
      graft.functions.HtmlOps.htmlToText(cleaned), S, -1)
    val rows = pages
      .select(col(idCol), posexplode(segs).as(Seq("seq", "__seg")))
      .select(col(idCol), col("seq").cast("long").as("seq"),
        when(pmod(col("seq"), lit(2)) === 1, lit("image"))
          .otherwise(lit("text")).as("kind"),
        trim(col("__seg")).as("__t"))
      .where(col("kind") === "image" || col("__t") =!= "")
    val slots = images
      .select(col(imgIdCol).as(idCol), col(srcCol).as("__src"),
        col(payloadCol).isNotNull.as("__has"))
      // one sidecar row per (page, src) however the fetcher logged
      // retries — a duplicate would duplicate the SLOT row after join
      .groupBy(col(idCol), col("__src"))
      .agg(max(col("__has")).as("__has"))
    rows.join(slots,
        rows(idCol) === slots(idCol) &&
          col("kind") === "image" && col("__t") === col("__src"),
        "left")
      .select(rows(idCol), col("seq"), col("kind"),
        when(col("kind") === "text", col("__t")).as("text"),
        when(col("kind") === "image", col("__t")).as("image_src"),
        when(col("kind") === "image", coalesce(col("__has"), lit(false)))
          .as("has_payload"))
  }

  // =====================================================================
  // Multimodal TRAINING SHARDS — the terminal artifact of the
  // interleaved arm: [[interleave]]'s sequences materialized as packed
  // int32 token records ([[TrainShards]] layout, image slots a sentinel
  // token) plus a content-addressed payload sidecar, both read back by
  // positioned reads — the `fetchSpans` posture applied to the training
  // side. Reference analogue: the final-table publish step
  // (`sql/02-bde_control_functions.sql.in:1949-1973`) — staged work
  // becomes the artifact consumers read, here for the multimodal arm.
  // =====================================================================

  /** Sentinel token marking an image slot in a tokenized interleaved
    * stream — outside the token-hash range ([[graft.functions.TextOps]]
    * hashes are < TokenMod < 2²⁰), so no text token can alias it. */
  val ImageSlotToken: Int = 1 << 20

  /** One [[interleave]] row as its token rendering: text spans hash to
    * int tokens, image slots to the sentinel. */
  private def rowToks =
    when(col("kind") === "image", array(lit(ImageSlotToken)))
      .otherwise(transform(
        graft.functions.TextOps.tokenHashes(
          graft.functions.TextOps.tokens(col("text"))),
        t => t.cast("int")))

  /** Per-page assembly from ONE aggregate over ONE tokenization pass:
    * (idCol, toks — the page's full stream, slots — the image slots'
    * (off, src) in-page addresses). Both outputs fold over the same
    * sorted per-page row array, so text spans tokenize exactly once;
    * page length bounds the aggregate's state (the per-document
    * convention). */
  private def pageAssembly(inter: DataFrame, idCol: String): DataFrame = {
    val sorted = array_sort(col("__rows"))
    val zero = struct(lit(0).as("n"),
      array().cast("array<struct<off:int,src:string>>").as("slots"))
    val folded = aggregate(sorted, zero, (acc, e) =>
      struct(
        (acc.getField("n") + size(e.getField("__t"))).as("n"),
        when(e.getField("kind") === "image",
          array_append(acc.getField("slots"),
            struct(acc.getField("n").as("off"),
              e.getField("image_src").as("src"))))
          .otherwise(acc.getField("slots")).as("slots")))
    inter
      .select(col(idCol), col("seq"), col("kind"), col("image_src"),
        rowToks.as("__t"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("seq"), col("kind"), col("image_src"),
        col("__t"))).as("__rows"))
      .select(col(idCol),
        flatten(transform(sorted, e => e.getField("__t"))).as("toks"),
        folded.getField("slots").as("slots"))
  }

  /** (idCol, toks): each page's interleaved stream as ONE int array —
    * text spans tokenized, image slots the sentinel — in document
    * order. */
  def interleavedPageTokens(inter: DataFrame, idCol: String): DataFrame =
    pageAssembly(inter, idCol).select(col(idCol), col("toks"))

  /** (idCol, in_page_pos, image_src): each image slot's token offset
    * within its page's stream. */
  def interleavedSlotOffsets(inter: DataFrame, idCol: String): DataFrame =
    pageAssembly(inter, idCol)
      .select(col(idCol), explode(col("slots")).as("__sl"))
      .select(col(idCol), col("__sl.off").cast("long").as("in_page_pos"),
        col("__sl.src").as("image_src"))

  /**
   * Content-addressed payload sidecar: every DISTINCT payload (by
   * sha-256) written ONCE as a blob span in a sidecar shard file —
   * identical images across a corpus (logos, spacers, re-hosted memes —
   * the common crawl case) store once however many slots reference
   * them. Returns the index (digest, payload_file, payload_offset,
   * payload_length): any slot's bytes are one positioned read. Same
   * attempt-unique staging + rename commit as
   * [[TrainShards.writeTokenShards]].
   */
  def writePayloadSidecar(
      images: DataFrame, payloadCol: String, outDir: String,
      numShards: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    require(numShards > 0, "writePayloadSidecar: numShards must be positive")
    val conf = spark.sparkContext.broadcast(
      new graft.sources.Warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    images
      .where(col(payloadCol).isNotNull)
      .select(sha2(col(payloadCol), 256).as("digest"),
        col(payloadCol).cast("binary").as("__p"))
      // rows sharing a digest carry identical bytes — any witness works
      .groupBy(col("digest")).agg(first(col("__p")).as("__p"))
      .as[(String, Array[Byte])]
      .repartition(numShards, col("digest"))
      .sortWithinPartitions(col("digest"))
      .mapPartitions { iter =>
        if (iter.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val name = f"payloads-${tc.partitionId()}%05d.bin"
          val dest = new org.apache.hadoop.fs.Path(outDir, name)
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            s"$name.inprogress-${tc.taskAttemptId()}")
          val fs = dest.getFileSystem(conf.value.value)
          val out = fs.create(tmp, true)
          val rows =
            scala.collection.mutable.ArrayBuffer.empty[(String, String, Long, Long)]
          var off = 0L
          try {
            iter.foreach { case (digest, bytes) =>
              out.write(bytes)
              rows += ((digest, dest.toString, off, bytes.length.toLong))
              off += bytes.length
            }
          } finally out.close()
          if (fs.exists(dest)) fs.delete(dest, false)
          fs.rename(tmp, dest)
          rows.iterator
        }
      }
      .toDF("digest", "payload_file", "payload_offset", "payload_length")
      .localCheckpoint(true) // eager: blobs exist when this returns
  }

  /** Positioned readback of sidecar spans: one open stream per blob file
    * per task, spans read in ascending offset order (the fetchSpans
    * shape) — sampling 10 images from a million-payload sidecar touches
    * 10 spans, never a blob scan. Returns (digest, payload). */
  def readPayloadSpans(spark: SparkSession, index: DataFrame): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new graft.sources.Warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    index
      .select(col("digest"), col("payload_file"), col("payload_offset"),
        col("payload_length"))
      .as[(String, String, Long, Long)]
      .repartition(col("payload_file"))
      .sortWithinPartitions(col("payload_file"), col("payload_offset"))
      .mapPartitions { iter =>
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def close(): Unit = if (in != null) { in.close(); in = null }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close()))
        iter.map { case (digest, file, off, len) =>
          if (file != curFile) {
            close()
            val p = new org.apache.hadoop.fs.Path(file)
            in = p.getFileSystem(conf.value.value).open(p)
            curFile = file
          }
          val buf = new Array[Byte](len.toInt)
          in.readFully(off, buf)
          (digest, buf)
        }
      }
      .toDF("digest", "payload")
  }

  /**
   * Materialize an interleaved corpus as TRAINING SHARDS — the terminal
   * multimodal artifact:
   *
   *  1. token records: each page's stream (text tokens + sentinel image
   *     slots) packed into `seqLen` int32-LE records per
   *     [[TrainShards.assembleSequences]] / `writeTokenShards` (docs
   *     end-to-end per group, straddlers split, partial tails dropped);
   *  2. slot references: every image slot's address IN the packed
   *     layout — (group, seq_id, slot_pos) — with its page, src, and
   *     payload digest (null digest = fetch failed; the slot row
   *     remains, the sequence SHAPE being the training contract);
   *     slots landing in a dropped partial tail drop with it;
   *  3. payload sidecar: [[writePayloadSidecar]] over the image table —
   *     content-addressed, positioned-read blobs.
   *
   * Returns (tokenIndex, slotRefs, payloadIndex). A training loader
   * reads a record by its index row, finds its slots by (group,
   * seq_id), and fetches bytes by digest through the sidecar index —
   * three positioned reads, zero corpus scans. Slot addresses come from
   * the SAME `packSequences` layout the assembler used, so slot_pos
   * always lands on a sentinel token in the written record (pinned by
   * the roundtrip oracle and the property spec).
   */
  def writeInterleavedShards(
      inter: DataFrame, idCol: String, groupOf: org.apache.spark.sql.Column,
      images: DataFrame, imgIdCol: String, srcCol: String,
      payloadCol: String, outDir: String, seqLen: Int,
      numShards: Int): (DataFrame, DataFrame, DataFrame) = {
    // cached: the assembly (the expensive tokenize + per-page aggregate)
    // feeds the packed layout, the record writer, AND the slot table —
    // released when the caller's first action over the slot refs runs
    // (the CacheScope convention)
    val asm = pageAssembly(inter, idCol).withColumn("__grp", groupOf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE packSequences layout, shared by the assembler and the slot
    // addressing — never computed twice from the same inputs
    val packed = Sampling.packSequences(
        asm.withColumn("__n", size(col("toks"))).where(col("__n") > 0),
        "__grp", idCol, "__n", seqLen.toLong)
      .withColumn("__start", col("seq_id") * seqLen + col("tok_offset"))
    val seqs = TrainShards.assemblePacked(packed, "__grp", "toks", seqLen)
    val tokenIndex = TrainShards.writeTokenShards(
      seqs, "__grp", s"$outDir/tokens", seqLen, numShards)
    val digests = images
      .select(col(imgIdCol).as(idCol), col(srcCol).as("image_src"),
        sha2(col(payloadCol).cast("binary"), 256).as("digest"))
      // one row per (page, src) however the fetcher logged retries —
      // the interleave() sidecar rule; max keeps a successful fetch's
      // digest over a failed retry's null
      .groupBy(col(idCol), col("image_src"))
      .agg(max(col("digest")).as("digest"))
    val slotRefs = asm
      .select(col(idCol), col("__grp"), explode(col("slots")).as("__sl"))
      .select(col(idCol), col("__grp"),
        col("__sl.off").cast("long").as("in_page_pos"),
        col("__sl.src").as("image_src"))
      .join(packed.select(col(idCol), col("__start").as("__p0")), Seq(idCol))
      .select(col(idCol), col("__grp").as("group"),
        expr(s"(__p0 + in_page_pos) div ${seqLen}L").as("seq_id"),
        expr(s"(__p0 + in_page_pos) % ${seqLen}L").cast("int").as("slot_pos"),
        col("image_src"))
      // a slot in the group's dropped partial tail drops with it
      .join(tokenIndex.select(col("group"), col("seq_id")),
        Seq("group", "seq_id"), "left_semi")
      .join(digests, Seq(idCol, "image_src"), "left")
      .select(col("group"), col("seq_id"), col("slot_pos"), col(idCol),
        col("image_src"), col("digest"))
    val payloadIndex = writePayloadSidecar(
      images.select(col(payloadCol)), payloadCol,
      s"$outDir/payloads", numShards)
    (tokenIndex, CacheScope.unpersistAfterAction(slotRefs, Seq(asm)),
      payloadIndex)
  }
}
