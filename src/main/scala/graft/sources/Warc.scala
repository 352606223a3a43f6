package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC (Web ARChive, ISO 28500) reader — the format crawl corpora
 * actually arrive in, and therefore the natural ingest head of the
 * curation pipeline (reference analogue: the BDE upload files are the
 * same idea for cadastral data — a dumb at-rest record format whose
 * reader is the pipeline's front door, `lib/LINZ/Bde.pm:192-340`).
 *
 * Layout facts the design leans on (all public, Common Crawl's layout):
 *
 *  - a crawl snapshot is tens of thousands of ~1 GB `.warc.gz` shards —
 *    FILE-level parallelism is the partitioning, which is exactly what
 *    `binaryFile` gives (one file = one task; gzip is not splittable,
 *    and record-level splits of the raw format would need a resync scan
 *    that can false-positive on payload bytes — "WARC/1.0" inside an
 *    archived page is data, not a record boundary; Content-Length is the
 *    only honest record delimiter);
 *  - each record is its OWN gzip member (the CC convention), so a shard
 *    decompresses as one concatenated stream — `GZIPInputStream` walks
 *    multi-member input natively and the parse stays streaming: at no
 *    point is more than one record's payload buffered;
 *  - record offsets are provenance: (file, offset) is how the public CC
 *    index addresses individual captures, so the reader carries both.
 *
 * Corrupt input is data, not an exception (the [[graft.operators.Multimodal]]
 * rule): a malformed record yields one `parse_ok = false` row for the
 * file's unparseable tail and the parse stops there — Content-Length
 * framing has no trustworthy resync once violated.
 *
 * `binaryFile` holds one file in memory per task (Spark's 2 GB column
 * ceiling); the ~1 GB shard convention sits comfortably under it, and a
 * corpus with bigger shards re-shards once at ingest.
 */
object Warc {

  /** `stored_offset`/`stored_length` are the record's AT-REST byte span in
    * its shard — the compressed gzip-member span for `.warc.gz` input (the
    * public CDX convention: compressed offset + length is what makes a
    * capture one ranged read instead of an archive scan), the raw record
    * span for plain input. `rec_offset` stays the DECOMPRESSED-stream
    * offset (the address a sequential reader walks). */
  final case class WarcRecord(
      warc_file: String,
      rec_offset: Long,
      rec_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte],
      parse_ok: Boolean,
      stored_offset: Long,
      stored_length: Long)

  private[sources] def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Byte-counting wrapper: record offsets must refer to the stream the
    * parse actually walks (for `.warc.gz` that is the DECOMPRESSED
    * stream — per-member compressed offsets belong to an index builder,
    * not a sequential reader). */
  private final class Counting(in: java.io.InputStream)
      extends java.io.FilterInputStream(in) {
    var count: Long = 0L
    override def read(): Int = {
      val b = super.read(); if (b >= 0) count += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = super.read(b, off, len); if (n > 0) count += n; n
    }
  }

  /** One header/version line, CRLF- or LF-terminated (the spec says CRLF;
    * tolerate bare LF the way every deployed reader does). None = EOF. */
  private def readLine(in: java.io.InputStream): Option[String] = {
    val sb = new java.lang.StringBuilder
    var c = in.read()
    if (c < 0) return None
    while (c >= 0 && c != '\n') {
      if (c != '\r') sb.append(c.toChar)
      c = in.read()
    }
    Some(sb.toString)
  }

  private def readFully(
      in: java.io.InputStream, n: Long): Option[Array[Byte]] = {
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      if (r < 0) return None
      off += r
    }
    Some(buf)
  }

  /** Streaming record parse: header block (version line + name: value
    * lines to a blank line), exactly Content-Length payload bytes, then
    * the two record-separator CRLFs. Stops at EOF or the first framing
    * violation (flagged row). */
  private[sources] def parseStream(
      file: String, raw: java.io.InputStream): Iterator[WarcRecord] = {
    val in = new Counting(new java.io.BufferedInputStream(raw))
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = _
      private var done = false
      private def bad(offset: Long): WarcRecord =
        WarcRecord(file, offset, "", null, null, null, -1L,
          Array.emptyByteArray, parse_ok = false, offset, 0L)
      private def advance(): Unit = {
        if (done) return
        // skip the record separator / any stray blank lines; the record
        // offset is the stream position BEFORE its version line — exact
        // by construction whatever the line terminator (CRLF or the
        // tolerated bare LF) or header byte width
        var before = in.count
        var line: Option[String] = readLine(in)
        while (line.exists(_.isEmpty)) { before = in.count; line = readLine(in) }
        val offset = before
        line match {
          case None => done = true
          case Some(v) if !v.startsWith("WARC/") =>
            nextRec = bad(offset); done = true
          case Some(_) =>
            val headers = scala.collection.mutable.Map.empty[String, String]
            var h = readLine(in)
            while (h.exists(_.nonEmpty)) {
              val s = h.get
              val i = s.indexOf(':')
              if (i > 0)
                headers(s.substring(0, i).trim.toLowerCase) =
                  s.substring(i + 1).trim
              h = readLine(in)
            }
            // a declared length outside [0, 2 GiB) is a framing violation
            // (binaryFile itself caps a file at 2 GiB) — flag, don't throw
            val len = headers.get("content-length").flatMap(_.toLongOption)
            len.filter(l => l >= 0 && l < Int.MaxValue)
              .flatMap(readFully(in, _)) match {
              case None => nextRec = bad(offset); done = true
              case Some(payload) =>
                // stored span: through the payload plus the two record-
                // separator CRLFs (may overrun a separator-less EOF by ≤4
                // bytes — a ranged re-read just gets a shorter tail, and
                // the payload is complete, so the re-parse still lands)
                nextRec = WarcRecord(file, offset,
                  headers.getOrElse("warc-type", ""),
                  headers.getOrElse("warc-target-uri", null),
                  headers.getOrElse("warc-date", null),
                  headers.getOrElse("content-type", null),
                  payload.length.toLong, payload, parse_ok = true,
                  offset, in.count - offset + 4L)
            }
        }
      }
      override def hasNext: Boolean = {
        if (nextRec == null && !done) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec; nextRec = null; r
      }
    }
  }

  /**
   * Read every WARC record under `path` (plain or `.gz`, auto-sniffed by
   * magic bytes — extensions lie on real crawls). One task per file; the
   * payload travels as an opaque `binary` column, so metadata-only
   * consumers (type/URI filters, dedup on URI, per-shard accounting)
   * never pay decode or payload shuffle — the Multimodal column rule.
   */
  /** One decoded gzip member: its compressed span in the shard and its
    * decompressed bytes. `None` = corrupt member (bad header, deflate
    * error, truncation, CRC/ISIZE mismatch) — the caller flags and stops,
    * the same no-trustworthy-resync rule as a Content-Length violation. */
  private final class GzipMembers(bytes: Array[Byte])
      extends Iterator[Option[(Long, Long, Array[Byte])]] {
    private var pos = 0
    private var dead = false
    override def hasNext: Boolean = !dead && pos < bytes.length
    override def next(): Option[(Long, Long, Array[Byte])] = {
      val start = pos
      val d = dataStart(start)
      if (d < 0) { dead = true; return None }
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, d, bytes.length - d)
      val out = new java.io.ByteArrayOutputStream(64 * 1024)
      val buf = new Array[Byte](64 * 1024)
      try {
        while (!inf.finished()) {
          val n =
            try inf.inflate(buf)
            catch { case _: java.util.zip.DataFormatException =>
              dead = true; return None }
          if (n > 0) out.write(buf, 0, n)
          else if (inf.needsInput()) { dead = true; return None } // truncated
        }
        val end = d + inf.getBytesRead.toInt + 8 // + CRC32 + ISIZE trailer
        if (end > bytes.length) { dead = true; return None }
        val data = out.toByteArray
        val crc = new java.util.zip.CRC32(); crc.update(data)
        if (le32(d + inf.getBytesRead.toInt) != (crc.getValue & 0xffffffffL) ||
          le32(d + inf.getBytesRead.toInt + 4) != (data.length & 0xffffffffL)) {
          dead = true; return None
        }
        pos = end
        Some((start.toLong, (end - start).toLong, data))
      } finally inf.end()
    }
    private def le32(i: Int): Long =
      if (i + 4 > bytes.length) -1L
      else (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    /** Offset of the deflate stream inside the member at `p`, or -1. */
    private def dataStart(p: Int): Int = {
      if (p + 10 > bytes.length || (bytes(p) & 0xff) != 0x1f ||
        (bytes(p + 1) & 0xff) != 0x8b || bytes(p + 2) != 8) return -1
      val flg = bytes(p + 3) & 0xff
      var i = p + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (i + 2 > bytes.length) return -1
        i += 2 + ((bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { // FNAME
        while (i < bytes.length && bytes(i) != 0) i += 1
        i += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (i < bytes.length && bytes(i) != 0) i += 1
        i += 1
      }
      if ((flg & 2) != 0) i += 2 // FHCRC
      if (i >= bytes.length) -1 else i
    }
  }

  /** Parse one shard's bytes (plain or gzip, sniffed) — the per-file unit
    * [[readRecords]] distributes, also the batch body of the streaming
    * ingest door ([[graft.streaming.Streams]]). Gzip shards walk one
    * MEMBER at a time (never more than one record's payload in memory),
    * recording each member's compressed span as the records' stored span
    * — how [[fetchCaptures]] re-reads a capture without the shard — and
    * a corrupt member (bad header/deflate/CRC) flags a `parse_ok=false`
    * tail instead of throwing, same as a Content-Length violation. */
  def parseShard(file: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    if (!isGzip(bytes))
      return parseStream(file, new java.io.ByteArrayInputStream(bytes))
    val members = new GzipMembers(bytes)
    var decompBase = 0L
    val raw = members.flatMap {
      case None =>
        Iterator.single(WarcRecord(file, decompBase, "", null, null, null,
          -1L, Array.emptyByteArray, parse_ok = false, decompBase, 0L))
      case Some((mOff, mLen, data)) =>
        val base = decompBase
        decompBase += data.length
        parseStream(file, new java.io.ByteArrayInputStream(data)).map { r =>
          r.copy(rec_offset = r.rec_offset + base, stored_offset = mOff,
            stored_length = if (r.parse_ok) mLen else 0L)
        }
    }
    // one flagged row then stop — a framing violation inside a member has
    // no trustworthy resync either (the stream rule, member-aware)
    new Iterator[WarcRecord] {
      private var emittedBad = false
      override def hasNext: Boolean = !emittedBad && raw.hasNext
      override def next(): WarcRecord = {
        val r = raw.next()
        if (!r.parse_ok) emittedBad = true
        r
      }
    }
  }

  def readRecords(spark: SparkSession, path: String): DataFrame =
    readRecords(spark, Seq(path))

  /** Multi-path variant — pass explicit shard files instead of a brace
    * glob (Spark's `FileStreamSink.hasMetadata` probe logs a caught
    * FileNotFoundException stack for glob paths on every read, noising
    * gate logs). */
  def readRecords(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseShard(p, bytes) }
      .toDF()
  }

  /** The HTTP response payloads' bodies: drops each `response` record's
    * HTTP header block (everything through the first blank line — the
    * WARC payload of a response record IS the raw HTTP message) and
    * decodes the remainder as UTF-8 text. Pure column expressions — the
    * split is one `instr`/`substr` over the binary, no UDF. For bodies
    * behind `Transfer-Encoding: chunked` / `Content-Encoding: gzip`
    * (most real response captures) use [[httpResponses]], which undoes
    * both — this projection reads the wire bytes as-is. */
  def httpBodyText(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = payload.cast("string")
    val sep = instr(s, "\r\n\r\n")
    when(sep > 0, substring(s, (sep + lit(4)).cast("int"), lit(Int.MaxValue)))
      .otherwise(s)
  }

  /** One decoded HTTP response message: status, entity Content-Type,
    * the body after undoing the wire encodings, and whether every
    * decode step succeeded ([[parseHttpResponse]]). */
  final case class HttpBody(
      http_status: Int,
      http_content_type: String,
      body: Array[Byte],
      decode_ok: Boolean)

  private def indexOfCrlfCrlf(b: Array[Byte]): (Int, Int) = {
    // returns (bodyStart, headerEnd); tolerates bare-LF header framing
    var i = 0
    while (i + 1 < b.length) {
      if (b(i) == '\n') {
        if (b(i + 1) == '\n') return (i + 2, i)
        if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n')
          return (i + 3, i)
      }
      i += 1
    }
    (-1, -1)
  }

  /** RFC 9112 §7.1 chunked decoding: hex-size line (chunk extensions
    * after `;` ignored), that many bytes, CRLF; the 0-size chunk ends
    * the body (trailer fields ignored). None = malformed framing —
    * the caller keeps the raw bytes and flags. */
  private[sources] def dechunk(b: Array[Byte], from: Int): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(math.max(b.length - from, 16))
    var i = from
    while (true) {
      var eol = i
      while (eol < b.length && b(eol) != '\n') eol += 1
      if (eol >= b.length) return None
      val line = new String(b, i, eol - i,
        java.nio.charset.StandardCharsets.US_ASCII).trim
      val semi = line.indexOf(';')
      val hex = (if (semi >= 0) line.substring(0, semi) else line).trim
      val size =
        try java.lang.Long.parseLong(hex, 16)
        catch { case _: NumberFormatException => return None }
      i = eol + 1
      if (size == 0L) return Some(out.toByteArray)
      // a negative hex size ("-1") is malformed framing, not an
      // exception: it would pass the overrun guard and crash the write
      if (size < 0L || size > b.length - i) return None
      out.write(b, i, size.toInt)
      i += size.toInt
      // the chunk-data CRLF (tolerate bare LF)
      if (i < b.length && b(i) == '\r') i += 1
      if (i >= b.length || b(i) != '\n') return None
      i += 1
    }
    None // unreachable
  }

  private[sources] def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(math.max(b.length * 4, 64))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }

  /**
   * Parse one `response` record's payload as an HTTP message and undo
   * the wire encodings real captures carry: `Transfer-Encoding:
   * chunked` de-frames first (chunking wraps the transfer), then
   * `Content-Encoding: gzip`/`x-gzip` inflates the entity —
   * `identity`/absent passes through. Anything that fails to decode —
   * no status line, malformed chunk framing, a broken gzip stream, or
   * an encoding outside the stated subset (deflate/br/zstd) — keeps
   * the bytes as far as they decoded and flags `decode_ok = false`
   * (corrupt input is data, the file-reader rule).
   */
  def parseHttpResponse(payload: Array[Byte]): HttpBody = {
    val (bodyStart, headerEnd) = indexOfCrlfCrlf(payload)
    val headText =
      if (headerEnd < 0) ""
      else new String(payload, 0, headerEnd,
        java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = headText.split("\r?\n")
    val status =
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val m = "^HTTP/\\S+\\s+(\\d{3})".r.findFirstMatchIn(lines(0))
        m.map(_.group(1).toInt).getOrElse(-1)
      } else -1
    if (bodyStart < 0 || status < 0)
      return HttpBody(-1, null, payload, decode_ok = false)
    val headers = scala.collection.mutable.Map.empty[String, String]
    lines.iterator.drop(1).foreach { s =>
      val i = s.indexOf(':')
      if (i > 0) headers(s.substring(0, i).trim.toLowerCase) =
        s.substring(i + 1).trim
    }
    val wire = java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)
    val chunked = headers.get("transfer-encoding")
      .exists(_.split(",").lastOption.exists(_.trim.equalsIgnoreCase("chunked")))
    val (deframed, okT) =
      if (!chunked) (wire, true)
      else dechunk(payload, bodyStart) match {
        case Some(d) => (d, true)
        case None => (wire, false)
      }
    val enc = headers.get("content-encoding").map(_.trim.toLowerCase)
    val (body, okC) = enc match {
      case Some("gzip") | Some("x-gzip") =>
        gunzip(deframed) match {
          case Some(d) => (d, true)
          case None => (deframed, false)
        }
      case Some("identity") | None => (deframed, true)
      case Some(_) => (deframed, false) // outside the stated subset
    }
    HttpBody(status, headers.getOrElse("content-type", null), body,
      okT && okC)
  }

  /** Decoded response bodies as a DataFrame operator: (keyCol [cast to
    * string], http_status, http_content_type, body_text, decode_ok) —
    * the decode runs per row in the map task holding the payload
    * (imperative byte work: chunk framing and inflate cannot be column
    * expressions), so bodies never shuffle encoded. */
  def httpResponses(
      df: DataFrame, keyCol: String, payloadCol: String): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string"), col(payloadCol))
      .as[(String, Array[Byte])]
      .map { case (k, p) =>
        val h = parseHttpResponse(p)
        (k, h.http_status, h.http_content_type,
          new String(h.body, java.nio.charset.StandardCharsets.UTF_8),
          h.decode_ok)
      }
      .toDF(keyCol, "http_status", "http_content_type", "body_text",
        "decode_ok")
  }

  // ---- the crawl INDEX: CDX-style capture lookup, persisted at rest ----

  /** SURT (Sort-friendly URI Reordering Transform — the public CDX index
    * key convention): host labels reversed and comma-joined, `:port`
    * when an explicit non-default port survives canonicalization (the
    * public convention keeps it — captures of one host on different
    * ports must not alias to one key), `)` then the path+query, over
    * the CANONICAL url — so all of a registered domain's captures sort
    * (and bucket) together. Pure column expressions. */
  def surtKey(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val canon = graft.functions.UrlOps.normalizeUrl(url)
    val host = regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    // normalizeUrl already drops the scheme-default :80/:443, so any
    // port still present here is a distinguishing non-default one
    val port = regexp_extract(canon, "^[a-z][a-z0-9+.-]*://[^/:?#]+:(\\d+)", 1)
    val rest = regexp_replace(canon, "^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    concat(array_join(reverse(split(host, "\\.")), ","),
      when(port === "", lit("")).otherwise(concat(lit(":"), port)),
      lit(")"), rest)
  }

  /** One CDX row per parsed capture: SURT key, original URI, record type,
    * (file, offset) — how a capture is re-fetched without re-scanning the
    * corpus — byte length and payload digest. The metadata-only read:
    * payload bytes feed the digest map-side and are never carried. */
  def cdxRows(spark: SparkSession, warcPath: String): DataFrame =
    cdxRows(spark, Seq(warcPath))

  def cdxRows(spark: SparkSession, warcPaths: Seq[String]): DataFrame =
    readRecords(spark, warcPaths)
      .where(col("parse_ok") && col("target_uri").isNotNull)
      .select(surtKey(col("target_uri")).as("surt"),
        col("target_uri"), col("rec_type"), col("warc_date"),
        col("warc_file"), col("rec_offset"), col("content_length"),
        sha2(col("payload"), 256).as("digest"),
        col("stored_offset"), col("stored_length"))

  /**
   * The TEMPORAL CDX query — the public archive's canonical lookup
   * ("the capture of this URL closest to time T", the wayback
   * semantics; real CDX keys are (SURT, timestamp14) for exactly
   * this): probe the bucket-pruned index for the URLs' keys, then pick
   * per URL the capture minimizing |warc_date − t|, ties to the
   * EARLIER capture — one `min_by` aggregate over the probed rows
   * (captures-per-URL sized), never a window. `t` is ISO-8601, like
   * `WARC-Date` itself; rows whose date fails to parse are ignored
   * (a capture without a parseable date cannot compete on time).
   */
  def lookupCdxNearest(
      spark: SparkSession, table: String, urls: Seq[String],
      t: String): DataFrame = {
    val target = to_timestamp(lit(t)).cast("long")
    // try_: a junk-dated capture must be ignored, not throw under ANSI
    val ts = try_to_timestamp(col("warc_date")).cast("long")
    lookupCdx(spark, table, urls)
      .where(ts.isNotNull)
      .groupBy(col("surt"))
      .agg(min_by(
        struct(col("*")),
        struct(abs(ts - target).as("d"), ts.as("t"))).as("__c"))
      .select(col("__c.*"))
  }

  /**
   * The public CDX server's `from=`/`to=`/`limit=` query shape: probe
   * the bucket-pruned index for the URLs' keys, keep captures whose
   * `WARC-Date` falls in the CLOSED [from, to] window (ISO-8601
   * compared as instants, like the temporal probe; junk-dated captures
   * cannot fall inside any window and drop), order by (surt,
   * warc_date, digest) — the CDX server's key order with the house
   * deterministic tiebreak — and return the first `limit` rows. The
   * limit is a bounded TakeOrdered (per-partition top-k + driver
   * merge), never a global sort; pass `collapseDigest = true` to apply
   * [[collapseCaptures]]' change-point fold before windowing, exactly
   * as CDX servers compose `collapse=digest` with `from/to/limit`.
   */
  def lookupCdxWindow(
      spark: SparkSession, table: String, urls: Seq[String],
      from: String, to: String, limit: Int,
      collapseDigest: Boolean = false): DataFrame = {
    require(limit > 0, "lookupCdxWindow: limit must be positive")
    val ts = try_to_timestamp(col("warc_date")).cast("long")
    val base = lookupCdx(spark, table, urls)
    val collapsed = if (collapseDigest) collapseCaptures(base) else base
    collapsed
      .where(ts.isNotNull &&
        ts >= to_timestamp(lit(from)).cast("long") &&
        ts <= to_timestamp(lit(to)).cast("long"))
      .orderBy(col("surt"), col("warc_date"), col("digest"))
      .limit(limit)
  }

  /**
   * The public CDX server's `collapse=digest` — per URL key, drop every
   * capture whose digest equals its PREDECESSOR's in capture-time order
   * (consecutive-run dedup: the "show me the change points" view).
   * Distinct from [[revisitCaptures]]' global (surt, digest) fold: a
   * content flip-flop A→B→A keeps all three captures here, because the
   * middle B is a change point both ways. One per-key lag window — a
   * URL's capture history is CDX-sized (the bounded
   * [[graft.operators.Frontier.revisitPriority]] shape), never a
   * corpus-wide window; ties on the timestamp order by digest, the same
   * deterministic tiebreak.
   */
  def collapseCaptures(
      caps: DataFrame, keyCol: String = "surt",
      tsCol: String = "warc_date", digestCol: String = "digest"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(digestCol))
    caps.withColumn("__prev", lag(col(digestCol), 1).over(w))
      .where(col("__prev").isNull || col("__prev") =!= col(digestCol))
      .drop("__prev")
  }

  /**
   * Persist the crawl's capture index as a bucketed managed table keyed
   * on SURT — the engine's rendering of the public CDX index beside every
   * crawl archive: URL-addressed capture lookup without touching archive
   * bytes. Same at-rest lifecycle as the dedup/postings indexes:
   * [[appendCdxIndex]] folds new shards in preserving the bucket layout
   * (one parse per shard lifetime), `Bucketing.compactBucketed` is the
   * maintenance fold, probes bucket-prune to the queried keys.
   */
  def writeCdxIndex(
      spark: SparkSession, warcPath: String, table: String,
      buckets: Int = 16): Unit =
    writeCdxIndex(spark, Seq(warcPath), table, buckets)

  def writeCdxIndex(
      spark: SparkSession, warcPaths: Seq[String], table: String,
      buckets: Int): Unit =
    graft.operators.Bucketing.writeBucketed(
      cdxRows(spark, warcPaths), table, "surt", buckets)

  /** Index newly-arrived shards into the existing CDX table (bucket
    * layout restated from the catalog, like every index append). */
  def appendCdxIndex(
      spark: SparkSession, warcPath: String, table: String): Unit =
    appendCdxIndex(spark, Seq(warcPath), table)

  def appendCdxIndex(
      spark: SparkSession, warcPaths: Seq[String], table: String): Unit =
    graft.operators.DedupIndex.appendBucketed(
      cdxRows(spark, warcPaths), table)

  /** Capture lookup by URL: the probe urls canonicalize to SURT keys
    * through the SAME expression the index was built with (computed over
    * a tiny local frame — one driver-bounded collect of the lookup set),
    * and the scan prunes to those keys' buckets. */
  def lookupCdx(
      spark: SparkSession, table: String, urls: Seq[String]): DataFrame = {
    import spark.implicits._
    require(urls.nonEmpty, "lookupCdx: empty url set")
    val keys = urls.toDF("u").select(surtKey(col("u")))
      .collect().map(_.getString(0)).toSeq
    graft.operators.Retract.readLive(spark, table)
      .where(col("surt").isin(keys: _*))
  }

  /** The SURT's host segment (everything before `)`) — the partition key
    * of the host-partitioned CDX companion. */
  private def surtHost(surt: org.apache.spark.sql.Column) =
    substring_index(surt, ")", 1)

  /**
   * The CDX `matchType=domain` query — every capture of each domain AND
   * its subdomains ("everything under example.com", the takedown /
   * re-crawl-seed shape): the reversed-label SURT makes a domain
   * subtree one string
   * RANGE, so the probe is a range predicate the per-bucket-sorted
   * parquet prunes by row-group stats, tightened by an exact
   * label-boundary check — `graftother.test` must NOT answer for
   * `graft.test`, so a bare string prefix is not enough: the host
   * segment must equal the reversed domain or extend it at a `,`
   * boundary (explicit non-default ports of the domain's hosts match —
   * same authority set, the public CDX convention).
   */
  def lookupCdxDomain(
      spark: SparkSession, table: String, domains: Seq[String]): DataFrame = {
    require(domains.nonEmpty, "lookupCdxDomain: empty domain set")
    // canonicalize like the index's own keys (normalizeUrl lowercases
    // hosts; a root-label trailing dot is the same authority): a pasted
    // "Graft.Test" takedown probe must not silently match nothing
    val revs = domains.map(_.toLowerCase.stripSuffix(".")
      .split('.').reverseIterator.mkString(","))
    val host = substring_index(surtHost(col("surt")), ":", 1)
    val exact = revs.map(r =>
      host === r || host.startsWith(r + ",")).reduce(_ || _)
    // the coarse range is PUSHABLE (plain comparisons on the sort
    // column); the boundary check above exacts it post-scan
    val prune = revs.map(r =>
      col("surt") >= r && col("surt") < r + "\uffff").reduce(_ || _)
    graft.operators.Retract.readLive(spark, table).where(prune && exact)
  }

  /**
   * The CDX `matchType=prefix` query — every capture whose canonical
   * URL extends the probe ("everything under example.com/data"): the
   * probe canonicalizes to its SURT through the SAME expression the
   * index was built with, and the scan keeps keys that string-prefix it
   * (`StringStartsWith` pushes to parquet, so the per-bucket-sorted
   * layout prunes row groups). Pure string-prefix semantics, as public
   * CDX servers answer it: `/doc` also matches `/docs` — end the probe
   * with `/` to bound it at a path segment.
   */
  def lookupCdxPrefix(
      spark: SparkSession, table: String, prefixes: Seq[String]): DataFrame = {
    import spark.implicits._
    require(prefixes.nonEmpty, "lookupCdxPrefix: empty prefix set")
    val keys = prefixes.toDF("u").select(surtKey(col("u")))
      .collect().map(_.getString(0)).toSeq
    graft.operators.Retract.readLive(spark, table)
      .where(keys.map(k => col("surt").startsWith(k)).reduce(_ || _))
  }

  /**
   * Host-partitioned CDX companion — the DOMAIN-query layout beside the
   * SURT-bucketed one: the same capture rows written
   * `partitionBy(surt_host)` (one directory per host key, the IVF cell
   * convention), so "every capture of host X" — the other canonical CDX
   * access pattern (per-site accounting, takedown sweeps, re-crawl
   * seeding) — prunes to that host's directory (`PartitionFilters`,
   * plan-pinned) instead of scanning a snapshot-wide index. Appends are
   * blind directory adds per release;
   * [[graft.operators.Bucketing.compactPartitioned]] is the maintenance
   * fold. The bucketed index answers by-URL probes; this one answers
   * by-host scans — same rows, two at-rest sort orders, each pruning
   * its own query shape.
   */
  def writeCdxHostIndex(
      spark: SparkSession, warcPaths: Seq[String], path: String): Unit =
    graft.operators.Bucketing.writePartitioned(
      cdxHostRows(spark, warcPaths), path, "surt_host")

  /** Index newly-arrived shards into the host-partitioned layout (blind
    * per-release append — one more file per touched host directory,
    * value-clustered like the build: see Bucketing.writePartitioned). */
  def appendCdxHostIndex(
      spark: SparkSession, warcPaths: Seq[String], path: String): Unit =
    graft.operators.Bucketing.appendPartitioned(
      cdxHostRows(spark, warcPaths), path, "surt_host")

  private def cdxHostRows(
      spark: SparkSession, warcPaths: Seq[String]): DataFrame =
    cdxRows(spark, warcPaths)
      .withColumn("surt_host", surtHost(col("surt")))

  /** Every capture of the probed hosts (plain host names, `host:port`
    * for explicit non-default ports): the probe keys derive by the SAME
    * label-reversal rule the writer's SURT expression applies — a pure
    * string computation, done driver-side (a Spark job to reverse a
    * handful of probe strings would cost a full scheduling round-trip
    * per lookup) — and the scan prunes to those hosts' directories. */
  def lookupCdxByHost(
      spark: SparkSession, path: String, hosts: Seq[String]): DataFrame = {
    require(hosts.nonEmpty, "lookupCdxByHost: empty host set")
    val keys = hosts.map { h =>
      val (host, port) = h.indexOf(':') match {
        case -1 => (h, "")
        case i => (h.substring(0, i), h.substring(i))
      }
      host.split('.').reverseIterator.mkString(",") + port
    }
    spark.read.parquet(path).where(col("surt_host").isin(keys: _*))
  }

  /** Hadoop `Configuration` is not `Serializable`; this is the standard
    * write/readFields envelope so fetch tasks see the session's FS config
    * (credentials, object-store endpoints) instead of a bare default. */
  private[graft] final class SerializableHadoopConf(
      @transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /**
   * Re-fetch captures by URL through the index as RANGED reads — the
   * reason a CDX index exists beside a 100 TB archive: the probe resolves
   * each URL to (file, stored_offset, stored_length) in the bucket-pruned
   * index scan, and each capture is then ONE positioned read of its
   * stored span (a single gzip member for `.warc.gz` shards) — archive
   * bytes outside the requested spans are never touched, and no shard is
   * scanned. Fetch work partitions by shard file (one open stream per
   * file per task) with spans read in ascending offset order (sequential
   * disk motion; on object stores, one GET per span). Returned rows are
   * the re-parsed records; `rec_offset` is span-relative (provenance is
   * the carried `stored_offset`).
   */
  def fetchCaptures(
      spark: SparkSession, table: String, urls: Seq[String]): DataFrame =
    fetchSpans(spark,
      lookupCdx(spark, table, urls)
        .select(col("warc_file"), col("stored_offset"), col("stored_length"),
          col("target_uri"))
        .distinct())

  /** The ranged-read engine behind [[fetchCaptures]], over an arbitrary
    * span frame (warc_file, stored_offset, stored_length, target_uri) —
    * how a `revisit` row's payload is ALSO fetched: resolve its
    * (refers_to_file, refers_to_offset, refers_to_length) to a span and
    * read the ORIGINAL's bytes, no separate code path. */
  def fetchSpans(spark: SparkSession, caps: DataFrame): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    caps.select(col("warc_file"), col("stored_offset"),
        col("stored_length"), col("target_uri"))
      .as[(String, Long, Long, String)]
      .repartition(col("warc_file"))
      .sortWithinPartitions(col("warc_file"), col("stored_offset"))
      .mapPartitions { iter =>
        var curFile: String = null
        var curLen = 0L
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def close(): Unit = if (in != null) { in.close(); in = null }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close()))
        iter.flatMap { case (file, off, len, uri) =>
          if (file != curFile) {
            close()
            val p = new org.apache.hadoop.fs.Path(file)
            val fs = p.getFileSystem(conf.value.value)
            curLen = fs.getFileStatus(p).getLen
            in = fs.open(p)
            curFile = file
          }
          // the stored span may overrun a separator-less EOF by ≤4 bytes
          // (plain shards) — clamp, the payload itself is complete
          val n = math.min(len, curLen - off).toInt
          val buf = new Array[Byte](math.max(n, 0))
          in.readFully(off, buf)
          parseShard(file, buf)
            .filter(r => r.parse_ok && r.target_uri == uri)
            .map(_.copy(stored_offset = off, stored_length = len))
        }
      }
      .toDF()
  }

  // ---- WAT export: the link-metadata sidecar beside a crawl archive ----

  /**
   * WAT-style per-capture link metadata (the third public artifact next
   * to WARC/WET — Common Crawl ships it as JSON; columnar parquet is
   * the engine's rendering): per response capture, its page-level
   * robots META verdicts, declared canonical URL, and outlink set with
   * anchor text and rel-nofollow annotations — everything the link
   * graph, frontier, and mirror-collapse consumers need, derived ONCE
   * from payload bytes at export time. After [[writeWatSidecar]] those
   * consumers read THIS, never the archive.
   *
   * Input: (warc_file, rec_offset, target_uri, payload) response rows —
   * extraction keys on the CAPTURE identity (file, offset), never the
   * URI: a routine re-crawl holds several captures of one URI, and
   * URI-keyed joins would cross-pair their signals and merge their
   * outlink sets. The payload decodes through [[parseHttpResponse]]
   * (chunked/gzip wire encodings), links resolve against the capture's
   * own URI, and the outlink array sorts by (link, anchor) —
   * deterministic at rest whatever the extraction partitioning. One row
   * per capture; link-less pages keep their row with an empty array.
   */
  def watRows(responses: DataFrame): DataFrame = {
    import graft.functions.HtmlOps
    val caps = responses.select(
      concat_ws("#", col("warc_file"), col("rec_offset")).as("cap"),
      col("warc_file"), col("rec_offset"), col("target_uri"),
      col("payload"))
    val pages = httpResponses(
        caps.select(col("cap"), col("payload")), "cap", "payload")
      .select(col("cap"), col("body_text").as("html"))
      .join(caps.select(col("cap"), col("target_uri")), Seq("cap"))
    val meta = HtmlOps.extractMetaRobots(pages, "cap", "html")
    val canon = HtmlOps.extractCanonical(pages, "cap", "html", "target_uri")
    val edges = HtmlOps.extractAnchorsRel(pages, "cap", "html", "target_uri")
      .groupBy(col("cap"))
      .agg(array_sort(collect_list(
        struct(col("link"), col("anchor"), col("nofollow")))).as("links"))
    caps.select(col("cap"), col("warc_file"), col("rec_offset"),
        col("target_uri"))
      .join(meta, Seq("cap"))
      .join(canon, Seq("cap"))
      .join(edges, Seq("cap"), "left")
      .select(col("warc_file"), col("rec_offset"), col("target_uri"),
        col("noindex"), col("nofollow"), col("canonical"),
        coalesce(col("links"), array().cast(
          "array<struct<link:string,anchor:string,nofollow:boolean>>"))
          .as("links"))
  }

  /** Materialize the sidecar beside the archive: one parquet dataset
    * over the shards' response records (metadata-only once written —
    * payload bytes are touched here and never again). */
  def writeWatSidecar(
      spark: SparkSession, warcPaths: Seq[String], path: String): Unit =
    watRows(readRecords(spark, warcPaths)
        .where(col("parse_ok") && col("rec_type") === "response" &&
          col("target_uri").isNotNull)
        .select(col("warc_file"), col("rec_offset"), col("target_uri"),
          col("payload")))
      .write.mode("overwrite").parquet(path)

  // ---- WET export: the curated-text sidecar beside a crawl archive ----

  /**
   * Distributed WET export — the public text-sidecar convention beside a
   * crawl archive (Common Crawl's `.wet` files): each input row renders
   * as one `WARC-Type: conversion` record (`Content-Type: text/plain`,
   * provenance in `WARC-Refers-To-Target-URI`), one gzip member per
   * record so members concatenate into a valid multi-member `.gz` (the
   * shard layout [[parseShard]] and the CDX offsets address), shards
   * headed by a `warcinfo` record. One shard file per hash partition of
   * the URI, written straight from its task through the task-side
   * filesystem — no driver materialization; at 100 TB the export is as
   * wide as `numShards`. Hash partitioning makes shard MEMBERSHIP
   * deterministic, and each attempt stages to an ATTEMPT-UNIQUE
   * `<shard>.inprogress-<attemptId>` then renames over the target, so a
   * retried or even concurrently-speculated attempt rewrites its whole
   * shard from its own staging file — two attempts never share a write
   * handle, and the last rename wins with a complete copy (the
   * compactBucketed rename-aside posture; a killed attempt can orphan
   * its staging file — swept by maintenance; a full job-commit protocol
   * is the production sink's job, stated not smuggled).
   *
   * Returns the written shard paths (≤ numShards rows — driver-bounded
   * by construction) so callers re-read with explicit file lists, never
   * a glob.
   */
  def writeWetShards(
      df: DataFrame, uriCol: String, textCol: String,
      outDir: String, warcDate: String, numShards: Int): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(numShards > 0, "writeWetShards: numShards must be positive")
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    df.select(col(uriCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .repartition(numShards, col(uriCol))
      .mapPartitions { iter =>
        if (iter.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val name = f"wet-$pid%05d.warc.gz"
          val dest = new org.apache.hadoop.fs.Path(outDir, name)
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            s"$name.inprogress-${tc.taskAttemptId()}")
          val fs = dest.getFileSystem(conf.value.value)
          val out = fs.create(tmp, true)
          try {
            out.write(gzipMember(renderRecord("warcinfo", None, warcDate,
              "application/warc-fields",
              "software: graft wet-export".getBytes("UTF-8"))))
            iter.foreach { case (uri, text) =>
              out.write(gzipMember(renderRecord("conversion", Some(uri),
                warcDate, "text/plain",
                Option(text).getOrElse("")
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8),
                Seq("WARC-Refers-To-Target-URI" -> uri))))
            }
          } finally out.close()
          if (fs.exists(dest)) fs.delete(dest, false)
          fs.rename(tmp, dest)
          Iterator.single(dest.toString)
        }
      }
      .collect().toSeq.sorted
  }

  /**
   * Write fetched HTTP responses as a WARC archive — the crawler's EMIT
   * path, closing the read/write symmetry (ISO 28500 `response` records,
   * one gzip member per record — the Common Crawl shard convention the
   * reader already parses) — and return the CDX rows computed AT WRITE
   * TIME: the writer knows every member's byte span as it writes, so the
   * archive is NEVER re-read to index it (at 100 TB, re-parsing what you
   * just wrote is a second full pass; real crawlers emit WARC + CDX
   * together for exactly this reason). The returned frame has the exact
   * [[cdxRows]] schema — feed it straight to
   * `Bucketing.writeBucketed(..., "surt", ...)` /
   * `DedupIndex.appendBucketed` like any parsed index batch.
   *
   * Layout per shard: a `warcinfo` member, then one member per response.
   * `rec_offset` is the decompressed-stream offset (what a sequential
   * re-read reports), `stored_offset`/`stored_length` the compressed
   * member span (what [[fetchSpans]] range-reads). Rows hash-partition
   * by URI and sort within shards, so shard contents are deterministic.
   * Commit discipline as [[writeWetShards]]: attempt-unique `.inprogress`
   * staging + rename, retried attempts never share a handle.
   */
  def writeWarcShards(
      df: DataFrame, uriCol: String, dateCol: String, payloadCol: String,
      outDir: String, numShards: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(numShards > 0, "writeWarcShards: numShards must be positive")
    val conf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
    val rows = df
      .select(col(uriCol).cast("string"), col(dateCol).cast("string"),
        col(payloadCol).cast("binary"))
      .as[(String, String, Array[Byte])]
      .repartition(numShards, col(uriCol))
      .sortWithinPartitions(col(uriCol))
      .mapPartitions { iter =>
        if (iter.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val name = f"crawl-${tc.partitionId()}%05d.warc.gz"
          val dest = new org.apache.hadoop.fs.Path(outDir, name)
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            s"$name.inprogress-${tc.taskAttemptId()}")
          val fs = dest.getFileSystem(conf.value.value)
          val out = fs.create(tmp, true)
          val sha = java.security.MessageDigest.getInstance("SHA-256")
          val recs = scala.collection.mutable.ArrayBuffer
            .empty[(String, String, String, Long, Long, String, Long, Long)]
          var storedPos = 0L   // compressed file position
          var decompPos = 0L   // decompressed-stream position
          try {
            val info = renderRecord("warcinfo", None,
              "2000-01-01T00:00:00Z", "application/warc-fields",
              "software: graft warc-export".getBytes("UTF-8"))
            val infoGz = gzipMember(info)
            out.write(infoGz)
            storedPos += infoGz.length
            decompPos += info.length
            iter.foreach { case (uri, date, payload0) =>
              val payload =
                if (payload0 == null) Array.emptyByteArray else payload0
              val rec = renderRecord("response", Some(uri), date,
                "application/http;msgtype=response", payload)
              val gz = gzipMember(rec)
              out.write(gz)
              val digest = sha.digest(payload)
                .map("%02x".format(_)).mkString
              recs += ((uri, "response", date, decompPos,
                payload.length.toLong, digest, storedPos, gz.length.toLong))
              storedPos += gz.length
              decompPos += rec.length
              sha.reset()
            }
          } finally out.close()
          if (fs.exists(dest)) fs.delete(dest, false)
          fs.rename(tmp, dest)
          // the fully-qualified form (scheme included) — what a re-parse
          // of the shard reports as `warc_file`, so index rows from the
          // write-time and rescan doors compare equal
          val qualified = fs.makeQualified(dest).toString
          recs.iterator.map(r => (r._1, r._2, r._3, r._4, r._5, r._6,
            r._7, r._8, qualified))
        }
      }
      .toDF("target_uri", "rec_type", "warc_date", "rec_offset",
        "content_length", "digest", "stored_offset", "stored_length",
        "warc_file")
    rows
      .select(surtKey(col("target_uri")).as("surt"),
        col("target_uri"), col("rec_type"), col("warc_date"),
        col("warc_file"), col("rec_offset"), col("content_length"),
        col("digest"), col("stored_offset"), col("stored_length"))
      .localCheckpoint(true) // eager: shards exist when this returns
  }

  /**
   * Digest-based revisit folding — the web-archive payload-dedup
   * convention (WARC `revisit` records / CDX `warc/revisit` rows): a new
   * capture whose payload digest already appears in the prior index
   * under the SAME SURT key stores no payload — its index row becomes
   * `rec_type = 'revisit'` with zero stored bytes and
   * (`refers_to_file`, `refers_to_offset`) addressing the EARLIEST
   * prior capture of that (surt, digest) (min by (file, offset) — a
   * deterministic canonical original); unseen payloads keep their full
   * rows with null refers-to. One equi-join on (surt, digest); against
   * a [[writeCdxIndex]] table the prior side pre-aggregates per key so
   * only (key, ref) pairs shuffle, never archive metadata rows.
   */
  def revisitCaptures(newCaps: DataFrame, prior: DataFrame): DataFrame = {
    val ref = prior
      .groupBy(col("surt"), col("digest"))
      .agg(min(struct(col("warc_file"), col("stored_offset"),
        col("stored_length"))).as("__ref"))
    newCaps.join(ref, Seq("surt", "digest"), "left")
      .select(
        col("surt"), col("target_uri"),
        when(col("__ref").isNotNull, lit("revisit"))
          .otherwise(col("rec_type")).as("rec_type"),
        col("digest"), col("content_length"),
        col("warc_file"), col("rec_offset"),
        when(col("__ref").isNotNull, lit(0L))
          .otherwise(col("stored_length")).as("stored_length"),
        col("__ref.warc_file").as("refers_to_file"),
        col("__ref.stored_offset").as("refers_to_offset"),
        col("__ref.stored_length").as("refers_to_length"))
  }

  // ---- fixture/sink side: render records to spec-shaped bytes ----

  /** Render one record (CRLF framing, the spec's mandatory headers). */
  def renderRecord(
      recType: String, targetUri: Option[String], warcDate: String,
      contentType: String, payload: Array[Byte]): Array[Byte] =
    renderRecord(recType, targetUri, warcDate, contentType, payload, Nil)

  /** Variant with caller-supplied extra WARC named fields (conversion
    * provenance `WARC-Refers-To-Target-URI`, revisit profile headers). */
  def renderRecord(
      recType: String, targetUri: Option[String], warcDate: String,
      contentType: String, payload: Array[Byte],
      extraHeaders: Seq[(String, String)]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(recType).append("\r\n")
    targetUri.foreach(u =>
      sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    sb.append("WARC-Date: ").append(warcDate).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      sb.append(k).append(": ").append(v).append("\r\n")
    }
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes("UTF-8"))
    out.toByteArray
  }

  /** Chunked transfer encoding of a body (RFC 9112 §7.1) for fixture
    * responses: `chunkSize`-byte chunks, each a hex-size line + data +
    * CRLF, closed by the 0-size terminator chunk. */
  def chunkedBody(b: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize > 0, "chunkedBody: chunkSize must be positive")
    val out = new java.io.ByteArrayOutputStream(b.length + 64)
    var i = 0
    while (i < b.length) {
      val n = math.min(chunkSize, b.length - i)
      out.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
      out.write(b, i, n)
      out.write("\r\n".getBytes("US-ASCII"))
      i += n
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  /** One gzip member per record — the Common Crawl shard convention
    * (members concatenate into a valid multi-member `.gz`). */
  def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }
}
