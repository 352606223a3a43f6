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

  final case class WarcRecord(
      warc_file: String,
      rec_offset: Long,
      rec_type: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte],
      parse_ok: Boolean)

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
          Array.emptyByteArray, parse_ok = false)
      private def advance(): Unit = {
        if (done) return
        // skip the record separator / any stray blank lines
        var line: Option[String] = readLine(in)
        while (line.exists(_.isEmpty)) line = readLine(in)
        val offset = line.map(l => in.count - l.length - 2).getOrElse(in.count)
        line match {
          case None => done = true
          case Some(v) if !v.startsWith("WARC/") =>
            nextRec = bad(math.max(offset, 0L)); done = true
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
                nextRec = WarcRecord(file, offset,
                  headers.getOrElse("warc-type", ""),
                  headers.getOrElse("warc-target-uri", null),
                  headers.getOrElse("warc-date", null),
                  headers.getOrElse("content-type", null),
                  payload.length.toLong, payload, parse_ok = true)
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
  /** Parse one shard's bytes (plain or gzip, sniffed) — the per-file unit
    * [[readRecords]] distributes, also the batch body of the streaming
    * ingest door ([[graft.streaming.Streams]]). */
  def parseShard(file: String, bytes: Array[Byte]): Iterator[WarcRecord] = {
    val base = new java.io.ByteArrayInputStream(bytes)
    val in: java.io.InputStream =
      if (isGzip(bytes)) new java.util.zip.GZIPInputStream(base) else base
    parseStream(file, in)
  }

  def readRecords(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseShard(p, bytes) }
      .toDF()
  }

  /** The HTTP response payloads' bodies: drops each `response` record's
    * HTTP header block (everything through the first blank line — the
    * WARC payload of a response record IS the raw HTTP message) and
    * decodes the remainder as UTF-8 text. Pure column expressions — the
    * split is one `instr`/`substr` over the binary, no UDF. */
  def httpBodyText(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val s = payload.cast("string")
    val sep = instr(s, "\r\n\r\n")
    when(sep > 0, substring(s, (sep + lit(4)).cast("int"), lit(Int.MaxValue)))
      .otherwise(s)
  }

  // ---- the crawl INDEX: CDX-style capture lookup, persisted at rest ----

  /** SURT (Sort-friendly URI Reordering Transform — the public CDX index
    * key convention): host labels reversed and comma-joined, `)` then the
    * path+query, over the CANONICAL url — so all of a registered domain's
    * captures sort (and bucket) together. Pure column expressions. */
  def surtKey(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val canon = graft.functions.UrlOps.normalizeUrl(url)
    val host = regexp_extract(canon, "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    val rest = regexp_replace(canon, "^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), rest)
  }

  /** One CDX row per parsed capture: SURT key, original URI, record type,
    * (file, offset) — how a capture is re-fetched without re-scanning the
    * corpus — byte length and payload digest. The metadata-only read:
    * payload bytes feed the digest map-side and are never carried. */
  def cdxRows(spark: SparkSession, warcPath: String): DataFrame =
    readRecords(spark, warcPath)
      .where(col("parse_ok") && col("target_uri").isNotNull)
      .select(surtKey(col("target_uri")).as("surt"),
        col("target_uri"), col("rec_type"), col("warc_file"),
        col("rec_offset"), col("content_length"),
        sha2(col("payload"), 256).as("digest"))

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
    graft.operators.Bucketing.writeBucketed(
      cdxRows(spark, warcPath), table, "surt", buckets)

  /** Index newly-arrived shards into the existing CDX table (bucket
    * layout restated from the catalog, like every index append). */
  def appendCdxIndex(
      spark: SparkSession, warcPath: String, table: String): Unit =
    graft.operators.DedupIndex.appendBucketed(
      cdxRows(spark, warcPath), table)

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
    spark.table(table).where(col("surt").isin(keys: _*))
  }

  // ---- fixture/sink side: render records to spec-shaped bytes ----

  /** Render one record (CRLF framing, the spec's mandatory headers). */
  def renderRecord(
      recType: String, targetUri: Option[String], warcDate: String,
      contentType: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new java.lang.StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(recType).append("\r\n")
    targetUri.foreach(u =>
      sb.append("WARC-Target-URI: ").append(u).append("\r\n"))
    sb.append("WARC-Date: ").append(warcDate).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    out.write(head); out.write(payload); out.write("\r\n\r\n".getBytes("UTF-8"))
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
