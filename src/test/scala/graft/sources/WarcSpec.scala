package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSuite {
  import Warc._

  private def utf8(s: String) = s.getBytes("UTF-8")

  private def writeFile(dir: java.nio.file.Path, name: String,
      bytes: Array[Byte]): Unit =
    java.nio.file.Files.write(dir.resolve(name), bytes)

  private def concatBytes(parts: Array[Byte]*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  test("plain file: records, headers, offsets, payload bytes round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("warc_plain")
    val r1 = renderRecord("warcinfo", None, "2026-01-01T00:00:00Z",
      "application/warc-fields", utf8("software: graft"))
    val r2 = renderRecord("response", Some("https://x.test/a"),
      "2026-01-01T00:00:01Z", "application/http;msgtype=response",
      utf8("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\nbody A"))
    val r3 = renderRecord("resource", Some("https://x.test/b"),
      "2026-01-01T00:00:02Z", "text/plain", utf8("raw resource B"))
    writeFile(dir, "a.warc", concatBytes(r1, r2, r3))
    val got = readRecords(spark, dir.toString)
      .orderBy(col("rec_offset")).collect()
    assert(got.length == 3)
    assert(got.map(_.getAs[String]("rec_type")).toSeq ==
      Seq("warcinfo", "response", "resource"))
    assert(got.forall(_.getAs[Boolean]("parse_ok")))
    // offsets: each record starts where the previous one's bytes end
    assert(got(0).getAs[Long]("rec_offset") == 0L)
    assert(got(1).getAs[Long]("rec_offset") == r1.length.toLong)
    assert(got(2).getAs[Long]("rec_offset") == (r1.length + r2.length).toLong)
    assert(got(0).getAs[String]("target_uri") == null)
    assert(got(1).getAs[String]("target_uri") == "https://x.test/a")
    assert(new String(got(2).getAs[Array[Byte]]("payload"), "UTF-8")
      == "raw resource B")
    assert(got(2).getAs[Long]("content_length") == 14L)
  }

  test("gzip multi-member shard (the Common Crawl layout) parses as one stream") {
    val dir = java.nio.file.Files.createTempDirectory("warc_gz")
    val recs = (0 until 5).map(i => renderRecord("resource",
      Some(s"https://x.test/$i"), "2026-01-01T00:00:00Z", "text/plain",
      utf8(s"payload number $i")))
    // one gzip member PER RECORD, concatenated — and a lying extension
    writeFile(dir, "shard.warc", concatBytes(recs.map(gzipMember): _*))
    val got = readRecords(spark, dir.toString)
      .orderBy(col("rec_offset")).collect()
    assert(got.length == 5 && got.forall(_.getAs[Boolean]("parse_ok")))
    assert(got.map(_.getAs[String]("target_uri")).toSeq ==
      (0 until 5).map(i => s"https://x.test/$i"))
    // offsets refer to the DECOMPRESSED stream: contiguous record sizes
    assert(got(1).getAs[Long]("rec_offset") == recs(0).length.toLong)
  }

  test("payload containing 'WARC/1.0' is data: Content-Length framing wins") {
    val dir = java.nio.file.Files.createTempDirectory("warc_embed")
    val tricky = "see WARC/1.0\r\nWARC-Type: fake\r\n\r\n inside a page"
    val recs = Seq(
      renderRecord("resource", Some("https://x.test/t"),
        "2026-01-01T00:00:00Z", "text/plain", utf8(tricky)),
      renderRecord("resource", Some("https://x.test/u"),
        "2026-01-01T00:00:00Z", "text/plain", utf8("after")))
    writeFile(dir, "t.warc", concatBytes(recs: _*))
    val got = readRecords(spark, dir.toString)
      .orderBy(col("rec_offset")).collect()
    assert(got.length == 2)
    assert(new String(got(0).getAs[Array[Byte]]("payload"), "UTF-8") == tricky)
    assert(got(1).getAs[String]("target_uri") == "https://x.test/u")
  }

  test("corrupt tails flag parse_ok=false and stop: bad magic, truncation, bogus length") {
    val dir = java.nio.file.Files.createTempDirectory("warc_bad")
    val good = renderRecord("resource", Some("https://x.test/ok"),
      "2026-01-01T00:00:00Z", "text/plain", utf8("fine"))
    // good record then garbage where the next version line should be
    writeFile(dir, "magic.warc", concatBytes(good, utf8("NOT-A-RECORD\r\n")))
    // declared length runs past EOF
    writeFile(dir, "trunc.warc",
      utf8("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999\r\n\r\nshort"))
    // length outside the representable range must flag, not throw
    writeFile(dir, "huge.warc",
      utf8("WARC/1.0\r\nWARC-Type: resource\r\n" +
        "Content-Length: 99999999999\r\n\r\nx"))
    val got = readRecords(spark, dir.toString)
      .select(col("warc_file"), col("parse_ok"), col("rec_type"))
      .collect()
      .groupBy(r => r.getString(0).split('/').last)
      .view.mapValues(_.map(r => (r.getBoolean(1), r.getString(2))).toSeq)
      .toMap
    assert(got("magic.warc").toSet == Set((true, "resource"), (false, "")))
    assert(got("trunc.warc").toSeq == Seq((false, "")))
    assert(got("huge.warc").toSeq == Seq((false, "")))
  }

  test("header names are case-insensitive; empty payload is a record") {
    val dir = java.nio.file.Files.createTempDirectory("warc_ci")
    writeFile(dir, "ci.warc",
      utf8("WARC/1.1\r\nwarc-type: metadata\r\nWARC-TARGET-URI: https://x/y\r\n" +
        "content-length: 0\r\n\r\n\r\n\r\n"))
    val got = readRecords(spark, dir.toString).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Boolean]("parse_ok"))
    assert(got(0).getAs[String]("rec_type") == "metadata")
    assert(got(0).getAs[String]("target_uri") == "https://x/y")
    assert(got(0).getAs[Long]("content_length") == 0L)
  }

  test("stored spans: plain = the record's own bytes, gz = its member's bytes") {
    val dir = java.nio.file.Files.createTempDirectory("warc_span")
    val recs = (0 until 3).map(i => renderRecord("resource",
      Some(s"https://x.test/$i"), "2026-01-01T00:00:00Z", "text/plain",
      utf8(s"payload $i with some differing lengths ${"x" * i}")))
    writeFile(dir, "plain.warc", concatBytes(recs: _*))
    val members = recs.map(gzipMember)
    writeFile(dir, "gz.warc", concatBytes(members: _*))
    val got = readRecords(spark, dir.toString)
      .select(col("warc_file"), col("target_uri"),
        col("stored_offset"), col("stored_length"))
      .collect()
      .map(r => (r.getString(0).split('/').last, r.getString(1),
        r.getLong(2), r.getLong(3)))
    val plainOffs = recs.scanLeft(0L)(_ + _.length)
    val gzOffs = members.scanLeft(0L)(_ + _.length)
    (0 until 3).foreach { i =>
      assert(got.contains(("plain.warc", s"https://x.test/$i",
        plainOffs(i), recs(i).length.toLong)))
      assert(got.contains(("gz.warc", s"https://x.test/$i",
        gzOffs(i), members(i).length.toLong)))
    }
  }

  test("corrupt gzip member flags a bad tail and stops — no throw") {
    val dir = java.nio.file.Files.createTempDirectory("warc_gzbad")
    val good = gzipMember(renderRecord("resource", Some("https://x.test/ok"),
      "2026-01-01T00:00:00Z", "text/plain", utf8("fine")))
    val corrupt = gzipMember(renderRecord("resource", Some("https://x.test/no"),
      "2026-01-01T00:00:00Z", "text/plain", utf8("gone")))
    corrupt(corrupt.length / 2) = (corrupt(corrupt.length / 2) ^ 0x55).toByte
    val after = gzipMember(renderRecord("resource", Some("https://x.test/later"),
      "2026-01-01T00:00:00Z", "text/plain", utf8("unreached")))
    writeFile(dir, "mid.warc", concatBytes(good, corrupt, after))
    // CRC-valid members whose DECOMPRESSED content violates framing also
    // flag (member boundaries are not a resync point for record framing)
    writeFile(dir, "frame.warc", concatBytes(good, gzipMember(utf8("junk"))))
    val got = readRecords(spark, dir.toString)
      .select(col("warc_file"), col("parse_ok"), col("target_uri"))
      .collect()
      .groupBy(_.getString(0).split('/').last)
      .view.mapValues(_.map(r => (r.getBoolean(1), r.getString(2))).toSeq.sortBy(_.toString))
      .toMap
    assert(got("mid.warc") == Seq((false, null), (true, "https://x.test/ok")))
    assert(got("frame.warc") == Seq((false, null), (true, "https://x.test/ok")))
  }

  private lazy val cdxDb: String = {
    val loc = java.nio.file.Files.createTempDirectory("warc_cdx_spec").toString
    graft.operators.Bucketing.scratchDb(spark, "warc_cdx_spec", loc)
    "warc_cdx_spec"
  }

  test("fetchCaptures reads ONLY the indexed spans: every other byte scrambled") {
    val dir = java.nio.file.Files.createTempDirectory("warc_fetch")
    val date = "2026-01-01T00:00:00Z"
    def rec(i: Int) = renderRecord("resource", Some(s"https://x.test/$i"),
      date, "text/plain", utf8(s"span-proof payload number $i"))
    // shard 0 plain (records 0-3), shard 1 gz members (records 4-7)
    writeFile(dir, "s0.warc", concatBytes((0 until 4).map(rec): _*))
    writeFile(dir, "s1.warc",
      concatBytes((4 until 8).map(i => gzipMember(rec(i))): _*))
    val tbl = s"$cdxDb.fetch_span_proof"
    writeCdxIndex(spark, dir.toString, tbl, buckets = 4)
    val want = Seq(1, 2, 5, 6) // a plain pair and a gz pair
    val spans = spark.table(tbl)
      .where(col("target_uri").isin(want.map(i => s"https://x.test/$i"): _*))
      .select(col("warc_file"), col("stored_offset"), col("stored_length"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // scramble every byte OUTSIDE the wanted spans, in place
    Seq("s0.warc", "s1.warc").foreach { name =>
      val p = dir.resolve(name)
      val b = java.nio.file.Files.readAllBytes(p)
      val keep = new Array[Boolean](b.length)
      spans.filter(_._1.endsWith(name)).foreach { case (_, off, len) =>
        (off until math.min(off + len, b.length.toLong))
          .foreach(i => keep(i.toInt) = true)
      }
      b.indices.foreach(i => if (!keep(i)) b(i) = 0xFF.toByte)
      java.nio.file.Files.write(p, b)
    }
    val got = fetchCaptures(spark, tbl, want.map(i => s"https://x.test/$i"))
      .select(col("target_uri"), col("payload"))
      .collect()
      .map(r => (r.getString(0),
        new String(r.getAs[Array[Byte]]("payload"), "UTF-8")))
      .toMap
    assert(got == want.map(i =>
      s"https://x.test/$i" -> s"span-proof payload number $i").toMap)
  }

  test("fetchCaptures equals the sequential read for both layouts") {
    val dir = java.nio.file.Files.createTempDirectory("warc_fetch_eq")
    val date = "2026-01-01T00:00:00Z"
    val recs = (0 until 6).map { i =>
      renderRecord(if (i % 2 == 0) "response" else "resource",
        Some(s"https://y.test/p/$i"), date, "text/plain",
        utf8(s"content $i ${"pad" * (i % 3)}"))
    }
    writeFile(dir, "p.warc", concatBytes(recs.take(3): _*))
    writeFile(dir, "g.warc",
      concatBytes(recs.drop(3).map(gzipMember): _*))
    val tbl = s"$cdxDb.fetch_eq"
    writeCdxIndex(spark, dir.toString, tbl, buckets = 4)
    val urls = (0 until 6).map(i => s"https://y.test/p/$i")
    val fetched = fetchCaptures(spark, tbl, urls)
      .select(col("target_uri"), col("rec_type"), col("content_length"),
        sha2(col("payload"), 256).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    val scanned = readRecords(spark, dir.toString)
      .where(col("parse_ok"))
      .select(col("target_uri"), col("rec_type"), col("content_length"),
        sha2(col("payload"), 256).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(fetched == scanned && fetched.size == 6)
  }

  test("httpBodyText strips the HTTP header block; non-HTTP passes through") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, utf8("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>")),
      (2L, utf8("no http header here")))
      .toDF("id", "payload")
      .select(col("id"), Warc.httpBodyText(col("payload")).as("body"))
      .orderBy(col("id")).collect()
    assert(df(0).getString(1) == "<p>hi</p>")
    assert(df(1).getString(1) == "no http header here")
  }

  test("parseHttpResponse decodes chunked, gzip, and chunked-over-gzip bodies") {
    val body = "<html><p>" + ("word " * 60) + "é—end</p></html>"
    val entity = utf8(body)
    def msg(extra: String, wire: Array[Byte]) = concatBytes(
      utf8(s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n$extra\r\n"), wire)
    val plain = parseHttpResponse(msg("", entity))
    val gz = parseHttpResponse(
      msg("Content-Encoding: gzip\r\n", gzipMember(entity)))
    val ch = parseHttpResponse(
      msg("Transfer-Encoding: chunked\r\n", chunkedBody(entity, 37)))
    val both = parseHttpResponse(
      msg("Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n",
        chunkedBody(gzipMember(entity), 37)))
    for (h <- Seq(plain, gz, ch, both)) {
      assert(h.decode_ok && h.http_status == 200)
      assert(h.http_content_type == "text/html")
      assert(new String(h.body, "UTF-8") == body)
    }
  }

  test("parseHttpResponse flags malformed framing, keeps the raw bytes") {
    // bad chunk-size line
    val badChunk = parseHttpResponse(concatBytes(
      utf8("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"),
      utf8("zz\r\ndata\r\n0\r\n\r\n")))
    assert(!badChunk.decode_ok && badChunk.http_status == 200)
    assert(new String(badChunk.body, "UTF-8") == "zz\r\ndata\r\n0\r\n\r\n")
    // chunk claims more bytes than the payload holds
    val shortChunk = parseHttpResponse(concatBytes(
      utf8("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"),
      utf8("ff\r\ntiny")))
    assert(!shortChunk.decode_ok)
    // a NEGATIVE hex chunk size parses ("-1") but is malformed framing —
    // it must flag, not crash the array write with an out-of-bounds
    val negChunk = parseHttpResponse(concatBytes(
      utf8("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"),
      utf8("-1\r\ndata\r\n0\r\n\r\n")))
    assert(!negChunk.decode_ok && negChunk.http_status == 200)
    // broken gzip stream
    val badGz = parseHttpResponse(concatBytes(
      utf8("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"),
      utf8("not gzip at all")))
    assert(!badGz.decode_ok &&
      new String(badGz.body, "UTF-8") == "not gzip at all")
    // an encoding outside the stated subset
    val br = parseHttpResponse(concatBytes(
      utf8("HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n"), utf8("x")))
    assert(!br.decode_ok)
    // no status line at all
    val notHttp = parseHttpResponse(utf8("just bytes"))
    assert(!notHttp.decode_ok && notHttp.http_status == -1 &&
      new String(notHttp.body, "UTF-8") == "just bytes")
  }

  test("bare-LF shard: offsets and stored spans are byte-exact") {
    val dir = java.nio.file.Files.createTempDirectory("warc_lf")
    // CRLF-rendered records rewritten with bare-LF line endings in the
    // header block (payloads carry no CR here, so a global rewrite of
    // the header+separator bytes is safe for this fixture)
    def lf(b: Array[Byte]): Array[Byte] =
      utf8(new String(b, "UTF-8").replace("\r\n", "\n"))
    val r1 = lf(renderRecord("resource", Some("https://x.test/a"),
      "2026-01-01T00:00:00Z", "text/plain", utf8("payload one")))
    val r2 = lf(renderRecord("resource", Some("https://x.test/b"),
      "2026-01-01T00:00:00Z", "text/plain", utf8("payload two!")))
    writeFile(dir, "a.warc", concatBytes(r1, r2))
    val got = readRecords(spark, dir.toString)
      .orderBy(col("rec_offset")).collect()
    assert(got.length == 2 && got.forall(_.getAs[Boolean]("parse_ok")))
    // the second record must start exactly where the first one's bytes
    // end — the reconstruction bug this pins against assumed CRLF and
    // drifted one byte per header line on bare-LF input
    assert(got(0).getAs[Long]("rec_offset") == 0L)
    assert(got(1).getAs[Long]("rec_offset") == r1.length.toLong)
    assert(got(1).getAs[Long]("stored_offset") == r1.length.toLong)
  }

  test("surtKey keeps an explicit non-default port; default ports drop") {
    val spark2 = spark
    import spark2.implicits._
    val got = Seq(
      "https://a.example.test:8443/x",
      "http://a.example.test:8080/x?q=1",
      "https://a.example.test:443/x",
      "http://a.example.test/x")
      .toDF("u").select(Warc.surtKey(col("u")).as("k"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "test,example,a:8443)/x",
      "test,example,a:8080)/x?q=1",
      "test,example,a)/x",
      "test,example,a)/x"))
  }

  test("writeWetShards: roundtrip, shard bound, rewrite idempotent") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      ("https://x.test/a", "plain text a"),
      ("https://x.test/b", "multi\nline\ntext"),
      ("https://x.test/c", "unicodé — café"),
      ("https://x.test/d", ""),
      ("https://x.test/e", "last one"))
    val df = rows.toDF("uri", "text")
    val out = java.nio.file.Files.createTempDirectory("wet_spec").toString
    val shards = Warc.writeWetShards(df, "uri", "text", out,
      "2026-01-01T00:00:00Z", numShards = 2)
    assert(shards.nonEmpty && shards.size <= 2)
    assert(shards.forall(_.endsWith(".warc.gz")))
    // no .inprogress-<attempt> staging files left behind
    val left = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(left.forall(!_.contains(".inprogress")), left.toString)
    def readBack(): Map[String, (String, String, Long)] =
      Warc.readRecords(spark, shards)
        .where(col("rec_type") === "conversion")
        .select(col("target_uri"), col("content_type"),
          col("payload").cast("string"), col("content_length"))
        .collect()
        .map(r => r.getString(0) -> (r.getString(1), r.getString(2),
          r.getLong(3))).toMap
    val got = readBack()
    assert(got == rows.map { case (u, t) =>
      u -> ("text/plain", t, t.getBytes("UTF-8").length.toLong)
    }.toMap)
    // every shard leads with its warcinfo header record
    val infos = Warc.readRecords(spark, shards)
      .where(col("rec_type") === "warcinfo" && col("rec_offset") === 0)
      .count()
    assert(infos == shards.size.toLong)
    // a re-run (the task-retry path) rewrites shards in place: same
    // shard set, same records, no duplicate or partial content
    val shards2 = Warc.writeWetShards(df, "uri", "text", out,
      "2026-01-01T00:00:00Z", numShards = 2)
    assert(shards2 == shards)
    assert(readBack() == got)
  }

  test("writeWarcShards: write-time CDX equals the rescan; spans fetch; " +
      "empty payloads survive") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      ("https://w.test/a", "HTTP/1.1 200 OK\r\n\r\nalpha"),
      ("https://w.test/b", "HTTP/1.1 200 OK\r\n\r\nbëta — café"),
      ("https://w.test/c", ""), // an empty capture must not derail framing
      ("https://w.test/d", "HTTP/1.1 404 Not Found\r\n\r\n"))
    val df = rows.toDF("uri", "payload")
      .select(col("uri"), lit("2026-02-02T00:00:00Z").as("wdate"),
        col("payload").cast("binary").as("payload"))
    val out = java.nio.file.Files.createTempDirectory("warc_w_spec").toString
    val idx = Warc.writeWarcShards(df, "uri", "wdate", "payload", out,
      numShards = 2)
    val files = idx.select(col("warc_file")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(files.forall(_.endsWith(".warc.gz")))
    // no staging files left behind
    val left = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(left.forall(!_.contains(".inprogress")), left.toString)
    // the write-time index IS the rescan index, field for field
    val wrote = idx.orderBy("target_uri").collect()
    val rescanned = Warc.cdxRows(spark, files)
      .where(col("rec_type") === "response").orderBy("target_uri").collect()
    assert(wrote.map(_.toSeq).toSeq == rescanned.map(_.toSeq).toSeq,
      s"wrote=${wrote.mkString("\n")}\nrescan=${rescanned.mkString("\n")}")
    // ranged span reads return the exact payloads, empty included
    val viaSpans = Warc.fetchSpans(spark,
      idx.select(col("warc_file"), col("stored_offset"),
        col("stored_length"), col("target_uri")))
      .select(col("target_uri"), col("payload").cast("string"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaSpans == rows.toMap, viaSpans.toString)
    // every shard leads with its warcinfo member
    val infos = Warc.readRecords(spark, files)
      .where(col("rec_type") === "warcinfo" && col("rec_offset") === 0)
      .count()
    assert(infos == files.size.toLong)
  }

  test("watRows: two captures of one URI stay two independent rows") {
    val spark2 = spark
    import spark2.implicits._
    def page(links: String) =
      utf8("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><body><p>$links</p></body></html>")
    // same URI captured twice (a re-crawl), different outlinks per
    // capture — signals must never cross-pair or merge
    val rows = Seq(
      ("a.warc", 0L, "https://x.test/", page("""<a href="/one">first</a>""")),
      ("a.warc", 500L, "https://x.test/", page("""<a href="/two">second</a>""")),
      ("b.warc", 0L, "https://y.test/", page("")))
      .toDF("warc_file", "rec_offset", "target_uri", "payload")
    val got = Warc.watRows(rows)
      .select(col("warc_file"), col("rec_offset"), col("target_uri"),
        size(col("links")).as("n"),
        try_element_at(col("links"), lit(1)).getField("link").as("l1"))
      .orderBy(col("warc_file"), col("rec_offset"))
      .collect()
    assert(got.length == 3, "one sidecar row per CAPTURE, not per URI")
    assert(got(0).getInt(3) == 1 && got(0).getString(4) == "https://x.test/one")
    assert(got(1).getInt(3) == 1 && got(1).getString(4) == "https://x.test/two")
    assert(got(2).getInt(3) == 0 && got(2).getString(4) == null)
  }

  test("lookupCdxDomain canonicalizes pasted casing and trailing dots") {
    val dir = java.nio.file.Files.createTempDirectory("cdx_dom_case")
    val date = "2026-01-01T00:00:00Z"
    writeFile(dir, "a.warc", concatBytes(
      renderRecord("resource", Some("https://graft.test/x"), date,
        "text/plain", utf8("gx")),
      renderRecord("resource", Some("https://sub.graft.test/y"), date,
        "text/plain", utf8("gy")),
      renderRecord("resource", Some("https://graftother.test/z"), date,
        "text/plain", utf8("gz"))))
    val db = s"wat_dom_${System.nanoTime()}"
    graft.operators.Bucketing.scratchDb(spark, db,
      java.nio.file.Files.createTempDirectory(db).toString)
    Warc.writeCdxIndex(spark, Seq(s"$dir/a.warc"), s"$db.cdx", buckets = 2)
    // original casing + root-label dot, as a takedown request arrives
    val got = Warc.lookupCdxDomain(spark, s"$db.cdx", Seq("Graft.Test."))
      .select(col("target_uri")).collect().map(_.getString(0)).sorted
    assert(got.toSeq ==
      Seq("https://graft.test/x", "https://sub.graft.test/y"))
  }

  test("host-partitioned CDX: the domain probe prunes to the host's directory") {
    val dir = java.nio.file.Files.createTempDirectory("cdx_host")
    val date = "2026-01-01T00:00:00Z"
    val recs = Seq(
      renderRecord("resource", Some("https://a.test/x"), date,
        "text/plain", utf8("content ax")),
      renderRecord("resource", Some("https://a.test/y"), date,
        "text/plain", utf8("content ay")),
      renderRecord("resource", Some("https://b.test/z"), date,
        "text/plain", utf8("content bz")),
      renderRecord("resource", Some("https://b.test:8080/p"), date,
        "text/plain", utf8("content bp")))
    writeFile(dir, "s.warc", concatBytes(recs: _*))
    val out = dir.resolve("idx").toString
    Warc.writeCdxHostIndex(spark, Seq(dir.resolve("s.warc").toString), out)
    val probe = Warc.lookupCdxByHost(spark, out, Seq("a.test"))
    assert(probe.collect().map(_.getAs[String]("target_uri")).sorted.toSeq ==
      Seq("https://a.test/x", "https://a.test/y"))
    val p = probe.queryExecution.executedPlan.toString
    val scan = p.linesIterator.find(_.contains("PartitionFilters: ["))
      .getOrElse("")
    assert(scan.contains("surt_host") && !scan.contains("PartitionFilters: []"),
      s"the host probe must prune partitions:\n$p")
    // an explicit non-default port is its own host key (the surtKey rule)
    assert(Warc.lookupCdxByHost(spark, out, Seq("b.test:8080"))
      .collect().map(_.getAs[String]("target_uri")).toSeq ==
      Seq("https://b.test:8080/p"))
    assert(Warc.lookupCdxByHost(spark, out, Seq("b.test"))
      .collect().map(_.getAs[String]("target_uri")).toSeq ==
      Seq("https://b.test/z"))
  }

  test("lookupCdxNearest: ties go earlier; unparseable dates never compete") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdx_time")
    def shard(name: String, date: String, body: String): Unit =
      writeFile(dir, name, renderRecord("resource",
        Some("https://t.test/a"), date, "text/plain", utf8(body)))
    shard("s0.warc", "2026-01-01T00:00:00Z", "jan")
    shard("s1.warc", "2026-01-03T00:00:00Z", "jan3")
    shard("s2.warc", "not-a-date", "junk")
    val spec = graft.operators.Bucketing
    spec.scratchDb(spark, "cdx_time_spec",
      java.nio.file.Files.createDirectory(dir.resolve("db")).toString)
    Warc.writeCdxIndex(spark,
      Seq("s0", "s1", "s2").map(n => dir.resolve(s"$n.warc").toString),
      "cdx_time_spec.idx", buckets = 2)
    def nearest(t: String): (String, String) = {
      val r = Warc.lookupCdxNearest(spark, "cdx_time_spec.idx",
        Seq("https://t.test/a"), t).collect()
      assert(r.length == 1)
      (r(0).getAs[String]("warc_date"), r(0).getAs[String]("warc_file"))
    }
    // Jan 2 noon sits 36h from Jan 1 and 12h from Jan 3
    assert(nearest("2026-01-02T12:00:00Z")._1 == "2026-01-03T00:00:00Z")
    // Jan 2 midnight is EQUIDISTANT (24h both ways): the earlier wins
    assert(nearest("2026-01-02T00:00:00Z")._1 == "2026-01-01T00:00:00Z")
    // far future: the latest parseable capture, never the junk-dated one
    assert(nearest("2030-01-01T00:00:00Z")._1 == "2026-01-03T00:00:00Z")
  }

  test("revisitCaptures: seen digests fold to revisit rows addressing the earliest original") {
    val spark2 = spark
    import spark2.implicits._
    def cap(surt: String, uri: String, rt: String, dig: String,
        file: String, off: Long): (String, String, String, String, Long,
        String, Long, Long, Long) =
      (surt, uri, rt, dig, 10L, file, off, off, 100L)
    val cols = Seq("surt", "target_uri", "rec_type", "digest",
      "content_length", "warc_file", "rec_offset", "stored_offset",
      "stored_length")
    // the prior index holds s1/d1 TWICE (two shards captured the same
    // payload) — the fold must address the lexically-earliest
    // (file, offset); s2/d2 once; s3 never
    val prior = Seq(
      cap("s1", "u1", "response", "d1", "b.warc", 100L),
      cap("s1", "u1", "response", "d1", "a.warc", 50L),
      cap("s2", "u2", "resource", "d2", "a.warc", 900L))
      .toDF(cols: _*)
    val fresh = Seq(
      cap("s1", "u1", "response", "d1", "new.warc", 0L), // seen → revisit
      cap("s1", "u1", "response", "dX", "new.warc", 10L), // changed payload
      cap("s2", "u2", "resource", "d2", "new.warc", 20L), // seen → revisit
      cap("s3", "u3", "response", "d2", "new.warc", 30L)) // same digest, other surt
      .toDF(cols: _*)
    val got = Warc.revisitCaptures(fresh, prior)
      .orderBy(col("surt"), col("digest"))
      .collect()
      .map(r => (r.getAs[String]("surt"), r.getAs[String]("digest"),
        r.getAs[String]("rec_type"), r.getAs[Long]("stored_length"),
        Option(r.getAs[String]("refers_to_file")),
        Option(r.getAs[Any]("refers_to_offset"))))
      .toSeq
    assert(got == Seq(
      ("s1", "d1", "revisit", 0L, Some("a.warc"), Some(50L)),
      ("s1", "dX", "response", 100L, None, None),
      ("s2", "d2", "revisit", 0L, Some("a.warc"), Some(900L)),
      ("s3", "d2", "response", 100L, None, None)))
  }
}
