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
}
