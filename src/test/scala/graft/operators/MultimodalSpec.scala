package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Real javax.imageio decode: encoder→decoder round-trip must report the
  * construction dimensions/channels; corrupt payloads flag, never throw. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private def png(w: Int, h: Int, gray: Boolean): Array[Byte] = {
    val tpe = if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
      else java.awt.image.BufferedImage.TYPE_INT_RGB
    val im = new java.awt.image.BufferedImage(w, h, tpe)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, (x * 7 + y) & 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  private def jpg(w: Int, h: Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    bos.toByteArray
  }

  test("decodeImageMeta: true dims/channels for png, jpeg, gray png") {
    val rows = Seq(
      (1L, png(33, 21, gray = false)),
      (2L, jpg(64, 48)),
      (3L, png(17, 17, gray = true))).toDF("id", "payload")
    val got = Multimodal.decodeImageMeta(rows, "id", "payload")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getBoolean(6)))
      .toSeq
    assert(got == Seq(
      (1L, "image/png", 33, 21, 3, true),
      (2L, "image/jpeg", 64, 48, 3, true),
      (3L, "image/png", 17, 17, 1, true)))
  }

  test("decodeImageMeta: corrupt payloads flag decode_ok=false, keep mime sniff") {
    val rows = Seq(
      (1L, "plain text, not an image".getBytes("UTF-8")),
      (2L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 1, 2, 3)),
      (3L, Array[Byte](0xff.toByte, 0xd8.toByte, 9, 9, 9)),
      (4L, Array.empty[Byte])).toDF("id", "payload")
    val got = Multimodal.decodeImageMeta(rows, "id", "payload")
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getBoolean(6)))
      .toSeq
    assert(got == Seq(
      (1L, "application/octet-stream", 0, false),
      (2L, "image/png", 0, false),
      (3L, "image/jpeg", 0, false),
      (4L, "application/octet-stream", 0, false)))
  }

  test("decodeAudioMeta: true rate/channels/frames for wav; corrupt flags") {
    def wav(rate: Int, channels: Int, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        rate.toFloat, 16, channels, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(
          new Array[Byte](frames * channels * 2)), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, wav(16000, 1, 16000)),  // exactly one second
      (2L, wav(8000, 2, 2000)),    // 250 ms stereo
      (3L, "not audio at all".getBytes("UTF-8"))).toDF("id", "payload")
    val got = Multimodal.decodeAudioMeta(rows, "id", "payload")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getBoolean(7)))
      .toSeq
    assert(got == Seq(
      (1L, "audio/wav", 16000, 1, 16000L, 1000L, true),
      (2L, "audio/wav", 8000, 2, 2000L, 250L, true),
      (3L, "application/octet-stream", 0, 0, 0L, 0L, false)))
  }

  test("parseMp4Moov: size==0 and largesize boxes, malformed overruns flag") {
    def u32(v: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(v.toInt).array
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      u32(body.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ body
    def mvhd(timescale: Int, duration: Int): Array[Byte] = {
      val body = new Array[Byte](100)
      System.arraycopy(u32(timescale.toLong), 0, body, 12, 4)
      System.arraycopy(u32(duration.toLong), 0, body, 16, 4)
      box("mvhd", body)
    }
    def tkhd(w: Int, h: Int): Array[Byte] = {
      val body = new Array[Byte](84)
      System.arraycopy(u32(w.toLong << 16), 0, body, 76, 4)
      System.arraycopy(u32(h.toLong << 16), 0, body, 80, 4)
      box("tkhd", body)
    }
    val moovBody = mvhd(1000, 2500) ++ box("trak", tkhd(640, 360))
    // plain: ftyp + moov
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0L))
    assert(Multimodal.parseMp4Moov(ftyp ++ box("moov", moovBody))
      == Some((640, 360, 1, 2500L)))
    // largesize (size==1 + 64-bit size) moov header
    val large = u32(1L) ++ "moov".getBytes("ISO-8859-1") ++
      u32(0L) ++ u32(moovBody.length + 16L) ++ moovBody
    assert(Multimodal.parseMp4Moov(ftyp ++ large)
      == Some((640, 360, 1, 2500L)))
    // size==0 (to end-of-file) moov as the LAST box
    val toEnd = u32(0L) ++ "moov".getBytes("ISO-8859-1") ++ moovBody
    assert(Multimodal.parseMp4Moov(ftyp ++ toEnd)
      == Some((640, 360, 1, 2500L)))
    // a child trak overrunning its parent is malformed, not a crash
    val bad = ftyp ++ box("moov",
      mvhd(1000, 2500) ++ u32(9999L) ++ "trak".getBytes("ISO-8859-1"))
    assert(Multimodal.parseMp4Moov(bad).isEmpty)
    // moov without mvhd yields no duration -> malformed
    assert(Multimodal.parseMp4Moov(
      ftyp ++ box("moov", box("trak", tkhd(64, 64)))).isEmpty)
    // an UNDERSIZED mvhd must flag — not read the next box's bytes as
    // timescale/duration and report them with decode_ok=true
    assert(Multimodal.parseMp4Moov(ftyp ++ box("moov",
      box("mvhd", new Array[Byte](4)) ++ box("trak", tkhd(640, 360)))).isEmpty)
    // same for an undersized tkhd
    assert(Multimodal.parseMp4Moov(ftyp ++ box("moov",
      mvhd(1000, 2500) ++ box("trak", box("tkhd", new Array[Byte](8))))).isEmpty)
  }

  test("decodeImageMeta: n_bytes is the payload size, not the pixel size") {
    val p = png(10, 10, gray = false)
    val r = Multimodal.decodeImageMeta(
      Seq((7L, p)).toDF("id", "payload"), "id", "payload").collect()(0)
    assert(r.getLong(5) == p.length.toLong)
  }

  test("interleave: slot order, src-less imgs drop, adjacency, retry dedup") {
    val html = "<p>a <img src=\"i1\"><img src=\"i2\"> b</p>" +
      "<p><img alt=\"no src\"> c <img src=\"i1\"></p>"
    val pages = Seq((1L, html)).toDF("id", "html")
    val images = Seq(
      (1L, "i1", Some(Array[Byte](1))),
      (1L, "i1", Option.empty[Array[Byte]]), // fetch retry logged twice
      (1L, "i2", Option.empty[Array[Byte]]))
      .toDF("id", "src", "payload")
    val got = Multimodal.interleave(pages, "id", "html",
        images, "id", "src", "payload")
      .orderBy(col("seq")).collect()
      .map(r => (r.getString(2), Option(r.getString(3)),
        Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
      .toSeq
    assert(got == Seq(
      ("text", Some("a"), None, None),
      ("image", None, Some("i1"), Some(true)), // retry dedup: max(has)
      // adjacent images: the empty span between them drops, slots stay
      ("image", None, Some("i2"), Some(false)),
      // src-less img vanished; "b" and "c" join across the block break
      ("text", Some("b\nc"), None, None),
      ("image", None, Some("i1"), Some(true))))
  }

  test("interleave: data-src never captures as the slot; NUL bytes inert") {
    // lazy-loader markup: the placeholder must NOT become the slot src,
    // and a stray NUL in crawled text must not flip text/image parity
    val html = "<p>x\u0000y <img data-src=\"ph.gif\" src=\"real.jpg\"> z</p>"
    val pages = Seq((1L, html)).toDF("id", "html")
    val images = Seq((1L, "real.jpg", Some(Array[Byte](1))))
      .toDF("id", "src", "payload")
    val got = Multimodal.interleave(pages, "id", "html",
        images, "id", "src", "payload")
      .orderBy(col("seq")).collect()
      .map(r => (r.getString(2), Option(r.getString(3)),
        Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getBoolean(5))))
      .toSeq
    assert(got == Seq(
      ("text", Some("x y"), None, None),
      ("image", None, Some("real.jpg"), Some(true)),
      ("text", Some("z"), None, None)))
  }
}
