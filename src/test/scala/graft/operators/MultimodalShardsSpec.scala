package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/** The multimodal terminal artifact vs a sequential reference assembly:
  * on arbitrary interleaved pages, the distributed packing's slot
  * addresses must equal a plain in-memory fold's, every addressed record
  * position must hold the sentinel after the byte roundtrip, and the
  * content-addressed sidecar must hand back each slot's exact bytes. */
class MultimodalShardsSpec extends SparkSuite {
  import spark.implicits._

  private val word = Gen.choose(1, 4).flatMap(n =>
    Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  // one page row: Left(words) = a text span, Right(src) = an image slot
  private def genPage(pid: Long): Gen[Seq[Either[Seq[String], String]]] =
    Gen.choose(1, 6).flatMap { n =>
      Gen.sequence[Seq[Either[Seq[String], String]], Either[Seq[String], String]](
        (0 until n).map { i =>
          Gen.oneOf(
            Gen.choose(1, 4).flatMap(k =>
              Gen.listOfN(k, word).map(ws => Left(ws): Either[Seq[String], String])),
            Gen.const(Right(s"im$pid-$i"): Either[Seq[String], String]))
        })
    }

  private case class Case(
      pages: Map[Long, Seq[Either[Seq[String], String]]],
      payloads: Map[(Long, String), Option[Array[Byte]]],
      seqLen: Int)

  private val genCase: Gen[Case] = for {
    nPages <- Gen.choose(1, 8)
    pages <- Gen.sequence[Seq[Seq[Either[Seq[String], String]]],
      Seq[Either[Seq[String], String]]]((0 until nPages).map(p => genPage(p.toLong)))
    seqLen <- Gen.choose(4, 9)
    pays <- Gen.sequence[Seq[Option[Array[Byte]]], Option[Array[Byte]]](
      pages.zipWithIndex.flatMap { case (rows, _) => rows.collect {
        case Right(_) => Gen.option(
          Gen.nonEmptyListOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray))
      }})
  } yield {
    val slotKeys = pages.zipWithIndex.flatMap { case (rows, pid) =>
      rows.collect { case Right(src) => (pid.toLong, src) }
    }
    Case(pages.zipWithIndex.map { case (r, p) => p.toLong -> r }.toMap,
      slotKeys.zip(pays).toMap, seqLen)
  }

  test("slot addresses, sentinel positions, and payload bytes equal the " +
      "sequential assembly on arbitrary pages") {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8),
      Prop.forAllNoShrink(genCase) { c =>
        val interRows = c.pages.toSeq.flatMap { case (pid, rows) =>
          rows.zipWithIndex.map {
            case (Left(ws), i) =>
              (pid, i.toLong, "text", ws.mkString(" "), null: String)
            case (Right(src), i) =>
              (pid, i.toLong, "image", null: String, src)
          }
        }
        val inter = interRows.toDF("doc_id", "seq", "kind", "text", "image_src")
        val images = c.payloads.toSeq
          .map { case ((pid, src), p) => (pid, src, p.orNull) }
          .toDF("doc_id", "src", "payload")
        val out = java.nio.file.Files
          .createTempDirectory("mm_prop").toString
        val (tokIdx, slots, payIdx) = Multimodal.writeInterleavedShards(
          inter, "doc_id", pmod(col("doc_id"), lit(2)).cast("string"),
          images, "doc_id", "src", "payload", out,
          seqLen = c.seqLen, numShards = 2)

        // ---- sequential reference ----
        // token stream per page: text span = one token per word, image = 1
        def pageStream(pid: Long): Seq[Option[(Long, String)]] =
          c.pages(pid).flatMap {
            case Left(ws) => ws.map(_ => None)
            case Right(src) => Seq(Some((pid, src)))
          }
        val wantSlots = (0 until 2).flatMap { g =>
          val pids = c.pages.keys.filter(_ % 2 == g).toSeq.sorted
          val stream = pids.flatMap(pageStream)
          val nFull = stream.size / c.seqLen
          stream.zipWithIndex.collect {
            case (Some((pid, src)), pos) if pos / c.seqLen < nFull =>
              (g.toString, (pos / c.seqLen).toLong, pos % c.seqLen, pid, src)
          }
        }.toSet

        val gotSlots = slots.collect().map(r => (r.getString(0), r.getLong(1),
          r.getInt(2), r.getLong(3), r.getString(4))).toSet
        val slotsOk = gotSlots == wantSlots

        // every addressed record position holds the sentinel in the
        // bytes read back; no other position does
        val seqsBack = TrainShards.readTokenShards(spark, tokIdx, c.seqLen)
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Int](2))
          .toMap
        val sentinelOk = seqsBack.forall { case ((g, sid), toks) =>
          val here = wantSlots.collect {
            case (`g`, `sid`, p, _, _) => p
          }
          toks.zipWithIndex.forall { case (t, i) =>
            (t == Multimodal.ImageSlotToken) == here.contains(i)
          }
        }

        // the sidecar hands back each slot's exact bytes (null digest =
        // failed fetch, no row in the sidecar)
        val bytesBack = Multimodal.readPayloadSpans(spark, payIdx)
          .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
        val slotDigests = slots.collect()
          .map(r => (r.getLong(3), r.getString(4)) -> Option(r.getString(5)))
          .toMap
        val payloadOk = slotDigests.forall { case ((pid, src), dig) =>
          (c.payloads((pid, src)), dig) match {
            case (None, d) => d.isEmpty
            case (Some(want), Some(d)) =>
              bytesBack.get(d).exists(_.sameElements(want))
            case _ => false
          }
        }

        (slotsOk :| s"slots got=$gotSlots want=$wantSlots") &&
          (sentinelOk :| "sentinel positions drifted in the byte roundtrip") &&
          (payloadOk :| "sidecar bytes drifted")
      })
    assert(res.passed, res.status.toString)
  }
}
