package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-14 (cont.): fill-in-the-middle transform — reconstruction,
  * gate-rate bounds, cut-point bounds, PSM/SPM layout parity,
  * determinism. */
class FimSpec extends SparkSuite {

  import spark.implicits._

  private val docs = (0L until 200L)
    .map(i => (i, s"doc $i " + ("abcdefghij" * (1 + (i % 5).toInt))))
    .toDF("doc_id", "text")

  test("applied rows reconstruct the original text (PSM and SPM)") {
    for (spm <- Seq(false, true)) {
      val rows = Fim.transform(docs, "doc_id", "text", ratePct = 100,
          spm = spm)
        .join(docs, col("id") === col("doc_id"))
        .select(col("id"), col("sequence"), col("text"),
          col("cut_lo"), col("cut_hi"))
        .collect()
      assert(rows.length == 200)
      rows.foreach { r =>
        val seq = r.getString(1); val text = r.getString(2)
        val (pre, mid, suf) = (Fim.PreTag, Fim.MidTag, Fim.SufTag)
        val (prefix, suffix, middle) = if (spm) {
          // <SUF> suffix <PRE> prefix <MID> middle
          val body = seq.stripPrefix(suf)
          val Array(sufPart, rest) = body.split(java.util.regex.Pattern.quote(pre), 2)
          val Array(prePart, midPart) = rest.split(java.util.regex.Pattern.quote(mid), 2)
          (prePart, sufPart, midPart)
        } else {
          val body = seq.stripPrefix(pre)
          val Array(prePart, rest) = body.split(java.util.regex.Pattern.quote(suf), 2)
          val Array(sufPart, midPart) = rest.split(java.util.regex.Pattern.quote(mid), 2)
          (prePart, sufPart, midPart)
        }
        assert(prefix + middle + suffix == text, s"id=${r.getLong(0)}")
        assert(prefix.length == r.getLong(3) &&
          middle.length == r.getLong(4) - r.getLong(3))
      }
    }
  }

  test("rate gate: 0 passes everything through unchanged, 100 transforms all") {
    val zero = Fim.transform(docs, "doc_id", "text", ratePct = 0)
    assert(zero.where(col("fim_applied")).count() == 0)
    assert(zero.join(docs, col("id") === col("doc_id"))
      .where(col("sequence") =!= col("text")).count() == 0)
    val all = Fim.transform(docs, "doc_id", "text", ratePct = 100)
    assert(all.where(!col("fim_applied")).count() == 0)
    // 40%: the LCG gate lands near the rate on 200 ids
    val some = Fim.transform(docs, "doc_id", "text", ratePct = 40)
      .where(col("fim_applied")).count()
    assert(some > 40 && some < 120, s"gate rate off: $some/200")
  }

  test("cut points: 0 <= lo <= hi <= len, uniform-ish spread") {
    val rows = Fim.transform(docs, "doc_id", "text", ratePct = 100)
      .join(docs, col("id") === col("doc_id"))
      .select(col("cut_lo"), col("cut_hi"), length(col("text")).cast("long"))
      .collect()
    rows.foreach { r =>
      assert(0L <= r.getLong(0) && r.getLong(0) <= r.getLong(1) &&
        r.getLong(1) <= r.getLong(2))
    }
    // not all cuts identical (the LCG actually spreads)
    assert(rows.map(_.getLong(0)).distinct.length > 20)
  }

  test("empty text: sentinels only; determinism across runs") {
    val e = Fim.transform(Seq((3L, "")).toDF("doc_id", "text"),
      "doc_id", "text", ratePct = 100).collect().head
    assert(e.getString(4) == Fim.PreTag + Fim.SufTag + Fim.MidTag)
    val a = Fim.transform(docs, "doc_id", "text", 40).collect().toSeq
    val b = Fim.transform(docs, "doc_id", "text", 40).collect().toSeq
    assert(a == b)
  }
}
