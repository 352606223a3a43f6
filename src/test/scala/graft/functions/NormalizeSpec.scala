package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def nfcOf(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.nfc(col("t"))).first().getString(0)
  private def foldOf(s: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextOps.accentFold(col("t"))).first().getString(0)

  test("nfc: decomposed sequences compose; ascii and normalized pass through") {
    assert(nfcOf("cafe\u0301") == "caf\u00e9")
    assert(nfcOf("\u212Bngstro\u0308m") == "\u00c5ngstr\u00f6m")
    assert(nfcOf("plain ascii 123") == "plain ascii 123")
    assert(nfcOf("caf\u00e9 already composed") == "caf\u00e9 already composed")
    assert(nfcOf("") == "")
  }

  test("nfc: idempotent and hash-stabilizing (the dedup motivation)") {
    // composed and decomposed spellings digest identically post-NFC
    assert(Seq("caf\u00e9", "cafe\u0301").map(nfcOf).distinct.size == 1)
    val messy = "ox\u0304 e\u0327\u0301"
    assert(nfcOf(nfcOf(messy)) == nfcOf(messy))
  }

  test("accent fold: lowercase + mark strip, composed and decomposed agree") {
    assert(foldOf("CAF\u00c9") == "cafe")
    assert(foldOf("CAFE\u0301") == "cafe")
    assert(foldOf("\u00dcn\u00effcod\u00e9 \u00d1O\u00d1O") == "unifcode nono")
    assert(foldOf("MiXeD AsCiI!") == "mixed ascii!") // ascii fast path
    assert(foldOf("") == "")
    // supplementary-plane combining marks (surrogate pairs in UTF-16)
    // strip like BMP ones: U+1D165/U+1D166 are Mc, U+1D167..69 Mn —
    // a char-wise walk would classify the surrogates and keep them
    assert(foldOf("a𝅥b𝅧c") == "abc")
    // non-mark astral chars survive (U+1D11E MUSICAL SYMBOL G CLEF)
    assert(foldOf("x𝄞y") == "x𝄞y")
  }

  test("null propagates; expressions run inside codegen projections") {
    val df = Seq((1L, "e\u0301"), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), TextOps.nfc(col("t")).as("n"),
        TextOps.accentFold(col("t")).as("f"))
      .orderBy(col("id")).collect()
    assert(df(0).getString(1) == "\u00e9" && df(0).getString(2) == "e")
    assert(df(1).isNullAt(1) && df(1).isNullAt(2))
  }
}
