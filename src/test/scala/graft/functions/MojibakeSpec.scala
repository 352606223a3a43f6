package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** ftfy-style mojibake repair: the whole-string round-trip contract. */
class MojibakeSpec extends SparkSuite {
  import spark.implicits._

  private def repair(s: String): String =
    Seq(s).toDF("t").select(QualityOps.mojibakeRepair(col("t")))
      .collect().head.getString(0)

  test("classic double-decode artifacts round-trip to their true chars") {
    assert(repair("donâ€™t") == "don’t")
    assert(repair("cafÃ©") == "café")
    assert(repair("naÃ¯ve Ã¼ber") == "naïve über")
    assert(repair("â€œquotedâ€") == "“quoted”")
    assert(repair("euro â‚¬ sign") == "euro € sign")
  }

  test("single-encoded text is NEVER repaired (rule 2: invalid UTF-8)") {
    // é encodes to the lone byte 0xE9 — malformed UTF-8, original kept
    assert(repair("café au lait") == "café au lait")
    assert(repair("über naïve") == "über naïve")
  }

  test("pure ASCII passes through identical (fast bail)") {
    val s = "nothing suspicious here, just ascii 123."
    assert(repair(s) == s)
  }

  test("chars outside cp1252 stop the repair (rule 1)") {
    // U+2028 LINE SEPARATOR has no cp1252 byte; the artifact beside it
    // must NOT be repaired — whole-string contract
    val s = "donâ€™t break"
    assert(repair(s) == s)
    assert(repair("汉字 donâ€™t") == "汉字 donâ€™t")
  }

  test("mixed artifact + ASCII repairs as one string") {
    assert(repair("a long ascii prefix then cafÃ© at the end") ==
      "a long ascii prefix then café at the end")
  }

  test("mojibakeScore counts artifact lead-ins, zero on clean text") {
    val got = Seq("donâ€™t cafÃ©", "clean text", "Â nbsp Ã deux")
      .toDF("t").select(QualityOps.mojibakeScore(col("t")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 0L, 2L), got.toString)
  }

  test("repair is idempotent: a repaired string does not repair again") {
    val once = repair("donâ€™t cafÃ©")
    assert(once == "don’t café")
    assert(repair(once) == once)
  }

  private def repairLines(s: String): String =
    Seq(s).toDF("t").select(QualityOps.mojibakeRepairLines(col("t")))
      .collect().head.getString(0)

  test("per-line repair fixes artifact lines in mixed documents") {
    // whole-string bails (the genuine 'é' fails the strict round-trip);
    // per-line scopes the bail-out to the genuine line only
    val mixed = "genuine café line\ndonâ€™t stop artifacts\n汉字 line"
    assert(repair(mixed) == mixed)
    assert(repairLines(mixed) ==
      "genuine café line\ndon’t stop artifacts\n汉字 line")
  }

  test("per-line repair preserves exact line structure (trailing/empty)") {
    val s = "\ncafÃ©\n\ntail\n"
    assert(repairLines(s) == "\ncafé\n\ntail\n")
    assert(repairLines("no newline cafÃ©") == "no newline café")
    assert(repairLines("") == "")
  }

  test("per-line equals whole-string when the whole string round-trips") {
    val s = "ascii only\nand cafÃ© artifacts\nmore ascii"
    assert(repairLines(s) == repair(s))
  }
}
