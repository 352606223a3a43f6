package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unicode-script profiling: literal mixed-script cases, tie-break
  * order, and the letterless edge. */
class ScriptOpsSpec extends SparkSuite {
  import spark.implicits._

  test("script counts, dominant and fraction on literal cases") {
    val rows = Seq(
      (1L, "hello world"),                 // pure Latin
      (2L, "hello привет"),                // Latin + Cyrillic, Latin tie-break on 5+6? no: 5 vs 6
      (3L, "中文 text 中文 more 中文中文"), // Han-heavy
      (4L, "12345 .,!?"),                  // letterless
      (5L, "αβγ abc"))                     // 3 Greek vs 3 Latin: tie → latin (earlier entry)
      .toDF("doc_id", "text")
    val got = ScriptOps.scriptProfile(rows, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getAs[Long]("latin"), r.getAs[Long]("cyrillic"),
          r.getAs[Long]("han"), r.getAs[Long]("greek"),
          r.getAs[String]("dominant"), r.getAs[Double]("dominant_frac"))))
      .toMap
    assert(got(1L) == ((10L, 10L, 0L, 0L, 0L, "latin", 1.0)))
    // "hello привет": 5 Latin, 6 Cyrillic → cyrillic dominates
    assert(got(2L) == ((11L, 5L, 6L, 0L, 0L, "cyrillic", 0.545455)))
    // 8 Han vs 8 Latin ("text"+"more") → tie breaks to latin (earlier)
    assert(got(3L)._4 == 8L && got(3L)._2 == 8L && got(3L)._6 == "latin")
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L, "none", 0.0)))
    assert(got(5L)._6 == "latin" && got(5L)._5 == 3L)
  }

  test("every script class counts its own sample") {
    val samples = Seq(
      ("latin", "abc"), ("cyrillic", "мир"), ("greek", "αβγ"),
      ("arabic", "كتب"), ("hebrew", "שלום"), ("devanagari", "नमस"),
      ("han", "中文"), ("hiragana", "ひらが"), ("katakana", "カタカ"),
      ("hangul", "한국"))
    val df = samples.zipWithIndex
      .map { case ((_, s), i) => (i.toLong, s) }.toDF("doc_id", "text")
    val prof = ScriptOps.scriptProfile(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    samples.zipWithIndex.foreach { case ((name, s), i) =>
      val r = prof(i)
      assert(r.getAs[String]("dominant") == name,
        s"$s must classify as $name, got ${r.getAs[String]("dominant")}")
      assert(r.getAs[Long](name) == s.length.toLong)
    }
  }
}
