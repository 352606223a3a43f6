package graft.operators

import graft.SparkSuite

class LineRulesSpec extends SparkSuite {
  import spark.implicits._

  test("c4LineFilter: punctuation, word-count, blocklist, min-lines rules") {
    val docs = Seq(
      // doc 1: three lines — one clean keeper, one unterminated, one short
      (1L, "alpha beta gamma delta echo foxtrot.\n" +
        "bravo charlie delta echo golf hotel\n" +
        "tiny line."),
      // doc 2: two keepers (one ends in ?, one in .), survives minLines=2
      (2L, "one two three four five six?\n" +
        "seven eight nine ten eleven twelve."),
      // doc 3: blocklisted word kills its only long line -> doc drops
      (3L, "spark alpha beta gamma delta echo."),
      // doc 4: blocklisted word only as line-terminal token with punct —
      // still caught (tokens are checked after punctuation strip)
      (4L, "alpha beta gamma delta spark.\n" +
        "india juliet kilo lima mike november.")
    ).toDF("doc_id", "text")
    val out = LineRules.c4LineFilter(docs, "doc_id", "text",
        minWords = 5, minLines = 1, blocklist = Seq("spark"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 4L), out.mkString(","))
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == "alpha beta gamma delta echo foxtrot." &&
      byId(1L)._3 == 1L)
    assert(byId(2L)._3 == 2L)
    assert(byId(2L)._2 ==
      "one two three four five six?\nseven eight nine ten eleven twelve.")
    // doc 4 keeps only the non-blocklisted line
    assert(byId(4L)._2 == "india juliet kilo lima mike november." &&
      byId(4L)._3 == 1L)
  }

  test("c4LineFilter: minLines drops docs with too few survivors") {
    val docs = Seq(
      (1L, "alpha beta gamma delta echo.\nzulu yankee xray whiskey victor."),
      (2L, "alpha beta gamma delta echo.")
    ).toDF("doc_id", "text")
    val out = LineRules.c4LineFilter(docs, "doc_id", "text",
        minWords = 5, minLines = 2, blocklist = Nil)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), out.toString)
  }
}
