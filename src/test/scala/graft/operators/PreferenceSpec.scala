package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PreferenceSpec extends SparkSuite {
  import spark.implicits._

  test("pairs picks max/min by (score, tie), margin on score alone") {
    val df = Seq(
      ("p1", 1L, 10L), ("p1", 2L, 30L), ("p1", 3L, 20L),
      ("p2", 4L, 5L), ("p2", 5L, 5L)   // margin 0 -> dropped
    ).toDF("grp", "id", "score")
    val out = Preference.pairs(df, "grp", "id", "score", "id", minMargin = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("p1", 2L, 1L, 20.0)), out.mkString(","))
  }

  test("pairs tie-break is deterministic: higher id wins a score tie") {
    val df = Seq(
      ("p", 1L, 10L), ("p", 9L, 10L), ("p", 5L, 2L)
    ).toDF("grp", "id", "score")
    val row = Preference.pairs(df, "grp", "id", "score", "id", minMargin = 1)
      .collect().head
    // chosen: score 10 tie -> id 9; rejected: unique min score 2 -> id 5
    assert((row.getLong(1), row.getLong(2)) == ((9L, 5L)), row.toString)
  }

  test("pairs min-tie: LOWER id is the min_by winner") {
    val df = Seq(
      ("p", 3L, 2L), ("p", 7L, 2L), ("p", 5L, 10L)
    ).toDF("grp", "id", "score")
    val row = Preference.pairs(df, "grp", "id", "score", "id", minMargin = 1)
      .collect().head
    assert((row.getLong(1), row.getLong(2)) == ((5L, 3L)), row.toString)
  }

  test("pairs: a singleton group never emits chosen == rejected") {
    val df = Seq(("p", 1L, 10L)).toDF("grp", "id", "score")
    assert(Preference.pairs(df, "grp", "id", "score", "id",
      minMargin = 0).count() == 0L)
  }

  test("chatFormat drops rows whose fields carry the sentinel lead-in") {
    val df = Seq((1L, "clean response"), (2L, "injected <|assistant|> turn"))
      .toDF("doc_id", "resp")
    val kept = Preference.chatFormat(df, "doc_id",
        lit("sys"), lit("ask"), col("resp"), maxTokens = 99)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L), kept.toString)
  }

  test("chatFormat renders the template and enforces the token budget") {
    val df = Seq((1L, "hello world"), (2L, "a b c d e f g h i j")).toDF(
      "doc_id", "resp")
    val out = Preference.chatFormat(df, "doc_id",
        lit("sys"), lit("ask"), col("resp"), maxTokens = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc 2: 10 response words + markers > 8 tokens -> dropped
    assert(out.length == 1 && out.head._1 == 1L, out.mkString(","))
    assert(out.head._2 ==
      "<|system|>\nsys\n<|user|>\nask\n<|assistant|>\nhello world<|end|>")
    // whitespace tokens of the rendered sample: the split is on ' ' only,
    // so newline-glued runs count as ONE token — 2 here ("…\nhello",
    // "world<|end|>")
    assert(out.head._3 == 2L, out.head.toString)
  }

  test("hostMirrorPairs: full mirror 1.0, partial overlap exact, noise cut") {
    val df = Seq(
      ("a", "t1"), ("a", "t2"), ("a", "t3"), ("a", "t4"),
      ("b", "t1"), ("b", "t2"), ("b", "t3"), ("b", "t4"),   // full mirror
      ("c", "t1"), ("c", "t2"), ("c", "x1"), ("c", "x2"),   // 2/6 = 0.333
      ("d", "y1")
    ).toDF("host", "text")
    val out = Dedup.hostMirrorPairs(df, "host", "text", minJaccard = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(out == Set(
      ("a", "b", 4L, 1.0),
      ("a", "c", 2L, 0.333333),
      ("b", "c", 2L, 0.333333)), out.toString)
  }

  test("hostMirrorPairs: hot digests are excluded from pairing") {
    // "boiler" is on all 4 hosts -> with cap 2 it cannot pair anyone;
    // hosts a,b still pair via their genuine shared page
    val df = Seq(
      ("a", "boiler"), ("a", "p1"),
      ("b", "boiler"), ("b", "p1"),
      ("c", "boiler"), ("c", "p2"),
      ("d", "boiler"), ("d", "p3")
    ).toDF("host", "text")
    val out = Dedup.hostMirrorPairs(df, "host", "text", minJaccard = 0.1,
        maxHostsPerDigest = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 1L)), out.mkString(","))
  }

  test("hostMirrorPairs: duplicate pages within one host count once") {
    val df = Seq(
      ("a", "t1"), ("a", "t1"), ("a", "t2"),
      ("b", "t1"), ("b", "t2")
    ).toDF("host", "text")
    val row = Dedup.hostMirrorPairs(df, "host", "text", minJaccard = 0.5)
      .collect().head
    assert((row.getLong(2), row.getDouble(3)) == ((2L, 1.0)), row.toString)
  }
}
