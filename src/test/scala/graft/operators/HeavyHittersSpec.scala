package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  test("capacity >= distinct: counts are exact, order deterministic") {
    val toks = Seq.fill(10)("a") ++ Seq.fill(7)("b") ++ Seq.fill(7)("c") ++
      Seq.fill(1)("d")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .shuffle(toks).toDF("t").repartition(8)
    val out = HeavyHitters.topTokens(df, col("t"), capacity = 16, n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 10L), ("b", 7L), ("c", 7L)), out.toString)
  }

  test("under eviction: guaranteed survivors, bounded undercount") {
    // N = 40: a=20, b=10, rest singletons. capacity k=4 -> any token with
    // freq > N/(k+1) = 8 MUST survive, undercounting by at most 8.
    val toks = Seq.fill(20)("a") ++ Seq.fill(10)("b") ++
      (1 to 10).map(i => s"z$i")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(3))
      .shuffle(toks).toDF("t").repartition(8)
    val got = HeavyHitters.summary(df, col("t"), capacity = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.contains("a") && got("a") >= 20L - 8L && got("a") <= 20L,
      got.toString)
    assert(got.getOrElse("b", 0L) <= 10L, got.toString)
    assert(got.size <= 4, s"summary must stay within capacity: $got")
    // every reported count is a valid lower bound
    got.foreach { case (t, c) =>
      val truth = toks.count(_ == t).toLong
      assert(c <= truth, s"$t reported $c > true $truth")
    }
  }

  test("streaming summary: exact when capacity suffices; bounded state") {
    import graft.streaming.Streams
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d"),
      (3L, "a c")).toDF("doc_id", "text")
    val out = Streams.topTokensStream(spark, docs, capacity = 16, n = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 5L), ("b", 3L), ("c", 2L)), out.toString)
  }

  test("merge across many partitions preserves the exact-path totals") {
    // same multiset split across 32 partitions: partial summaries merge
    // without losing counts when nothing evicts
    val toks = (1 to 26).flatMap(i => Seq.fill(i)(('a' + i - 1).toChar.toString))
    val df = toks.toDF("t").repartition(32)
    val out = HeavyHitters.summary(df, col("t"), capacity = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == (1 to 26).map(i => ('a' + i - 1).toChar.toString -> i.toLong)
      .toMap, out.toString)
  }
}
