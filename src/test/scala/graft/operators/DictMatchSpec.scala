package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/** Aho–Corasick dictionary scan vs a naive slide-and-compare reference
  * (every position × every phrase — nothing shared with the automaton). */
class DictMatchSpec extends SparkSuite {
  import spark.implicits._

  /** (total matches, distinct phrases) by brute force. */
  private def naive(text: String, phrases: Seq[String]): (Long, Long) = {
    val counts = phrases.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }
    (counts.sum, counts.count(_ > 0).toLong)
  }

  private def run(texts: Seq[String], phrases: Seq[String]): Map[String, (Long, Long)] =
    texts.toDF("text")
      .select(col("text"), DictMatch.stats(col("text"), phrases).as("m"))
      .collect()
      .map(r => (r.getString(0), (r.getStruct(1).getLong(0),
        r.getStruct(1).getLong(1)))).toMap

  test("overlapping and nested phrases all count") {
    val phrases = Seq("aa", "aaa", "ab", "b")
    // "aaab": aa at 0,1; aaa at 0; ab at 2; b at 3 → 5 total, 4 distinct
    val got = run(Seq("aaab", "", "zzz"), phrases)
    assert(got("aaab") == (5L, 4L))
    assert(got("") == (0L, 0L))
    assert(got("zzz") == (0L, 0L))
    assert(got.forall { case (t, s) => s == naive(t, phrases) })
  }

  test("phrase that is a suffix of another is found via the failure chain") {
    val phrases = Seq("table", "able", "le")
    val got = run(Seq("a table", "tab", "lele"), phrases)
    assert(got("a table") == (3L, 3L)) // table, able, le
    assert(got("tab") == (0L, 0L))
    assert(got("lele") == (2L, 1L)) // le at 0 and 2
    assert(got.forall { case (t, s) => s == naive(t, phrases) })
  }

  test("null text yields null; matches cross token boundaries") {
    val phrases = Seq("value table", "ue t")
    val got = Seq(Some("value table x"), None).toDF("text")
      .select(DictMatch.stats(col("text"), phrases).as("m"))
      .collect()
    assert(got(0).getStruct(0).getLong(0) == 2L)
    assert(got(1).isNullAt(0))
  }

  test("property: any text, any dictionary — equals brute force") {
    val genText = Gen.choose(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genPhrase = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genDict = Gen.nonEmptyListOf(genPhrase).map(_.distinct)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30),
      Prop.forAllNoShrink(Gen.nonEmptyListOf(genText), genDict) { (texts, dict) =>
        val got = run(texts.distinct, dict)
        texts.distinct.forall { t =>
          got(t) == naive(t, dict)
        } :| s"texts=$texts dict=$dict got=$got"
      })
    assert(res.passed, res.status.toString)
  }
}
