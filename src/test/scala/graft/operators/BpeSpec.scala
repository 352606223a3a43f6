package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** BPE trainer/encoder vs the independent tools/bpe_reference.py values. */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private val sennrich = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
    ("widest", 3L), ("lowest", 4L)).toDF("word", "freq")

  test("train: merge sequence matches the independent Python reference") {
    val got = Bpe.train(sennrich, "word", "freq", 8)
      .map(m => (m.rank, m.left, m.right, m.cnt))
    val want = Seq(
      (1, "e", "s", 13L), (2, "es", "t", 13L), (3, "l", "o", 11L),
      (4, "lo", "w", 11L), (5, "e", "w", 6L), (6, "ew", "est", 6L),
      (7, "n", "ewest", 6L), (8, "low", "est", 4L))
    assert(got == want)
  }

  test("train: stops early when the vocabulary runs out of pairs") {
    val tiny = Seq(("ab", 3L)).toDF("word", "freq")
    val merges = Bpe.train(tiny, "word", "freq", 5)
    assert(merges.map(m => (m.left, m.right)) == Seq(("a", "b")),
      "one merge exhausts a single two-char word")
  }

  test("merge application is non-overlapping left-to-right") {
    // "a a a a a" under merge (a,a): pairs counted 4, merged to aa aa a
    val v = Seq(("aaaaa", 1L)).toDF("word", "freq")
    val merges = Bpe.train(v, "word", "freq", 1)
    assert(merges.head.pair == "a  a" && merges.head.cnt == 4L)
    val stats = Bpe.encodeStats(Seq((1L, "aaaaa")).toDF("id", "text"),
      "id", "text", merges).collect()(0)
    assert(stats.getLong(2) == 3L, "aa aa a = 3 pieces")
  }

  test("encodeStats: known words under the pinned merges") {
    val merges = Bpe.train(sennrich, "word", "freq", 8)
    // reference: lowest->1 piece, newest->1, wider->5, low->1
    val docs = Seq((1L, "lowest newest wider low")).toDF("id", "text")
    val r = Bpe.encodeStats(docs, "id", "text", merges).collect()(0)
    assert(r.getLong(1) == 4L && r.getLong(2) == 8L)
    assert(r.getDouble(3) == 2.0)
  }

  test("encodeStats: empty docs dropped, pieces never exceed chars") {
    val docs = Seq((1L, ""), (2L, "low lower")).toDF("id", "text")
    val merges = Bpe.train(sennrich, "word", "freq", 8)
    val rows = Bpe.encodeStats(docs, "id", "text", merges).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
    assert(rows(0).getLong(2) >= rows(0).getLong(1),
      "at least one piece per word")
  }
}
