package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** WordPiece trainer/encoder vs the independent
  * tools/wordpiece_reference.py values (naive full-recount trainer there,
  * incremental counts here — same likelihood rule). */
class WordPieceSpec extends SparkSuite {
  import spark.implicits._

  private val pinnedVocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
    ("widest", 3L), ("lowest", 4L))

  private lazy val merges = WordPiece.trainLocal(pinnedVocab, 8)
  private lazy val pieceSet = WordPiece.pieces(pinnedVocab, merges)

  test("trainLocal matches the independent Python reference exactly") {
    val got = merges.map { m =>
      (m.rank, m.left, m.right, m.cnt,
        BigDecimal(m.score).setScale(9, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val want = Seq(
      (1, "##i", "##d", 3L, 0.333333333),
      (2, "w", "##id", 3L, 0.333333333),
      (3, "l", "##o", 11L, 0.090909091),
      (4, "##s", "##t", 13L, 0.076923077),
      (5, "lo", "##w", 11L, 0.058823529),
      (6, "##e", "##r", 2L, 0.047619048),
      (7, "low", "##er", 2L, 0.090909091),
      (8, "##e", "##st", 13L, 0.052631579))
    assert(got == want)
  }

  test("greedy encode matches the reference; unmatchable words are one UNK") {
    val words = Seq("lowest", "newest", "low", "wider", "newlow", "elow", "zzz")
      .toDF("word")
    val got = words
      .select(col("word"),
        array_join(WordPiece.encode(col("word"), pieceSet), " ").as("pieces"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("lowest") == "low ##est")
    assert(got("newest") == "n ##e ##w ##est")
    assert(got("low") == "low")
    assert(got("wider") == "wid ##er")
    // '##l' never occurs (l is only ever word-initial): BERT's rule voids
    // the whole word, it does not emit a partial segmentation
    assert(got("newlow") == WordPiece.UnkPiece)
    assert(got("elow") == WordPiece.UnkPiece)
    assert(got("zzz") == WordPiece.UnkPiece)
  }

  test("encode: matched pieces reassemble the word; astral chars are one unit") {
    val x = new String(Character.toChars(0x1D54F)) // UTF-16 surrogate pair
    val vocab = Seq((s"a${x}b", 1L))
    val ms = WordPiece.trainLocal(vocab, 2)
    // merges: ties at score 1 break by pair UTF-8 order, so ("##X", "##b")
    // merges first, then ("a", "##Xb")
    val ps = WordPiece.pieces(vocab, ms)
    val got = Seq(s"a${x}b", s"a$x", "ab").toDF("word")
      .select(col("word"), WordPiece.encode(col("word"), ps).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(got(s"a${x}b") == Seq(s"a${x}b"))
    assert(got(s"a$x") == Seq("a", s"##$x"))
    // 'b' only occurs as a continuation: word-initial 'b' has no piece
    assert(got("ab") == Seq("a", s"##b"))
  }

  test("merged symbols keep the left form's continuation prefix") {
    // "##s  ##t" -> "##st": the continuation marker survives the merge
    assert(merges.find(m => m.left == "##s" && m.right == "##t")
      .map(_.merged).contains("##st"))
    assert(merges.find(m => m.left == "w" && m.right == "##id")
      .map(_.merged).contains("wid"))
  }

  test("empty and null words; empty word encodes to empty array") {
    val got = Seq(Some(""), None).toDF("word")
      .select(WordPiece.encode(col("word"), pieceSet).as("p"))
      .collect()
    assert(got(0).getSeq[String](0) == Seq.empty)
    assert(got(1).isNullAt(0))
  }

  test("encodeStats drops empty docs; ratio is pieces per word") {
    val docs = Seq((1L, "lowest newest low"), (2L, ""), (3L, "zzz low"))
      .toDF("id", "text")
    val got = WordPiece.encodeStats(docs, "id", "text", pieceSet)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // lowest=2, newest=4, low=1 pieces; zzz=1 (UNK), low=1
    assert(got.toSeq == Seq((1L, 3L, 7L), (3L, 2L, 2L)))
  }
}
