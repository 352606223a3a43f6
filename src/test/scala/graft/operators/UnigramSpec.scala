package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Unigram-LM trainer/encoder vs the independent tools/unigram_reference.py
  * values (raw-probability-space EM — bit-identical op sequence, compared
  * after the 9-decimal round). */
class UnigramSpec extends SparkSuite {
  import spark.implicits._

  private val pinnedVocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
    ("widest", 3L), ("lowest", 4L))

  private lazy val model =
    Unigram.trainLocal(pinnedVocab, maxLen = 4, seedSize = 30,
      emIters = 2, vocabSize = 15)

  test("trainLocal matches the independent Python reference exactly") {
    val got = model.map { case (s, p) =>
      (s, BigDecimal(p).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val want = Seq(
      ("d", 0.041268399), ("e", 0.005874964), ("est", 0.194856490),
      ("i", 0.087650864), ("l", 0.000140486), ("low", 0.221547923),
      ("lowe", 0.081095236), ("n", 0.000132884), ("new", 0.073616489),
      ("o", 0.000008082), ("r", 0.058433909), ("s", 0.000217430),
      ("st", 0.124118211), ("t", 0.012880653), ("w", 0.098157979))
    assert(got == want)
    // probabilities are a distribution
    assert(math.abs(model.map(_._2).sum - 1.0) < 1e-12)
  }

  test("viterbi encode matches the reference segmentations, UNK chars pass") {
    val words = Seq("lowest", "newest", "low", "wider", "newlow", "zzz")
      .toDF("word")
    val got = words
      .select(col("word"),
        array_join(Unigram.encode(col("word"), model, 4), " ").as("pieces"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("lowest") == "low est")
    assert(got("newest") == "new est")
    assert(got("low") == "low")
    assert(got("wider") == "w i d e r")
    assert(got("newlow") == "new low")
    // 'z' is not in the model: UNK singletons keep every word segmentable
    assert(got("zzz") == "z z z")
  }

  test("viterbi: long words segment through the underflow rescale") {
    // pre-rescale, a ~37+-char out-of-model word drove best(i) to 0.0 and
    // fell out as ONE bogus whole-word piece; the exact 2^600 live-window
    // rescale must keep segmenting arbitrarily long words
    val unk = "z" * 64
    val lows = "low" * 40 // 120 chars of model pieces
    val got = Seq(unk, lows).toDF("word")
      .select(col("word"), Unigram.encode(col("word"), model, 4).as("p"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1))).toMap
    assert(got(unk) == Seq.fill(64)("z"),
      s"UNK singletons expected, got ${got(unk).take(5)}... (${got(unk).size})")
    assert(got(lows) == Seq.fill(40)("low"), got(lows).take(5).toString)
  }

  test("viterbi: astral characters are ONE code-point UNK piece, not halves") {
    // U+1D54F (math double-struck X) is a surrogate pair in UTF-16: the
    // DP must segment on code points (the Python reference's indexing) —
    // a UTF-16-unit DP would emit two lone-surrogate pieces that mangle
    // to '?' on UTF-8 conversion and never reassemble
    val x = new String(Character.toChars(0x1D54F))
    val got = Seq(s"a${x}b").toDF("word")
      .select(Unigram.encode(col("word"), model, 4).as("p"))
      .collect()(0).getSeq[String](0)
    assert(got == Seq("a", x, "b"), got.toString)
    assert(got.mkString("") == s"a${x}b")
  }

  test("encodeStats: pieces reassemble words; ratio bounded by chars") {
    val docs = Seq((1L, "lowest newest low"), (2L, ""), (3L, "newlow"))
      .toDF("id", "text")
    val rows = Unigram.encodeStats(docs, "id", "text", model).orderBy("id")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L), "empty doc dropped")
    assert(rows(0).getLong(1) == 3L && rows(0).getLong(2) == 5L) // low est|new est|low
    assert(rows(1).getLong(2) == 2L)
    // every word's segmentation concatenates back to the word
    val joined = Seq(Tuple1("lowest")).toDF("w")
      .select(concat_ws("", Unigram.encode(col("w"), model, 4)).as("c"))
      .collect()(0).getString(0)
    assert(joined == "lowest")
  }

  test("train: the bounded collect truncates like Bpe.train") {
    val vocab = (pinnedVocab :+ (("tail1xq", 1L)) :+ (("tail2zj", 1L)))
      .toDF("word", "freq")
    val truncated = Unigram.train(vocab, "word", "freq",
      maxLen = 4, seedSize = 30, emIters = 2, vocabSize = 15, minFreq = 2L)
    assert(truncated == model,
      "minFreq=2 must drop exactly the singleton tail")
  }
}
