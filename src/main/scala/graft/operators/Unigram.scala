package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.plans.UnigramEncodeExpr

/**
 * SentencePiece-style unigram-LM tokenizer (Kudo 2018, "Subword
 * Regularization: Improving Neural Network Translation Models with
 * Multiple Subword Candidates", arXiv:1804.10959): a piece vocabulary
 * with probabilities trained by EM over each word's segmentation lattice,
 * encoded per word by Viterbi — the OTHER major subword family next to
 * [[Bpe]] (greedy merges), completing the tokenizer pair a pretraining
 * pipeline chooses between.
 *
 * Distributed formulation — identical to [[Bpe]]'s: ONE corpus aggregate
 * builds the (word, freq) vocabulary (bounded by `minFreq`/`topM`, the
 * same web-tail guard), training then runs DRIVER-SIDE on the
 * vocabulary-sized table — 100 TB and 100 MB of text train at identical
 * cost once the word counts exist. The lattice EM is O(Σ|word|·maxLen)
 * per round over DISTINCT words, not corpus tokens.
 *
 * Cross-engine exactness: all training arithmetic stays in RAW
 * probability space — only + · / on IEEE doubles, no log/exp (whose libm
 * implementations differ in the last ulp between runtimes) — with every
 * summation in piece-sorted or word-sorted order, so the trained
 * probabilities are BIT-IDENTICAL to the independent Python reference
 * (`tools/unigram_reference.py`) and the pinned oracle compares them
 * after a 9-decimal round. Raw-space products underflow only beyond
 * ~150-character words at these probabilities — fine for whitespace
 * words; a log-space variant would trade the exactness pin for range.
 *
 * Encoding is a map-side native expression ([[UnigramEncodeExpr]]): the
 * trained model rides the plan as literals, the per-word Viterbi DP runs
 * inside whole-stage codegen — no join, no shuffle, no state.
 */
object Unigram {

  /** Trained model: (piece, probability) sorted by piece. */
  type Model = Seq[(String, Double)]

  /** Seed vocabulary: every substring of length ≤ `maxLen` counted once
    * per occurrence position weighted by word frequency; all single
    * characters plus the top (seedSize − #chars) multi-char substrings by
    * (count desc, piece asc). */
  private[operators] def seedLocal(
      vocab: Seq[(String, Long)],
      maxLen: Int,
      seedSize: Int): Seq[(String, Long)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    vocab.sortBy(_._1).foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lim = math.min(maxLen, w.length - i)
        while (l <= lim) {
          val s = w.substring(i, i + l)
          counts.update(s, counts.getOrElse(s, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val singles = counts.keys.filter(_.length == 1).toSeq.sorted
    val multi = counts.keys.filter(_.length > 1).toSeq
      .sortBy(s => (-counts(s), s))
      .take(math.max(0, seedSize - singles.size))
    (singles ++ multi).sorted.map(s => (s, counts(s)))
  }

  /** One E-step: expected piece counts from forward–backward over each
    * word's lattice, words visited in sorted order, span starts ascending
    * — the exact loop order of the Python reference. */
  private def latticeExpected(
      vocab: Seq[(String, Long)],
      probs: Map[String, Double],
      maxLen: Int): scala.collection.mutable.HashMap[String, Double] = {
    val expected = scala.collection.mutable.HashMap.empty[String, Double]
    probs.keys.foreach(s => expected.update(s, 0.0))
    vocab.sortBy(_._1).foreach { case (w, f) =>
      val n = w.length
      val alpha = new Array[Double](n + 1)
      alpha(0) = 1.0
      var i = 1
      while (i <= n) {
        var j = math.max(0, i - maxLen)
        while (j < i) {
          probs.get(w.substring(j, i)).foreach(p => alpha(i) += alpha(j) * p)
          j += 1
        }
        i += 1
      }
      val beta = new Array[Double](n + 1)
      beta(n) = 1.0
      i = n - 1
      while (i >= 0) {
        var j = i + 1
        val lim = math.min(n, i + maxLen)
        while (j <= lim) {
          probs.get(w.substring(i, j)).foreach(p => beta(i) += p * beta(j))
          j += 1
        }
        i -= 1
      }
      val z = alpha(n)
      if (z > 0.0) {
        i = 0
        while (i < n) {
          var j = i + 1
          val lim = math.min(n, i + maxLen)
          while (j <= lim) {
            val s = w.substring(i, j)
            probs.get(s).foreach { p =>
              expected.update(s,
                expected(s) + f * (alpha(i) * p * beta(j) / z))
            }
            j += 1
          }
          i += 1
        }
      }
    }
    expected
  }

  /** Piece-sorted-order sum then divide — the normalization both engines
    * perform identically. */
  private def normalized(weights: Seq[(String, Double)]): Model = {
    val sorted = weights.sortBy(_._1)
    var total = 0.0
    sorted.foreach { case (_, v) => total += v }
    sorted.map { case (s, v) => (s, v / total) }
  }

  /** Driver-side EM training on a (word, freq) vocabulary. */
  def trainLocal(
      vocab: Seq[(String, Long)],
      maxLen: Int = 4,
      seedSize: Int = 1000,
      emIters: Int = 2,
      vocabSize: Int = 100): Model = {
    require(maxLen >= 1 && emIters >= 0 && vocabSize >= 1 && seedSize >= 1,
      "unigram: parameters must be positive")
    var probs: Model =
      normalized(seedLocal(vocab, maxLen, seedSize)
        .map { case (s, c) => (s, c.toDouble) })
    for (_ <- 1 to emIters) {
      val expected = latticeExpected(vocab, probs.toMap, maxLen)
      probs = normalized(probs.map { case (s, _) => (s, expected(s)) })
    }
    // prune: all single chars survive (any word stays segmentable), top
    // multi-char pieces by probability
    val byPiece = probs.toMap
    val singles = probs.collect { case (s, _) if s.length == 1 => s }
    val multi = probs.collect { case (s, _) if s.length > 1 => s }
      .sortBy(s => (-byPiece(s), s))
      .take(math.max(0, vocabSize - singles.size))
    normalized((singles ++ multi).sorted.map(s => (s, byPiece(s))))
  }

  /** Train on a vocabulary DataFrame with the SAME bounded collect as
    * [[Bpe.train]]: `minFreq` filters the crawl tail, at most `topM` words
    * (freq desc, word asc) reach the driver. */
  def train(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      maxLen: Int = 4,
      seedSize: Int = 1000,
      emIters: Int = 2,
      vocabSize: Int = 100,
      minFreq: Long = 1L,
      topM: Int = Bpe.DefaultMaxVocab): Model =
    trainLocal(Bpe.boundedVocabCollect(vocab, wordCol, freqCol, minFreq, topM),
      maxLen, seedSize, emIters, vocabSize)

  /** Viterbi segmentation of one word column under `model` — a map-side
    * native expression, model as literals. */
  def encode(word: Column, model: Model, maxLen: Int = 4): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      UnigramEncodeExpr(ColumnBridge.expression(word), model, maxLen))
  }

  /**
   * Per-document encoding statistics under `model`: word count, total
   * piece count, pieces-per-word ratio — [[Bpe.encodeStats]]'s shape with
   * the Viterbi DP in place of the merge-chain replaces. Pure projection;
   * documents with no tokens are dropped.
   */
  def encodeStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      maxLen: Int = 4): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        aggregate(
          transform(col("w"), w => size(encode(w, model, maxLen)).cast("long")),
          lit(0L), (a, x) => a + x).as("n_pieces"))
      .withColumn("ratio",
        round(col("n_pieces").cast("double") / col("n_words").cast("double"), 6))
}
