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

  test("encodeStatsPretokenized: per-piece encode, boundaries uncrossed") {
    // no merges: bpe pieces = visible (non-framing-space) chars per piece
    val df = Seq((1L, "ab c d't")).toDF("id", "text")
    val r0 = Bpe.encodeStatsPretokenized(df, "id", "text", Seq.empty)
      .collect()(0)
    // pieces: ["ab", " c", " d", "'t"] — leading spaces drop from the
    // symbol framing, so 2+1+1+2 symbols
    assert(r0.getLong(1) == 4L, r0.toString)
    assert(r0.getLong(2) == 6L, r0.toString)
    // one deterministic merge (a,a): "aa" merges inside a piece, and the
    // piece boundary between "aa" and " baa" keeps their a's apart
    val merges = Bpe.train(Seq(("aa", 5L)).toDF("word", "freq"),
      "word", "freq", 1)
    val r1 = Bpe.encodeStatsPretokenized(
      Seq((1L, "aa baa")).toDF("id", "text"), "id", "text", merges)
      .collect()(0)
    // "aa" -> [aa] = 1; " baa" -> [b, aa] = 2
    assert(r1.getLong(1) == 2L && r1.getLong(2) == 3L, r1.toString)
    // empty docs drop like encodeStats
    assert(Bpe.encodeStatsPretokenized(
      Seq((1L, "")).toDF("id", "text"), "id", "text", merges).count() == 0L)
  }

  test("encodeStats: empty docs dropped, pieces never exceed chars") {
    val docs = Seq((1L, ""), (2L, "low lower")).toDF("id", "text")
    val merges = Bpe.train(sennrich, "word", "freq", 8)
    val rows = Bpe.encodeStats(docs, "id", "text", merges).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
    assert(rows(0).getLong(2) >= rows(0).getLong(1),
      "at least one piece per word")
  }

  /** Obviously-correct sequential reference: FULL pair recount every round
    * (no incremental bookkeeping), same symbol-string encoding and replace
    * semantics. The incremental trainer must reproduce its merge sequence
    * exactly — this is what makes 32k-merge training trustworthy without
    * 32k Spark jobs. */
  private def naiveTrain(vocab: Seq[(String, Long)], k: Int): Seq[(String, Long)] = {
    var words = vocab.map { case (w, f) => (" " + w.replaceAll("(.)", "$1  "), f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    var r = 0
    var done = false
    while (r < k && !done) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      for ((s, f) <- words) {
        val sy = s.trim.split("  ")
        for (i <- 0 until sy.length - 1)
          counts.update(sy(i) + "  " + sy(i + 1),
            counts.getOrElse(sy(i) + "  " + sy(i + 1), 0L) + f)
      }
      if (counts.isEmpty) done = true
      else {
        val (p, c) = counts.toSeq.minBy { case (p0, c0) => (-c0, p0) }
        out += ((p, c))
        words = words.map { case (s, f) =>
          (s.replace(" " + p + " ", " " + p.replace("  ", "") + " "), f) }
      }
      r += 1
    }
    out.toSeq
  }

  test("trainLocal: 80 merges match the full-recount reference, zero jobs per merge") {
    // deterministic synthetic vocabulary: enough pair diversity to sustain
    // 80+ merges, with colliding counts to exercise the UTF-8 tie-break
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    val vocab = (1 to 300).map { _ =>
      val len = 4 + rnd.nextInt(5)
      val w = (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (w, (1 + rnd.nextInt(9)).toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val got = Bpe.trainLocal(vocab, 80).map(m => (m.pair, m.cnt))
    val want = naiveTrain(vocab, 80)
    assert(got.size >= 64, s"fixture must sustain >= 64 merges, got ${got.size}")
    assert(got == want, "incremental trainer must reproduce the sequential " +
      "full-recount merge sequence exactly")
    // ranks are 1..n in order
    val ranked = Bpe.trainLocal(vocab, 80)
    assert(ranked.map(_.rank) == (1 to ranked.size))
  }

  test("train: minFreq/topM truncation bounds the collect, deterministically") {
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 4L), ("typo1xz", 1L), ("typo2qj", 1L))
      .toDF("word", "freq")
    // minFreq = 2 drops exactly the singleton crawl tail: training equals
    // training on the hand-truncated vocabulary
    val got = Bpe.train(vocab, "word", "freq", 8, minFreq = 2L)
      .map(m => (m.rank, m.pair, m.cnt))
    val want = Bpe.train(sennrich, "word", "freq", 8)
      .map(m => (m.rank, m.pair, m.cnt))
    assert(got == want)
    // topM keeps the highest-frequency words (freq desc, word asc):
    // top-3 of the mixed vocab is {newest, low, lowest}
    val top3 = Bpe.train(vocab, "word", "freq", 2, topM = 3)
    val manual = Bpe.trainLocal(
      Seq(("newest", 6L), ("low", 5L), ("lowest", 4L)), 2)
    assert(top3.map(m => (m.pair, m.cnt)) == manual.map(m => (m.pair, m.cnt)))
  }

  test("trainLocal: a 32k-merge train on a bounded vocab stays driver-feasible") {
    // ~40k distinct pseudo-random words (the topM shape a truncated 100 TB
    // vocabulary collect produces): the lazy-deletion heap argmax must
    // sustain 32768 merges without per-round O(distinct pairs) scans
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefghijklmnop"
    val vocab = (1 to 40000).map { _ =>
      val len = 6 + rnd.nextInt(7)
      val w = (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (w, (1 + rnd.nextInt(99)).toLong)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    val t0 = System.nanoTime()
    val merges = Bpe.trainLocal(vocab, 32768)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size == 32768, s"vocab must sustain 32k merges, got ${merges.size}")
    assert(merges.map(_.rank) == (1 to 32768))
    // counts are non-increasing only per-pair, but the heap must never
    // return a pair with a stale (higher) count: spot-check monotone sanity
    assert(merges.head.cnt >= merges.last.cnt)
    assert(secs < 120.0, f"32k merges took $secs%.1f s — argmax has regressed")
  }
}
