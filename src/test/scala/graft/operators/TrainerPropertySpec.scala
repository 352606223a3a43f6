package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/** Brute-force property checks for the round's trainer/index operators:
  * the distributed plans must equal obviously-correct sequential
  * definitions on arbitrary inputs. */
class TrainerPropertySpec extends SparkSuite {
  import spark.implicits._

  private def run(prop: Prop, n: Int = 15): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** Sequential reference for [[Classifier.train]]: the same integer
    * micro-unit arithmetic written as plain driver loops — no Spark, no
    * map-side combine, nothing shared with the operator's plan. */
  private def naiveTrain(
      docs: Seq[(String, Long)], buckets: Int, iters: Int): (Array[Long], Long) = {
    val S = Classifier.Scale
    def cells(text: String): Seq[Long] =
      text.split(" ").filter(_.nonEmpty).toSeq
        .map { t =>
          val h = t.foldLeft(0L)((a, c) =>
            (a * 31 + c.toLong) % graft.functions.TextOps.TokenMod)
          val v = h * Classifier.Mult % buckets
          if (v < 0) v + buckets else v
        }
    val w = new Array[Long](buckets)
    var bias = 0L
    val n = docs.size
    for (_ <- 1 to iters) {
      val g = new Array[Long](buckets)
      var gBias = 0L
      docs.foreach { case (text, y) =>
        val mU = cells(text).map(c => w(c.toInt)).sum + bias
        val m = mU.toDouble / S
        val p = 0.5 + 0.5 * (m / (1.0 + math.abs(m)))
        val rq = math.floor((p - y) * S).toLong
        cells(text).foreach(c => g(c.toInt) += rq)
        gBias += rq
      }
      var j = 0
      while (j < buckets) {
        w(j) -= math.floor(g(j).toDouble / n.toDouble).toLong
        j += 1
      }
      bias -= math.floor(gBias.toDouble / n.toDouble).toLong
    }
    (w, bias)
  }

  test("classifier training equals the sequential reference, any corpus") {
    val word = Gen.oneOf("aa", "bb", "cc", "dd", "spam", "good", "x")
    val genDoc = for {
      ws <- Gen.listOfN(5, word)
      y <- Gen.oneOf(0L, 1L)
    } yield (ws.mkString(" "), y)
    val genDocs = Gen.nonEmptyListOf(genDoc)
    run(Prop.forAllNoShrink(genDocs) { docs =>
      val model = Classifier.train(docs.toDF("text", "y"), "text", "y",
        buckets = 16, iters = 2)
      val (w, bias) = naiveTrain(docs, 16, 2)
      (model.wUnits.toSeq == w.toSeq && model.biasUnits == bias) :|
        s"got=(${model.wUnits.toSeq}, ${model.biasUnits}) want=(${w.toSeq}, $bias)"
    })
  }

  test("indexed digest probe equals the rescan operator, any corpus/batch") {
    val text = Gen.oneOf("a", "b", "c", "dd", "ee", "ff gg", "hh ii jj")
    val genRows = Gen.nonEmptyListOf(text)
    val dir = java.nio.file.Files.createTempDirectory("didx_prop").toString
    Bucketing.scratchDb(spark, "didx_prop", dir)
    var trial = 0
    run(Prop.forAllNoShrink(genRows, genRows) { (corpusT, batchT) =>
      trial += 1
      val corpus = corpusT.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val batch = batchT.zipWithIndex.map { case (t, i) => (100L + i, t) }
        .toDF("id", "text")
      DedupIndex.writeDigestIndex(corpus, "id", "text",
        s"didx_prop.t$trial", buckets = 2)
      val indexed = DedupIndex.incrementalIndexed(batch, spark,
          s"didx_prop.t$trial", "id", "text")
        .select("id").collect().map(_.getLong(0)).toSet
      val rescan = Dedup.incremental(batch, corpus, "id", "text")
        .select("id").collect().map(_.getLong(0)).toSet
      (indexed == rescan) :| s"indexed=$indexed rescan=$rescan"
    }, n = 10)
  }

  /** Sequential reference for [[WordPiece.trainLocal]]: naive full
    * recount of pair and symbol tables every round over symbol LISTS —
    * no incremental counts, no occurrence index, no string-replace
    * encoding of the vocabulary (the Python reference's shape). */
  private def naiveWordPiece(
      vocab: Seq[(String, Long)], k: Int): Seq[(Int, String, Long, Double)] = {
    var words: Seq[(Seq[String], Long)] = vocab.map { case (w, f) =>
      val cps = w.codePoints().toArray.toSeq
        .map(cp => new String(Character.toChars(cp)))
      (cps.head +: cps.tail.map("##" + _), f)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long, Double)]
    for (rank <- 1 to k if words.exists(_._1.size >= 2)) {
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (sy, f) =>
        sy.foreach(s => symCnt.update(s, symCnt.getOrElse(s, 0L) + f))
        sy.zip(sy.tail).foreach(p =>
          pairCnt.update(p, pairCnt.getOrElse(p, 0L) + f))
      }
      val ((a, b), c) = pairCnt.minBy { case ((a, b), c) =>
        (-(c.toDouble / (symCnt(a).toDouble * symCnt(b).toDouble)),
          a + "  " + b)
      }
      val merged = a + b.stripPrefix("##")
      out += ((rank, a + "  " + b, c,
        c.toDouble / (symCnt(a).toDouble * symCnt(b).toDouble)))
      words = words.map { case (sy, f) =>
        val ns = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < sy.size) {
          if (i + 1 < sy.size && sy(i) == a && sy(i + 1) == b) {
            ns += merged; i += 2
          } else { ns += sy(i); i += 1 }
        }
        (ns.toSeq, f)
      }
    }
    out.toSeq
  }

  test("wordpiece training equals the naive full-recount reference, any vocab") {
    // ASCII-only alphabet, so the naive minBy's Java-string tie order
    // coincides with the trainer's UTF-8 byte order
    val word = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val entry = for {
      w <- word; f <- Gen.choose(1L, 9L)
    } yield (w, f)
    val genVocab = Gen.nonEmptyListOf(entry)
      .map(_.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq)
    run(Prop.forAllNoShrink(genVocab, Gen.choose(1, 12)) { (vocab, k) =>
      val got = WordPiece.trainLocal(vocab, k)
        .map(m => (m.rank, m.pair, m.cnt, m.score))
      val want = naiveWordPiece(vocab, k)
      (got == want) :| s"vocab=$vocab k=$k got=$got want=$want"
    }, n = 40)
  }

  test("viterbi encode maximizes the segmentation product, any short word") {
    val model = Unigram.trainLocal(
      Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
        ("widest", 3L), ("lowest", 4L)),
      maxLen = 4, seedSize = 30, emIters = 2, vocabSize = 15)
    val probs = model.toMap
    def pOf(s: String): Option[Double] =
      probs.get(s).orElse(
        if (s.length == 1) Some(graft.plans.UnigramEncodeExpr.PUnk) else None)
    // brute-force best LOG-mass over all segmentations — log space so the
    // reference itself cannot underflow on long words (memoized on suffix
    // length: O(len·maxLen) states)
    def bestLog(w: String): Double = {
      val memo = new Array[java.lang.Double](w.length + 1)
      def go(i: Int): Double = {
        if (i == w.length) 0.0
        else {
          if (memo(i) == null) {
            memo(i) = (1 to math.min(4, w.length - i)).flatMap { l =>
              pOf(w.substring(i, i + l)).map(p => math.log(p) + go(i + l))
            }.max
          }
          memo(i).doubleValue()
        }
      }
      go(0)
    }
    val chars = Gen.oneOf(('a' to 'z') ++ Seq('l', 'o', 'w', 'e', 's', 't'))
    // up to 60 chars: well past the ~37-char raw-space underflow point,
    // exercising the DP's exact live-window rescale
    val genWord = Gen.choose(1, 60).flatMap(n =>
      Gen.listOfN(n, chars).map(_.mkString))
    run(Prop.forAllNoShrink(Gen.nonEmptyListOf(genWord)) { words =>
      val got = words.distinct.toDF("word")
        .select(col("word"), Unigram.encode(col("word"), model, 4).as("p"))
        .collect()
        .map(r => (r.getString(0), r.getSeq[String](1))).toMap
      words.distinct.forall { w =>
        val pieces = got(w)
        val logMass = pieces.map(p => math.log(pOf(p).get)).sum
        // log sums associate/round differently than the reference's
        // recursion — compare at absolute 1e-6
        pieces.mkString("") == w && logMass >= bestLog(w) - 1e-6
      } :| s"got=$got"
    }, n = 10)
  }
}
