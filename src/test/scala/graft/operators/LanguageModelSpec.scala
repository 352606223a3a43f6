package graft.operators

import graft.SparkSuite

/** Kneser–Ney bigram scoring vs an independent driver-side reference. */
class LanguageModelSpec extends SparkSuite {

  import spark.implicits._

  private val D = 0.75
  private val corpus = Seq(
    (1L, "a b a b c"),
    (2L, "b a b b"),
    (3L, "c a b a"),
    (4L, "a a a b c b"))

  // the operator's token hash, restated independently: polynomial
  // (acc*31 + codepoint) mod 1000003 over whitespace tokens
  private def h(tok: String): Long =
    tok.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)

  // sequential interpolated-KN reference over the tiny corpus
  private val pairsByDoc: Map[Long, Seq[(Long, Long)]] = corpus.map {
    case (id, t) =>
      val hs = t.split(" ").filter(_.nonEmpty).map(h)
      id -> hs.sliding(2).filter(_.length == 2).map(p => (p(0), p(1))).toSeq
  }.toMap
  private val cb: Map[(Long, Long), Long] =
    pairsByDoc.values.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  private val ctx: Map[Long, (Long, Int)] =
    cb.groupBy(_._1._1).map { case (u1, m) => u1 -> (m.values.sum, m.size) }
  private val rev: Map[Long, Int] =
    cb.groupBy(_._1._2).map { case (u2, m) => u2 -> m.size }
  private val n1pAll = cb.size.toDouble

  private def retained(topK: Int): Map[(Long, Long), Long] =
    cb.toSeq.sortBy { case ((u1, u2), c) => (-c, u1, u2) }.take(topK).toMap

  private def prob(pair: (Long, Long), topK: Int): Double = {
    val pc = rev(pair._2) / n1pAll
    ctx.get(pair._1) match {
      case None => pc
      case Some((c, n1f)) =>
        val lam = D * n1f / c
        retained(topK).get(pair) match {
          case Some(cbv) => (cbv - D) / c + lam * pc
          case None      => lam * pc
        }
    }
  }

  private def expected(topK: Int): Map[Long, Double] = pairsByDoc.map {
    case (id, ps) =>
      val m = ps.map(p => math.log(prob(p, topK))).sum / ps.size
      id -> BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("kn bigram: matches the sequential reference, untruncated and pruned") {
    for (topK <- Seq(1000, 2)) {
      val out = LanguageModel.knBigramLogProb(
          corpus.toDF("doc_id", "text"), "doc_id", "text", topK = topK)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out == expected(topK), s"topK=$topK")
    }
  }

  test("kn bigram: the smoothed distribution conserves probability mass") {
    // for every observed context, P(·|w1) over the continuation vocabulary
    // must sum to EXACTLY 1 — the discounted-ML mass (ctx − D·N1+(w1·))/ctx
    // plus the λ(w1)-weighted continuation distribution (which sums to 1)
    for (u1 <- ctx.keys) {
      val mass = rev.keys.toSeq.map(u2 => prob((u1, u2), Int.MaxValue)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context $u1 mass $mass")
    }
  }

  // ---- trigram KN: independent sequential reference ------------------

  private val triplesByDoc: Map[Long, Seq[(Long, Long, Long)]] = corpus.map {
    case (id, t) =>
      val hs = t.split(" ").filter(_.nonEmpty).map(h)
      id -> hs.sliding(3).filter(_.length == 3)
        .map(p => (p(0), p(1), p(2))).toSeq
  }.toMap
  private val ct3: Map[(Long, Long, Long), Long] =
    triplesByDoc.values.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
  private val ctx12: Map[(Long, Long), (Long, Int)] =
    ct3.groupBy { case ((a, b, _), _) => (a, b) }
      .map { case (k, m) => k -> (m.values.sum, m.size) }
  private val cont23: Map[(Long, Long), Int] =
    ct3.keys.groupBy { case (_, b, c) => (b, c) }.map { case (k, v) => k -> v.size }
  private val mid2: Map[Long, (Long, Int)] =
    cont23.groupBy(_._1._1)
      .map { case (u2, m) => u2 -> (m.values.map(_.toLong).sum, m.size) }
  private val pc3: Map[Long, Int] =
    cont23.keys.groupBy(_._2).map { case (u3, v) => u3 -> v.size }
  private val n1ppAll = cont23.size.toDouble

  private def retained3(topK: Int) =
    ct3.toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(topK).toMap
  private def retainedCtx(topK: Int) =
    ctx12.toSeq.sortBy { case ((a, b), (c, _)) => (-c, a, b) }.take(topK).toMap
  private def retainedMid(topK: Int) =
    cont23.toSeq.sortBy { case ((b, c), n) => (-n, b, c) }.take(topK).toMap

  private def prob3(tr: (Long, Long, Long), topK: Int): Double = {
    val (u1, u2, u3) = tr
    val pc = pc3(u3) / n1ppAll
    val (n1mid, nfol2) = mid2(u2)
    val lamMid = D * nfol2 / n1mid
    val pMid = retainedMid(topK).get((u2, u3)) match {
      case Some(n1t) => (n1t - D) / n1mid + lamMid * pc
      case None      => lamMid * pc
    }
    retainedCtx(topK).get((u1, u2)) match {
      case None => pMid
      case Some((c12, n1f12)) =>
        val lamTop = D * n1f12 / c12
        (retained3(topK).get(tr) match {
          case Some(n) => (n - D) / c12
          case None    => 0.0
        }) + lamTop * pMid
    }
  }

  private def expected3(topK: Int): Map[Long, Double] = triplesByDoc
    .filter(_._2.nonEmpty).map { case (id, ts) =>
      val m = ts.map(p => math.log(prob3(p, topK))).sum / ts.size
      id -> BigDecimal(m).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  test("kn trigram: matches the sequential reference, untruncated and pruned") {
    for (topK <- Seq(1000, 2)) {
      val out = LanguageModel.knTrigramLogProb(
          corpus.toDF("doc_id", "text"), "doc_id", "text", topK = topK)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out == expected3(topK), s"topK=$topK: $out vs ${expected3(topK)}")
    }
  }

  test("kn trigram: every level of the ladder conserves probability mass") {
    // vocabulary of continuations = every u3 observed with a predecessor
    val vocab = pc3.keys.toSeq
    // bottom: Σ Pcont = 1 exactly
    val pcMass = vocab.map(pc3(_) / n1ppAll).sum
    assert(math.abs(pcMass - 1.0) < 1e-9, s"pcont mass $pcMass")
    // middle and top: Σ_w3 P = 1 for every observed context, unpruned
    for ((u1, u2) <- ctx12.keys) {
      val mass = vocab.map(u3 => prob3((u1, u2, u3), Int.MaxValue)).sum
      assert(math.abs(mass - 1.0) < 1e-9, s"context ($u1,$u2) mass $mass")
    }
    for (u2 <- mid2.keys) {
      val (n1mid, nfol2) = mid2(u2)
      val lamMid = D * nfol2 / n1mid
      val mass = vocab.map { u3 =>
        val pc = pc3(u3) / n1ppAll
        cont23.get((u2, u3)) match {
          case Some(n1t) => (n1t - D) / n1mid + lamMid * pc
          case None      => lamMid * pc
        }
      }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"middle context $u2 mass $mass")
    }
  }
}
