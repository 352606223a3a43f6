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
}
