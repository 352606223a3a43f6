package graft.operators

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSuite

class SamplingSpec extends SparkSuite {

  private lazy val docs = {
    import spark.implicits._
    (0L until 2000L).map(i => (i, s"doc $i", if (i % 3 == 0) "en" else "mi"))
      .toDF("doc_id", "text", "lang")
  }

  test("weighted k: exact count, dominant weights win, weights bias draws") {
    import spark.implicits._
    val df = (1L to 20L).map(i =>
      (i, "g", if (i == 7L) 1.0e9 else if (i <= 10L) 50.0 else 1.0))
      .toDF("id", "g", "w")
    // a weight 9 orders of magnitude above the field is effectively
    // always drawn (its exponential key is ~0)
    val picks = (1 to 25).map { seed =>
      Sampling.weightedKPerGroup(df, "g", "id", "w", k = 5, seed = seed)
        .collect().map(_.getLong(0)).toSet
    }
    assert(picks.forall(_.size == 5), "exactly k per group")
    assert(picks.forall(_.contains(7L)), "dominant weight must always win")
    // ids 1-10 (weight 50) should be drawn far more often than 11-20
    // (weight 1): expected ~4.8 vs ~0.2 of the 4 non-dominant slots
    val heavy = picks.map(_.count(i => i <= 10L && i != 7L)).sum
    val light = picks.map(_.count(_ > 10L)).sum
    assert(heavy > light * 5, s"weighting must bias draws: $heavy vs $light")
  }

  test("split assignment is deterministic and stable under corpus growth") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val full = Sampling.assignSplit(docs, "doc_id", splits, seed = 7)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // the first half of the corpus, assigned on its own, gets identical
    // labels — growing the corpus never reshuffles existing rows
    val half = Sampling.assignSplit(docs.where(col("doc_id") < 1000),
        "doc_id", splits, seed = 7)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(half.forall { case (id, s) => full(id) == s })
    // fractions land near their targets (16-bit buckets, n=2000)
    val n = full.size.toDouble
    val byLabel = full.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(byLabel("train") - 0.8) < 0.05, byLabel.toString)
    assert(math.abs(byLabel("val") - 0.1) < 0.05, byLabel.toString)
    assert(math.abs(byLabel("test") - 0.1) < 0.05, byLabel.toString)
  }

  test("hash sampling hits the rate per stratum and varies by seed") {
    val s1 = Sampling.sampleByHash(docs, "doc_id", 0.25, seed = 1)
    val s2 = Sampling.sampleByHash(docs, "doc_id", 0.25, seed = 2)
    val perLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en has ~667 rows, mi ~1333; both sampled near 25%
    assert(math.abs(perLang("en") / 667.0 - 0.25) < 0.08, perLang.toString)
    assert(math.abs(perLang("mi") / 1333.0 - 0.25) < 0.08, perLang.toString)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 != ids2, "different seeds must draw different samples")
    // re-running the same seed is byte-identical
    val again = Sampling.sampleByHash(docs, "doc_id", 0.25, seed = 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids1)
  }

  test("assignment and sampling are map-side (no shuffle in the plan)") {
    val assigned = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 0.9, "test" -> 0.1))
    val sampled = Sampling.sampleByHash(docs, "doc_id", 0.5)
    for (df <- Seq(assigned, sampled)) {
      val exchanges = df.queryExecution.executedPlan.collect {
        case e: Exchange => e
      }
      assert(exchanges.isEmpty, df.queryExecution.executedPlan.toString)
    }
  }

  test("split fractions must sum to at most one") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 0.9, "b" -> 0.2))
    }
  }

  test("weighted k: negative/null raise; weight 0 is the never-drawn limit") {
    import spark.implicits._
    // negative inverts the draw — job-fatal with a named error
    val neg = Seq((1L, "g", -1.0), (2L, "g", 1.0)).toDF("id", "grp", "wt")
    val e = intercept[Exception] {
      Sampling.weightedKPerGroup(neg, "grp", "id", "wt", k = 1).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("non-negative")), msgs(e).mkString("; "))
    val withNull = Seq((1L, "g", Some(1.0)), (2L, "g", None))
      .toDF("id", "grp", "wt")
    intercept[Exception] {
      Sampling.weightedKPerGroup(withNull, "grp", "id", "wt", k = 2).count()
    }
    // weight EXACTLY 0: probability-zero row is excluded, never job-fatal
    // (one empty document must not kill a 100 TB sampling pass)
    val zero = Seq((1L, "g", 0.0), (2L, "g", 1.0), (3L, "g", 1.0))
      .toDF("id", "grp", "wt")
    val got = Sampling.weightedKPerGroup(zero, "grp", "id", "wt", k = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L), s"zero-weight row must never be drawn: $got")
  }

  /** Independent sequential best-fit-decreasing: linear-scan bin search
    * (nothing shared with the TreeSet engine or the Python tool). */
  private def seqBestFit(docs: Seq[(Long, Long)], seqLen: Int)
      : Seq[(Long, Int, Int, Long, Int)] = {
    val pieces = docs.filter(_._2 > 0).flatMap { case (id, n) =>
      (0L until (n + seqLen - 1) / seqLen).map { i =>
        (id, i.toInt, math.min(seqLen.toLong, n - i * seqLen).toInt)
      }
    }.sortBy { case (id, piece, len) => (-len, id, piece) }
    val bins = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var next = 0L
    pieces.map { case (id, piece, len) =>
      val fits = bins.zipWithIndex
        .filter { case ((rem, _), _) => rem >= len }
      if (fits.isEmpty) {
        bins += ((seqLen - len, next)); next += 1
        (id, piece, len, next - 1, 0)
      } else {
        val (best @ (rem, bid), j) = fits.minBy { case ((r, b), _) => (r, b) }
        bins(j) = (rem - len, bid)
        (id, piece, len, bid, seqLen - rem)
      }
    }
  }

  private def runBestFit(docs: Seq[(Long, Long)], seqLen: Int)
      : Seq[(Long, Int, Int, Long, Int)] = {
    import spark.implicits._
    val df = docs.toDF("id", "n").withColumn("g", lit("all"))
    Sampling.packBestFit(df, "g", "id", "n", seqLen)
      .collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4),
        r.getInt(5))).toSeq.sorted
  }

  test("packBestFit: random corpora match the sequential reference " +
      "placement for placement; invariants hold") {
    val rnd = new scala.util.Random(1414)
    for (trial <- 0 until 4) {
      val seqLen = 8 + rnd.nextInt(24)
      val docs = (1L to (20L + rnd.nextInt(30))).map(i =>
        i -> (1L + rnd.nextInt(3 * seqLen)))
      val got = runBestFit(docs, seqLen)
      assert(got == seqBestFit(docs, seqLen).sorted,
        s"trial=$trial seqLen=$seqLen")
      // conservation: every token of every doc placed exactly once
      val bylen = got.groupBy(_._1).view.mapValues(_.map(_._3.toLong).sum)
      assert(bylen.toMap == docs.toMap, "token conservation")
      // capacity + disjoint intervals per bin
      got.groupBy(_._4).foreach { case (_, ps) =>
        assert(ps.map(_._3).sum <= seqLen, "capacity")
        val iv = ps.map(p => (p._5, p._5 + p._3)).sorted
        iv.sliding(2).foreach {
          case Seq(a, b) => assert(b._1 >= a._2, s"overlap: $a $b")
          case _ =>
        }
      }
      // the BFD guarantee: 9·bins ≤ 11·OPT + 6
      val total = docs.map(_._2).sum
      val opt = (total + seqLen - 1) / seqLen
      val nBins = got.map(_._4).distinct.size
      assert(9L * nBins <= 11L * opt + 6L, s"bound: $nBins bins, opt=$opt")
    }
  }

  test("packBestFit: groups pack independently; empty docs drop") {
    import spark.implicits._
    val df = Seq((1L, 5L, "a"), (2L, 5L, "a"), (3L, 5L, "b"),
      (4L, 0L, "b")).toDF("id", "n", "g")
    val got = Sampling.packBestFit(df, "g", "id", "n", seqLen = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4)))
      .toSet
    // a's two docs share bin 0 of group a; b restarts bin ids at 0
    assert(got == Set(("a", 1L, 0L), ("a", 2L, 0L), ("b", 3L, 0L)), got)
  }
}
