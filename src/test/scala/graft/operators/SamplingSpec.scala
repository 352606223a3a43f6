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
}
