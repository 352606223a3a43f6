package graft.operators

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.SparkSuite

class MixingSpec extends SparkSuite {
  import spark.implicits._

  // en 1000, de 500, zh 100 (+ fr 50 unlisted) with deterministic ids
  private lazy val corpus = {
    val rows =
      (0L until 1000L).map(i => (i, "en", s"doc $i")) ++
      (1000L until 1500L).map(i => (i, "de", s"doc $i")) ++
      (1500L until 1600L).map(i => (i, "zh", s"doc $i")) ++
      (1600L until 1650L).map(i => (i, "fr", s"doc $i"))
    rows.toDF("doc_id", "lang", "text")
  }

  private val weights = Seq("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2)

  test("thresholds: limiting stratum keeps all, others thin to the mixture") {
    val th = Mixing.thresholds(
      Map("en" -> 1000L, "de" -> 500L, "zh" -> 100L), weights)
    // N' = min(1000/.5, 500/.3, 100/.2) = 500; rates .25 / .3 / 1.0
    assert(th("zh") == 65536L) // argmin keeps everything
    assert(th("en") == 16384L) // round(.25 * 65536)
    assert(th("de") == 19661L) // round(.30 * 65536)
  }

  test("mix realizes the target mixture, drops unlisted strata, reproducible") {
    val kept = Mixing.mix(corpus, "doc_id", "lang", weights, seed = 4)
    val byLang = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"), "unlisted stratum must be dropped")
    assert(byLang("zh") == 100L, "limiting stratum keeps every row")
    // binomial realization: en ~250, de ~150 (16-bit hash, ±~12%)
    assert(math.abs(byLang("en") - 250.0) < 40, byLang.toString)
    assert(math.abs(byLang("de") - 150.0) < 30, byLang.toString)
    // realized proportions near the target mixture
    val total = byLang.values.sum.toDouble
    assert(math.abs(byLang("en") / total - 0.5) < 0.06, byLang.toString)
    // same seed → byte-identical keep set
    val again = Mixing.mix(corpus, "doc_id", "lang", weights, seed = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val ids = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
  }

  test("keep decision is map-side: no exchange beyond the counts aggregate") {
    val kept = Mixing.mix(corpus, "doc_id", "lang", weights)
    // the RETURNED plan is scan + filter only — the stratum-size aggregate
    // ran eagerly inside mix(); the kept frame itself must not shuffle
    val exchanges = kept.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }
    assert(exchanges.isEmpty, kept.queryExecution.executedPlan.toString)
  }

  test("temperature weights: T=1 is natural (keep all), T=2 flattens by sqrt") {
    val counts = Map("en" -> 1000L, "de" -> 500L, "zh" -> 100L)
    // T=1: p_s = n_s/N, so N' = N and every rate is exactly 1.0
    val th1 = Mixing.thresholds(counts, Mixing.temperatureWeights(counts, 1.0))
    assert(th1.values.forall(_ == 65536L), th1.toString)
    // T=2: p ∝ sqrt(n) → (1000, 500, 100) → weights ∝ (31.62, 22.36, 10);
    // zh limits (nprime = 100/p_zh); rates shrink with size
    val th2 = Mixing.thresholds(counts, Mixing.temperatureWeights(counts, 2.0))
    assert(th2("zh") == 65536L, th2.toString)
    assert(th2("en") < th2("de") && th2("de") < 65536L, th2.toString)
    // hand-derived: wsum = sqrt(1000)+sqrt(500)+sqrt(100); nprime =
    // 100*wsum/10; rate_en = (sqrt(1000)/wsum)*nprime/1000
    val wsum = math.sqrt(1000.0) + math.sqrt(500.0) + 10.0
    val nprime = 100.0 / (10.0 / wsum)
    def rate(n: Double) = (math.sqrt(n) / wsum) * nprime / n
    assert(th2("en") == math.round(rate(1000.0) * 65536L))
    assert(th2("de") == math.round(rate(500.0) * 65536L))
    // end-to-end over the 4-strata corpus (en 1000, de 500, zh 100, fr 50):
    // weights derive from ALL observed strata, so fr is in the mixture now
    // and — as the smallest — is the limiting stratum that keeps every row
    // (nprime = min over n/p lands on fr); zh thins to ~0.71, en to ~0.22
    val kept = Mixing.mixByTemperature(corpus, "doc_id", "lang", 2.0, seed = 4)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("fr") == 50L, kept.toString)
    assert(kept("zh") > 50L && kept("zh") < 92L, kept.toString) // ~71 ± noise
    // natural en:zh is 10:1; sqrt-flattened target is ~3.16:1
    assert(kept("en").toDouble / kept("zh") < 4.8, kept.toString)
  }

  test("mixEpochs: whole epochs exact, fractional epoch binomial, indexed") {
    val out = Mixing.mixEpochs(corpus, "doc_id", "lang",
      Seq("en" -> 2.25, "de" -> 0.5, "zh" -> 1.0), seed = 4)
    val byLang = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byLang.contains("fr"), "unlisted stratum emits nothing")
    assert(byLang("zh") == 100L, "integer epoch is exact")
    // en: 1000 docs × 2 copies + ~25% a third → ~2250 (16-bit hash, ±12%)
    assert(math.abs(byLang("en") - 2250.0) < 120, byLang.toString)
    assert(math.abs(byLang("de") - 250.0) < 40, byLang.toString)
    // every emitted doc carries a contiguous 1-based epoch index
    val epochs = out.where(col("lang") === "en")
      .groupBy("doc_id").agg(max("epoch").as("mx"), count(lit(1)).as("n"))
      .where(col("mx") =!= col("n")).count()
    assert(epochs == 0L, "epoch indexes must be 1..copies")
    // deterministic: same seed reproduces the same multiset
    val again = Mixing.mixEpochs(corpus, "doc_id", "lang",
      Seq("en" -> 2.25, "de" -> 0.5, "zh" -> 1.0), seed = 4)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == byLang)
  }

  test("mixEpochs is exchange-free: recipe folds to literals, no join") {
    val out = Mixing.mixEpochs(corpus, "doc_id", "lang",
      Seq("en" -> 1.5), seed = 4)
    val exchanges = out.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }
    assert(exchanges.isEmpty, out.queryExecution.executedPlan.toString)
  }

  test("weights must be positive and strata populated") {
    intercept[IllegalArgumentException] {
      Mixing.thresholds(Map("en" -> 10L), Seq("en" -> 0.5, "de" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Mixing.thresholds(Map("en" -> 10L), Seq("en" -> -1.0))
    }
  }
}
