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

  test("weights must be positive and strata populated") {
    intercept[IllegalArgumentException] {
      Mixing.thresholds(Map("en" -> 10L), Seq("en" -> 0.5, "de" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      Mixing.thresholds(Map("en" -> 10L), Seq("en" -> -1.0))
    }
  }
}
