package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SelectionSpec extends SparkSuite {
  import spark.implicits._

  // scores quantize to distinct buckets: 0.9 > 0.8 > 0.5 > 0.1
  private lazy val docs = Seq(
    (1L, 0.9, 100L), (2L, 0.9, 200L),   // bucket 58982: 300 tokens
    (3L, 0.8, 400L),                    // bucket 52428: 400
    (4L, 0.5, 250L), (5L, 0.5, 250L),   // bucket 32768: 500
    (6L, 0.1, 50L)                      // bucket  6553: 50
  ).toDF("id", "score", "ntok")

  private def select(budget: Long) =
    Selection.selectTokenBudget(docs, "id", col("score"), col("ntok"), budget)
      .select("id").collect().map(_.getLong(0)).toSet

  test("budget walk: whole buckets kept, boundary bucket cut by id order") {
    // budget 950: buckets 0.9 (300) + 0.8 (400) fit -> 700; boundary is the
    // 0.5 bucket with 250 remaining: id 4 fits (cum 250), id 5 doesn't
    assert(select(950) == Set(1L, 2L, 3L, 4L))
    // budget 450: 0.9 fits (300); 0.8 doesn't fit entirely -> boundary with
    // remaining 150 < 400, so doc 3 is cut and everything below drops
    assert(select(450) == Set(1L, 2L))
    // nothing below the boundary is admitted even if it would fit: doc 6's
    // 50 tokens would fit the 150 remaining, but the prefix rule is maximal
    assert(!select(450).contains(6L))
  }

  test("budget >= total keeps everything; zero budget keeps nothing") {
    assert(select(10000) == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(select(0) == Set.empty[Long])
  }

  test("boundary rule matches a global ordered-cumsum reference") {
    // independent formulation (the oracle's): one cumsum over
    // (bucket desc, id), admit while cum <= budget
    val rows = Seq((1L, 0.9, 100L), (2L, 0.9, 200L), (3L, 0.8, 400L),
      (4L, 0.5, 250L), (5L, 0.5, 250L), (6L, 0.1, 50L))
    def bucketOf(s: Double) =
      math.min(math.floor(BigDecimal(s).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 65536).toLong, 65535L)
    for (budget <- Seq(0L, 49L, 50L, 299L, 300L, 301L, 700L, 949L, 950L,
        1200L, 1249L, 1250L, 5000L)) {
      val ref = rows.sortBy { case (id, s, _) => (-bucketOf(s), id) }
        .scanLeft((0L, 0L)) { case ((_, cum), (id, _, n)) => (id, cum + n) }
        .tail.takeWhile(_._2 <= budget).map(_._1).toSet
      assert(select(budget) == ref, s"budget=$budget")
    }
  }

  test("only the boundary bucket pays a window; full buckets are a filter") {
    val out = Selection.selectTokenBudget(docs, "id", col("score"),
      col("ntok"), 950)
    val p = out.queryExecution.executedPlan.toString
    // exactly one Window node, and it sits behind the boundary-bucket
    // equality filter — the corpus-wide branch is filter-only
    val windows = p.linesIterator.count(_.contains("Window"))
    assert(windows == 1, s"expected one boundary window, got $windows:\n$p")
  }
}
