package graft.operators

import org.apache.spark.sql.Row

import graft.SparkSuite

/** Round-14 (cont.): trec_eval-style ranked-retrieval metrics —
  * hand-computed nDCG/MRR/AP on a pinned fixture, plus the outer-join
  * edge arms (query with no relevant retrieved / no ranking / no labels). */
class RetrievalMetricsSpec extends SparkSuite {

  import spark.implicits._

  // q1: ranked 1,2,3; labels 1→2, 3→1, 9→3 (best doc never retrieved)
  // q2: ranked 5,6; label 7→1 (nothing relevant retrieved)
  // q3: labels only (8→2), never ranked
  // q4: ranked only (5), never labeled
  private val ranked = Seq(
    ("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L),
    ("q2", 5L, 1L), ("q2", 6L, 2L),
    ("q4", 5L, 1L)).toDF("query", "id", "rank")
  private val labels = Seq(
    ("q1", 1L, 2L), ("q1", 3L, 1L), ("q1", 9L, 3L),
    ("q2", 7L, 1L),
    ("q3", 8L, 2L)).toDF("query", "id", "grade")

  private def row(q: String): Row = {
    val m = Relevance.retrievalMetrics(ranked, labels, "query", "id", k = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    m(q)
  }

  test("nDCG/MRR/AP/P/R: hand-computed on the pinned fixture") {
    val r = row("q1")
    // DCG = 3/log2(2) + 0 + 1/log2(4) = 3.5
    // IDCG = 7/log2(2) + 3/log2(3) + 1/log2(4) = 9.3927893
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L) // n_rel, n_hit
    assert(r.getDouble(3) == 0.372626, s"ndcg: $r")
    assert(r.getDouble(4) == 1.0, s"mrr: $r")
    // AP = (P(1) + P(3)) / R = (1 + 2/3) / 3
    assert(r.getDouble(5) == 0.555556, s"ap: $r")
    assert(r.getDouble(6) == 0.666667 && r.getDouble(7) == 0.666667)
  }

  test("nothing relevant retrieved: zeros, not nulls") {
    val r = row("q2")
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0)
  }

  test("labels with no ranking: the query still reports, all-zero metrics") {
    val r = row("q3")
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0 &&
      r.getDouble(5) == 0.0)
  }

  test("ranking with no labels: nDCG/AP/recall undefined (null), not fake 0/0") {
    val r = row("q4")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(7))
    assert(r.getDouble(4) == 0.0 && r.getDouble(6) == 0.0)
  }

  test("rows past k are ignored; a perfect ranking scores nDCG = MRR = 1") {
    val perfect = Seq(("p", 9L, 1L), ("p", 1L, 2L), ("p", 3L, 3L),
      ("p", 4L, 4L)).toDF("query", "id", "rank")
    val lab = Seq(("p", 9L, 3L), ("p", 1L, 2L), ("p", 3L, 1L),
      ("p", 4L, 3L)).toDF("query", "id", "grade") // 4th label beyond k
    val r = Relevance.retrievalMetrics(perfect, lab, "query", "id", k = 3)
      .collect().head
    // ideal@3 of grades (3,3,2) vs retrieved (3,2,1): not 1 — so check
    // the true perfect case instead: retrieved order IS grade order
    val perfect2 = Seq(("p", 9L, 1L), ("p", 4L, 2L), ("p", 1L, 3L))
      .toDF("query", "id", "rank")
    val r2 = Relevance.retrievalMetrics(perfect2, lab, "query", "id", k = 3)
      .collect().head
    assert(r2.getDouble(3) == 1.0 && r2.getDouble(4) == 1.0)
    assert(r.getDouble(4) == 1.0) // first arm: top doc relevant → MRR 1
  }
}
