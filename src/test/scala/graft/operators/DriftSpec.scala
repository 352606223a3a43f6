package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class DriftSpec extends SparkSuite {
  import spark.implicits._

  // slice A: 4 "a", 4 "b"; slice B: 6 "a", 2 "c" — hand-computable ppm:
  // p(a)=500000 vs 750000, p(b)=500000 vs 0, p(c)=0 vs 250000
  private lazy val a = Seq((1L, "a a b b"), (2L, "a a b b")).toDF("id", "text")
  private lazy val b = Seq((3L, "a a a c"), (4L, "a a a c")).toDF("id", "text")

  test("summary: integer-ppm TVD matches the hand computation") {
    val row = Drift.summary(a, b, "text").collect().head
    assert(row.getAs[Long]("n_a") == 8L)
    assert(row.getAs[Long]("n_b") == 8L)
    assert(row.getAs[Long]("vocab") == 3L)
    // sum |Δppm| = 250000 + 500000 + 250000 = 1000000 → tvd 500000 (= 0.5)
    assert(row.getAs[Long]("tvd_ppm") == 500000L, row.toString)
  }

  test("identical slices drift zero; disjoint slices drift one") {
    val same = Drift.summary(a, a, "text").collect().head
    assert(same.getAs[Long]("tvd_ppm") == 0L)
    val disj = Drift.summary(
      Seq((1L, "x y")).toDF("id", "text"),
      Seq((2L, "p q")).toDF("id", "text"), "text").collect().head
    assert(disj.getAs[Long]("tvd_ppm") == 1000000L)
  }

  test("topDrift: ranked by |Δppm| desc then token; counts exact") {
    val top = Drift.topDrift(a, b, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // b moved 500000 ppm; a and c tie at 250000 → 'a' wins the tie
    assert(top.toSeq == Seq(("b", 4L, 0L, 500000L), ("a", 4L, 6L, 250000L)),
      top.mkString(", "))
  }

  test("topDrift plans a bounded TakeOrderedAndProject, never a global sort") {
    val p = Drift.topDrift(a, b, "text", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
