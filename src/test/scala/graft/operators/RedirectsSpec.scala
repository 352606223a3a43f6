package graft.operators

import graft.SparkSuite

/** Pointer-doubling redirect resolution vs hand-walked chains. */
class RedirectsSpec extends SparkSuite {
  import spark.implicits._

  private def run(
      edges: Seq[(String, String)], maxHops: Int): Map[String, (String, Long, Boolean)] =
    Redirects.resolve(edges.toDF("src", "dst"), "src", "dst", maxHops)
      .collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getBoolean(3)))).toMap

  test("chains land on their terminal with exact hop counts") {
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "d", "x" -> "d")
    assert(run(e, 4) == Map(
      "a" -> (("d", 3L, true)), "b" -> (("d", 2L, true)),
      "c" -> (("d", 1L, true)), "x" -> (("d", 1L, true))))
  }

  test("loops walk the full budget back and flag unresolved") {
    val e = Seq("a" -> "b", "b" -> "a", "in" -> "a")
    val got = run(e, 8)
    assert(got("a") == (("a", 8L, false))) // even budget: back to self
    assert(got("b") == (("b", 8L, false)))
    assert(got("in") == (("b", 8L, false))) // 1 + 7 loop hops → at b
  }

  test("a chain longer than the budget stops mid-chain, unresolved") {
    val e = (0 until 6).map(i => s"n$i" -> s"n${i + 1}")
    val got = run(e, 4)
    assert(got("n0") == (("n4", 4L, false)))
    assert(got("n3") == (("n6", 3L, true)))
  }

  test("conflicting duplicate edges collapse to the smallest target") {
    val e = Seq("a" -> "z", "a" -> "b", "b" -> "c")
    assert(run(e, 4)("a") == (("c", 2L, true)))
  }

  test("self-redirects drop; non-power-of-two budgets refuse") {
    assert(run(Seq("a" -> "a", "a" -> "b"), 2)("a") == (("b", 1L, true)))
    intercept[IllegalArgumentException] {
      Redirects.resolve(Seq(("a", "b")).toDF("src", "dst"),
        "src", "dst", 3)
    }
  }
}
