package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** PageRank vs a sequential Map-based evaluator of the same integer
  * micro-unit update (nothing shared with the DataFrame fixpoint). */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private val U = Graph.RankUnit

  /** Independent reference: plain Scala Maps and Long arithmetic. */
  private def seqPagerank(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = nodes.size.toLong
    var r = nodes.map(_ -> U).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v =>
        v -> (15 * U + 85 * (inflow.getOrElse(v, 0L) + dang / n)) / 100).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pagerank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("3-node graph with a dangling sink matches the sequential fixpoint") {
    // 1→2, 2→1, 2→3; node 3 dangles — its mass must come back uniformly
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L))
    for (k <- Seq(1, 2, 5))
      assert(run(e, k) == seqPagerank(e, k), s"iters=$k")
  }

  test("parallel edges collapse; a hub concentrates rank") {
    val spokes = (2L to 9L).map(i => (i, 1L))
    val e = spokes ++ spokes ++ Seq((1L, 2L)) // duplicates must not double-count
    val got = run(e, 3)
    assert(got == seqPagerank(e, 3))
    assert(got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("ring conserves near-total mass (floor drip only)") {
    val e = (0L until 10L).map(i => (i, (i + 1) % 10))
    val got = run(e, 4)
    val total = got.values.sum
    // each round floors at most 100 units per node away
    assert(total <= 10 * U && total > 10 * U - 4 * 10 * 100)
    assert(got.values.toSet.size == 1) // symmetry: every node equal
  }

  test("plan: the 1-row total/count sides never become a cartesian") {
    val e = (0L until 50L).map(i => (i, (i * 3 + 1) % 50))
    val p = Graph.pagerank(e.toDF("src", "dst"), "src", "dst", 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"1-row combines must broadcast:\n$p")
  }
}
