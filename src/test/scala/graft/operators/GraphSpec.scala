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

  /** Independent sequential TrustRank with the same integer update. */
  private def seqTrust(
      edges: Seq[(Long, Long)], seeds: Seq[Long],
      iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val sd = seeds.distinct.filter(nodes.contains).toSet
    val (n, sN) = (nodes.size.toLong, sd.size.toLong)
    var r = nodes.map(_ -> U).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / out(s) }.sum).toMap
      val dang = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map(v => v -> ((85 * inflow.getOrElse(v, 0L)) / 100 +
        (if (sd(v)) (15 * (n * U)) / 100 / sN + (85 * dang) / 100 / sN
         else 0L))).toMap
    }
    r
  }

  test("warm start: k warm rounds from cold_n equal cold_{n+k} bit-for-bit") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 1L), (5L, 2L))
    val prior = Graph.pagerank(e.toDF("src", "dst"), "src", "dst", iters = 2)
    val warm = Graph.pagerankWarm(e.toDF("src", "dst"), "src", "dst",
        prior, "node", "rank_units", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == seqPagerank(e, 5))
  }

  test("warm start: new nodes begin cold, departed prior nodes drop") {
    val g1 = Seq((1L, 2L), (2L, 1L), (9L, 1L)) // node 9 leaves in g2
    val g2 = Seq((1L, 2L), (2L, 1L), (2L, 3L)) // node 3 is new
    val prior = Graph.pagerank(g1.toDF("src", "dst"), "src", "dst", 2)
    val got = Graph.pagerankWarm(g2.toDF("src", "dst"), "src", "dst",
        prior, "node", "rank_units", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // 9 dropped, 3 present
    // independent sequential replay of ONE warm round on g2
    val pr = Graph.pagerank(g1.toDF("src", "dst"), "src", "dst", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = Seq(1L, 2L, 3L)
    val out = Map(1L -> 1L, 2L -> 2L)
    val r0 = nodes.map(v => v -> pr.getOrElse(v, U)).toMap
    val inflow = Map(
      1L -> r0(2L) / 2, 2L -> r0(1L) / 1, 3L -> r0(2L) / 2)
    val dang = r0(3L)
    val want = nodes.map(v =>
      v -> (15 * U + 85 * (inflow.getOrElse(v, 0L) + dang / 3)) / 100).toMap
    assert(got == want)
  }

  test("trustrank matches the sequential fixpoint; rank flows from seeds") {
    // chain: 1→2→3→4 (4 dangles), seed {1}; an off-chain pair 5↔6
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L), (6L, 5L))
    val got = Graph.personalizedPagerank(
        e.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), "node", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == seqTrust(e, Seq(1L), 3))
    // trust decays along the chain; the pair NOT reachable from the
    // seed starves toward zero
    assert(got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > got(4L))
    // the pair unreachable from the seed gets no teleport — only the
    // decaying 85% echo of its start mass; trust-adjacent beats it
    assert(got(2L) > got(5L))
  }

  test("trustrank ignores seeds outside the node universe") {
    val e = Seq((1L, 2L), (2L, 1L))
    val got = Graph.personalizedPagerank(
        e.toDF("src", "dst"), "src", "dst",
        Seq(1L, 99L).toDF("node"), "node", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == seqTrust(e, Seq(1L, 99L), 2))
    assert(!got.contains(99L))
  }

  test("seedDistance: BFS depth along edges, NULL beyond the horizon") {
    // 1→2→3→4→5 with a shortcut 1→3; seed {1}; 9↔8 unreachable
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (9L, 8L), (8L, 9L))
    val got = Graph.seedDistance(e.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), "node", maxHops = 3)
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == Map(
      1L -> Some(0L), 2L -> Some(1L), 3L -> Some(1L), // shortcut wins
      4L -> Some(2L), 5L -> Some(3L),
      8L -> None, 9L -> None))
    // a tighter horizon leaves the tail unknown
    val h2 = Graph.seedDistance(e.toDF("src", "dst"), "src", "dst",
        Seq(1L).toDF("node"), "node", maxHops = 2)
      .collect().filter(_.getLong(0) == 5L).head
    assert(h2.isNullAt(1))
  }

  test("coCitation counts shared citers; the hub cap drops mega-sources") {
    // s1 → {a, b, c}; s2 → {a, b}; hub → {a, b, c, d} (capped out)
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L),
      (9L, 10L), (9L, 11L), (9L, 12L), (9L, 13L))
    val got = Graph.coCitation(e.toDF("src", "dst"), "src", "dst",
        maxOutDegree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 1L))
    // coupling = co-citation transposed: 10 and 11 share citers {1, 2}
    val coup = Graph.bibliographicCoupling(e.toDF("src", "dst"),
        "src", "dst", maxInDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // targets 10/11 have in-degree 3 (capped out); only 12 (deg 2,
    // citers 1 and 9) and 13 (deg 1) survive
    assert(coup == Map((1L, 9L) -> 1L))
  }

  /** Sequential weighted reference with the same integer update. */
  private def seqWeighted(
      edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(_._3 > 0)
      .groupBy(p => (p._1, p._2)).view.mapValues(_.map(_._3).sum)
      .toMap.toSeq.map { case ((s, d), w) => (s, d, w) }
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val ow = e.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val n = nodes.size.toLong
    var r = nodes.map(_ -> U).toMap
    for (_ <- 1 to iters) {
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / ow(s) }.sum).toMap
      val dang = nodes.filterNot(ow.contains).map(r).sum
      r = nodes.map(v =>
        v -> (15 * U + 85 * (inflow.getOrElse(v, 0L) + dang / n)) / 100).toMap
    }
    r
  }

  test("weightedPagerank: flow proportional to weight, parallel edges combine") {
    // 1 sends 3/5 of its mass to 2 and 2/5 to 3 — the weight-2 edge
    // arrives as TWO parallel weight-1 rows that must SUM (a keep-first
    // combine would send 1/4 and fail), plus a zero-weight row to drop
    val e = Seq((1L, 2L, 3L), (1L, 3L, 1L), (1L, 3L, 1L), (1L, 3L, 0L))
    val eSplit = Seq((1L, 2L, 3L), (1L, 3L, 2L)) // pre-combined view
    val got = Graph.weightedPagerank(
        e.toDF("src", "dst", "w"), "src", "dst", "w", 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == seqWeighted(eSplit, 2))
    assert(got(2L) > got(3L))
    // unit weights reduce to the unweighted operator exactly
    val uw = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    val viaWeighted = Graph.weightedPagerank(
        uw.map(p => (p._1, p._2, 1L)).toDF("src", "dst", "w"),
        "src", "dst", "w", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaPlain = Graph.pagerank(uw.toDF("src", "dst"), "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaWeighted == viaPlain)
  }

  test("weightedPagerank fails loudly beyond the N × maxW envelope") {
    // whichever arm evaluates first wins — the guard's raise_error or
    // ANSI mode's multiply check; either way the failure is LOUD, never
    // a silent wrap
    val e = Seq((1L, 2L, Long.MaxValue / 100)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.weightedPagerank(e, "src", "dst", "w", 1).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("overflow"), ex.getMessage)
  }

  test("triangles: direction ignored, each corner counts once, K4 = 3 each") {
    // K4 on 1..4 (some edges reversed, one duplicated both ways), a
    // pendant 5, a self-loop, and a directed 2-cycle 6↔7 (no triangle)
    val e = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L),
      (3L, 4L), (4L, 3L), (4L, 5L), (5L, 5L), (6L, 7L), (7L, 6L))
    val got = Graph.triangles(e.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      5L -> 0L, 6L -> 0L, 7L -> 0L))
  }

  test("plan: the 1-row total/count sides never become a cartesian") {
    val e = (0L until 50L).map(i => (i, (i * 3 + 1) % 50))
    val p = Graph.pagerank(e.toDF("src", "dst"), "src", "dst", 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"1-row combines must broadcast:\n$p")
  }

  /** Independent HITS reference: sequential Maps, the same integer L1
    * half-steps (nothing shared with the DataFrame loop). */
  private def seqHits(
      edges: Seq[(Long, Long)], iters: Int,
      unit: Long = Graph.HitsUnit): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    def norm(raw: Map[Long, Long]): Map[Long, Long] = {
      val tot = raw.values.sum
      nodes.map(v => v ->
        (if (tot > 0) raw.getOrElse(v, 0L) * unit / tot else 0L)).toMap
    }
    var h = nodes.map(_ -> unit).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      a = norm(e.groupBy(_._2).view.mapValues(_.map(p => h(p._1)).sum).toMap)
      h = norm(e.groupBy(_._1).view.mapValues(_.map(p => a(p._2)).sum).toMap)
    }
    nodes.map(v => v -> (a.getOrElse(v, 0L), h.getOrElse(v, 0L))).toMap
  }

  private def runHits(
      edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hits: bipartite hub/authority structure matches the sequential " +
      "half-steps and separates the roles") {
    // 1 links to both authorities, 2 to one; 10 also links out once —
    // mixed roles exercise both flows
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L), (10L, 11L))
    for (k <- Seq(1, 2, 4)) {
      val got = runHits(e, k)
      assert(got == seqHits(e, k), s"iters=$k")
    }
    val fin = runHits(e, 4)
    // 10 (two pure-hub in-links) and 11 both authoritative; 1 is the
    // stronger hub (two links to strong authorities)
    assert(fin(1L)._2 > fin(2L)._2, fin.toString)
    assert(fin(10L)._1 > 0 && fin(11L)._1 > 0)
    // pure hubs carry no authority
    assert(fin(1L)._1 == 0 && fin(2L)._1 == 0)
  }

  test("hits: random graphs match the sequential reference bit for bit") {
    val rnd = new scala.util.Random(414)
    for (trial <- 0 until 3) {
      val n = 12 + rnd.nextInt(10)
      val e = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(runHits(e, 3) == seqHits(e, 3), s"trial=$trial e=$e")
    }
  }

  test("reciprocalLinks: trading pair flagged, one-way and self edges not") {
    val e = Seq(
      (1L, 2L), (2L, 1L),            // trading pair
      (1L, 3L),                      // one-way
      (3L, 3L),                      // self loop: dropped entirely
      (4L, 1L), (4L, 1L),            // duplicate edge counts once
      (3L, 4L)
    ).toDF("src", "dst")
    val out = Graph.reciprocalLinks(e, "src", "dst")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)), out.toString)    // 1→2 recip, 1→3 not
    assert(out(2L) == ((1L, 1L, 1.0)), out.toString)
    assert(out(3L) == ((1L, 0L, 0.0)), out.toString)    // self loop gone
    assert(out(4L) == ((1L, 0L, 0.0)), out.toString)    // dup collapsed
  }
}
