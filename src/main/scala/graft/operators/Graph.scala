package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph centrality for crawl prioritization: PageRank (Page et al.
 * 1999) over the edge list a link extraction produces, feeding the
 * frontier scheduler's priority column ([[Frontier.schedule]]) — the
 * crawl-ordering signal of Cho, Garcia-Molina & Page 1998 ("Efficient
 * crawling through URL ordering"). Reference analogue: the uploader's
 * dependency-ordered table scheduling (`BdeUploader.pm` load order),
 * generalized to a fixpoint over an arbitrary graph.
 *
 * Exactness: ranks are INTEGER MICRO-UNITS (the KMeans/Pca/Classifier
 * house pattern — every distributed sum is a sum of longs, so results
 * are bit-identical across engines and partitionings, and the oracle
 * can replay the whole fixpoint as unrolled CTEs). Per iteration, with
 * unit U and damping 85/100:
 *
 *   contrib(j→i) = rank(j) div outdeg(j)
 *   redist       = (Σ rank over DANGLING nodes) div N
 *   rank'(i)     = (15·U + 85·(Σ contrib(·→i) + redist)) div 100
 *
 * — dangling mass redistributes uniformly (the standard random-surfer
 * repair), and `div` floors, so the tiny floor losses are themselves
 * deterministic.
 *
 * Scale shape: the edge list dedups and partitions ONCE outside the
 * loop; each iteration is the inherent pair — ranks join edges on the
 * source (ranks are node-sized, edges dominate and stay put) and the
 * contributions aggregate by destination (map-side partial sums). The
 * dangling total and N ride as 1-row crossJoin combines, never a
 * driver collect. Iterations chain linearly in the plan; at fixpoint
 * depths beyond a few dozen, checkpoint the rank table between rounds
 * the way [[Dedup]]'s component doubling does.
 */
object Graph {

  val RankUnit: Long = 1000000000000L

  /** Normalized (edges, node universe) every operator here starts from:
    * long-cast endpoints, parallel edges collapsed (the rank model is a
    * simple directed graph), nodes = every distinct endpoint. One place
    * to change edge hygiene for all five consumers. */
  private def prepGraph(
      edges: DataFrame, srcCol: String,
      dstCol: String): (DataFrame, DataFrame) = {
    val e = edges
      .select(col(srcCol).cast("long").as("node"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
    val nodes = e.select(col("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    (e, nodes)
  }

  /** The node-count 1-row frame, guarded against the integer-unit
    * arithmetic's overflow envelope: every product in the rank update
    * is ≤ 100 · 2 · N · unit, so N must stay under Long.Max / (200 ·
    * unit) — at the default unit that is ~46k nodes; a billion-node web
    * graph runs with `unit = 1e6` (six significant rank digits, cap
    * ~46e9 nodes). The guard rides the 1-row aggregate as a
    * `raise_error` arm — distributed, never a driver count. */
  private def guardedN(nodes: DataFrame, unit: Long): DataFrame = {
    val maxNodes = Long.MaxValue / 200 / unit
    nodes.agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > maxNodes,
        raise_error(concat(lit(s"pagerank: more than $maxNodes nodes " +
          s"overflows the unit=$unit integer ranks; lower the unit"),
          lit("")))).otherwise(col("__n")).as("__n"))
  }

  /** (node, rank_units) after `iters` damped rounds from a uniform
    * start of `unit` per node ([[RankUnit]] default; lower it for
    * graphs beyond the [[guardedN]] envelope). */
  def pagerank(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, unit: Long = RankUnit): DataFrame = {
    require(iters >= 1 && iters <= 64, "pagerank: iters must be in 1..64")
    require(unit >= 100L, "pagerank: unit must be at least 100")
    val (e, nodes, outdeg, n) = prepPersisted(edges, srcCol, dstCol)
    val r0 = nodes.select(col("node"), lit(unit).as("__pr"))
    runRounds(e, nodes, outdeg, r0, iters, unit, n)
  }

  /**
   * [[pagerank]] WARM-STARTED from a prior release's rank vector — the
   * release-over-release maintenance arm: instead of recomputing the
   * fixpoint cold after an edge-index append, round 1 starts from
   * `prior` (nodeCol, rankCol — the previous release's `rank_units`,
   * which MUST come from the same `unit`). Nodes new to the graph start
   * at the cold uniform `unit`; prior nodes that left the graph drop.
   * The per-round arithmetic is identical, so on an UNCHANGED graph k
   * warm rounds from cold round n are bit-identical to cold round n+k
   * (the GraphSpec pin); on a drifted graph the start is already near
   * the fixpoint and the round-k movement is smaller than cold's — the
   * `graph_pagerank_warm_gauge` measurement.
   */
  def pagerankWarm(
      edges: DataFrame, srcCol: String, dstCol: String,
      prior: DataFrame, nodeCol: String, rankCol: String,
      iters: Int, unit: Long = RankUnit): DataFrame = {
    require(iters >= 1 && iters <= 64, "pagerankWarm: iters must be in 1..64")
    require(unit >= 100L, "pagerankWarm: unit must be at least 100")
    val (e, nodes, outdeg, n) = prepPersisted(edges, srcCol, dstCol)
    val r0 = nodes.join(
        prior.select(col(nodeCol).cast("long").as("node"),
          col(rankCol).cast("long").as("__pr0")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("__pr0"), lit(unit)).as("__pr"))
    runRounds(e, nodes, outdeg, r0, iters, unit, n)
  }

  /** The loop-invariant frames both fixpoint entry points share,
    * persisted once: every round re-joins e/outdeg and re-reads nodes —
    * without the cache a k-round run re-executes the edge lineage
    * (which may be a whole extract→gate→trap chain, as in
    * pipeline_crawl) ~3k times. */
  private def prepPersisted(
      edges: DataFrame, srcCol: String, dstCol: String)
      : (DataFrame, DataFrame, DataFrame, Long) = {
    val (e0, nodes0) = prepGraph(edges, srcCol, dstCol)
    val e = e0.persist()
    val nodes = nodes0.persist()
    val outdeg =
      e.groupBy(col("node")).agg(count(lit(1)).as("__odeg")).persist()
    // fill the caches EAGERLY: the fixpoint plan references these
    // frames from many subtrees that execute as parallel stages, and
    // parallel readers of a cold cache each recompute the lineage —
    // for an edge list built by a whole extract→robots→trap chain
    // (pipeline_crawl) that race re-ran the chain several times per
    // action (measured: 75 CPU-s vs 40 with the caches pre-filled).
    // Two node-sized counts; e fills as outdeg's input. The node count
    // doubles as the fixpoint's overflow-guard/damping denominator
    // (a driver literal instead of a per-round 1-row broadcast).
    outdeg.count()
    val n = nodes.count()
    (e, nodes, outdeg, n)
  }

  /** The shared damped-round loop over a prepared (and persisted —
    * EAGERLY, see [[prepPersisted]]) graph, from an arbitrary integer
    * start vector.
    *
    * The loop stays LAZY on purpose: the rounds unfold into one plan
    * whose repeated subtrees ReuseExchange dedups at execution — an
    * eager per-round `localCheckpoint` variant was measured at +70%
    * CPU on the plain pagerank rows and +380% on the gauges (which run
    * two fixpoint depths that the one lazy plan shares via exchange
    * reuse, but eager rounds must execute twice). What the lazy loop
    * needs to be safe is exactly what prepPersisted now guarantees:
    * the loop-invariant caches are filled before the fan-out races
    * over them. */
  private def runRounds(
      e: DataFrame, nodes: DataFrame, outdeg: DataFrame,
      r0: DataFrame, iters: Int, unit: Long, n: Long): DataFrame = {
    require(n <= Long.MaxValue / 200 / unit,
      s"pagerank: more than ${Long.MaxValue / 200 / unit} nodes " +
        s"overflows the unit=$unit integer ranks; lower the unit")
    val nDiv = math.max(n, 1L) // n == 0 ⇒ zero rows; keep the div legal
    var r = r0
    for (_ <- 1 to iters) {
      // ONE pass over the rank vector per round: inflow and the dangling
      // mass come out of the same left-join aggregation (a dangling node
      // survives the edge join with dst NULL carrying its whole rank).
      // The previous formulation referenced r twice (inflow + a separate
      // anti-join aggregate); the second reference sat under a broadcast
      // exchange with no reusable shuffle boundary, so every round
      // re-executed the prior round's tail — per-stage CPU accounting
      // showed those broadcast children as the fixpoint's dominant cost.
      val contrib = r.join(outdeg, Seq("node"), "left")
        .join(e, Seq("node"), "left")
        .select(col("dst"),
          when(col("__odeg").isNull, col("__pr"))
            .otherwise(expr("__pr div __odeg")).as("__c"))
        .groupBy(col("dst")).agg(sum(col("__c")).as("__in"))
      val dangRow = contrib.where(col("dst").isNull)
        .agg(coalesce(sum(col("__in")), lit(0L)).as("__dang"))
      r = nodes.join(contrib.where(col("dst").isNotNull)
            .select(col("dst").as("node"), col("__in")),
          Seq("node"), "left")
        .crossJoin(dangRow)
        .select(col("node"),
          expr(s"(15 * ${unit}L + 85 * (coalesce(__in, 0L) + " +
            s"(__dang div ${nDiv}L))) div 100").as("__pr"))
    }
    CacheScope.unpersistAfterAction(
      r.select(col("node"), col("__pr").as("rank_units")),
      Seq(e, nodes, outdeg))
  }

  /**
   * Weighted PageRank — the HOST-graph form: collapsing a page graph to
   * hosts turns parallel links into edge WEIGHTS (link counts), and a
   * host's rank should flow in proportion to how often it links where
   * it links, not once per distinct neighbor. Same integer fixpoint
   * with `contrib(j→i) = (rank(j) · w(j→i)) div Σ_k w(j→k)`; parallel
   * (src, dst) rows COMBINE their weights; non-positive weights drop.
   * The overflow envelope gains the max-weight factor, guarded
   * distributedly like [[guardedN]]: N · unit · maxW must stay under
   * Long.Max/200 — at the default unit a 46k-node graph tolerates
   * maxW = 1; size `unit` to the weight scale (the scaladoc example:
   * unit 1e6 and maxW 1e6 still allows 9e6 hosts... the guard does the
   * arithmetic, loudly).
   */
  def weightedPagerank(
      edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, iters: Int, unit: Long = RankUnit): DataFrame = {
    require(iters >= 1 && iters <= 64,
      "weightedPagerank: iters must be in 1..64")
    require(unit >= 100L, "weightedPagerank: unit must be at least 100")
    val e = edges
      .select(col(srcCol).cast("long").as("node"),
        col(dstCol).cast("long").as("dst"),
        col(weightCol).cast("long").as("__w"))
      .where(col("__w") > 0)
      .groupBy(col("node"), col("dst"))
      .agg(sum(col("__w")).as("__w"))
      .persist()
    val nodes = e.select(col("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val outw = e.groupBy(col("node")).agg(sum(col("__w")).as("__ow"))
      .persist()
    // eager cache fill — see prepPersisted
    outw.count()
    nodes.count()
    val maxW = e.agg(coalesce(max(col("__w")), lit(1L)).as("__mw"))
    // compare via division — the product n·maxW could itself wrap, and
    // the guard must stay loud even with ANSI checks off
    val nRow = nodes.agg(count(lit(1)).as("__n")).crossJoin(maxW)
      .select(when(
        col("__mw") > expr(s"${Long.MaxValue / 200 / unit}L div __n"),
        raise_error(concat(lit("weightedPagerank: N × maxW exceeds the " +
          s"unit=$unit overflow envelope; lower the unit"), lit(""))))
        .otherwise(col("__n")).as("__n"))
    var r = nodes.select(col("node"), lit(unit).as("__pr"))
    for (_ <- 1 to iters) {
      val inflow = r.join(outw, "node").join(e, "node")
        .select(col("dst").as("node"),
          expr("(__pr * __w) div __ow").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      val dangRow = r.join(outw, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("__pr")), lit(0L)).as("__dang"))
      r = nodes.join(inflow, Seq("node"), "left")
        .crossJoin(dangRow).crossJoin(nRow)
        .select(col("node"),
          expr(s"(15 * ${unit}L + 85 * (coalesce(__in, 0L) + " +
            "(__dang div __n))) div 100").as("__pr"))
    }
    CacheScope.unpersistAfterAction(
      r.select(col("node"), col("__pr").as("rank_units")),
      Seq(e, nodes, outw))
  }

  /** The gauge of [[pagerank]]'s one approximation — TRUNCATION at
    * `iters` rounds (the arithmetic itself is exact): the L1 and max
    * movement between the last two rounds, in rank units. A run whose
    * `l1_delta_units` is still a large share of total mass needs more
    * rounds; the house rule is that every approximate arm ships its
    * gauge. Costs one extra fixpoint prefix — the prefix is
    * deterministic, so round `iters-1` of the second run is
    * bit-identical to the first's. */
  def pagerankGauge(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, unit: Long = RankUnit): DataFrame = {
    require(iters >= 2, "pagerankGauge: needs iters >= 2 to compare")
    val prev = pagerank(edges, srcCol, dstCol, iters - 1, unit)
      .withColumnRenamed("rank_units", "__prev")
    pagerank(edges, srcCol, dstCol, iters, unit)
      .join(prev, "node")
      .agg(sum(abs(col("rank_units") - col("__prev")))
          .as("l1_delta_units"),
        max(abs(col("rank_units") - col("__prev")))
          .as("max_delta_units"),
        count(lit(1)).as("n_nodes"))
  }

  /** Default integer unit for [[hits]] — smaller than [[RankUnit]]
    * because the normalization step multiplies a raw score (≤ N·unit)
    * by `unit` before the floor division, so the envelope is N·unit²
    * < Long.Max: at 1e6 that admits ~9.2M nodes (lower the unit for
    * bigger graphs; the guard is loud). */
  val HitsUnit: Long = 1000000L

  /**
   * HITS hubs and authorities (Kleinberg 1999, "Authoritative sources
   * in a hyperlinked environment", JACM 46(5) §2): the mutual
   * recursion a(i) = Σ_{j→i} h(j), h(j) = Σ_{j→i} a(i), normalized
   * each half-step. Complements PageRank in crawl curation — PageRank
   * scores endorsement mass, HITS separates DIRECTORY pages (hubs:
   * pages whose links concentrate on strong authorities) from CONTENT
   * pages (authorities: pages the strong hubs agree on) — the classic
   * seed-list / link-farm diagnostic pair.
   *
   * Exactness: integer micro-units like [[pagerank]], with L1 (sum)
   * normalization instead of Kleinberg's L2 — the normalization only
   * fixes the vector's SCALE, never its direction, and a sum stays in
   * integer arithmetic: score'(i) = (raw(i) · unit) div (Σ raw), so
   * each half-step is one edge join + one map-side-combinable sum +
   * a 1-row total riding a crossJoin (never a driver collect). An
   * all-zero half-step (no edges) yields all-zero scores rather than
   * dividing by zero.
   *
   * Scale shape: identical to [[runRounds]] — edges dedup/persist once,
   * each half-step joins the node-sized score vector to the edge list
   * on its flow side and aggregates by the other endpoint.
   */
  def hits(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, unit: Long = HitsUnit): DataFrame = {
    require(iters >= 1 && iters <= 64, "hits: iters must be in 1..64")
    require(unit >= 100L, "hits: unit must be at least 100")
    val (e0, nodes0) = prepGraph(edges, srcCol, dstCol)
    val e = e0.persist()
    val nodes = nodes0.persist()
    // eager cache fill — see prepPersisted
    e.count()
    nodes.count()
    val maxNodes = Long.MaxValue / unit / unit
    val nRow = nodes.agg(count(lit(1)).as("__n"))
      .select(when(col("__n") > maxNodes,
        raise_error(concat(lit(s"hits: more than $maxNodes nodes " +
          s"overflows the unit=$unit integer scores; lower the unit"),
          lit("")))).otherwise(col("__n")).as("__n"))
    // L1-normalize a raw integer score vector to total ≈ unit
    def normalized(raw: DataFrame, outCol: String): DataFrame = {
      val tot = raw.agg(coalesce(sum(col("__raw")), lit(0L)).as("__tot"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(tot).crossJoin(nRow)
        .select(col("node"),
          when(col("__tot") > 0,
            expr(s"(coalesce(__raw, 0L) * ${unit}L) div __tot"))
            .otherwise(lit(0L)).as(outCol))
    }
    var h = nodes.select(col("node"), lit(unit).as("__h"))
    var a: DataFrame = null
    for (_ <- 1 to iters) {
      val aRaw = h.join(e, "node")
        .select(col("dst").as("node"), col("__h").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__raw"))
      a = normalized(aRaw, "__a")
      val hRaw = a.withColumnRenamed("node", "dst").join(e, "dst")
        .select(col("node"), col("__a").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__raw"))
      h = normalized(hRaw, "__h")
    }
    CacheScope.unpersistAfterAction(
      a.join(h, "node")
        .select(col("node"), col("__a").as("auth_units"),
          col("__h").as("hub_units")),
      Seq(e, nodes))
  }

  /**
   * Personalized PageRank with a trusted seed set (TrustRank — Gyöngyi,
   * Garcia-Molina & Pedersen 2004): the random surfer teleports ONLY to
   * seeds, so rank flows outward from trust and spam farms far from any
   * seed starve — the standard frontier-quality demotion signal. Same
   * integer micro-unit fixpoint as [[pagerank]], with the teleport and
   * the dangling mass both returning to the seeds:
   *
   *   tele       = (15·T div 100) div S          (T = N·U total mass)
   *   dangShare  = (85·Σ_dangling rank div 100) div S
   *   rank'(i)   = (85·Σ contrib(·→i)) div 100
   *                + [i ∈ seeds] (tele + dangShare)
   *
   * Seeds outside the edge set's node universe are ignored (they can
   * receive no links and give none). Starts from the uniform U per node
   * so round counts compare with [[pagerank]].
   */
  def personalizedPagerank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, iters: Int,
      unit: Long = RankUnit): DataFrame = {
    require(iters >= 1 && iters <= 64,
      "personalizedPagerank: iters must be in 1..64")
    require(unit >= 100L, "personalizedPagerank: unit must be at least 100")
    val (e0, nodes0) = prepGraph(edges, srcCol, dstCol)
    val e = e0.persist()
    val nodes = nodes0.persist()
    val outdeg =
      e.groupBy(col("node")).agg(count(lit(1)).as("__odeg")).persist()
    val seed = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().join(nodes, "node").persist()
    // eager cache fill — see prepPersisted
    outdeg.count()
    nodes.count()
    seed.count()
    val nRow = guardedN(nodes, unit)
    val sRow = seed.agg(count(lit(1)).as("__s"))
    var r = nodes.select(col("node"), lit(unit).as("__pr"))
    for (_ <- 1 to iters) {
      val inflow = r.join(outdeg, "node").join(e, "node")
        .select(col("dst").as("node"),
          expr("__pr div __odeg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      val dangRow = r.join(outdeg, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("__pr")), lit(0L)).as("__dang"))
      r = nodes.join(inflow, Seq("node"), "left")
        .join(seed.select(col("node"), lit(1).as("__seed")),
          Seq("node"), "left")
        .crossJoin(dangRow).crossJoin(nRow).crossJoin(sRow)
        .select(col("node"),
          (expr("(85 * coalesce(__in, 0L)) div 100") +
            when(col("__seed").isNotNull,
              expr(s"((15 * (__n * ${unit}L)) div 100) div __s + " +
                "((85 * __dang) div 100) div __s"))
              .otherwise(lit(0L))).as("__pr"))
    }
    CacheScope.unpersistAfterAction(
      r.select(col("node"), col("__pr").as("rank_units")),
      Seq(e, nodes, outdeg, seed))
  }

  /**
   * Hop distance from a seed set along edge direction — crawl DEPTH
   * from the trusted frontier (the companion diagnostic of
   * [[personalizedPagerank]]: TrustRank's own seed selection uses
   * inverse-PageRank reach, and crawl policies cap by depth-from-seed).
   * `maxHops` rounds of min-plus relaxation: dist(seed) = 0,
   * dist(v) = min(dist(v), min over edges u→v of dist(u)+1); nodes not
   * reached within `maxHops` return NULL (unknown, not infinite — the
   * next release's deeper walk may reach them).
   *
   * Scale shape: each round is one ranks⋈edges join + a min aggregate
   * (map-side combinable); the reached set only grows, and all
   * arithmetic is integer min/plus — exact everywhere. BFS depth on a
   * web graph converges in ~diameter rounds (tens); checkpoint between
   * rounds at that depth like the component doubling.
   */
  def seedDistance(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 1 && maxHops <= 64,
      "seedDistance: maxHops must be in 1..64")
    val (e0, nodes0) = prepGraph(edges, srcCol, dstCol)
    val e = e0.persist()
    val nodes = nodes0.persist()
    // eager cache fill — see prepPersisted
    e.count()
    nodes.count()
    var d = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().join(nodes, "node")
      .select(col("node"), lit(0L).as("__dist"))
    for (_ <- 1 to maxHops) {
      val relaxed = d.join(e, "node")
        .select(col("dst").as("node"), (col("__dist") + 1L).as("__dist"))
      d = d.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("__dist")).as("__dist"))
    }
    CacheScope.unpersistAfterAction(
      nodes.join(d, Seq("node"), "left")
        .select(col("node"), col("__dist").as("dist")),
      Seq(e, nodes))
  }

  /**
   * Co-citation similarity (Small 1973): pages are similar when the
   * same pages LINK TO BOTH — n_common(a, b) = |{s : s→a and s→b}|.
   * The complementary [[bibliographicCoupling]] (Kessler 1963) counts
   * shared OUT-links. Both are the link-evidence neighbors feeding
   * related-page retrieval and seed expansion.
   *
   * Scale shape: the pair explosion is per-SOURCE (C(outdeg, 2) pairs),
   * so the one skew risk is a navigational mega-hub — `maxOutDegree`
   * drops sources above the cap BEFORE pairing (the standard repair:
   * a page linking to thousands of others carries no co-citation
   * signal per pair anyway). After the cap the self-join groups are
   * bounded by cap², and the pair count aggregate is map-side
   * combinable.
   */
  def coCitation(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxOutDegree: Int): DataFrame = {
    require(maxOutDegree >= 2 && maxOutDegree <= 10000,
      "coCitation: maxOutDegree must be in 2..10000")
    val (e, _) = prepGraph(edges, srcCol, dstCol)
    val capped = e.join(
        e.groupBy(col("node")).agg(count(lit(1)).as("__od"))
          .where(col("__od") <= maxOutDegree)
          .select(col("node")),
        "node")
      .persist() // both self-join sides scan it
    val left = capped.select(col("node"), col("dst").as("node_a"))
    val right = capped.select(col("node"), col("dst").as("node_b"))
    CacheScope.unpersistAfterAction(
      left.join(right, "node")
        .where(col("node_a") < col("node_b"))
        .groupBy(col("node_a"), col("node_b"))
        .agg(count(lit(1)).as("n_common")),
      Seq(capped))
  }

  /**
   * Per-node triangle counts over the UNDIRECTED view of the graph —
   * the local-density signal behind clustering coefficients, community
   * sanity checks, and link-farm detection (farms are near-cliques;
   * honest web neighborhoods are sparse). Direction is ignored and
   * self-loops drop: a triangle is an unordered {u, v, w} with all
   * three edges present either way.
   *
   * Scale shape: the compact-forward algorithm (Schank & Wagner 2005 /
   * Cohen 2009's MapReduce form) — every undirected edge ORIENTS from
   * the lower (degree, id) endpoint to the higher, which turns the
   * graph into a DAG whose out-degrees are O(√m) on any graph, so the
   * wedge join (out-neighbor pairs per source) is bounded by Σ
   * out-deg² = O(m^1.5) TOTAL and no hub explodes a single task; each
   * triangle closes exactly once (its corners meet in k-order). The
   * oracle deliberately uses the OTHER standard formulation (ordered
   * triple self-join), so the implementations share nothing.
   *
   * Returns (node, n_triangles) for every node of the universe,
   * zero-filled.
   */
  def triangles(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val (e, nodes) = prepGraph(edges, srcCol, dstCol)
    val und = e.where(col("node") =!= col("dst"))
      .select(least(col("node"), col("dst")).as("u"),
        greatest(col("node"), col("dst")).as("v"))
      .distinct().persist()
    val deg = und.select(col("u").as("n"))
      .union(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val keyed = und
      .join(deg.select(col("n").as("u"), col("d").as("__du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("__dv")), "v")
    val uKey = struct(col("__du").as("d"), col("u").as("n"))
    val vKey = struct(col("__dv").as("d"), col("v").as("n"))
    val oriented = keyed.select(
        when(uKey < vKey, col("u")).otherwise(col("v")).as("a"),
        when(uKey < vKey, col("v")).otherwise(col("u")).as("b"),
        when(uKey < vKey, vKey).otherwise(uKey).as("__kb"))
      .persist() // scanned three times: both wedge sides and the closure
    val o1 = oriented.select(col("a"), col("b").as("x"),
      col("__kb").as("__kx"))
    val o2 = oriented.select(col("a"), col("b").as("y"),
      col("__kb").as("__ky"))
    val wedges = o1.join(o2, "a").where(col("__kx") < col("__ky"))
      .select(col("a").as("corner"), col("x"), col("y"))
    val closed = wedges.join(
      oriented.select(col("a").as("x"), col("b").as("y")),
      Seq("x", "y"))
    val perCorner = closed
      .select(explode(array(col("corner"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("__t"))
    CacheScope.unpersistAfterAction(
      nodes.join(perCorner, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__t"), lit(0L)).as("n_triangles")),
      Seq(und, oriented))
  }

  /** Shared-out-link similarity (Kessler 1963) — [[coCitation]] on the
    * transposed graph; `maxInDegree` caps the popular-target hub the
    * same way. */
  def bibliographicCoupling(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxInDegree: Int): DataFrame = {
    val flipped = edges.select(col(dstCol).as("__f_src"),
      col(srcCol).as("__f_dst"))
    coCitation(flipped, "__f_src", "__f_dst", maxInDegree)
  }

  /**
   * Reciprocal-link profile per node — the classic nepotistic-link /
   * link-farm signal (Davison 2000, "Recognizing nepotistic links on the
   * web"; the TrustRank-era heuristic): organic link graphs are strongly
   * asymmetric (news links to sources, directories to members), so a node
   * whose out-edges are mostly RECIPROCATED (A→B and B→A) is trading
   * links, not citing. Rank flows (PageRank/HITS) treat such edges as
   * endorsements unless the curation layer discounts them first.
   *
   * One pass: dedup'd edges left-join their own reversal (an equi-join
   * keyed (src, dst) vs (dst, src) — no window, no cartesian), then one
   * map-side-combinable per-source aggregate. Self-loops are dropped
   * (trivially "reciprocal", pure noise). Returns (`node`, `out_degree`,
   * `n_reciprocal`, `recip_frac`).
   */
  def reciprocalLinks(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src") =!= col("dst")).distinct()
    val rev = e.select(col("dst").as("src"), col("src").as("dst"),
      lit(1L).as("__r"))
    e.join(rev, Seq("src", "dst"), "left_outer")
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_degree"),
        sum(coalesce(col("__r"), lit(0L))).as("n_reciprocal"))
      .withColumn("recip_frac",
        round(col("n_reciprocal").cast("double") /
          col("out_degree").cast("double"), 6))
  }

  /**
   * Persist the link graph as an at-rest artifact — the same lifecycle
   * as the dedup/IVF/postings indexes: a crawl pays link extraction
   * once per page, the EDGES accumulate across releases ([[
   * appendEdgeIndex]]), and the graph analytics re-read the bucketed
   * table instead of re-extracting. Bucketed on `src`, so per-source
   * folds (out-degree, the rank loop's contribution join) scan the
   * index with NO Exchange on the index side. Re-observed edges (the
   * same link seen by two crawls) collapse at READ time via the rank
   * model's own distinct — appends stay blind writes. Rank itself is
   * corpus-global, so each release recomputes it over the folded graph
   * (the suffix-array rebuild-per-release posture, stated there at
   * `SuffixArray.scala`); the artifact amortizes extraction and layout,
   * not the fixpoint.
   */
  def writeEdgeIndex(
      edges: DataFrame, srcCol: String, dstCol: String,
      table: String, buckets: Int): Unit =
    Bucketing.writeBucketed(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct(),
      table, "src", buckets)

  /** Fold a crawl release's edges into the index (append preserving the
    * bucket layout; within-batch duplicates collapse here, cross-release
    * re-observations at read). */
  def appendEdgeIndex(
      edges: DataFrame, srcCol: String, dstCol: String,
      table: String): Unit =
    DedupIndex.appendBucketed(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst")).distinct(),
      table)

  /** Takedown for the edge index: a retracted NODE leaves the graph
    * entirely — every edge it sources AND every edge pointing at it
    * ([[Retract]]'s per-column tombstones give the OR semantics; one
    * broadcast anti-join per endpoint at probe time, physical drop at
    * the next [[Retract.purge]]). Rank/degree probes over the live view
    * then equal a rebuild from the filtered edge list by construction —
    * they are pure folds of the edge set. */
  def retractNodes(spark: org.apache.spark.sql.SparkSession,
      table: String, nodes: DataFrame): Unit = {
    Retract.retract(spark, table, "src", nodes)
    Retract.retract(spark, table, "dst", nodes)
  }

  /** Out-degree per source from the persisted graph — a bucketed scan
    * folding in place, zero Exchange (plan-pinned). */
  def outDegrees(spark: org.apache.spark.sql.SparkSession,
      table: String): DataFrame =
    Retract.readLive(spark, table).groupBy(col("src").as("node"))
      .agg(countDistinct(col("dst")).as("out_degree"))

  /** [[pagerank]] over the persisted graph (`unit` passes through for
    * graphs past the default envelope). */
  def pagerankIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, iters: Int, unit: Long = RankUnit): DataFrame =
    pagerank(Retract.readLive(spark, table), "src", "dst", iters, unit)
}

/** DuckDB renderings of the same fixpoint, for oracle SQL: the whole
  * training loop unrolls as CTEs (the ClassifierSql pattern), so the
  * oracle replays every iteration bit-for-bit. */
object GraphSql {

  /** Shared edge/node-universe CTEs over a prior CTE `<px>raw(src,
    * dst)` — the SQL twin of [[Graph]]'s prepGraph. The prefix keeps
    * two fixpoints (e.g. a prior release's and a warm restart's) in one
    * oracle query from colliding. */
  private def graphFixed(px: String) =
    s"""${px}e AS (SELECT DISTINCT src, dst FROM ${px}raw),
       |${px}nodes AS (SELECT src AS node FROM ${px}e
       |               UNION SELECT dst FROM ${px}e)""".stripMargin

  private val GraphFixed = graphFixed("")

  private def odegCte(px: String) =
    s"${px}odeg AS (SELECT src, count(*) AS odeg FROM ${px}e GROUP BY src)"

  private val OdegCte = odegCte("")

  /** Seed set restricted to the node universe (prior CTE `rawseed`). */
  private val SeedCte =
    """seed AS (SELECT DISTINCT rawseed.node FROM rawseed
      |         JOIN nodes ON nodes.node = rawseed.node)""".stripMargin

  /** The per-round contribution / inflow / dangling trio both rank
    * fixpoints share. */
  private def flowCtes(i: Int, px: String = ""): String = {
    val p = i - 1
    s"""${px}c$i AS (
       |  SELECT ${px}e.dst AS node, ${px}r$p.pr // ${px}odeg.odeg AS c
       |  FROM ${px}r$p JOIN ${px}odeg ON ${px}odeg.src = ${px}r$p.node
       |           JOIN ${px}e ON ${px}e.src = ${px}r$p.node),
       |${px}inf$i AS (SELECT node, CAST(sum(c) AS BIGINT) AS inflow
       |          FROM ${px}c$i GROUP BY node),
       |${px}dang$i AS (
       |  SELECT CAST(coalesce(sum(${px}r$p.pr), 0) AS BIGINT) AS dang
       |  FROM ${px}r$p LEFT JOIN ${px}odeg ON ${px}odeg.src = ${px}r$p.node
       |  WHERE ${px}odeg.src IS NULL)""".stripMargin
  }

  /** CTE chain `e, nodes, odeg, nn, r0, …, r{iters}` over a prior CTE
    * `raw(src, dst)`. Ranks are BIGINT micro-units; `//` floors like
    * Spark's `div` on the non-negative values here. */
  def pagerankCtes(iters: Int, unit: Long = Graph.RankUnit): String =
    pagerankCtes(iters, unit, "", None)

  /** Prefixed variant over a prior CTE `<prefix>raw(src, dst)`; every
    * CTE name gains `prefix`, and `start` (when given) replaces the
    * uniform `r0` body — the warm-start oracle's hook. */
  def pagerankCtes(iters: Int, unit: Long, prefix: String,
      start: Option[String]): String = {
    val px = prefix
    val r0 = start.getOrElse(
      s"SELECT node, CAST($unit AS BIGINT) AS pr FROM ${px}nodes")
    val fixed =
      s"""${graphFixed(px)},
         |${odegCte(px)},
         |${px}nn AS (SELECT count(*) AS n FROM ${px}nodes),
         |${px}r0 AS ($r0)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${flowCtes(i, px)},
         |${px}r$i AS (
         |  SELECT ${px}nodes.node,
         |         (15 * $unit + 85 * (coalesce(inflow, 0) + dang // n)) // 100
         |           AS pr
         |  FROM ${px}nodes LEFT JOIN ${px}inf$i USING (node)
         |  CROSS JOIN ${px}dang$i CROSS JOIN ${px}nn)""".stripMargin
    }
    (fixed +: rounds).mkString(",\n")
  }

  /** CTE chain for [[Graph.weightedPagerank]] over a prior CTE
    * `raw(src, dst, w)`. */
  def weightedCtes(iters: Int, unit: Long = Graph.RankUnit): String = {
    val fixed =
      s"""e AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w
         |      FROM raw WHERE w > 0 GROUP BY src, dst),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
         |       FROM e GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, CAST($unit AS BIGINT) AS pr FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""c$i AS (
         |  SELECT e.dst AS node, (r$p.pr * e.w) // ow.ow AS c
         |  FROM r$p JOIN ow ON ow.src = r$p.node
         |           JOIN e ON e.src = r$p.node),
         |inf$i AS (SELECT node, CAST(sum(c) AS BIGINT) AS inflow
         |          FROM c$i GROUP BY node),
         |dang$i AS (
         |  SELECT CAST(coalesce(sum(r$p.pr), 0) AS BIGINT) AS dang
         |  FROM r$p LEFT JOIN ow ON ow.src = r$p.node
         |  WHERE ow.src IS NULL),
         |r$i AS (
         |  SELECT nodes.node,
         |         (15 * $unit + 85 * (coalesce(inflow, 0) + dang // n)) // 100
         |           AS pr
         |  FROM nodes LEFT JOIN inf$i USING (node)
         |  CROSS JOIN dang$i CROSS JOIN nn)""".stripMargin
    }
    (fixed +: rounds).mkString(",\n")
  }

  /** CTE chain for [[Graph.personalizedPagerank]] over prior CTEs
    * `raw(src, dst)` and `rawseed(node)`. */
  def personalizedCtes(iters: Int, unit: Long = Graph.RankUnit): String = {
    val fixed =
      s"""$GraphFixed,
         |$OdegCte,
         |$SeedCte,
         |nn AS (SELECT count(*) AS n FROM nodes),
         |ss AS (SELECT count(*) AS s FROM seed),
         |r0 AS (SELECT node, CAST($unit AS BIGINT) AS pr FROM nodes)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""${flowCtes(i)},
         |r$i AS (
         |  SELECT nodes.node,
         |         (85 * coalesce(inflow, 0)) // 100
         |         + CASE WHEN seed.node IS NOT NULL
         |             THEN ((15 * (n * $unit)) // 100) // s
         |                  + ((85 * dang) // 100) // s
         |             ELSE 0 END AS pr
         |  FROM nodes LEFT JOIN inf$i USING (node)
         |  LEFT JOIN seed ON seed.node = nodes.node
         |  CROSS JOIN dang$i CROSS JOIN nn CROSS JOIN ss)""".stripMargin
    }
    (fixed +: rounds).mkString(",\n")
  }

  /** CTE chain for [[Graph.seedDistance]] over prior CTEs `raw(src,
    * dst)` and `rawseed(node)`: `d0 … d{maxHops}` of min-plus rounds. */
  def seedDistanceCtes(maxHops: Int): String = {
    val fixed =
      s"""$GraphFixed,
         |$SeedCte,
         |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM seed)""".stripMargin
    val rounds = (1 to maxHops).map { i =>
      val p = i - 1
      s"""d$i AS (
         |  SELECT node, min(dist) AS dist FROM (
         |    SELECT node, dist FROM d$p
         |    UNION ALL
         |    SELECT e.dst AS node, d$p.dist + 1 AS dist
         |    FROM d$p JOIN e ON e.src = d$p.node)
         |  GROUP BY node)""".stripMargin
    }
    (fixed +: rounds).mkString(",\n")
  }

  /** CTE chain replaying [[Graph.hits]]'s integer half-steps over a
    * prior CTE `raw(src, dst)`: `e, nodes, h0, a1, h1, …, a{iters},
    * h{iters}` — raw flows as edge-join sums, each half-step
    * L1-normalized by `(raw · unit) // total` with an all-zero guard,
    * exactly the Spark arithmetic. */
  def hitsCtes(iters: Int, unit: Long = Graph.HitsUnit): String = {
    val fixed =
      s"""$GraphFixed,
         |h0 AS (SELECT node, CAST($unit AS BIGINT) AS s FROM nodes)""".stripMargin
    def norm(rawCte: String, out: String): String =
      s"""$out AS (
         |  SELECT nodes.node,
         |         CASE WHEN t.tot > 0
         |              THEN (coalesce(r.raw, 0) * $unit) // t.tot
         |              ELSE CAST(0 AS BIGINT) END AS s
         |  FROM nodes LEFT JOIN $rawCte r USING (node)
         |  CROSS JOIN (SELECT CAST(coalesce(sum(raw), 0) AS BIGINT) AS tot
         |              FROM $rawCte) t)""".stripMargin
    val rounds = (1 to iters).map { i =>
      val p = i - 1
      s"""araw$i AS (
         |  SELECT e.dst AS node, CAST(sum(h$p.s) AS BIGINT) AS raw
         |  FROM h$p JOIN e ON e.src = h$p.node GROUP BY e.dst),
         |${norm(s"araw$i", s"a$i")},
         |hraw$i AS (
         |  SELECT e.src AS node, CAST(sum(a$i.s) AS BIGINT) AS raw
         |  FROM a$i JOIN e ON e.dst = a$i.node GROUP BY e.src),
         |${norm(s"hraw$i", s"h$i")}""".stripMargin
    }
    (fixed +: rounds).mkString(",\n")
  }
}
