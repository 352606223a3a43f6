package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{TextOps, VectorOps}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup groups by content digest, keeps smallest id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("id", "text")
    val out = Dedup.exact(df, "id", "text")
      .select("kept_id", "n_dups")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("keepFirst keeps one full row per duplicate group") {
    val df = Seq((3L, "x", "d1"), (1L, "x", "d2"), (2L, "y", "d3"))
      .toDF("id", "text", "extra")
    val out = Dedup.keepFirst(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((1L, "d2"), (2L, "d3")))
  }

  test("minhash LSH finds near-duplicate pairs, exact copies score 1.0") {
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (3 to 30).map(i => s"w$i").mkString(" ")  // 2 tokens dropped
    val far = (1 to 30).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, doc), (2L, doc), (3L, near), (4L, far)).toDF("id", "text")
    val pairs = Dedup.minHashLshPairs(df, "id", "text", minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((1L, 2L)) == 1.0)
    assert(byPair.contains(1L -> 3L) && byPair((1L, 3L)) > 0.8)
    assert(!byPair.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("minHashKeep drops every row with a lower-id near-duplicate") {
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (3 to 30).map(i => s"w$i").mkString(" ")
    val far = (1 to 30).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, doc), (2L, doc), (3L, near), (4L, far)).toDF("id", "text")
    val kept = Dedup.minHashKeep(df, "id", "text", minJaccard = 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), kept.toString) // 2 and 3 duplicate 1; 4 unique
  }

  test("connectedComponents closes transitive chains, not just one hop") {
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3-4 (diameter 3: propagation must iterate), clique 6-7,
    // isolated 5; pair (2,3) given b-before-a to prove symmetrization
    val pairs = Seq((1L, 2L), (3L, 2L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L, 7L -> 6L), got.toString)
  }

  test("componentsMerge: star-edge merge equals the cold recompute") {
    // release 1: chains {1,2,3} and {10,11}; release 2 appends a bridge
    // (3,10) merging them, an extension (11,12) adding a new node, and a
    // fresh pair (20,21) with no prior members at all
    val p1 = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val m1 = Seq(1L, 2L, 3L, 10L, 11L).toDF("id")
    val prior = Dedup.connectedComponents(m1, "id", p1)
    val p2 = Seq((3L, 10L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.componentsMerge(prior, "id", "component", p2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // cold recompute over the full accumulated pair log
    val allNodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L).toDF("id")
    val cold = Dedup.connectedComponents(allNodes, "id",
        p1.unionByName(p2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == cold, s"got=$got cold=$cold")
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      12L -> 1L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on an adversarial diameter-40 path") {
    // a 41-node path graph has diameter 40 > the default maxIter=20: plain
    // min-label propagation would fail the fixpoint guard; pointer doubling
    // (label chains halve per round) must converge in O(log 40) rounds.
    // Edges are ordered HIGH-to-low so labels must travel the full path.
    val nodes = (0L to 40L).toDF("id")
    val pairs = (0L until 40L).map(i => (i + 1L, i)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(nodes, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 40L).map(_ -> 0L).toMap, got.toString)
  }

  test("components loop: convergence counts ride the checkpoint jobs") {
    // the per-round convergence check must be an OBSERVED metric on the
    // checkpoint materialization, not a second count() job per frame: on
    // the diameter-40 path (≈6 doubling rounds) the job total must stay at
    // ~2 jobs/round + fixed setup. The pre-observation loop ran 2 extra
    // count jobs per round (~12 more here) and trips this bound.
    val sc = spark.sparkContext
    val savedAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE splits one action into a job per shuffle stage — disable it so
    // actions and jobs correspond 1:1 and the bound is crisp
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup("cc-jobcount", "components job-count pin")
    try {
      val nodes = (0L to 40L).toDF("id")
      val pairs = (0L until 40L).map(i => (i + 1L, i)).toDF("id_a", "id_b")
      val got = Dedup.connectedComponents(nodes, "id", pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == (0L to 40L).map(_ -> 0L).toMap)
    } finally {
      sc.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
    }
    Thread.sleep(500) // listener bus drain for the status tracker
    val jobs = sc.statusTracker.getJobIdsForGroup("cc-jobcount").length
    // measured: 24 jobs (2 checkpoint jobs per round + fixed setup); the
    // pre-observation loop added one count job per checkpoint (~43 total)
    assert(jobs <= 30, s"components loop ran $jobs jobs — the convergence " +
      "check has stopped riding the checkpoint materialization")
  }

  test("minhash LSH: 1k-copy identical cluster expands arithmetically") {
    // an m-copy boilerplate cluster must contribute ONE banded row per band
    // (never m) and its m(m-1)/2 intra pairs must come from the sorted-ids
    // expansion at jaccard exactly 1.0; identical SHORT docs (< k tokens,
    // empty shingles) must still produce no pairs (null-bucket parity with
    // the uncollapsed pipeline)
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (3 to 30).map(i => s"w$i").mkString(" ")
    val rows = (0L until 1000L).map(i => (i, doc)) ++
      Seq((2000L, near), (3000L, "a b"), (3001L, "a b"))
    val pairs = Dedup.minHashLshPairs(rows.toDF("id", "text"), "id", "text",
      minJaccard = 0.3)
    val n = pairs.count()
    // 1000*999/2 intra + 1000 cross (each copy with the near doc)
    assert(n == 499500L + 1000L, s"got $n")
    assert(pairs.where(col("jaccard") === 1.0).count() == 499500L)
    assert(pairs.where(col("id_a") === 3000L || col("id_b") === 3001L)
      .count() == 0, "empty-shingle docs must never pair")
    // the band join itself must see one representative per distinct text
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("operator caches are released after the consuming action") {
    // Asserted at the CacheScope mechanism level (poll the wrapped
    // frame's OWN storage level), not via global getRDDStorageInfo:
    // suites run in parallel against one shared SparkContext, so
    // another suite's legitimately-live cache can sit in executor
    // storage during the poll window.
    import org.apache.spark.storage.StorageLevel
    val cached = (0L until 50L).map(i => (i, s"tok$i a b c d e f g"))
      .toDF("id", "text").persist()
    val result = CacheScope.unpersistAfterAction(
      cached.groupBy(col("text")).count(), Seq(cached))
    result.count()
    // CacheScope's listener fires asynchronously after the action; the
    // cache must drop without any session-level clearCache
    val deadline = System.currentTimeMillis + 15000
    while (cached.storageLevel != StorageLevel.NONE &&
        System.currentTimeMillis < deadline) Thread.sleep(50)
    assert(cached.storageLevel == StorageLevel.NONE,
      "cached frame still pinned after the consuming action")
    // and the operator path rides the same scope (source-pinned in
    // Dedup.minHashLshPairs); run it so a future regression that makes
    // the listener throw surfaces here
    val df = (0L until 50L).map(i => (i, s"tok$i a b c d e f g"))
      .toDF("id", "text")
    Dedup.minHashLshPairs(df, "id", "text", minJaccard = 0.0).count()
  }

  test("simhash hamming pairs: identical docs at distance 0, near docs small") {
    val doc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 39).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, doc), (2L, doc), (3L, near)).toDF("id", "text")
    val pairs = Dedup.simHashHammingPairs(df, "id", "text", maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("hamming").longValue)
      .toMap
    assert(pairs((1L, 2L)) == 0L)
  }

  test("simhash hamming pairs: 1k-copy identical cluster expands arithmetically") {
    // A boilerplate cluster of 1000 identical docs: the band self-join must
    // see ONE representative row per distinct print (never 1000), and the
    // 499 500 intra-cluster pairs come from the arithmetic expansion.
    val doc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 39).map(i => s"tok$i").mkString(" ")
    val far = (1 to 40).map(i => s"zz$i").mkString(" ")
    val rows = (0L until 1000L).map(i => (i, doc)) ++
      Seq((2000L, near), (2001L, near), (3000L, far))
    val df = rows.toDF("id", "text")
    val got = Dedup.simHashHammingPairs(df, "id", "text", maxHamming = 3)
    // brute-force reference over the raw prints (1003 docs → ~500k pairs)
    val prints = df.select(col("id"),
      TextOps.simHash(TextOps.tokenHashesWide(TextOps.tokens(col("text"))))
        .as("print"))
    val want = prints.as("l").join(prints.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        TextOps.hamming(col("l.print"), col("r.print")).as("hamming"))
      .where(col("hamming") <= 3)
    def sig(p: org.apache.spark.sql.DataFrame) =
      p.agg(count(lit(1)), sum("id_a"), sum("id_b"), sum("hamming"))
        .collect().head.toSeq
    val gotSig = sig(got)
    assert(gotSig == sig(want))
    assert(gotSig.head.asInstanceOf[Long] >= 1000L * 999 / 2)
  }

  test("blocked ngram jaccard: candidates never cross blocks") {
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc, "en"), (2L, doc, "en"), (3L, doc, "de"))
      .toDF("id", "text", "lang")
    val pairs = Dedup.ngramJaccardPairs(df, "id", "text", "lang", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set(1L -> 2L)) // 3 is identical but in another block
  }

  test("componentsKeep keeps one survivor per transitive chain") {
    val df = (1L to 7L).map(i => (i, s"payload$i")).toDF("id", "payload")
    // chain 1-2-3-4: one-hop keep would retain 1 AND 3 (no 1~3 pair);
    // the transitive rule keeps only 1. Clique 6-7 keeps 6; 5 untouched.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val kept = Dedup.componentsKeep(df, "id", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 5L, 6L), kept.toString)
  }

  test("componentsKeepBest keeps the top-scoring member, min id on ties") {
    val df = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.9), (4L, 0.1), // chain: 2 and 3 tie -> 2
      (5L, 0.5),                                  // untouched singleton
      (6L, 0.1), (7L, 0.8)                        // pair: 7 wins over 6
    ).toDF("id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (6L, 7L)).toDF("id_a", "id_b")
    val kept = Dedup.componentsKeepBest(df, "id", "score", pairs)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 5L, 7L), kept.toString)
  }

  test("incremental dedup drops corpus collisions and within-batch repeats") {
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("id", "text")
    val batch = Seq(
      (10L, "aaa"), // collides with ingested corpus → drop
      (11L, "new1"), (12L, "new1"), // within-batch dup → keep 11 only
      (13L, "new2")).toDF("id", "text")
    val kept = Dedup.incremental(batch, corpus, "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L), kept.toString)
  }

  test("incrementalBloom equals incremental exactly, at any fpp") {
    val corpus = (0L until 200L).map(i => (i, s"doc $i")).toDF("id", "text")
    val batch = (
      (150L until 250L).map(i => (i + 1000L, s"doc $i")) ++ // 50 collide
      (0L until 40L).map(i => (i + 2000L, s"fresh ${i % 20}")) // in-batch dups
    ).toDF("id", "text")
    val plain = Dedup.incremental(batch, corpus, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // generous sizing (honest fpp) and pathological undersizing (every
    // probe a possible hit) must BOTH reproduce the exact result — the
    // confirm join owns correctness, the bloom only owns the fast path
    for ((items, fpp) <- Seq((100000L, 0.01), (5L, 0.5))) {
      val gated = Dedup.incrementalBloom(batch, corpus, "id", "text",
          expectedItems = items, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(gated == plain, s"items=$items fpp=$fpp")
    }
    // and at any shard-bank width: a single filter, the default bank, and
    // a wider-than-corpus bank (most shards null → definite misses) all
    // produce the identical survivor set
    for (shards <- Seq(1, 16, 1024)) {
      val gated = Dedup.incrementalBloom(batch, corpus, "id", "text",
          expectedItems = 100000L, fpp = 0.01, shards = shards)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(gated == plain, s"shards=$shards")
    }
  }

  test("incrementalBloom refuses a bank beyond the byte cap, loudly") {
    // 10^11 corpus docs at 1% fpp wants ~120 GB of bits — the regime where
    // the gate stops gating; the operator must fail with a pointer at the
    // persisted digest index rather than OOM the driver or silently decay
    val corpus = Seq((1L, "a")).toDF("id", "text")
    val batch = Seq((2L, "b")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalBloom(batch, corpus, "id", "text",
        expectedItems = 100000000000L, fpp = 0.01)
    }
    assert(e.getMessage.contains("digest index"))
  }

  test("incrementalBloom: an EMPTY corpus admits the whole deduped batch") {
    // regression: BloomFilterAggregate evaluates to null on empty input;
    // a null bitmap literal nulls might_contain and both branches would
    // silently drop every row — the gate must degenerate to no gate
    val corpus = Seq.empty[(Long, String)].toDF("id", "text")
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "text")
    val kept = Dedup.incrementalBloom(batch, corpus, "id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), kept.toString)
  }

  test("rangeSearch returns every pair at or above the radius, exactly") {
    val rows = Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(1f, 0.2f, 0f),
      2L -> Array(0f, 1f, 0f), 3L -> Array(-1f, 0f, 0f),
      10L -> Array(2f, 0f, 0f), 11L -> Array(0f, 3f, 1f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.rangeSearch(df, df.where(col("vec_id") < 2),
        "vec_id", "embedding", minCosine = 0.9)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference over the same vectors
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0d else d / (na * nb)
    }
    val expect = (for {
      (qid, qv) <- rows if qid < 2
      (nid, nv) <- rows if nid != qid && cos(qv, nv) >= 0.9
    } yield (qid, nid)).toSet
    assert(out == expect, s"got $out expected $expect")
  }

  test("semDedup drops the higher id of same-cluster high-cosine pairs") {
    // ids 0..3 seed 4 clusters; 2 tracks the 0-axis, 3 the 1-axis.
    // 10/11 duplicate axis 0 (cosine 1 with seed 0), 12 is axis 1,
    // 13 is a mixed vector closest to the diagonal seed 1.
    val rows = Seq(
      0L -> Array(1f, 0f, 0f), 1L -> Array(1f, 1f, 0f),
      2L -> Array(0f, 1f, 0f), 3L -> Array(0f, 0f, 1f),
      10L -> Array(2f, 0f, 0f), 11L -> Array(3f, 0f, 0f),
      12L -> Array(0f, 5f, 0f), 13L -> Array(0f, 0f, 4f))
    val df = rows.toDF("id", "vec")
    val kept = Dedup.semDedup(df, "id", "vec", minCosine = 0.99, nlist = 4)
      .select("id").collect().map(_.getLong(0)).toSet
    // cluster of seed 0 holds {0,10,11}: cosine(0,10)=cosine(0,11)=1 → 10,
    // 11 drop; 12 pairs with 2 (cosine 1) → drops; 13 pairs with 3 → drops
    assert(kept == Set(0L, 1L, 2L, 3L), kept.toString)
  }

  test("semDedup within-cluster self-join equals brute force at the threshold") {
    // random-ish deterministic vectors: clustering must never DROP a pair
    // that brute force finds within one cluster, and every drop must have a
    // lower-id witness at >= the threshold (soundness; recall is cluster-
    // bounded by design, but with nlist=1 it must equal brute force exactly)
    val rows = (0L until 60L).map { i =>
      val v = Array.tabulate(8)(j =>
        (math.sin(i * 31 + j * 7) * 10).toFloat)
      (i, v)
    }
    val df = rows.toDF("id", "vec")
    val kept = Dedup.semDedup(df, "id", "vec", minCosine = 0.9, nlist = 1)
      .select("id").collect().map(_.getLong(0)).toSet
    val vecs = rows.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val wantDropped = rows.map(_._1).filter(i =>
      rows.map(_._1).exists(j => j < i && cos(vecs(j), vecs(i)) >= 0.9)).toSet
    assert(kept == rows.map(_._1).toSet -- wantDropped,
      s"kept=$kept wantDropped=$wantDropped")
  }

  test("semDedupTrained with k=1 equals brute force; drops are sound") {
    // k=1 makes one trained cell = the whole corpus, so the cluster-bounded
    // join must equal brute force exactly; with k=4 every drop must still
    // have a lower-id SAME-cluster witness at >= the threshold (soundness)
    val rows = (0L until 60L).map { i =>
      val v = Array.tabulate(8)(j =>
        (math.sin(i * 31 + j * 7) * 10).toFloat)
      (i, v)
    }
    val df = rows.toDF("id", "vec")
    val vecs = rows.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val keptK1 = Dedup.semDedupTrained(df, "id", "vec",
        minCosine = 0.9, k = 1, iters = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val wantDropped = rows.map(_._1).filter(i =>
      rows.map(_._1).exists(j => j < i && cos(vecs(j), vecs(i)) >= 0.9)).toSet
    assert(keptK1 == rows.map(_._1).toSet -- wantDropped,
      s"keptK1=$keptK1 wantDropped=$wantDropped")
    val keptK4 = Dedup.semDedupTrained(df, "id", "vec",
        minCosine = 0.9, k = 4, iters = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val droppedK4 = rows.map(_._1).toSet -- keptK4
    assert(droppedK4.subsetOf(wantDropped),
      s"unsound drops: ${droppedK4 -- wantDropped}")
  }
}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(-1f, 0f, 0f, 0f)),
    (4L, Array(0.95f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding")

  test("recallAtK: per-query hit fraction; a fully-missed query reports 0") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "neighbor_id")
    // q1 finds 2 of 3; q2 finds none of its exact set (only a stray id);
    // the stray approx hit must not inflate anything
    val approx = Seq((1L, 10L), (1L, 12L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(approx, exact)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(1L -> ((2L, 2d / 3d)), 2L -> ((0L, 0d))), got.toString)
  }

  test("bruteForceTopK: exact ranks, deterministic tie-break, k respected") {
    val out = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
      "vec_id", "embedding", 2)
      .orderBy(desc("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 2)
    assert(out.map(_._2).toSeq == Seq(4L, 1L)) // 0.95-vec closer than 0.9-vec
    assert(out.forall(_._1 == 0L))
    assert(out.head._3 > out(1)._3)
  }

  test("bruteForceTopK matches a window-based reference on random data") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = data.where(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: full scored set + window
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = data.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosine(col("qv"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(desc("cos"), col("vec_id"))
    val want = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("ivfTopK: probes prune to cluster candidates; full-probe equals brute force") {
    val rnd = new scala.util.Random(31)
    val data = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = data.where(col("vec_id") < 4)
    // nprobe == nlist degenerates to exact search: must equal brute force
    val full = Similarity.ivfTopK(data, queries, "vec_id", "embedding",
      k = 3, nlist = 6, nprobe = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute)
    // pruned probing returns ≤ k unique neighbors per query, none the query
    val pruned = Similarity.ivfTopK(data, queries, "vec_id", "embedding",
      k = 3, nlist = 6, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pruned.groupBy(_._1).values.forall(g =>
      g.length <= 3 && g.distinct.length == g.length))
    assert(pruned.forall { case (q, n) => q != n })
  }

  test("SRP-LSH pairs: identical vectors always collide; verified by cosine") {
    val out = Similarity.lshNeighborPairs(vecs, "vec_id", "embedding",
      bits = 8, minCosine = 0.9, numTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = out.map(p => (p._1, p._2)).toSet
    assert(ids.contains(0L -> 4L))          // near-identical direction
    assert(out.forall(_._3 >= 0.9))
    assert(!ids.exists { case (a, b) => a == 3L || b == 3L }) // opposite vec
  }

  test("mmrTopK: redundant near-copy of the top hit is demoted") {
    // query (0.8, 0.6): rel = {1: .861, 4: .830, 0: .8, 2: .6, 3: -.8} ->
    // plain top-3 is {1, 4, 0}, three copies of the x-direction. After
    // picking 1, the orthogonal 2 scores .5*.6 - .5*.110 = .245 while the
    // redundant 4 scores .5*.830 - .5*.998 = -.084 -> MMR picks 1, 2, 4.
    val out = Similarity.mmrTopK(vecs, "vec_id", "embedding",
        Seq(0.8f, 0.6f, 0f, 0f), k = 3, lambda = 0.5, overfetch = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.map(_._2).toSeq == Seq(1L, 2L, 4L), out.mkString(","))
  }

  test("mmrTopK: lambda = 1 reduces to plain relevance order") {
    val out = Similarity.mmrTopK(vecs, "vec_id", "embedding",
        Seq(0.8f, 0.6f, 0f, 0f), k = 3, lambda = 1.0, overfetch = 5)
      .collect().map(_.getLong(1)).toSeq
    assert(out == Seq(1L, 4L, 0L), out.toString)
  }

  test("mmrTopK: first pick scores raw relevance; ranks are 1..k") {
    val out = Similarity.mmrTopK(vecs, "vec_id", "embedding",
        Seq(0.8f, 0.6f, 0f, 0f), k = 4, lambda = 0.5, overfetch = 5)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.head.getDouble(2) == out.head.getDouble(3)) // rel == mmr at 1
  }
}

class RpBucketsSpec extends SparkSuite {
  import spark.implicits._

  test("native RpBucketsExpr matches the higher-order-fold reference exactly") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map(i =>
      (i, Array.fill(1 + rnd.nextInt(96))(rnd.nextFloat() * 4 - 2)))
    val df = rows.toDF("id", "vec")
    val both = df.select(
      col("id"),
      VectorOps.rpBuckets(col("vec"), 12, 4).as("native"),
      VectorOps.rpBucketsHof(col("vec"), 12, 0 until 4).as("ref"))
    assert(both.where(col("native") =!= col("ref")).count() == 0)
  }

  test("native poly-hash expressions match the higher-order-fold references") {
    val rnd = new scala.util.Random(19)
    val words = Seq("alpha", "Beta7", "", "日本語テキスト", "héllo wörld", "a",
      "mixed日本ascii", "é́combining") ++
      (0 until 50).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString)
    val df = words.map(w => (w, w.split(" ").toSeq)).toDF("s", "toks")
    val pinned = df.select(
      TextOps.polyHash(col("s")).as("n1"),
      TextOps.polyHashHof(col("s")).as("r1"),
      TextOps.tokenHashesWide(col("toks")).as("n2"),
      TextOps.tokenHashesWideHof(col("toks")).as("r2"))
    assert(pinned.where(col("n1") =!= col("r1") || col("n2") =!= col("r2"))
      .count() == 0)
  }

  test("native MinHashExpr matches the column-expression reference exactly") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 300L).map { i =>
      (i, Array.fill(rnd.nextInt(40))(rnd.nextLong().abs % TextOps.HashMod))
    }
    val df = rows.toDF("id", "shingles")
    val both = df.select(
      TextOps.minHashSignature(col("shingles")).as("native"),
      TextOps.minHashSignatureHof(col("shingles")).as("ref"))
    assert(both.where(not(col("native") <=> col("ref"))).count() == 0)
    // empty shingle set → array of null minima in both (NOT a null array)
    val empty = Seq(Tuple1(Array.empty[Long])).toDF("shingles")
      .select(
        TextOps.minHashSignature(col("shingles")).as("n"),
        TextOps.minHashSignatureHof(col("shingles")).as("r"))
      .collect().head
    assert(!empty.isNullAt(0) && !empty.isNullAt(1))
    assert(empty.getSeq[Any](0) == Seq.fill(TextOps.NumHashes)(null))
    assert(empty.getSeq[Any](0) == empty.getSeq[Any](1))
  }

  test("native ShingleHashesExpr matches the lambda reference exactly") {
    val rnd = new scala.util.Random(29)
    val rows = (0L until 300L).map { i =>
      // arrays of 0..12 token hashes with occasional null elements
      (i, Seq.fill(rnd.nextInt(13))(
        if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong().abs % TextOps.TokenMod)))
    }
    val df = rows.toDF("id", "thash")
    for (k <- Seq(1, 2, 3, 7, 20)) { // incl. wide windows (repeated-ngram use)
      val both = df.select(
        TextOps.shingleHashes(col("thash"), k).as("native"),
        TextOps.shingleHashesHof(col("thash"), k).as("ref"))
      assert(both.where(not(col("native") <=> col("ref"))).count() == 0, s"k=$k")
    }
    // null array → EMPTY array in both (the when-guard's null-condition edge)
    val edge = Seq((1L, null: Seq[java.lang.Long]), (2L, Seq.empty[java.lang.Long]))
      .toDF("id", "thash")
      .select(
        TextOps.shingleHashes(col("thash")).as("n"),
        TextOps.shingleHashesHof(col("thash")).as("r"))
      .collect()
    assert(edge.forall(r => !r.isNullAt(0) && r.getSeq[Any](0).isEmpty))
    assert(edge.forall(r => !r.isNullAt(1) && r.getSeq[Any](1).isEmpty))
    // end-to-end over the real pipeline shape (nested tokenize+hash child)
    val docs = Seq("alpha beta gamma delta", "a b", "", "one two three four five")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val pipe = docs.select(
      TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col("text")))).as("n"),
      TextOps.shingleHashesHof(TextOps.tokenHashes(TextOps.tokens(col("text")))).as("r"))
    assert(pipe.where(not(col("n") <=> col("r"))).count() == 0)
  }

  test("native WinnowExpr matches the lambda reference exactly") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 300L).map { i =>
      // shingle streams of 0..40 hashes; occasional nulls exercise the
      // never-wins rule AND the all-null-window (-1, MaxValue) seed edge
      (i, Seq.fill(rnd.nextInt(41))(
        if (rnd.nextInt(8) == 0) null
        else java.lang.Long.valueOf(rnd.nextLong().abs % 1000)))
    }
    val df = rows.toDF("id", "sh")
    for (w <- Seq(1, 2, 4, 9)) {
      val both = df.select(
        TextOps.winnow(col("sh"), w).as("native"),
        TextOps.winnowHof(col("sh"), w).as("ref"))
      assert(both.where(not(col("native") <=> col("ref"))).count() == 0,
        s"w=$w")
    }
    // a LONG all-null run: non-adjacent repeats of the (-1, MaxValue)
    // seed must dedupe globally, as array_distinct does
    val nullRun = Seq((1L, Seq[java.lang.Long](5L, null, null, null, null,
        null, null, 3L, null, null, null, null, null, 4L))).toDF("id", "sh")
      .select(TextOps.winnow(col("sh"), 4).as("n"),
        TextOps.winnowHof(col("sh"), 4).as("r"))
    assert(nullRun.where(not(col("n") <=> col("r"))).count() == 0)
    // null / short arrays → empty in both
    val edge = Seq((1L, null: Seq[java.lang.Long]),
      (2L, Seq[java.lang.Long](7L, 8L))).toDF("id", "sh")
      .select(TextOps.winnow(col("sh"), 4).as("n"),
        TextOps.winnowHof(col("sh"), 4).as("r"))
      .collect()
    assert(edge.forall(r => !r.isNullAt(0) && r.getSeq[Any](0).isEmpty))
    assert(edge.forall(r => !r.isNullAt(1) && r.getSeq[Any](1).isEmpty))
    // end-to-end over the real pipeline shape
    val docs = Seq("alpha beta gamma delta epsilon zeta eta theta",
      "a b c", "", "one two three four five six seven")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    def sh = TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col("text"))))
    val pipe = docs.select(TextOps.winnow(sh, 4).as("n"),
      TextOps.winnowHof(sh, 4).as("r"))
    assert(pipe.where(not(col("n") <=> col("r"))).count() == 0)
  }

  test("native SimHashExpr matches the higher-order-fold reference exactly") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map { i =>
      (i, Array.fill(rnd.nextInt(60))(math.abs(rnd.nextLong()) % 4611686014132420609L))
    }
    val df = rows.toDF("id", "thash")
    val both = df.select(
      TextOps.simHash(col("thash")).as("native"),
      TextOps.simHashHof(col("thash")).as("ref"))
    assert(both.where(col("native") =!= col("ref")).count() == 0)
    // empty array → 0 in both
    val empty = Seq(Tuple1(Array.empty[Long])).toDF("thash")
      .select(TextOps.simHash(col("thash")), TextOps.simHashHof(col("thash")))
      .collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L)
  }

  test("native CosineExpr matches the higher-order-fold reference exactly") {
    val rnd = new scala.util.Random(13)
    val rows = (0L until 300L).map { i =>
      val dim = 1 + rnd.nextInt(64)
      (i, Array.fill(dim)(rnd.nextFloat() * 4 - 2),
        Array.fill(dim)(rnd.nextFloat() * 4 - 2))
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      VectorOps.cosine(col("a"), col("b")).as("native"),
      VectorOps.cosineHof(col("a"), col("b")).as("ref"))
    // bit-for-bit: compare raw doubles, no tolerance
    assert(both.where(col("native") =!= col("ref")).count() == 0)
    // zero vectors → 0.0; self-cosine of a zero-free vector is 1-ish
    val z = Seq((Array(0f, 0f), Array(0f, 0f))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b"))).collect().head.getDouble(0)
    assert(z == 0.0)
  }

  test("native SortedIntersectCountExpr matches size(array_intersect) exactly") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 300L).map { i =>
      def arr = Array.fill(1 + rnd.nextInt(40))(rnd.nextInt(30).toLong)
        .sorted // duplicates INCLUDED: equal runs must count once
      (i, arr, arr)
    }
    val df = rows.toDF("id", "a", "b")
    val both = df.select(
      TextOps.sortedIntersectCount(col("a"), col("b")).as("native"),
      TextOps.sortedIntersectCountRef(col("a"), col("b")).as("ref"))
    assert(both.where(col("native") =!= col("ref")).count() == 0)
    // edges: empty vs non-empty, both empty, disjoint
    val edge = Seq((Array(1L, 2L, 2L, 3L), Array.empty[Long], Array(9L, 10L)))
      .toDF("a", "empty", "disj")
      .select(
        TextOps.sortedIntersectCount(col("a"), col("a")).as("self"),
        TextOps.sortedIntersectCount(col("a"), col("empty")).as("vsEmpty"),
        TextOps.sortedIntersectCount(col("empty"), col("empty")).as("empties"),
        TextOps.sortedIntersectCount(col("a"), col("disj")).as("disjoint"))
      .collect().head
    assert(edge.getLong(0) == 3L) // 1,2,3 — the duplicate 2 counts once
    assert(edge.getLong(1) == 0L && edge.getLong(2) == 0L && edge.getLong(3) == 0L)
  }

  test("native SqDistExpr matches the higher-order-fold reference exactly") {
    val rnd = new scala.util.Random(17)
    val rows = (0L until 300L).map { i =>
      val dim = 1 + rnd.nextInt(64)
      (i, Array.fill(dim)(rnd.nextFloat() * 4 - 2),
        Array.fill(dim)(rnd.nextFloat() * 4 - 2))
    }
    val df = rows.toDF("id", "a", "b")
    // float vs float, and float vs a double literal (the centroid shape)
    val both = df.select(
      VectorOps.sqDist(col("a"), col("b")).as("native"),
      VectorOps.sqDistHof(col("a"), col("b")).as("ref"),
      VectorOps.sqDist(col("a"),
        typedLit(Seq.fill(65)(0.25d))).as("native_mixed"),
      VectorOps.sqDistHof(col("a"),
        typedLit(Seq.fill(65)(0.25d))).as("ref_mixed"))
    // bit-for-bit: compare raw doubles, no tolerance
    assert(both.where(col("native") =!= col("ref")).count() == 0)
    assert(both.where(col("native_mixed") <=> col("ref_mixed")).count() == 300)
    // self-distance 0; empty arrays → the 0.0 fold seed; length mismatch
    // and null element → null, matching zip_with padding semantics
    val edge = Seq((Array(1f, 2f), Array.empty[Float]))
      .toDF("a", "empty")
      .select(
        VectorOps.sqDist(col("a"), col("a")).as("self"),
        VectorOps.sqDist(col("empty"), col("empty")).as("empties"),
        VectorOps.sqDist(col("a"), col("empty")).as("mismatch"),
        VectorOps.sqDist(col("a"),
          array(lit(1f), lit(null).cast("float"))).as("nullel"))
      .collect().head
    assert(edge.getDouble(0) == 0.0 && edge.getDouble(1) == 0.0)
    assert(edge.isNullAt(2) && edge.isNullAt(3))
  }

  test("native VecSubExpr matches the zip_with reference exactly") {
    val rnd = new scala.util.Random(23)
    val rows = (0L until 200L).map { i =>
      (i, Array.fill(32)(rnd.nextFloat() * 4 - 2))
    }
    val df = rows.toDF("id", "a")
    val cLit = typedLit(Seq.fill(32)(0.125d))
    val both = df.select(
      VectorOps.vecSub(col("a"), cLit).as("native"),
      VectorOps.vecSubHof(col("a"), cLit).as("ref"))
    assert(both.where(!(col("native") <=> col("ref"))).count() == 0)
    // length mismatch and null element → null, matching zip_with padding
    val edge = Seq((Array(1f, 2f), Array(3f)))
      .toDF("a", "short")
      .select(
        VectorOps.vecSub(col("a"), col("short")).as("mismatch"),
        VectorOps.vecSub(col("a"),
          array(lit(1f), lit(null).cast("float"))).as("nullel"),
        VectorOps.vecSub(col("a"), col("a")).as("self"))
      .collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    assert(edge.getSeq[Double](2) == Seq(0.0, 0.0))
  }

  test("native RpBucketsExpr edge cases: empty vec, null element, null vec") {
    val df = Seq(
      (1L, Some(Array[Float]())),
      (2L, Some(Array(1f, Float.NaN, -1f))),
      (3L, None),
      (4L, Some(Array(0.5f, -0.25f)))).toDF("id", "vec")
    // null ELEMENT case needs explicit construction: replace index 1 with null
    val withNullElem = df.withColumn("vec2",
      when(col("id") === 2L,
        array(lit(1f), lit(null).cast("float"), lit(-1f)))
        .otherwise(col("vec")))
    val out = withNullElem.select(
      col("id"),
      VectorOps.rpBuckets(col("vec2"), 8, 2).as("native"),
      VectorOps.rpBucketsHof(col("vec2"), 8, 0 until 2).as("ref"))
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getSeq[Long](2)))
      .toMap
    assert(out(1L)._1 == Seq(255L, 255L))      // empty → all bits set
    assert(out(1L)._1 == out(1L)._2)
    assert(out(2L)._1 == Seq(0L, 0L))          // null element poisons all planes
    assert(out(2L)._1 == out(2L)._2)
    assert(out(4L)._1 == out(4L)._2)
    val nulls = withNullElem.where(col("id") === 3L)
      .select(VectorOps.rpBuckets(col("vec2"), 8, 2)).collect()
    assert(nulls.head.isNullAt(0))             // null vector → null
  }
}

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("polyHash is deterministic and bounded; empty string hashes to 0") {
    val out = Seq("", "abc", "abc", "abd").toDF("s")
      .select(TextOps.polyHash(col("s")).as("h")).collect().map(_.getLong(0))
    assert(out(0) == 0L)
    assert(out(1) == out(2))
    assert(out(1) != out(3))
    assert(out.forall(h => h >= 0 && h < TextOps.TokenMod))
  }

  test("simhash: identical token sets identical prints; prints non-negative") {
    val df = Seq("a b c d e f", "a b c d e f", "q r s t u v").toDF("s")
      .select(TextOps.simHash(
        TextOps.tokenHashesWide(TextOps.tokens(col("s")))).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
    // 63-bit prints use the full positive int64 range (bit 63 never set)
    assert(TextOps.SimHashBits <= 63)
    assert(hs.forall(_ >= 0))
  }

  test("shingles: short docs yield empty arrays; jaccard of disjoint sets is 0") {
    val df = Seq("one two", "one two three four").toDF("s")
      .select(size(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens(col("s"))))).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 2))
  }

  test("paragraphDedup keeps first (doc,pos) occurrence, reassembles order") {
    val df = Seq(
      (1L, "header\nalpha\nbeta"),
      (2L, "header\ngamma\nalpha"),   // header+alpha dup -> keeps gamma only
      (3L, "header\nalpha"),          // everything dup -> doc drops
      (4L, "delta\ndelta\nepsilon")   // within-doc dup: first delta survives
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "header\nalpha\nbeta",
      2L -> "gamma",
      4L -> "delta\nepsilon"), out.toString)
  }

  test("paragraphDedup first-occurrence is by (doc, pos), not arrival order") {
    // 'x' occurs at (2,0) and (1,1): the (1,1) occurrence wins — doc order
    // dominates position
    val df = Seq((2L, "x\ny"), (1L, "a\nx")).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a\nx", 2L -> "y"), out.toString)
  }

  test("boilerplateStrip removes every copy of hot paragraphs, keeps rest") {
    val df = Seq(
      (1L, "nav\nalpha"),
      (2L, "nav\nbeta\nbeta"),  // within-doc repeat counts ONE distinct doc
      (3L, "nav\ngamma"),
      (4L, "beta\ndelta")       // beta in 2 distinct docs only -> kept
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateStrip(df, "doc_id", "text", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha",
      2L -> "beta\nbeta",
      3L -> "gamma",
      4L -> "beta\ndelta"), out.toString)
  }
}
