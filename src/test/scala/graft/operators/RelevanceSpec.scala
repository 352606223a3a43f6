package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.QualityOps

/** Round-9 operators: BM25 relevance, the hashed linear classifier, and the
  * hot-bucket skew guard on MinHash-LSH. */
class RelevanceSpec extends SparkSuite {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat sat on the mat"),
    (2L, "dog and cat and dog play"),
    (3L, "fish swim in deep water"),
    (4L, "dog dog dog dog dog dog dog dog"))

  test("bm25: matches the independent Python reference on the pinned corpus") {
    val out = Relevance.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id",
        "text", Seq("cat", "dog"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // tools/bm25_reference.py — doc 3 (no query terms) never scores
    assert(out.toSeq == Seq((2L, 1.646225), (4L, 1.284146), (1L, 0.743865)))
  }

  test("bm25: rarer terms weigh more; tf saturates under k1") {
    // 'rare' in 1 of 20 docs, 'common' in all 20: one 'rare' hit must
    // outscore one 'common' hit; 8 repeats of a term score less than 8x one
    val docs = (1L to 18L).map(i => (i, s"common filler$i")) ++
      Seq((19L, "common rare"), (20L, "common"))
    val scores = Relevance.bm25TopK(docs.toDF("id", "text"), "id", "text",
        Seq("rare", "common"), topK = 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(19L) > scores(20L) * 2,
      s"idf must dominate: ${scores(19L)} vs ${scores(20L)}")
    val rep = Relevance.bm25TopK(
      Seq((1L, Seq.fill(8)("t").mkString(" ")), (2L, "t x x x x x x x"))
        .toDF("id", "text"), "id", "text", Seq("t"), topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rep(1L) < rep(2L) * 8, "tf term must saturate, not scale linearly")
  }

  test("proximity: slop-k pair counts, boundary-inclusive, self-pair doubles") {
    val wh = java.nio.file.Files.createTempDirectory("prox_spec").toString
    Bucketing.scratchDb(spark, "prox_spec", wh)
    val docs = Seq(
      (1L, "a x x b"),   // a@0, b@3: distance exactly 3
      (2L, "a b a"),     // a@{0,2}, b@1: two (a,b) pairs at distance 1
      (3L, "b y y y a")) // b@0, a@4: distance 4
      .toDF("doc_id", "text")
    Relevance.writePostingsIndex(docs, "doc_id", "text",
      "prox_spec.pr", buckets = 2)
    def got(a: String, b: String, k: Int): Seq[(Long, Int)] =
      Relevance.proximitySearch(spark, "prox_spec.pr", a, b, k)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(got("a", "b", 2) == Seq((2L, 2)))            // doc1/doc3 too far
    assert(got("a", "b", 3) == Seq((1L, 1), (2L, 2)))   // slop INCLUSIVE
    assert(got("a", "b", 4) == Seq((1L, 1), (2L, 2), (3L, 1)))
    // symmetric in the terms
    assert(got("b", "a", 3) == Seq((1L, 1), (2L, 2)))
    // self-pair: ordered pairs, each unordered pair counts twice
    assert(got("a", "a", 2) == Seq((2L, 2)))
    // a term absent from a doc kills it on the null list
    assert(got("a", "z", 10) == Seq())
  }

  test("rrf fusion: both-arm docs sum two reciprocal terms, single-arm one") {
    // text arm: docs 1,2,4 score (query 'cat dog'); dense arm: vectors
    // orthogonal except 2 and 3 near the query vector 0
    val docs = corpus.toDF("doc_id", "text")
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f)), // query
      (1L, Seq(0f, 1f, 0f)),
      (2L, Seq(1f, 0.1f, 0f)),
      (3L, Seq(0.9f, 0f, 0.1f)),
      (4L, Seq(0f, 0f, 1f))).toDF("vec_id", "embedding")
    val out = Relevance.rrfHybrid(docs, emb, "doc_id", "text",
      "vec_id", "embedding", Seq("cat", "dog"), queryVecId = 0L,
      armK = 3, rrfK = 60, topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    // doc 2: rank 1 in BOTH arms -> 2/61; doc 3: dense-only rank 2 -> 1/62
    assert(math.abs(out(2L) - 2.0 / 61) < 1e-9)
    assert(math.abs(out(3L) - 1.0 / 62) < 1e-9)
    // a both-arm doc outranks every single-arm doc here
    assert(out(2L) > out.filterNot(_._1 == 2L).values.max)
  }

  test("classifier: native cell sum matches the higher-order reference") {
    val df = Seq(
      (1L, "cat sat on the mat"),
      (2L, "dog and cat and dog play"),
      (3L, ""),
      (4L, "a"),
      (5L, (1 to 500).map(i => s"tok$i").mkString(" "))).toDF("id", "text")
    val toks = graft.functions.TextOps.tokens(col("text"))
    val th = graft.functions.TextOps.tokenHashes(toks)
    val native = QualityOps.classifierScore(th)
    val rows = df.select(col("id"), native.as("n"),
        when(size(th) === 0, lit(0.0)).otherwise(
          QualityOps.weightCellSumHof(th).cast("double") /
            lit(QualityOps.ClassifierBuckets.toDouble) /
            size(th).cast("double") - lit(0.5)).as("h"))
      .collect()
    rows.foreach(r => assert(r.getDouble(1) == r.getDouble(2),
      s"id=${r.getLong(0)}: native ${r.getDouble(1)} != hof ${r.getDouble(2)}"))
    val byId = rows.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // tools/classifier_reference.py values; score bounded in [-0.5, 0.5)
    assert(math.abs(byId(1L) - 0.066683) < 1e-6)
    assert(byId(3L) == 0.0)
    rows.foreach(r => assert(r.getDouble(1) >= -0.5 && r.getDouble(1) < 0.5))
  }

  test("bigram LM: hand-checked probabilities; pruning routes through backoff") {
    // corpus: "a b" x3 + "a c" + "z" -> bigrams ab:3, ac:1; unigrams a:4
    // b:3 c:1 z:1, T=9 (bigram-less docs still count toward the unigram
    // model). Unpruned: lp(ab)=ln(3/4), lp(ac)=ln(1/4).
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"),
      (5L, "z")).toDF("id", "text")
    val open = LanguageModel.bigramLogProb(df, "id", "text", topK = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(open.size == 4, "single-token docs have no bigrams, no row")
    assert(math.abs(open(1L) - math.log(3.0 / 4.0)) < 1e-6)
    assert(math.abs(open(4L) - math.log(1.0 / 4.0)) < 1e-6)
    // topK=1 keeps only ab; ac backs off to alpha*c(c)/T = 0.4*1/9
    val pruned = LanguageModel.bigramLogProb(df, "id", "text", topK = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pruned(1L) - math.log(3.0 / 4.0)) < 1e-6)
    assert(math.abs(pruned(4L) - math.log(0.4 * 1.0 / 9.0)) < 1e-6)
  }

  test("quantiles: approx_percentile (the 100 TB path) tracks exact percentile") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val rows = docs.groupBy(col("lang")).agg(
        expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.95D))").as("ex"),
        expr("approx_percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)")
          .as("ap"),
        (max(col("n_chars")) - min(col("n_chars"))).cast("double").as("range"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ex = r.getSeq[Double](1)
      val ap = r.getSeq[Any](2).map(_.toString.toDouble)
      val range = r.getDouble(3)
      ex.zip(ap).foreach { case (e, a) =>
        assert(math.abs(e - a) <= math.max(range * 0.05, 1.0),
          s"lang=${r.getString(0)}: approx $a drifted from exact $e")
      }
    }
  }

  test("asof join: latest at-or-before value, inclusive ties, keys isolated") {
    val right = Seq((1L, 10L, "v1"), (1L, 20L, "v2"), (2L, 5L, "w1"))
      .toDF("k", "ts", "v")
    val left = Seq((101L, 1L, 5L), (102L, 1L, 10L), (103L, 1L, 15L),
      (104L, 1L, 25L), (105L, 2L, 4L), (106L, 3L, 99L))
      .toDF("id", "k", "ts")
    val out = AsOf.asofJoin(left, right, "k", "ts", "ts", "v")
      .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
    assert(out == Map(
      101L -> None,        // before any build row
      102L -> Some("v1"),  // same-timestamp build row matches (inclusive)
      103L -> Some("v1"),
      104L -> Some("v2"),
      105L -> None,        // key 2's build row is later
      106L -> None))       // key with no build rows at all
  }

  test("capped LSH: hot buckets drop cross pairs, identical copies still pair") {
    // v1a/v1b byte-identical; v2/v3 same TOKEN stream via extra separators
    // (distinct bytes, identical shingle sets) — all four land in the same
    // buckets, so each bucket holds 3 distinct texts
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, base),
      (2L, base),
      (3L, base.replace("w5 w6", "w5  w6")),
      (4L, base.replace("w9 w10", "w9  w10")),
      (5L, (1 to 30).map(i => s"z$i").mkString(" "))).toDF("id", "text")
    val open = Dedup.minHashLshPairs(df, "id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(open.length == 6, s"uncapped: all 4 variants pair: ${open.toSeq}")
    val capped = Dedup.minHashLshPairs(df, "id", "text", maxBucket = Some(2))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1L, 2L)),
      s"cap=2 with 3 distinct texts per bucket keeps only the identical pair: ${capped.toSeq}")
    val cap3 = Dedup.minHashLshPairs(df, "id", "text", maxBucket = Some(3))
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cap3.length == 6, "cap above the bucket size changes nothing")
  }

  test("dsirScores: target-like docs score above raw-like docs") {
    import org.apache.spark.sql.functions.col
    val target = (1L to 20L).map(i => (i, "quality prose tokens here"))
      .toDF("doc_id", "text")
    // raw pool: doc 100 repeats the target phrasing, docs 101.. use
    // disjoint junk vocabulary that dominates the raw model
    val raw = Seq((100L, "quality prose tokens here")) ++
      (101L to 120L).map(i => (i, s"junk spam filler noise$i"))
    val scored = Relevance.dsirScores(raw.toDF("doc_id", "text"), target,
        "doc_id", "text", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.size == 21)
    val junkMax = scored.filterKeys(_ > 100L).values.max
    assert(scored(100L) > 0, scored.toString)
    assert(scored(100L) > junkMax, scored.toString)
    // every token of doc 100 is in-target; n_toks rides along
    val n = Relevance.dsirScores(raw.toDF("doc_id", "text"), target,
        "doc_id", "text", buckets = 64)
      .where(col("doc_id") === 100L).collect().head.getLong(1)
    assert(n == 4L)
  }
}
