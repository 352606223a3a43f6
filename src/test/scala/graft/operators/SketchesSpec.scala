package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SketchesSpec extends SparkSuite {

  import spark.implicits._

  private lazy val docs = (0L until 200L)
    .map(i => (i, s"tok${i % 7} tok${i % 7} common filler$i"))
    .toDF("id", "text")

  test("cms gauge: exact counts surface, flags hold, absent probes count 0") {
    val out = Sketches.cmsTokenGauge(docs, "text",
        Seq("common", "tok0", "absent"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSeq == Seq("absent", "common", "tok0"))
    val byTok = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byTok("common") == ((200L, true)))
    // 200 ids, i%7==0 for 29 ids, twice per doc
    assert(byTok("tok0") == ((58L, true)))
    assert(byTok("absent") == ((0L, true)))
  }

  test("per-group quantile: each row competes only within its own group") {
    // group a scores 1..10 (0.5-cut 5.5), group b scores 101..110 (105.5):
    // a's 6..10 survive even though EVERY a-score is below b's cut
    val df = ((1 to 10).map(i => ("a", i.toLong)) ++
      (101 to 110).map(i => ("b", i.toLong))).toDF("g", "score")
    val kept = PerGroupQuantile.filter(df, "g", "score", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept == ((6 to 10).map(("a", _: Int)).map(t => (t._1, t._2.toLong))
      ++ (106 to 110).map(i => ("b", i.toLong))).toSet, kept.toString)
  }

  test("vocab coverage: hand-counted OOV rate, count-then-token tie-break") {
    val df = Seq((1L, "a a a b c")).toDF("id", "text")
    val out = VocabCoverage.vocabCoverage(df, "text", vocabSize = 1)
      .collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getDouble(2)) ==
      ((5L, 3L, 0.4)))
    // ties: b and c both count 1; vocabSize=2 must pick 'b' (token order)
    val out2 = VocabCoverage.vocabCoverage(df, "text", vocabSize = 2)
      .collect()(0)
    assert((out2.getLong(1), out2.getDouble(2)) == ((4L, 0.2)))
  }

  test("rank normalize: strictly-below fraction, ties share a rank") {
    val df = Seq(
      (1L, "a", 0.1), (2L, "a", 0.2), (3L, "a", 0.2), (4L, "a", 0.3),
      (5L, "b", 0.9)).toDF("id", "g", "s")
    val got = RankNormalize.percentileRank(df, "g", col("s"))
      .select("id", "rank_pct")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.25, 3L -> 0.25, 4L -> 0.75,
      5L -> 0.0), got.toString)
    // the corpus-side join must be a broadcast of the bounded lookup
    val p = RankNormalize.percentileRank(df, "g", col("s"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("expectations audit: nulls violate, counts are exact, one row each") {
    val df = Seq(
      (Some(1L), "ok"), (Some(2L), ""), (None, "x"), (Some(4L), null))
      .toDF("id", "s")
    val got = Expectations.audit(df, Seq(
        "id_not_null" -> col("id").isNotNull,
        "s_nonempty" -> (length(col("s")) > 0)))
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // row 3: null id violates; rows 2 (empty) and 4 (null -> violation)
    assert(got.toSeq == Seq(
      ("id_not_null", 4L, 1L, false),
      ("s_nonempty", 4L, 2L, false)))
    val clean = Expectations.audit(df.where(col("id") === 1L), Seq(
        "id_not_null" -> col("id").isNotNull))
      .collect()(0)
    assert(clean.getBoolean(3))
  }

  test("kmv: below k the sketch IS the exact distinct count") {
    val df = Seq("a", "b", "c", "a", "b").toDF("v")
    val est = Sketches.kmvEstimate(
      Sketches.kmvSketch(df, col("v"), 64), 64).collect().head
    assert(est.getLong(0) == 3L)          // n_sketch = 3 distinct
    assert(est.getDouble(2) == 3.0)       // exact mode
  }

  test("kmv: duplicates collapse — sketch has k DISTINCT hashes") {
    val df = (0 until 500).map(i => s"t${i % 100}").toDF("v")
    val sk = Sketches.kmvSketch(df, col("v"), 64).collect().map(_.getLong(0))
    assert(sk.length == 64 && sk.distinct.length == 64)
    assert(sk.sorted.toSeq == sk.toSeq, "sketch must be the SMALLEST k")
  }

  test("kmv estimate lands within 3 sigma on a 2000-distinct stream") {
    val df = (0 until 2000).map(i => s"item-$i-payload").toDF("v")
    val k = 64
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(df, col("v"), k), k)
      .collect().head.getDouble(2)
    val sigma = 2000.0 / math.sqrt(k - 2)
    assert(math.abs(est - 2000.0) <= 3 * sigma, s"est=$est")
  }

  test("kmv merge equals pooled under full and partial overlap") {
    val a = (0 until 300).map(i => s"x$i").toDF("v")
    val b = (150 until 450).map(i => s"x$i").toDF("v")   // half overlap
    val k = 32
    val merged = Sketches.kmvSketch(a, col("v"), k)
      .unionByName(Sketches.kmvSketch(b, col("v"), k))
      .distinct().orderBy(col("fp")).limit(k)
      .collect().map(_.getLong(0)).toSeq
    val pooled = Sketches.kmvSketch(a.unionByName(b), col("v"), k)
      .collect().map(_.getLong(0)).toSeq
    assert(merged == pooled, "bottom-k of union must be exact from parts")
  }

  test("kmv at-rest ledger: write two releases, merged estimate = pooled") {
    val dir = java.nio.file.Files.createTempDirectory("kmv_test").toString
    val a = (0 until 200).map(i => s"r0-$i").toDF("v")
    val b = (0 until 200).map(i => if (i % 2 == 0) s"r0-$i" else s"r1-$i")
      .toDF("v")
    Sketches.writeKmv(a, col("v"), 32, dir, 0)
    Sketches.writeKmv(b, col("v"), 32, dir, 1)
    val merged = Sketches.kmvIndexedEstimate(spark, dir, 32).collect().head
    val pooled = Sketches.kmvEstimate(
      Sketches.kmvSketch(a.unionByName(b), col("v"), 32), 32)
      .collect().head
    assert(merged.getLong(0) == pooled.getLong(0))
    assert(merged.getLong(1) == pooled.getLong(1))
    assert(merged.getDouble(2) == pooled.getDouble(2))
  }

  test("cms gauge: a deliberately tiny sketch still never underestimates") {
    // eps = 0.9 -> width 3: with ~200 distinct filler tokens every cell
    // collides, so estimates overshoot — the one-sided contract (est >=
    // exact) and the slack*eps*N ceiling must BOTH still hold, which is
    // exactly what the flag asserts
    val out = Sketches.cmsTokenGauge(docs, "text",
        Seq("common", "tok1", "absent"), eps = 0.9, slack = 1.0)
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toMap
    assert(out.values.forall(identity),
      "collision-heavy sketch must stay within the eps*N guarantee")
  }
}
