package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{QualityOps, VectorOps}
import graft.streaming.Streams

/** Round-7 training-data pipeline operators: repetition/PII quality gates,
  * contamination, packing/shuffle, int8 quantization, stream-stream join. */
class PipelineOpsSpec extends SparkSuite {

  import spark.implicits._

  test("dupTokenFrac: 0 for all-unique and empty docs, (n-u)/n otherwise") {
    val df = Seq(
      (1, "a b c d"),        // unique -> 0.0
      (2, "a a a a"),        // 3/4 repeated
      (3, "x y x y x y"),    // 4/6
      (4, "")                // empty -> 0.0
    ).toDF("id", "text")
    val got = df.select(col("id"),
      QualityOps.dupTokenFrac(graft.functions.TextOps.tokens(col("text")))
        .as("f"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(1) == 0.0)
    assert(math.abs(got(2) - 0.75) < 1e-12)
    assert(math.abs(got(3) - 4.0 / 6.0) < 1e-12)
    assert(got(4) == 0.0)
  }

  test("qualityScore: each gate subtracts its weight; floor at 0; keep rule") {
    import graft.functions.TextOps
    // 45 distinct tokens (no repeats), 5 stopwords, no punctuation
    val good = (1 to 40).map(i => s"word$i").mkString(" ") + " the of and is a"
    val short = "too short"
    val salad = (1 to 50).map(i => s"zz$i").mkString(" ") // no stopwords
    val repeats = ("the the the the " * 10).trim  // dup-token gate (stopwords fine)
    val df = Seq((1, good), (2, short), (3, salad), (4, repeats), (5, ""))
      .toDF("id", "text")
    val got = df.select(col("id"),
        QualityOps.qualityScore(col("text"), TextOps.tokens(col("text"))).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got(1) == 1.0, got.toString) // inside every window
    // "too short": 2 tokens (window), no stopwords → 1 - .35 - .15 = 0.5
    assert(math.abs(got(2) - 0.5) < 1e-9, got.toString)
    // salad: token count ok (50), mean len ok, no stopwords → 0.85
    assert(math.abs(got(3) - 0.85) < 1e-9, got.toString)
    // repeats: 40 tokens, all stopwords, dup frac 39/40 → 1 - .2 = 0.8
    assert(math.abs(got(4) - 0.8) < 1e-9, got.toString)
    // empty: token window + mean-len window + stopword gate → 0.35
    assert(math.abs(got(5) - 0.35) < 1e-9, got.toString)
  }

  test("topElemFrac matches the explode/groupBy reference; map-side plan") {
    val rnd = new scala.util.Random(31)
    val rows = (0L until 200L).map { i =>
      (i, Seq.fill(rnd.nextInt(20))(
        if (rnd.nextInt(12) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(6).toLong)))
    }
    val df = rows.toDF("id", "arr").where(size(col("arr")) > 0)
    val native = df.select(col("id"),
        QualityOps.topElemFrac(col("arr")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ref = df.select(col("id"), size(col("arr")).as("n"),
        explode(col("arr")).as("e"))
      .groupBy("id", "n", "e").count()
      .groupBy(col("id"), col("n")).agg(max(col("count")).as("top"))
      .select(col("id"),
        (col("top").cast("double") / col("n").cast("double")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(native == ref)
    // empty array → 0.0, and the gate stays a pure projection (no exchange)
    val empty = Seq((1L, Seq.empty[java.lang.Long])).toDF("id", "arr")
      .select(QualityOps.topElemFrac(col("arr"))).collect().head.getDouble(0)
    assert(empty == 0.0)
    val gate = df.select(QualityOps.topElemFrac(col("arr")))
    val exchanges = gate.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    assert(exchanges.isEmpty)
  }

  test("PII: counts and redaction, pinned order, no cross-manufacturing") {
    val df = Seq(
      (1, "mail a.b-c_d@ex.org now"),
      (2, "ip 10.0.0.1 and phone 555-123-4567"),
      (3, "+1 (555) 123-4567 calls 1.2.3.4"),
      (4, "nothing to see: 1234, a.b, x@y (no tld)"),
      (5, "two mails a@b.io c@d.co one ip 8.8.8.8")
    ).toDF("id", "text")
    val got = df.select(col("id"),
      QualityOps.emailCount(col("text")).as("e"),
      QualityOps.ipv4Count(col("text")).as("i"),
      QualityOps.phoneCount(col("text")).as("p"),
      QualityOps.redactPii(col("text")).as("r"))
      .collect().map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    assert(got(1) == ((1, 0, 0, "mail <EMAIL> now")))
    assert(got(2) == ((0, 1, 1, "ip <IP> and phone <PHONE>")))
    assert(got(3) == ((0, 1, 1, "<PHONE> calls <IP>")))
    assert(got(4)._1 == 0 && got(4)._2 == 0 && got(4)._3 == 0)
    assert(got(4)._4 == "nothing to see: 1234, a.b, x@y (no tld)")
    assert(got(5) == ((2, 1, 0, "two mails <EMAIL> <EMAIL> one ip <IP>")))
  }

  test("contamination: eval-overlapping 3-grams found; eval docs excluded") {
    // ids 0..199; eval = hash-selected ~10%. Give every doc the same unique
    // phrase plus an id-specific tail: every train doc shares exactly its
    // leading 3-grams with any eval doc.
    val docs = (0L until 200L)
      .map(i => (i, s"alpha beta gamma delta tail$i end$i"))
      .toDF("doc_id", "text")
    val out = Contamination.check(docs, "doc_id", "text",
      evalRate = 0.1, seed = 11, k = 3)
    val rows = out.collect()
    val evalIds = docs.where(
        Sampling.hash16(col("doc_id"), 11) < math.round(0.1 * Sampling.Buckets))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.nonEmpty, "need a non-empty eval split for the test")
    // no eval doc appears in the output
    assert(rows.forall(r => !evalIds.contains(r.getLong(0))))
    // every train doc has 6 tokens -> 4 shingles; the 2 leading shingles
    // (alpha beta gamma, beta gamma delta) occur in every doc, so every
    // train doc is contaminated at exactly 2/4
    assert(rows.length == 200 - evalIds.size)
    assert(rows.forall(_.getLong(2) == 2L), rows.take(3).mkString(";"))
    assert(rows.forall(r => math.abs(r.getDouble(3) - 0.5) < 1e-12))
  }

  test("contamination multi: hits attributed per eval set") {
    // two hash-carved eval sets; every doc shares its 2 leading 3-grams
    // with every other doc, so each train doc overlaps BOTH sets at 2/4
    val docs = (0L until 200L)
      .map(i => (i, s"alpha beta gamma delta tail$i end$i"))
      .toDF("doc_id", "text")
    val h = Sampling.hash16(col("doc_id"), 11)
    val r = math.round(0.1 * Sampling.Buckets)
    val sets = (0 until 2).map(i =>
      s"eval_$i" -> docs.where(h >= lit(i * r) && h < lit((i + 1) * r)))
    sets.foreach { case (n, s) =>
      assert(s.count() > 0, s"need a non-empty $n for the test") }
    val train = docs.where(h >= lit(2 * r))
    val trainIds = train.select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = Contamination.checkMulti(train, "doc_id", "text", sets)
      .collect()
    assert(rows.length == trainIds.size * 2, s"${rows.length}")
    assert(rows.forall(r => trainIds.contains(r.getLong(0))))
    assert(rows.map(_.getString(1)).toSet == Set("eval_0", "eval_1"))
    assert(rows.forall(r => r.getLong(2) == 4L && r.getLong(3) == 2L))
    assert(rows.forall(r => math.abs(r.getDouble(4) - 0.5) < 1e-12))
  }

  test("contamination fuzzy: cross-corpus near-dups surface, unrelated text doesn't") {
    val evalSet = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val train = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // exact
      (101L, "beta gamma delta epsilon zeta eta theta iota kappa"),       // near
      (200L, "wholly unrelated words that never overlap anything above"))
      .toDF("doc_id", "text")
    val got = Contamination.fuzzy(train, evalSet, "doc_id", "text",
        minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId.contains(100L) && byId(100L)._2 == 1L && byId(100L)._3 == 1.0,
      got.mkString(";"))
    // the near copy shares 7 of 8 shingles (jaccard 0.875) — its signature
    // must land in at least one common band for LSH to be useful here
    assert(byId.contains(101L) && byId(101L)._3 > 0.8, got.mkString(";"))
    assert(!byId.contains(200L), got.mkString(";"))
  }

  test("shuffleAssign: reproducible, bucket = key % n, roughly uniform") {
    val docs = (0L until 4096L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = Sampling.shuffleAssign(docs, "doc_id", nBuckets = 8, seed = 5)
    val rows = a.select("doc_id", "shuffle_key", "shuffle_bucket").collect()
    assert(rows.forall(r => r.getLong(2) == r.getLong(1) % 8))
    val sizes = rows.groupBy(_.getLong(2)).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0L until 8L).toSet)
    assert(sizes.values.forall(s => s > 256 && s < 768), sizes.toString)
    // same seed identical; different seed a different permutation
    val b = Sampling.shuffleAssign(docs, "doc_id", 8, seed = 6)
      .select("doc_id", "shuffle_key").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val aKeys = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(aKeys != b)
  }

  test("byQuality: score 1 always kept, score 0 never, mid-scores thin") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val df = (0L until 400L).map(i => (i, i % 4)).toDF("id", "grp")
    val score = when(col("grp") === 0, lit(1.0))
      .when(col("grp") === 1, lit(0.0))
      .when(col("grp") === 2, lit(0.5))
      .otherwise(lit(0.25))
    val kept = Sampling.byQuality(df, "id", score, seed = 9)
      .groupBy("grp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept(0L) == 100L, s"score 1.0 keeps everything: $kept")
    assert(!kept.contains(1L), s"score 0.0 keeps nothing: $kept")
    assert(kept(2L) > 25 && kept(2L) < 75, s"score 0.5 thins to ~half: $kept")
    assert(kept(3L) > 5 && kept(3L) < 45, s"score 0.25 thins to ~quarter: $kept")
    // deterministic: same seed, same selection
    val again = Sampling.byQuality(df, "id", score, seed = 9)
      .agg(org.apache.spark.sql.functions.sum(col("id"))).first().getLong(0)
    val first = Sampling.byQuality(df, "id", score, seed = 9)
      .agg(org.apache.spark.sql.functions.sum(col("id"))).first().getLong(0)
    assert(again == first)
  }

  test("packSequences: hand-checked offsets, straddling doc stays whole") {
    val d = Seq(
      ("s", 1L, 400L), ("s", 2L, 400L), ("s", 3L, 400L), // 3rd straddles 1024
      ("s", 4L, 1200L),                                  // bigger than budget
      ("t", 9L, 10L)                                     // separate shard
    ).toDF("source", "doc_id", "n_toks")
    val got = Sampling.packSequences(d, "source", "doc_id", "n_toks", 1024)
      .select("doc_id", "seq_id", "tok_offset").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((0L, 0L)))
    assert(got(2L) == ((0L, 400L)))
    assert(got(3L) == ((0L, 800L)))    // starts in seq 0, runs into seq 1
    assert(got(4L) == ((1L, 176L)))    // starts at cum 1200 -> seq 1
    assert(got(9L) == ((0L, 0L)))      // shards pack independently
  }

  test("quantize: |q| <= 127, reconstruction error bounded by scale/2") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.125f)),
      (2L, Array(0.0f, 0.0f)),          // all-zero -> scale 1.0, q all 0
      (3L, Array(3.0f))
    ).toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
        VectorOps.quantScale(col("embedding")).as("scale"),
        col("embedding"))
      .select(col("vec_id"), col("scale"),
        VectorOps.quantize(col("embedding"), col("scale")).as("q"),
        VectorOps.dequantMaxErr(col("embedding"),
          VectorOps.quantize(col("embedding"), col("scale")), col("scale"))
          .as("err"))
      .collect().map(r => (r.getLong(0),
        (r.getDouble(1), r.getSeq[Long](2), r.getDouble(3)))).toMap
    val (s1, q1, e1) = out(1L)
    assert(s1 == 1.0 / 127.0)
    assert(q1 == Seq(64L, -127L, 32L, 16L))
    assert(e1 <= s1 / 2 + 1e-15)
    assert(out(2L)._1 == 1.0 && out(2L)._2 == Seq(0L, 0L) && out(2L)._3 == 0.0)
    assert(out(3L)._2 == Seq(127L))
  }

  test("windowed type drift: hand-computed ppm TVD per window") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-spec")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // window 0: 2 view + 2 click (= the corpus mix -> drift 0)
    // window 1: 2 view only (vs ref 4/6 view, 2/6 click)
    val events = Seq(
      (1L, 10L, "view"), (2L, 20L, "view"), (3L, 30L, "click"),
      (4L, 40L, "click"), (5L, 70L, "view"), (6L, 80L, "view")
    ).map { case (id, mins, ty) =>
      (id, (base + mins * 60000L) * 1000000L, 1L, ty, 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    events.coalesce(1).write.mode("overwrite")
      .parquet(dir.toString + "/events.parquet")
    val got = Streams.windowedTypeDrift(spark, dir.toString + "/events.parquet")
      .orderBy("window_start")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // ref ppm: view 4*1e6/6 = 666666, click 333333
    // w0: view 500000, click 500000 -> |Δ| = 166666 + 166667 -> tvd 166666
    // w1: view 1000000, click 0     -> |Δ| = 333334 + 333333 -> tvd 333333
    assert(got.toSeq == Seq((4L, 166666L), (2L, 333333L)), got.mkString(";"))
  }

  test("windowed counts accept a multi-part parquet directory (stageSource)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-win-spec")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = Seq(
      (1L, 10L, 1L, "view", 1.0), (2L, 20L, 2L, "view", 1.0),
      (3L, 15L, 1L, "click", 1.0), (4L, 70L, 2L, "view", 1.0)
    ).map { case (id, mins, u, ty, v) =>
      (id, (base + mins * 60000L) * 1000000L, u, ty, v) // epoch ns
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    events.repartition(3).write.mode("overwrite")
      .parquet(dir.toString + "/events.parquet")
    val got = Streams.windowedEventCounts(spark, dir.toString + "/events.parquet")
      .select("window_start", "event_type", "n_events").collect()
    val perType = got.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(perType == Map("view" -> 3L, "click" -> 1L), got.mkString(";"))
    assert(got.map(_.getString(0)).distinct.length == 2) // two 1h windows
  }

  test("stream incremental dedup matches the batch operator") {
    val corpus = Seq((1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "aaa"),               // collides with the static corpus index
      (11L, "new1"), (12L, "new1"), // within-stream dup → keep 11
      (13L, "new2")).toDF("doc_id", "text")
    val got = Streams.incrementalDedupStream(spark, batch, corpus)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(11L, 13L), got.toString)
  }

  test("ingest loop stream: batch 2 sees batch 1's in-run index appends") {
    val wh = java.nio.file.Files.createTempDirectory("ingest_loop_spec").toString
    Bucketing.scratchDb(spark, "ingest_loop_spec", wh)
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "pack my box with five dozen liquor jugs for the trip"))
      .toDF("doc_id", "text")
    DedupIndex.writeDigestIndex(corpus, "doc_id", "text",
      "ingest_loop_spec.dg", 4)
    DedupIndex.writeBandIndex(corpus, "doc_id", "text",
      "ingest_loop_spec.bd", 4)
    val b1 = Seq(
      (101L, "the quick brown fox jumps over the lazy dog again"), // corpus hit
      (102L, "a wholly novel sentence about spark physical planning"),
      (103L, "a wholly novel sentence about spark physical planning"), // in-batch dup
      (104L, "independent text mentioning shuffle partitions and codegen"))
      .toDF("doc_id", "text")
    val b2 = Seq(
      (201L, "a wholly novel sentence about spark physical planning"),  // = b1 admit
      (202L, "independent text mentioning shuffle partitions and codegen"), // = b1 admit
      (203L, "fresh content arriving only in the second batch"),
      (204L, "pack my box with five dozen liquor jugs for the trip")) // corpus hit
      .toDF("doc_id", "text")
    val got = Streams.ingestLoopStream(spark, Seq(b1, b2),
        "ingest_loop_spec.dg", "ingest_loop_spec.bd", 0.7)
      .collect().map(_.getLong(0)).toSet
    // 201/202 re-ship batch 1's admissions: WITHOUT the in-run append they
    // are novel vs the base corpus and would be admitted — their absence
    // is the closed-loop proof
    assert(got == Set(102L, 104L, 203L), got.toString)
    // and the indexes now hold corpus + every admitted doc: a third probe
    // of the admitted content (fresh ids) drops everything
    val reprobe = DedupIndex.incrementalIndexed(
      Seq((301L, "fresh content arriving only in the second batch"))
        .toDF("doc_id", "text"),
      spark, "ingest_loop_spec.dg", "doc_id", "text")
    assert(reprobe.count() == 0L)
    // an all-duplicate drain admits nothing and returns an EMPTY frame
    // (not an unreadable empty sink); an empty batch stages nothing
    val nothing = Streams.ingestLoopStream(spark,
      Seq(b1, Seq.empty[(Long, String)].toDF("doc_id", "text")),
      "ingest_loop_spec.dg", "ingest_loop_spec.bd", 0.7)
    assert(nothing.count() == 0L)
  }

  test("token budget stream: non-skipping cumulative admission, batch-rule refold") {
    def doc(id: Long, source: String, n: Int): (Long, String, String) =
      (id, source, Seq.fill(n)("t").mkString(" "))
    val docs = Seq(
      doc(1, "A", 300), doc(2, "A", 400), doc(3, "A", 200), doc(4, "A", 50),
      doc(10, "B", 799), doc(11, "B", 1), doc(12, "B", 1),
      doc(20, "C", 900),
      (30L, "D", "")) // empty text -> 0 tokens, always fits
      .toDF("doc_id", "source", "text")
    val got = Streams.tokenBudgetStream(spark, docs, budget = 800,
        maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // A prefixes: 300, 700, 900, 950 -> docs 1,2 admitted; doc 4 (50 tok)
    // would FIT if doc 3 were skipped — non-skipping means it must not
    // B: 799, 800, 801 -> budget boundary is INCLUSIVE at exactly 800
    // C: a single over-budget doc admits nothing
    assert(got == Set((1L, "A"), (2L, "A"), (10L, "B"), (11L, "B"), (30L, "D")))
    // live-signal arithmetic: cum_tokens includes self and keeps growing
    // past the budget (the non-skipping invariant, pinned on the raw
    // membership rows)
    val arrivals = Streams.tokenBudgetArrivals(spark, docs, None)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(arrivals(1L) == 300L && arrivals(2L) == 700L &&
      arrivals(3L) == 900L && arrivals(4L) == 950L)
  }

  test("token budget stream: multi-doc boundary bucket and NULL source") {
    def doc(id: Long, source: String, n: Int): (Long, String, String) =
      (id, source, Seq.fill(n)("t").mkString(" "))
    // idBuckets = 2 over ids 0..9 -> width 5: bucket 0 holds ids 0-4,
    // bucket 1 ids 5-9, so the boundary bucket genuinely mixes admitted
    // and rejected rows and full-bucket admission sums several docs
    val docs = Seq(
      doc(1, "A", 100), doc(2, "A", 100), doc(3, "A", 100), doc(4, "A", 100),
      doc(5, "A", 150), doc(6, "A", 150), doc(7, "A", 200), doc(8, "A", 10),
      doc(0, null.asInstanceOf[String], 300), // NULL source is a real group
      doc(9, null.asInstanceOf[String], 500))
      .toDF("doc_id", "source", "text")
    val got = Streams.tokenBudgetStream(spark, docs, budget = 700,
        idBuckets = 2)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    // A prefixes: 100,200,300,400 | 550,700,900,910 -> bucket 0 admitted
    // whole (400 <= 700), boundary bucket 1 admits 5,6 (cum 550,700
    // INCLUSIVE), rejects 7, and non-skipping rejects 8 (10 tok would fit)
    // NULL source: prefixes 300, 800 -> doc 0 admitted, doc 9 rejected
    // (9 sits in the boundary bucket 1 with remaining 400 < 500)
    assert(got == Set((1L, Some("A")), (2L, Some("A")), (3L, Some("A")),
      (4L, Some("A")), (5L, Some("A")), (6L, Some("A")), (0L, None)), got)
  }

  test("profile: one row per column, exact metrics, nulls counted out") {
    val df = Seq(
      (1L, "en", None: Option[String]),
      (2L, "de", Some("x")),
      (3L, "en", Some("y"))).toDF("id", "lang", "src")
    val got = Profile.profile(df, Seq("lang", "src"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5)))).toMap
    assert(got("lang") == ((3L, 3L, 2L, "de", "en")), got.toString)
    assert(got("src") == ((3L, 2L, 2L, "x", "y")), got.toString)
  }

  test("stream-stream interval join matches the batch self-join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-join-spec")
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // user 1: click at 0, purchases at +10min (in) and +40min (out);
    // user 2: purchase BEFORE its click only -> no pair;
    // user 3: two clicks sharing one purchase
    val events = Seq(
      (1L, 0L, 1L, "click", 1.0), (2L, 10L, 1L, "purchase", 5.0),
      (3L, 40L, 1L, "purchase", 7.0),
      (4L, 20L, 2L, "purchase", 9.0), (5L, 30L, 2L, "click", 1.0),
      (6L, 50L, 3L, "click", 1.0), (7L, 60L, 3L, "click", 1.0),
      (8L, 70L, 3L, "purchase", 3.0)
    ).map { case (id, mins, u, ty, v) =>
      (id, (base + mins * 60000L) * 1000000L, u, ty, v) // epoch ns
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    // a NORMAL parquet directory with several part files (plus _SUCCESS and
    // .crc sidecars) — the shape every Spark write produces; the staging
    // path must list part files, not assume a single-file input
    events.repartition(3).write.mode("overwrite")
      .parquet(dir.toString + "/events.parquet")
    val got = Streams.clickAttribution(spark, dir.toString + "/events.parquet")
      .select("user_id", "click_id", "buy_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 2L), (3L, 6L, 8L), (3L, 7L, 8L)))
  }

  test("streaming LSH filter: copies drop to lowest id, short docs kept") {
    val long1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val near1 = (3 to 30).map(i => s"w$i").mkString(" ") // 2 tokens dropped
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (5L, long1), (2L, long1),   // identical — only id 2 survives
      (9L, near1),                // near-dup of long1 — shares buckets, drops
      (7L, other),                // unrelated — kept
      (3L, "too short")           // 2 tokens, no shingles — always kept
    ).toDF("doc_id", "text")
    val kept = Streams.minHashDedupStream(spark, docs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 7L), kept.toString)
  }

  test("streaming LSH filter: result is micro-batch-partitioning independent") {
    // one staged file per doc + maxFilesPerTrigger=1 forces one doc per
    // micro-batch, so every bucket-mate pair crosses a batch boundary in
    // SOME order; the global keep rule must still equal the single-batch
    // answer (first-arrival state alone would keep a doc whose lower-id
    // mate arrives in a later batch)
    val long1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val near1 = (3 to 30).map(i => s"w$i").mkString(" ")
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (5L, long1), (2L, long1), (9L, near1), (7L, other), (3L, "too short")
    ).toDF("doc_id", "text").repartition(5, col("doc_id"))
    val kept = Streams.minHashDedupStream(spark, docs, maxFilesPerTrigger = Some(1))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 7L), kept.toString)
  }

  test("streaming URL dedup: canonical-key min survives batch boundaries") {
    // same page under tracking/case/port noise; one staged file per row +
    // maxFilesPerTrigger=1 forces every arrival into its own micro-batch,
    // so the global per-URL minimum must win even when the LOWER id
    // arrives AFTER a higher-id mate was first seen
    val pages = Seq(
      (9L, "https://example.com/a?utm_source=x"),
      (2L, "https://EXAMPLE.com/a"),
      (5L, "https://example.com:443/a"),
      (7L, "http://other.org/"),
      (4L, "http://other.org:80")).toDF("doc_id", "url")
      .repartition(5, col("doc_id"))
    val kept = graft.streaming.Streams
      .urlDedupStream(spark, pages, maxFilesPerTrigger = Some(1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == Map(
      "https://example.com/a" -> 2L,
      "http://other.org" -> 4L), kept.toString)
  }

  test("bloom-gated ingest stream equals the ungated door, at any fpp") {
    val corpus = (0L until 50L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val batch = (
      (30L until 70L).map(i => (i + 1000L, s"doc $i")) ++   // 20 collide
      (0L until 10L).map(i => (i + 2000L, s"novel ${i % 5}"))
    ).toDF("doc_id", "text")
    val plain = Streams.incrementalDedupStream(spark, batch, corpus)
      .collect().map(_.getLong(0)).toSet
    for ((items, fpp) <- Seq((100000L, 0.01), (4L, 0.5))) {
      val gated = Streams.incrementalDedupStream(spark, batch, corpus,
          bloomExpectedItems = Some(items), bloomFpp = fpp)
        .collect().map(_.getLong(0)).toSet
      assert(gated == plain, s"items=$items fpp=$fpp")
    }
  }

  test("streaming source quota: admits the N lowest ids per source") {
    val docs = (
      (0L until 20L).map(i => (i, "web")) ++
      (100L until 103L).map(i => (i, "books"))
    ).toDF("doc_id", "source")
    val kept = Streams.sourceQuotaStream(spark, docs, quota = 5)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expect = ((0L until 5L).map(i => (i, "web")) ++
      (100L until 103L).map(i => (i, "books"))).toSet
    assert(kept == expect, kept.toString)
  }

  test("bloom-gated ingest stream: empty corpus admits everything") {
    val corpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val batch = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val kept = Streams.incrementalDedupStream(spark, batch, corpus,
        bloomExpectedItems = Some(1000L))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L), kept.toString)
  }

  test("streaming source quota: the live rank signal itself is correct") {
    // one doc per micro-batch: the per-source counter state must hand out
    // contiguous 1-based ranks in batch-arrival order, whatever that order
    // is — this pins the STATE arithmetic the admission decision reads
    // (`rank <= quota`), which the batch-rule fold alone never exercises
    val docs = ((0L until 6L).map(i => (i, "web")) ++
      (100L until 103L).map(i => (i, "books"))).toDF("doc_id", "source")
      .repartition(9, col("doc_id"))
    val ranked = Streams.sourceQuotaRanked(spark, docs,
        maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    // per source: ranks are exactly 1..n (contiguous, no gaps, no repeats)
    for ((src, n) <- Seq(("web", 6), ("books", 3))) {
      val ranks = ranked.filter(_._1 == src).map(_._3).sorted.toSeq
      assert(ranks == (1L to n).toSeq, s"$src: $ranks")
    }
    // single-batch drain: within a source, rank order IS id order, so the
    // live admission (rank <= q) equals the batch rule exactly
    val oneBatch = Streams.sourceQuotaRanked(spark,
        (0L until 8L).map(i => (i, "web")).toDF("doc_id", "source")
          .coalesce(1), maxFilesPerTrigger = None)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert((0L until 8L).forall(id => oneBatch(id) == id + 1),
      oneBatch.toString)
  }

  test("streaming source quota: result is micro-batch-partitioning independent") {
    // one doc per micro-batch in arbitrary file order: first-arrival
    // admission would over-admit high ids that arrive early; the returned
    // fold must still be the N lowest ids per source
    val docs = (0L until 8L).map(i => (i, "web")).toDF("doc_id", "source")
      .repartition(8, col("doc_id"))
    val kept = Streams.sourceQuotaStream(spark, docs, quota = 3,
        maxFilesPerTrigger = Some(1))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L), kept.toString)
  }

  test("streaming politeness door: live slots contiguous per host, delay exact") {
    // one URL per micro-batch: the per-host slot counter must hand out
    // contiguous 0-based slots in arrival order and multiply by the
    // host's delay (a.test 2.0, others the 0.5 default) — this pins the
    // STATE arithmetic the live admission reads (`sched_s < horizon`)
    val urls = ((0L until 5L).map(i => (i, s"https://a.test/p$i")) ++
      (100L until 103L).map(i => (i, s"https://b.test/q$i")))
      .toDF("doc_id", "url").repartition(8, col("doc_id"))
    val got = Streams.politenessArrivals(spark, urls,
        Map("a.test" -> 2.0), defaultDelayS = 0.5,
        maxFilesPerTrigger = Some(1))
      .collect()
      .map(r => (r.getString(2), r.getLong(3), r.getDouble(4))).toSeq
    for ((host, n, d) <- Seq(("a.test", 5, 2.0), ("b.test", 3, 0.5))) {
      val slots = got.filter(_._1 == host).map(_._2).sorted.toSeq
      assert(slots == (0L until n.toLong).toSeq, s"$host: $slots")
      assert(got.filter(_._1 == host)
        .forall(r => r._3 == r._2 * d), s"$host sched")
    }
    // the public refold equals the batch scheduler on id order
    val folded = Streams.politenessStream(spark, urls,
        Map("a.test" -> 2.0), defaultDelayS = 0.5, horizonS = 4.0,
        maxFilesPerTrigger = Some(1))
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(5)))
      .toSet
    // a.test: slots 0,1 fit (0,2 < 4); b.test: slots 0..7 would fit but
    // only 3 urls exist
    assert(folded == Set((0L, 0L, 0.0), (1L, 1L, 2.0),
      (100L, 0L, 0.0), (101L, 1L, 0.5), (102L, 2L, 1.0)), folded.toString)
  }

  test("crawl loop: a later batch cannot re-discover an earlier batch's URL") {
    import graft.operators.{Bucketing, Robots}
    Bucketing.scratchDb(spark, "crawl_loop_spec",
      java.nio.file.Files.createTempDirectory("crawl_loop_db").toString)
    val tbl = "crawl_loop_spec.seen"
    // seed: S already known
    Bucketing.writeBucketed(
      Seq("https://x.test/s").toDF("curl"), tbl, "curl", 4)
    def page(id: Long, hrefs: String*) =
      (id, hrefs.map(h => s"""<a href="$h">l</a>""").mkString,
        s"https://x.test/p$id")
    // b1: page 1 → A, S (seeded: drop); b2: page 2 → A (re-discovery:
    // drop), B; page 3 → B too (same batch: min id wins)
    val b1 = Seq(page(1L, "/a", "/s")).toDF("doc_id", "html", "base")
    val b2 = Seq(page(3L, "/b"), page(2L, "/a", "/b"))
      .toDF("doc_id", "html", "base")
    val rules = Robots.parseRules(
      Seq.empty[(String, String)].toDF("host", "txt"), "host", "txt")
    val got = Streams.crawlLoopStream(spark, Seq(b1, b2), rules,
        "anybot", tbl)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("https://x.test/a" -> 1L, "https://x.test/b" -> 2L),
      got.toString)
    // the seen table accumulated seed + both discoveries
    assert(spark.table(tbl).count() == 3L)
  }

  test("incrementalNearDup: corpus near-dups drop, batch keep-first, novel kept") {
    val long1 = (1 to 30).map(i => s"w$i").mkString(" ")
    val near1 = (3 to 30).map(i => s"w$i").mkString(" ")  // near-dup of long1
    val other = (100 to 140).map(i => s"x$i").mkString(" ")
    val corpus = Seq((1L, long1)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, near1),        // near-dup of corpus doc 1 -> drops
      (11L, other),        // novel -> kept
      (12L, other),        // batch-internal dup of 11 -> drops (keep-first)
      (13L, "too short")   // no shingles -> never buckets -> kept
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text", 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L), kept.toString)
  }

  test("incrementalSemDedup: corpus twins drop, opposites kept, batch rule holds") {
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Seq(1f, 0f, 0f, 0f)),    // exact twin of corpus 1 -> drops
      (11L, Seq(-1f, 0f, 0f, 0f)),   // opposite of 1 (cosine -1) -> kept
      (12L, Seq(0f, 0.99f, 0.01f, 0f)), // near-twin of corpus 2 -> drops
      (13L, Seq(0f, 0f, 1f, 0f)),    // novel -> kept
      (14L, Seq(0f, 0f, 0.999f, 0.001f)) // near-dup of 13 within batch -> drops
    ).toDF("vec_id", "embedding")
    val kept = Dedup.incrementalSemDedup(batch, corpus, "vec_id", "embedding",
        minCosine = 0.9, nlist = 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 13L), kept.toString)
  }

  test("perplexity gate stream: reference-like docs pass, gibberish drops") {
    // ref model: T = 8, V = 4 (aa:3, bb:2, cc:1, dd:2), denom = 12
    val ref = Seq((1L, "aa bb aa cc"), (2L, "aa bb dd dd")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "aa aa bb"),   // mean lp = (2*log10(4/12) + log10(3/12))/3 ≈ -0.519
      (11L, "zz yy xx"),   // all unseen -> log10(1/12) ≈ -1.079
      (12L, "")            // token-free -> floor
    ).toDF("doc_id", "text")
    val kept = Streams.perplexityGateStream(spark, docs, ref,
        minMeanLogProb = -0.7)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), kept.toString)
    // a floor-level threshold admits everything
    val all = Streams.perplexityGateStream(spark, docs, ref,
        minMeanLogProb = math.log10(1.0 / 12.0) - 0.001)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(10L, 11L, 12L), all.toString)
  }

  test("contamination gate stream: overlap fraction gates; short docs pass") {
    // eval doc shares its leading 3-grams with train doc 10 (2 of 4
    // shingles = 0.5 > 0.2 → dropped) but not doc 11 (0.0 → kept);
    // doc 12 is too short to shingle → always passes
    val evalDocs = Seq((1L, "alpha beta gamma delta echo fox"))
      .toDF("doc_id", "text")
    val train = Seq(
      (10L, "alpha beta gamma delta tailx endx"),
      (11L, "wholly different words that never overlap"),
      (12L, "too short")).toDF("doc_id", "text")
    val kept = Streams.contaminationGateStream(spark, train, evalDocs,
        maxContamFrac = 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L), kept.toString)
  }

  test("hygiene gate stream: repair then drop valid cards then redact") {
    val docs = Seq(
      (1L, "clean prose, nothing to do"),
      (2L, "cafÃ© talk and a phone 555-123-4567"),   // repaired + redacted
      (3L, "buy now 4532 0151 1283 0366 thanks"),    // valid card -> drop
      (4L, "order 4111-1111-1111-1112 is fine"),     // luhn-invalid -> keep
      (5L, "mail me bob@example.com please"),
      // the merged-run leak: valid card + separator-joined expiry fuse
      // into a 20-digit run the bounded regex discards — the window net
      // must still drop the row
      (6L, "visa 4111 1111 1111 1111 12 26 exp"),
      // two touching GROUPED cards, single separator between them — the
      // bounded regex's 5-group cap eats 24 digits and discards, leaving
      // no candidate; the net scans the merged 32-digit run and drops
      (7L, "pair 4111 1111 1111 1111 4532 0151 1283 0366 end"),
      // mixed doc: genuine 'é' on one line, artifact on another — the
      // per-line repair fixes the artifact line and keeps the genuine one
      (8L, "genuine café line\nnaÃ¯ve Ã¼ber artifacts")
    ).toDF("doc_id", "text")
    val out = Streams.hygieneGateStream(spark, docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(!out.contains(3L), out.keys.toString)
    assert(!out.contains(6L), out.keys.toString)
    assert(!out.contains(7L), out.keys.toString)
    assert(out(1L) == "clean prose, nothing to do")
    assert(out(2L) == "café talk and a phone <PHONE>", out(2L))
    assert(out(4L) == "order 4111-1111-1111-1112 is fine")
    assert(out(5L) == "mail me <EMAIL> please")
    assert(out(8L) == "genuine café line\nnaïve über artifacts", out(8L))
  }

  test("containsLuhnCard: window net catches merged runs, spares noise") {
    import graft.functions.QualityOps
    val cases = Seq(
      (1L, "plain 4532 0151 1283 0366 card", true),        // in-bounds valid
      (2L, "invalid 4111-1111-1111-1112 run", false),      // luhn fails
      (3L, "merged 4111 1111 1111 1111 12 26 leak", true), // card + expiry
      (4L, "wall 12345678901234567890123456789012345678901234567890123456789012345 x",
        false),                                            // > 64 digits: out of scope
      (5L, "phone 555-123-4567 and zip 90210", false),     // short groups only
      (6L, "touch 4111 1111 1111 1111 4532 0151 1283 0366", true) // grouped cards fused
    )
    val got = cases.map { case (id, t, _) => (id, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), QualityOps.containsLuhnCard(col("text")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (id, t, want) =>
      assert(got(id) == want, s"case $id '$t': got ${got(id)}")
    }
  }

  test("winnow gate stream: union semantics against the at-rest index") {
    val db = {
      val dir = java.nio.file.Files.createTempDirectory("winnow_gate").toString
      Bucketing.scratchDb(spark, "winnow_gate_spec", dir)
      "winnow_gate_spec"
    }
    val run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val bench = Seq(
      (900L, s"$run benchmark one tail"),
      (901L, "completely unrelated benchmark text with its own words"))
      .toDF("doc_id", "text")
    Contamination.writeWinnowIndex(bench, "doc_id", "text", 4,
      s"$db.fps", buckets = 2)
    val stream = Seq(
      (1L, s"prefix words here then $run pasted"),   // shares the run -> drop
      (2L, "nothing in common with any benchmark at all today"),
      (3L, "short doc")                              // too short to fingerprint
    ).toDF("doc_id", "text")
    val kept = Streams.winnowGateStream(spark, stream, s"$db.fps")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), kept.toString)
  }

  test("flesch: counts floor correctly, monosyllabic prose scores high") {
    import graft.functions.TextOps
    val df = Seq(
      (1L, "the cat sat. the dog ran. we all nap."),  // easy: high FRE
      (2L, "extraordinary institutionalization necessitates comprehensive reorganization"),
      (3L, "no terminal punctuation here")            // sentences floor to 1
    ).toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val out = df.select(col("doc_id"),
        size(toks).cast("long").as("w"),
        QualityOps.sentenceCount(col("text")).as("s"),
        QualityOps.syllableCount(toks).as("y"))
      .withColumn("fre", QualityOps.fleschScore(col("w"), col("s"), col("y")))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L)._2 == 3L)                  // three sentences
    assert(out(3L)._2 == 1L)                  // floored
    assert(out(1L)._4 > 90.0, out(1L).toString)   // monosyllables read easy
    assert(out(2L)._4 < 0.0, out(2L).toString)    // polysyllabic soup
  }

  test("statePartitionsFor sizes to staged bytes: 1 per 64 MB, clamped") {
    val dir = java.nio.file.Files.createTempDirectory("state-size")
    def write(name: String, mb: Int): Unit =
      java.nio.file.Files.write(dir.resolve(name), new Array[Byte](mb << 20))
    assert(Streams.statePartitionsFor(dir.toString) == 1)   // empty dir
    write("a.parquet", 1)
    assert(Streams.statePartitionsFor(dir.toString) == 1)   // small input
    write("b.parquet", 130)
    assert(Streams.statePartitionsFor(dir.toString) == 3)   // 131 MB → 3
    assert(Streams.statePartitionsFor("/nonexistent-path") == 1)
  }
}
