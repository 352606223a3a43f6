package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.bde.Diff
import graft.operators.{Dedup, Similarity}

/**
 * Physical-plan audit: the properties the 100 TB design depends on, pinned
 * as tests so a refactor that silently degrades a plan (a lost broadcast, a
 * cartesian product, a filter that stops reaching the parquet scan) fails
 * CI instead of surfacing as a cluster incident.
 */
class PlanAuditSpec extends SparkSuite {
  import spark.implicits._

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private val sf = "/root/testdata/sf0.001"

  test("diff classify/apply: change-set sides broadcast, never cartesian") {
    val cur = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") % 7 =!= 0)
    val inc = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") % 9 =!= 0)
    val keys = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") % 3 === 0).select("o_orderkey")
    val actions = Diff.classifyChanges(cur, inc, keys, "o_orderkey")
    val applied = Diff.applyActions(cur, inc, actions, "o_orderkey")
    for (p <- Seq(physical(actions), physical(applied))) {
      assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
        "big-table reductions must broadcast the change-set side")
      assert(!p.contains("CartesianProduct"), "no cartesian products")
    }
  }

  test("parquet scans: filters push down, projections prune columns") {
    val q6 = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_quantity") < 24)
      .select(col("l_extendedprice"), col("l_discount"))
    val p = physical(q6)
    assert(p.contains("PushedFilters: [IsNotNull"),
      s"filters must reach the scan:\n$p")
    // ReadSchema carries only the columns the query touches, never the
    // 16-column lineitem row
    val read = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_orderkey") && read.contains("l_extendedprice"),
      s"projection must prune to referenced columns: $read")
  }

  test("LSH similarity + simhash dedup: bucket-bounded joins, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lsh = Similarity.lshNeighborPairs(emb, "vec_id", "embedding",
      bits = 12, minCosine = 0.2, numTables = 2)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ham = Dedup.simHashHammingPairs(docs, "doc_id", "text", 3)
    for (p <- Seq(physical(lsh), physical(ham)))
      assert(!p.contains("CartesianProduct"),
        "candidate joins must be key-equality (bucket) joins")
  }

  test("whole-stage codegen covers the native expressions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(docs.select(
      graft.functions.TextOps.simHash(
        graft.functions.TextOps.tokenHashesWide(
          graft.functions.TextOps.tokens(col("text")))).as("print")))
    // `*(n)` marks operators inside a WholeStageCodegen stage; one lambda
    // (CodegenFallback) in the projection would strip the marker — the
    // tokens() filter used to do exactly that
    val projectLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"the tokenize->hash->simhash projection must run inside " +
        s"whole-stage codegen:\n$p")
  }

  test("shingle pipeline: WSCG projection, generated code compiles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val shingled = docs.select(col("doc_id"),
      graft.functions.TextOps.shingleHashes(
        graft.functions.TextOps.tokenHashes(
          graft.functions.TextOps.tokens(col("text")))).as("sh"))
    val p = physical(shingled)
    val projectLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"the tokenize->hash->shingle projection must stay inside " +
        s"whole-stage codegen (the lambda version dropped out):\n$p")
    // force the generated code through janino — a codegen bug would
    // otherwise FALL BACK to interpreted mode silently and only show up as
    // a 10x constant on the cluster
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    val wscg = shingled.queryExecution.executedPlan.collectFirst {
      case w: WholeStageCodegenExec => w
    }.getOrElse(fail("no WholeStageCodegen stage in the shingle plan"))
    val (ctx, code) = wscg.doCodeGen()
    org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      .compile(code) // throws on janino compile failure
    assert(ctx != null)
  }

  test("semDedup: map-side assignment, cluster-equality join, no cartesian") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Dedup.semDedup(emb, "vec_id", "embedding",
      minCosine = 0.9, nlist = 8)
    val p = physical(out)
    assert(!p.contains("CartesianProduct"),
      s"the within-cluster self-join must be a cluster-id equality join:\n$p")
    // the nearest-centroid assignment is literal arithmetic — there must be
    // no exchange between the parquet scan and the first (cluster) join key
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), s"expected an equality join:\n$p")
  }

  test("incremental dedup: digest-key joins only, scans prune to key+id") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batch = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val out = Dedup.incremental(batch, docs, "doc_id", "text")
    val p = physical(out)
    assert(!p.contains("CartesianProduct"))
    // the corpus side of the anti-join must read only the text column it
    // digests, not the whole row
    val reads = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(reads.exists(r => r.contains("text") && !r.contains("source")),
      s"corpus digest scan must prune to the digested column:\n$reads")
  }

  test("bloom-gated incremental dedup: misses bypass the corpus join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val batch = docs.select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val out = Dedup.incrementalBloom(batch, docs, "doc_id", "text",
      expectedItems = 65536L, fpp = 0.01)
    val p = physical(out)
    // the gate's whole point: exactly ONE anti-join (the confirm branch) —
    // the definite-miss branch must be scan + might_contain filter only
    val antiJoins = p.linesIterator.count(l =>
      l.contains("LeftAnti") || l.contains("left_anti"))
    assert(antiJoins == 1, s"expected one confirm anti-join, got $antiJoins:\n$p")
    assert(p.contains("bloom_bank_contains"),
      s"map-side bloom-bank probe missing from the plan:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("range search: probes broadcast, corpus side never shuffles") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val plan = graft.operators.Similarity.rangeSearch(
      emb, emb.where(col("vec_id") < 4), "vec_id", "embedding", 0.5)
      .queryExecution.executedPlan
    val p = plan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"threshold predicate should plan as a broadcast nested loop:\n$p")
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"the corpus side must stream map-side, no shuffle:\n$p")
  }

  test("pipeline_e2e: one documents scan feeds the whole composed flow") {
    val out = SparkEntry.queries("pipeline_e2e")(spark, sf)
    val p = physical(out)
    // language filter, quality gate, digest dedup, split and the final
    // aggregate must all ride ONE scan of the documents table
    val scans = p.linesIterator.count(_.contains("FileScan parquet"))
    assert(scans == 1, s"expected exactly one documents scan, got $scans:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("bucketed join: co-located scans, zero Exchange in the plan") {
    import graft.operators.Bucketing
    val wh = java.nio.file.Files.createTempDirectory("bkt_wh").toString
    Bucketing.scratchDb(spark, "bkt_audit", wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id").as("doc_id"), col("label"))
    Bucketing.writeBucketed(docs, "bkt_audit.d", "doc_id", 4)
    Bucketing.writeBucketed(emb, "bkt_audit.e", "doc_id", 4)
    // disable auto-broadcast: at test scale the planner would broadcast the
    // KB-sized side (also shuffle-free, but it bypasses the bucketed scan);
    // the property that matters at 100 TB is the big-big case — bucketed
    // scans on both sides, no Exchange
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.join(spark, "bkt_audit.d", "bkt_audit.e", "doc_id")
      val p = physical(joined)
      assert(!p.contains("Exchange"),
        s"same-bucketing equi-join must not shuffle either side:\n$p")
      assert(p.contains("Bucketed: true"),
        s"both sides must use the bucketed scan:\n$p")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("partitioned write: reads prune to the matching partition dirs") {
    import graft.operators.Bucketing
    val out = java.nio.file.Files.createTempDirectory("part_docs").toString
    Bucketing.writePartitioned(
      spark.read.parquet(s"$sf/documents.parquet"), out, "lang")
    val pruned = spark.read.parquet(out).where(col("lang") === "en")
      .select(col("doc_id"))
    val p = physical(pruned)
    assert(p.contains("PartitionFilters: [") && p.contains("lang"),
      s"the lang predicate must prune partitions, not filter rows:\n$p")
    // the partition column never appears in the data-read schema (it is in
    // the scan's OUTPUT — from directory names — but not read from files)
    val read = p.linesIterator.find(_.contains("ReadSchema"))
      .map(l => l.substring(l.indexOf("ReadSchema"))).getOrElse("")
    assert(!read.contains("lang"), s"partition col must not be read: $read")
    assert(pruned.count() > 0)
  }

  test("classifier score: a pure projection — no exchange anywhere") {
    import graft.functions.{QualityOps, TextOps}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val scored = docs.select(col("doc_id"),
      QualityOps.classifierScore(
        TextOps.tokenHashes(TextOps.tokens(col("text")))).as("s"))
    val p = physical(scored)
    assert(!p.contains("Exchange"),
      s"model scoring must stream map-side at scan speed:\n$p")
    // `*(n)` marks operators inside a WholeStageCodegen stage
    val projectLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"the native cell-sum expression must stay inside codegen:\n$p")
  }

  test("bm25: document frequencies broadcast; the corpus never self-joins") {
    import graft.operators.Relevance
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(Relevance.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "hash", "merge")))
    assert(p.contains("BroadcastHashJoin"),
      s"the |Q|-row df table must broadcast onto the tf stream:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-sized join may appear:\n$p")
  }

  test("capped LSH: one-pass window guard, no extra aggregation pass") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val capped = Dedup.minHashLshPairs(docs, "doc_id", "text",
      maxBucket = Some(2))
    val p = physical(capped)
    assert(p.contains("Window"),
      s"bucket sizes must come from ONE windowed pass, not a second " +
        s"evaluation of the banded stream:\n$p")
    // the guard must NOT add an aggregate over the banded stream (the
    // two-pass hot-set formulation did — and cost 4x at sf0.1); the only
    // aggregates in this plan belong to the signature/cluster collapse
    assert(!p.contains("partial_count(1) AS __n"),
      s"no aggregation pass for bucket sizes:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("repeated spans: no window over the raw hash partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(Dedup.repeatedSpans(docs, "doc_id", "text", 20))
    // a window function over partitionBy(wh) funnels EVERY occurrence of a
    // hot hash into one unsplittable task; hot detection must be a map-side
    // combinable aggregate joined back (AQE can split a skewed join
    // partition, and a small hot set broadcasts)
    assert(!p.contains("Window"),
      s"hot-hash detection must not be a window over the hash partition:\n$p")
    assert(p.contains("partial_min") || p.contains("partial_max") ||
      p.contains("HashAggregate"),
      s"hot hashes must come from a partial-combinable aggregate:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("paragraph dedup family: digest-keyed aggregates, no window funnel") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    for (df <- Seq(
      Dedup.paragraphDedup(docs, "doc_id", "text"),
      Dedup.boilerplateStrip(docs, "doc_id", "text", 3))) {
      val p = physical(df)
      // same skew lesson as repeated spans: a boilerplate paragraph shared
      // by millions of docs must NOT funnel into one window task — first-
      // occurrence / hot detection are map-side-combinable aggregates
      // joined back on the 32-byte digest
      assert(!p.contains("Window"),
        s"paragraph dedup must not window over the digest partition:\n$p")
      assert(p.contains("HashAggregate"),
        s"occurrence detection must be a combinable aggregate:\n$p")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("asof join: one shuffle + one window, no join operator at all") {
    import graft.operators.AsOf
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val left = ev.select(col("event_id"), col("user_id"), col("ts"))
    val right = ev.select(col("user_id"), col("ts"), col("value"))
    val p = physical(AsOf.asofJoin(left, right, "user_id", "ts", "ts", "value"))
    assert(p.contains("Window"), s"as-of must be a window pass:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"the union+window formulation has NO join operator — a range join " +
        s"here would go quadratic on hot keys:\n$p")
    assert(p.sliding("hashpartitioning".length).count(_ == "hashpartitioning") <= 2,
      s"one probe+build shuffle only:\n$p")
  }

  test("contamination: eval shingles broadcast, train side never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.Contamination.check(
      docs, "doc_id", "text", evalRate = 0.1, seed = 11)
    val p = physical(out)
    assert(p.contains("BroadcastHashJoin"),
      s"the eval shingle set must be the broadcast side:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the only SortMergeJoin-free shuffle allowed is the final per-doc
    // aggregate; the train shingle explode must not be exchanged before
    // the broadcast join
    assert(!p.contains("SortMergeJoin"),
      s"train shingles must stream map-side into the broadcast join:\n$p")
  }

  test("dsir: bucket models broadcast onto the raw token stream") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.Relevance.dsirScores(
      docs.where(col("lang") =!= "en"), docs.where(col("lang") === "en"),
      "doc_id", "text", buckets = 256)
    val p = physical(out)
    assert(p.contains("BroadcastHashJoin"),
      s"both bucket-count models must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the raw token stream must never shuffle into a join — only into " +
        s"the per-doc score aggregate:\n$p")
  }

  test("contamination fuzzy: eval side broadcasts, train side never sort-merges") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val out = graft.operators.Contamination.fuzzy(
      docs, docs.limit(50), "doc_id", "text", minJaccard = 0.5)
    val p = physical(out)
    assert(p.contains("BroadcastHashJoin"),
      s"eval bands and shingles must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"the train corpus must stream map-side into broadcast joins — " +
        s"only the candidate id pairs may shuffle:\n$p")
  }

  test("contamination multi: N eval sets still cost ONE train-side broadcast join") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val h = graft.operators.Sampling.hash16(col("doc_id"), 11)
    val r = math.round(0.05 * graft.operators.Sampling.Buckets)
    val sets = (0 until 3).map(i =>
      s"eval_$i" -> docs.where(h >= lit(i * r) && h < lit((i + 1) * r)))
    val out = graft.operators.Contamination.checkMulti(
      docs.where(h >= lit(3 * r)), "doc_id", "text", sets)
    val p = physical(out)
    assert(p.sliding("BroadcastHashJoin".length)
        .count(_ == "BroadcastHashJoin") == 1,
      s"the set-tagged shingle union must broadcast ONCE:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"train shingles must stream map-side into the broadcast join:\n$p")
  }

  test("sliding chunks: pure map-side — zero Exchange in the plan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(graft.operators.Chunking.slidingChunks(
      docs, "doc_id", "text", 32, 16))
    assert(!p.contains("Exchange"),
      s"chunking must scale with scan bandwidth alone — no shuffle:\n$p")
    assert(p.contains("Generate"), s"posexplode emits the chunk rows:\n$p")
  }

  test("bpe encode: merge chain is a pure projection — zero Exchange") {
    import graft.operators.Bpe
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Seq(Bpe.Merge(1, "e  s", 1L), Bpe.Merge(2, "es  t", 1L))
    val p = physical(Bpe.encodeStats(docs, "doc_id", "text", merges))
    assert(!p.contains("Exchange"),
      s"encoding must scale with scan bandwidth alone — no shuffle:\n$p")
  }

  test("jaccard prefix join: equi-joins only, never cartesian") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(graft.operators.Dedup.jaccardPrefixPairs(
      docs, "doc_id", "text", 0.7))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"candidate generation must join on shingle equality:\n$p")
  }

  test("kmeans assignment: literal-centroid projection — zero Exchange") {
    import graft.operators.KMeans
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = KMeans.seedCentroids(emb, "vec_id", "embedding", 4)
    val p = physical(KMeans.assign(emb, "vec_id", "embedding", cents))
    assert(!p.contains("Exchange"),
      s"assignment must stream map-side at scan speed:\n$p")
  }

  test("salted aggregation: exactly two exchanges, no single-key funnel") {
    import graft.operators.Salting
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), col("value"))
    val out = Salting.aggregate(ev, Seq("event_type"), 8,
      Seq(Salting.Agg("count", "event_type", "n"),
        Salting.Agg("max", "value", "mx")))
    val p = physical(out)
    // partials shuffle on (key, salt), finals on key — and the first
    // exchange must carry the salt so the hot key fans out
    val parts = p.linesIterator
      .filter(_.contains("hashpartitioning")).toSeq
    assert(parts.exists(_.contains("__salt")),
      s"the partial aggregate must shuffle on (key, salt):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("salted join: equi-join on (key, salt), probe side never replicates") {
    import graft.operators.Salting
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"))
    val dim = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val p = physical(Salting.join(docs, dim, Seq("lang"), 4))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"the salted join must stay an equality join:\n$p")
    // the ×salts replication (explode of the salt range) must sit on the
    // BUILD side only — exactly one Generate in the plan
    assert(p.linesIterator.count(_.contains("Generate explode")) == 1,
      s"exactly one side may replicate:\n$p")
  }

  test("incremental near-dup probe: at-rest band index scans with NO Exchange") {
    import graft.operators.{Bucketing, Dedup}
    // the posture incrementalNearDup documents: the corpus's band table is
    // PERSISTED bucketed on the band-bucket key, so each ingest batch's
    // probe re-shuffles only ITSELF (batch-sized); the corpus-side scan
    // stays in place however many ingests run. (band, bucket) fold into
    // one key at write time — a collision can only add a candidate, which
    // exact-Jaccard verification kills.
    val wh = java.nio.file.Files.createTempDirectory("band_wh").toString
    Bucketing.scratchDb(spark, "band_audit", wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val index = Dedup.banded(
        Dedup.withSignature(docs, "doc_id", "text"), "doc_id", Nil)
      .where(col("bucket").isNotNull)
      .select(col("id").as("cid"),
        xxhash64(col("band"), col("bucket")).as("bb"))
    Bucketing.writeBucketed(index, "band_audit.bands", "bb", 4)
    val probe = Dedup.banded(
        Dedup.withSignature(docs.where(col("doc_id") < 50), "doc_id", "text"),
        "doc_id", Nil)
      .where(col("bucket").isNotNull)
      .select(col("id").as("bid"), xxhash64(col("band"), col("bucket")).as("bb"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = physical(spark.table("band_audit.bands").join(probe, "bb"))
      assert(p.contains("Bucketed: true"),
        s"the index side must be the bucketed scan:\n$p")
      // exactly one Exchange — the batch probe aligning to the index's
      // bucketing; the corpus-side scan must have none
      assert(p.linesIterator.count(_.contains("Exchange")) == 1,
        s"only the probe side may shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("digest index probe: index scans bucketed, only the batch shuffles") {
    import graft.operators.{Bucketing, DedupIndex}
    // the operator-API form of the posture above: writeDigestIndex persists
    // the corpus digests bucketed on kh ONCE; every incrementalIndexed
    // probe anti-joins it in place — however many ingests run, the corpus
    // side never re-shuffles and its text is never re-read
    val wh = java.nio.file.Files.createTempDirectory("digest_wh").toString
    Bucketing.scratchDb(spark, "digest_audit", wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    DedupIndex.writeDigestIndex(docs, "doc_id", "text",
      "digest_audit.digests", buckets = 4)
    val batch = docs.where(col("doc_id") < 50)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = physical(DedupIndex.incrementalIndexed(
        batch, spark, "digest_audit.digests", "doc_id", "text"))
      assert(p.contains("Bucketed: true"),
        s"the index side must be the bucketed scan:\n$p")
      // ONE Exchange: the batch aligning to the index's bucketing; the
      // keep-first aggregate reuses that partitioning (both key on the
      // digest), and the index side scans in place
      assert(p.linesIterator.count(_.contains("Exchange")) == 1,
        s"only the batch probe may shuffle:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("band index probe operator: both index tables scan bucketed in place") {
    import graft.operators.{Bucketing, DedupIndex}
    val wh = java.nio.file.Files.createTempDirectory("bandop_wh").toString
    Bucketing.scratchDb(spark, "bandop_audit", wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    DedupIndex.writeBandIndex(docs, "doc_id", "text",
      "bandop_audit.band", buckets = 4)
    val batch = docs.where(col("doc_id") < 50)
      .select((col("doc_id") + 5000).as("doc_id"), col("text"))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = physical(DedupIndex.incrementalNearDupIndexed(
        batch, spark, "bandop_audit.band", "doc_id", "text", 0.7))
      // the candidate join reads <table>_bands and the verify join
      // <table>_shingles — BOTH must be bucketed in-place scans; batch
      // signatures recompute per ingest, corpus text never re-reads
      assert(p.linesIterator.count(l =>
        l.contains("Bucketed: true")) >= 2,
        s"both index tables must scan bucketed:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("ivf index probe: the inverted-file scan partition-prunes to probed cells") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("ivf_wh").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = s"$dir/ivf"
    Similarity.writeIvfIndex(emb, "vec_id", "embedding", path, nlist = 16)
    val out = Similarity.ivfTopKIndexed(spark, path,
      emb.where(col("vec_id") < 4), "vec_id", "embedding", k = 3, nprobe = 2)
    val p = physical(out)
    // the index scan must carry a non-empty PartitionFilters on cluster:
    // unprobed cells are pruned BEFORE file listing, not post-scan
    val scanLine = p.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("cluster")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("PartitionFilters: []"),
      s"index scan must partition-prune on cluster:\n$p")
    assert(!p.contains("CartesianProduct"))
    // and the result equals the rescan operator's
    val rescan = Similarity.ivfTopK(emb, emb.where(col("vec_id") < 4),
      "vec_id", "embedding", k = 3, nlist = 16, nprobe = 2)
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = rescan.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("ivf-sq8 index probe: partition-pruned, never reads the scale column") {
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("ivfsq8_wh").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = s"$dir/ivfsq8"
    Similarity.writeIvfSq8Index(emb.where(col("vec_id") < 64),
      "vec_id", "embedding", path, nlist = 16)
    Similarity.appendIvfSq8Index(emb.where(col("vec_id") >= 64),
      "vec_id", "embedding", path)
    val out = Similarity.ivfSq8TopKIndexed(spark, path,
      emb.where(col("vec_id") < 4), "vec_id", "embedding", k = 3, nprobe = 2)
    val p = physical(out)
    val scanLine = p.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("cluster")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("PartitionFilters: []"),
      s"code scan must partition-prune on cluster:\n$p")
    // scale cancels in cosine: the probe must not read it — columnar
    // pruning is what makes the reconstruction column free for ranking
    assert(!scanLine.contains("scale"),
      s"SQ8 cosine probe must prune the scale column:\n$scanLine")
    assert(p.contains("cosine("),
      s"scoring must be the native codegen'd cosine expression:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("ivf-pq index probe: code scan partition-prunes, result equals rescan") {
    import graft.operators.IvfPq
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_wh").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val path = s"$dir/ivfpq"
    // FAISS train/add split: quantizers learn from the full corpus, codes
    // write for the even half, the odd half appends with FIXED quantizers
    IvfPq.writeIvfPqIndex(emb.where(col("vec_id") % 2 === 0),
      "vec_id", "embedding", path, nCells = 4, m = 4, ksub = 8, iters = 2,
      train = Some(emb))
    IvfPq.appendIvfPqIndex(emb.where(col("vec_id") % 2 === 1),
      "vec_id", "embedding", path)
    val out = IvfPq.topKIndexed(spark, path,
      emb.where(col("vec_id") < 4), "vec_id", "embedding", nprobe = 2, k = 5)
    val p = physical(out)
    // unprobed cells are pruned BEFORE file listing — the scan reads codes
    // (ids + m bytes per vector), never raw vectors
    val scanLine = p.linesIterator.find(l =>
      l.contains("PartitionFilters: [") && l.contains("cluster")).getOrElse("")
    assert(scanLine.nonEmpty && !scanLine.contains("PartitionFilters: []"),
      s"code scan must partition-prune on cluster:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("BroadcastExchange"),
      s"the ADC lookup table must broadcast:\n$p")
    // write→append→probe equals the in-session full-corpus rescan exactly
    // (same quantizers, same codes, same integer ADC arithmetic)
    val a = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = IvfPq.topK(emb, emb.where(col("vec_id") < 4), "vec_id", "embedding",
        nCells = 4, m = 4, ksub = 8, iters = 2, nprobe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("cdx index lookup: bucket-pruned scan over the at-rest capture index") {
    import graft.sources.Warc
    val wh = java.nio.file.Files.createTempDirectory("cdx_wh").toString
    graft.operators.Bucketing.scratchDb(spark, "cdx_audit", wh)
    val dir = java.nio.file.Files.createTempDirectory("cdx_warc")
    (0 until 2).foreach { shard =>
      val bos = new java.io.ByteArrayOutputStream()
      (0 until 8).map(i => shard * 8 + i).foreach { i =>
        bos.write(Warc.renderRecord("resource",
          Some(s"https://site$i.test/page/$i"), "2026-01-01T00:00:00Z",
          "text/plain", s"capture $i".getBytes("UTF-8")))
      }
      java.nio.file.Files.write(dir.resolve(s"s$shard.warc"), bos.toByteArray)
    }
    Warc.writeCdxIndex(spark, s"$dir/s0.warc", "cdx_audit.cdx", buckets = 8)
    Warc.appendCdxIndex(spark, s"$dir/s1.warc", "cdx_audit.cdx")
    val out = Warc.lookupCdx(spark, "cdx_audit.cdx",
      Seq("https://site3.test/page/3", "https://site12.test/page/12"))
    // the lookup finds both captures (one from the build, one appended)
    // with their provenance intact
    val rows = out.select(col("target_uri"), col("rec_offset")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.keySet ==
      Set("https://site3.test/page/3", "https://site12.test/page/12"))
    assert(rows.values.forall(_ >= 0L))
    // and the scan is the bucketed index, pruned to <= 2 of 8 buckets —
    // archive bytes are never touched by a lookup
    val p = physical(out)
    assert(p.contains("Bucketed: true"), s"lookup must scan the index:\n$p")
    val sel = p.linesIterator.find(_.contains("SelectedBucketsCount"))
      .getOrElse(fail(s"lookup must bucket-prune on the surt keys:\n$p"))
    val selected = "SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(sel).map(_.group(1).toInt)
      .getOrElse(fail(s"unparseable bucket count:\n$sel"))
    assert(selected <= 2, s"pruned to <=2 buckets:\n$sel")
  }

  test("postings index probe: bucket-pruned scan, dfreq aggregates in place") {
    import graft.operators.{Bucketing, Relevance}
    // the at-rest lexical-retrieval posture: writePostingsIndex persists
    // (tok, id, tf, dl) bucketed on tok ONCE; a bm25TopKIndexed probe must
    // (a) bucket-prune its scan to the buckets holding the query terms,
    // (b) aggregate per-term document frequencies WITHOUT an Exchange
    //     (groupBy on the bucketing key), and
    // (c) shuffle only matched postings for the per-document score —
    // corpus text is never read, however many probes run
    val wh = java.nio.file.Files.createTempDirectory("postings_wh").toString
    Bucketing.scratchDb(spark, "postings_audit", wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    Relevance.writePostingsIndex(docs, "doc_id", "text",
      "postings_audit.postings", buckets = 8)
    val out = Relevance.bm25TopKIndexed(spark, "postings_audit.postings",
      Seq("spark", "hash", "merge"))
    val p = physical(out)
    assert(p.contains("Bucketed: true"),
      s"the postings side must be the bucketed scan:\n$p")
    val sel = p.linesIterator.find(_.contains("SelectedBucketsCount"))
      .getOrElse(fail(s"probe must bucket-prune on the query terms:\n$p"))
    // 3 query terms hit at most 3 of the 8 buckets
    val selected = "SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(sel).map(_.group(1).toInt)
      .getOrElse(fail(s"unparseable bucket count:\n$sel"))
    assert(selected <= 3, s"pruned to <=3 buckets:\n$sel")
    // exactly one Exchange: matched postings aligning to the per-document
    // aggregate; dfreq groups on the bucketing key and broadcasts back
    assert(p.linesIterator.count(_.contains("Exchange")) == 2 &&
      p.contains("BroadcastExchange"),
      s"only matched postings may shuffle; dfreq must broadcast:\n$p")
    // the index is POSITIONAL, but a BM25 probe must never read the pos
    // column — columnar pruning is what makes positions free for
    // non-positional probes
    assert(sel.contains("ReadSchema: struct<tok:string,id:bigint,tf:double,dl:double>"),
      s"BM25 probe must prune the pos column from its scan:\n$sel")
    // and the probe result equals the rescan operator's
    val a = out.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = Relevance.bm25TopK(docs, "doc_id", "text",
        Seq("spark", "hash", "merge"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b)
    // the phrase probe over the same index also bucket-prunes, and its
    // only Exchange groups matched postings by document
    val pp = physical(Relevance.phraseSearch(spark,
      "postings_audit.postings", Seq("spark", "hash")))
    assert(pp.contains("SelectedBucketsCount"),
      s"phrase probe must bucket-prune:\n$pp")
    assert(pp.linesIterator.count(_.contains("Exchange")) == 1,
      s"phrase probe shuffles matched postings only:\n$pp")
    // the proximity (slop-k) probe shares the phrase probe's shape:
    // bucket-pruned scan, one Exchange grouping matched postings by doc,
    // pair counting as a map-side array fold
    val xp = physical(Relevance.proximitySearch(spark,
      "postings_audit.postings", "spark", "hash", 4))
    assert(xp.contains("SelectedBucketsCount"),
      s"proximity probe must bucket-prune:\n$xp")
    assert(xp.linesIterator.count(_.contains("Exchange")) == 1,
      s"proximity probe shuffles matched postings only:\n$xp")
  }

  test("suffix rank index: probes scan the artifact in place — no re-ranking") {
    import graft.operators.{Bucketing, SuffixArray}
    // the at-rest ExactSubstr posture: writeRankIndex pays the
    // prefix-doubling build once per corpus release; every probe must be a
    // plain scan of the bucketed artifact — the plan may contain NO
    // ExistingRDD node (the signature of the distributed dense-rank
    // machinery: any re-ranking would re-enter createDataFrame-over-RDD)
    val wh = java.nio.file.Files.createTempDirectory("suffix_wh").toString
    Bucketing.scratchDb(spark, "suffix_audit", wh)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    SuffixArray.writeRankIndex(docs, "doc_id", "text", 12,
      "suffix_audit.ranks", buckets = 4)
    val at = spark.table("suffix_audit.ranks")
    // the heavy consumer's shape: the rank-groupBy aggregates over the
    // bucketed scan IN PLACE — zero Exchange on the index side
    val pg = physical(at.groupBy("rank").count())
    assert(pg.contains("Bucketed: true"),
      s"rank-groupBy must scan the bucketed artifact:\n$pg")
    assert(!pg.contains("Exchange"),
      s"bucketing on rank must satisfy the rank-groupBy without a shuffle:\n$pg")
    for (p <- Seq(
        physical(SuffixArray.rankChecksums(at, "doc_id")),
        physical(SuffixArray.repeatedWindows(at, docs, "doc_id", "text", 12, 5)),
        physical(SuffixArray.repeatedPositions(at, docs, "doc_id", "text", 12)),
        physical(SuffixArray.topSuffixes(at, docs, "doc_id", "text", 12, 5)))) {
      assert(p.contains("Bucketed: true"),
        s"probe must scan the persisted rank table:\n$p")
      assert(!p.contains("ExistingRDD"),
        s"probe must not re-rank (no dense-rank RDD machinery):\n$p")
      assert(!p.contains("CartesianProduct"))
    }
    // and probing the artifact returns exactly the in-session result
    val a = SuffixArray.rankChecksums(at, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = SuffixArray.rankChecksums(
        SuffixArray.suffixRanks(docs, "doc_id", "text", 12), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("classifier scoring: margin is one map-side codegen'd projection") {
    import graft.operators.Classifier
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val model = Classifier.Model(Array.fill(64)(7L), 3L)
    val p = physical(Classifier.score(docs, "doc_id", "text", model))
    assert(!p.contains("Exchange"),
      s"scoring must not shuffle — the model rides the expression:\n$p")
    // the `*(n)` operator prefix is the WholeStageCodegen marker in the
    // compact rendering
    assert(p.contains("*(1) Project"),
      s"the cell-sum margin must stay inside codegen:\n$p")
  }

  test("unigram encode: the Viterbi DP runs inside whole-stage codegen, no shuffle") {
    import graft.operators.Unigram
    val model: Unigram.Model =
      Seq(("a", 0.4), ("b", 0.3), ("ab", 0.2), ("c", 0.1))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = physical(docs.select(col("doc_id"),
      Unigram.encode(col("text"), model, 4).as("p")))
    assert(!plan.contains("Exchange"), s"pure projection expected:\n$plan")
    assert(plan.contains("*(1) Project"),
      s"unigram_encode must codegen:\n$plan")
    assert(plan.contains("unigram_encode"), plan)
  }

  test("ppl buckets: model broadcast, bucketing map-side — no global window") {
    import graft.operators.Perplexity
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(Perplexity.pplBuckets(docs, "doc_id", "text",
      col("lang") === "en"))
    assert(p.contains("BroadcastHashJoin"),
      s"the reference model must broadcast to the token stream:\n$p")
    assert(!p.contains("Window"),
      s"terciles assign by comparison against collected thresholds — an " +
        s"ntile() over a global ORDER BY would be one unsplittable task:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("pq adc: lookup table broadcast, codes map-side, no cartesian") {
    import graft.operators.Pq
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Pq.adcTopK(emb, emb.where(col("vec_id") < 4),
      "vec_id", "embedding", m = 4, ksub = 8, iters = 1, k = 5)
    val p = physical(out)
    assert(p.contains("BroadcastHashJoin"),
      s"the query LUT (queries × m × ksub rows) must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // the encoded-corpus side reaches the LUT join scan-direct: no
    // exchange may sit between the corpus scan and the broadcast join
    // (encoding is a projection; the only exchanges are the ADC aggregate
    // and the per-query top-k)
    val hashParts = p.linesIterator
      .count(_.contains("hashpartitioning"))
    assert(hashParts <= 2,
      s"only the ADC sum + top-k window may shuffle:\n$p")
  }

  test("ivf-pq: residual encode map-side, LUT broadcast, probed-cell join only") {
    import graft.operators.IvfPq
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = IvfPq.topK(emb, emb.where(col("vec_id") < 4),
      "vec_id", "embedding", nCells = 4, m = 4, ksub = 8, iters = 1,
      nprobe = 2, k = 5)
    val p = physical(out)
    assert(p.contains("BroadcastHashJoin"),
      s"the (query, cell) LUT must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // residual + code columns are projections over the scan: candidate
    // pruning IS the (cell, sub, code) broadcast join, so the only
    // exchanges are the ADC aggregate and the per-query top-k
    assert(p.linesIterator.count(_.contains("hashpartitioning")) <= 2,
      s"only the ADC sum + top-k may shuffle:\n$p")
  }

  test("per-source quota: bounded top-k aggregate, no window over the source") {
    import graft.SparkEntry
    val p = physical(SparkEntry.queries("quota_per_source")(spark, sf))
    assert(!p.contains("Window"),
      s"top-N per source must be the bounded aggregate — a window over " +
        s"the source partition funnels a hot source into one task:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"the typed top-k aggregate must plan with partial aggregation:\n$p")
  }

  test("curation pipeline: broadcasts only, no cartesian, no global window") {
    import graft.SparkEntry
    val out = SparkEntry.queries("pipeline_curation")(spark, sf)
    val p = physical(out)
    assert(p.contains("BroadcastHashJoin"),
      s"the ppl model and small key sets must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    assert(!p.contains("Window"),
      s"no stage of the composed pipeline may need a global window:\n$p")
  }

  test("c4 line filter: rules map-side, ONE doc-keyed shuffle total") {
    import graft.operators.LineRules
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(LineRules.c4LineFilter(docs, "doc_id", "text",
      minWords = 5, minLines = 2, blocklist = Seq("spark")))
    // reassembly + count + gate ride one aggregate: a single exchange
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"line rules are map-side predicates; only the reassembly shuffles:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"))
  }

  test("vocab coverage: bounded top-K cut, broadcast membership probe") {
    import graft.operators.VocabCoverage
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(VocabCoverage.vocabCoverage(docs, "text", 25))
    assert(p.contains("TakeOrderedAndProject"),
      s"the vocabulary cut must be per-partition top-K + driver merge, " +
        s"never a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the membership probe must broadcast the vocabulary:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus must never sort-merge against its own vocabulary:\n$p")
  }

  test("per-lang quantile cut: group cuts broadcast back onto the corpus") {
    import graft.operators.PerGroupQuantile
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n"))
    val p = physical(PerGroupQuantile.filter(d, "lang", "n", 0.7))
    assert(p.contains("BroadcastHashJoin"),
      s"the group-count-sized cut table must broadcast:\n$p")
    assert(!p.contains("Window") && !p.contains("SortMergeJoin"),
      s"the keep decision is map-side against the broadcast cuts:\n$p")
  }

  test("dict match: automaton scan is pure projection inside codegen") {
    import graft.operators.DictMatch
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(docs.select(col("doc_id"),
      DictMatch.stats(col("text"), SparkEntry.DictPhrases).as("m")))
    assert(!p.contains("Exchange"),
      s"the dictionary scan must not shuffle — the automaton is a literal:\n$p")
    val projectLine = p.linesIterator.find(_.contains("Project")).getOrElse("")
    assert(projectLine.trim.startsWith("*("),
      s"the scan must run inside whole-stage codegen:\n$p")
  }

  test("wordpiece encode: literal piece set, zero-shuffle stats projection") {
    import graft.operators.WordPiece
    val vocab = Seq(("low", 5L), ("lower", 2L), ("newest", 6L)).toDF("w", "f")
    val (_, ps) = WordPiece.trainPieces(vocab, "w", "f", 4)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val stats = WordPiece.encodeStats(docs, "doc_id", "text", ps)
    val p = physical(stats)
    assert(!p.contains("Exchange"),
      s"encode stats are per-doc projection — the piece set rides as " +
        s"literals, no join, no shuffle:\n$p")
  }

  test("robots gate: rules broadcast onto the URL stream, never sort-merge") {
    import graft.operators.Robots
    val rules = Seq(
      ("a.test", "*", false, "/private"), ("a.test", "*", true, "/pub"),
      ("b.test", "*", false, "/*.pdf$")).toDF("host", "agent", "allow", "prefix")
    val urls = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://a.test/p/"), col("doc_id")).as("url"))
    val p = physical(Robots.gate(urls, rules, "bot", "doc_id", "url"))
    assert(p.contains("BroadcastHashJoin"),
      s"the tiny rules frame must broadcast — the URL side never " +
        s"shuffles by host:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no corpus-side shuffle join:\n$p")
    // the stateless per-row form (the streaming door): broadcast join +
    // fold, no exchange on the URL side after the join
    val joined = urls
      .withColumn("__host", Robots.urlHost(col("url")))
      .withColumn("__path", Robots.urlPath(col("url")))
      .join(broadcast(Robots.hostRuleSets(rules, "bot")),
        col("__host") === col("__rh"), "left")
    val (allowed, rp) = Robots.verdict(col("__path"), col("__rules"))
    val pf = physical(joined.select(col("doc_id"), allowed.as("allowed"),
      rp.as("rule_prefix")))
    assert(pf.contains("BroadcastHashJoin") && !pf.contains("SortMergeJoin"),
      s"door form: broadcast join only:\n$pf")
  }

  test("sitemap parse: block extraction + explode, zero shuffle") {
    import graft.sources.Sitemaps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), concat(lit("<urlset><url><loc>https://x/"),
        col("doc_id"), lit("</loc></url></urlset>")).as("xml"))
    val p = physical(Sitemaps.parse(docs, "doc_id", "xml"))
    assert(!p.contains("Exchange"),
      s"sitemap parsing is a map-side projection + generate:\n$p")
  }

  test("cdx ranged fetch: bucket-pruned index probe, no archive file scan") {
    import graft.sources.Warc
    val dir = java.nio.file.Files.createTempDirectory("plan_cdx")
    val date = "2026-01-01T00:00:00Z"
    val recs = (0 until 6).map(i => Warc.renderRecord("resource",
      Some(s"https://p.test/$i"), date, "text/plain",
      s"plan fixture $i".getBytes("UTF-8")))
    val bytes = new java.io.ByteArrayOutputStream()
    recs.foreach(r => bytes.write(Warc.gzipMember(r)))
    java.nio.file.Files.write(dir.resolve("s.warc"), bytes.toByteArray)
    graft.operators.Bucketing.scratchDb(spark, "plan_cdx",
      java.nio.file.Files.createTempDirectory("plan_cdx_db").toString)
    Warc.writeCdxIndex(spark, dir.toString, "plan_cdx.idx", buckets = 8)
    val fetch = Warc.fetchCaptures(spark, "plan_cdx.idx",
      Seq("https://p.test/1", "https://p.test/4"))
    val p = physical(fetch)
    assert(p.contains("SelectedBucketsCount"),
      s"the probe must bucket-prune to the looked-up SURT keys:\n$p")
    assert(!p.toLowerCase.contains("binaryfile"),
      s"a ranged fetch never scans archive shards:\n$p")
  }

  test("edge index: the per-source degree fold scans bucketed, zero Exchange") {
    import graft.operators.{Bucketing, Graph}
    Bucketing.scratchDb(spark, "plan_graph",
      java.nio.file.Files.createTempDirectory("plan_graph_db").toString)
    val e = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id").as("src"), ((col("doc_id") * 3 + 1) % 500).as("dst"))
    Graph.writeEdgeIndex(e, "src", "dst", "plan_graph.edges", buckets = 8)
    val p = physical(Graph.outDegrees(spark, "plan_graph.edges"))
    assert(!p.contains("Exchange"),
      s"out-degree must fold in place over the src bucketing:\n$p")
    assert(p.contains("Bucketed: true"),
      s"the index scan must be bucketed:\n$p")
  }

  test("frontier schedule: bounded top-k aggregate, no window over the host") {
    import graft.operators.Frontier
    val urls = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://"), col("source"), lit(".test/doc/"),
          col("doc_id").cast("string")).as("url"),
        (col("n_chars") % 11).cast("double").as("priority"))
    val d = Seq(("src0.test", 2.0)).toDF("host", "delay_s")
    val p = physical(
      Frontier.schedule(urls, d, "doc_id", "url", "priority", 0.5, 10.0))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"the delay table must ride in as a broadcast:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"exactly the inherent cluster-by-host shuffle:\n$p")
    // the quota_per_source posture: slots come from the bounded per-host
    // aggregate (≤ cap state per map task, combined map-side) — a
    // row_number window here would sort a mega-host's ENTIRE frontier
    // in one unsplittable task while emitting only the bounded head
    assert(!p.contains("Window"),
      s"per-host slotting must be the bounded aggregate, not a window:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"the typed top-k aggregate must plan with partial aggregation:\n$p")
  }

  test("apportionBudget: no single-partition window, exact sum preserved") {
    import graft.operators.Frontier
    val scores = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy(col("source")).agg(count(lit(1)).as("mass"))
    val out = Frontier.apportionBudget(scores, "source", "mass", budget = 997L)
    // the largest-remainder tie-break needs the GLOBAL remainder order,
    // but it must come from the two-pass partition-ranked numbering — a
    // Window.orderBy with no partitionBy would funnel every host row
    // through ONE task (the 10⁸-host crawl killer)
    val p = physical(out)
    assert(!p.contains("Window"),
      s"the remainder rank must not plan as a window:\n$p")
    assert(out.agg(sum(col("alloc"))).collect()(0).getLong(0) == 997L,
      "Σ alloc must equal the budget exactly")
  }

  test("conditional fetch plan: latest-per-url is an aggregate, never a window") {
    import graft.operators.Frontier
    val frontier = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"))
    val state = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"),
        concat(lit("e"), col("doc_id")).as("etag"),
        concat(lit("lm"), col("doc_id")).as("last_modified"),
        col("doc_id").as("fetch_time"))
    val p = physical(Frontier.conditionalFetchPlan(frontier, state))
    // a URL's fetch history is unbounded across releases: latest-wins
    // must fold as a partial-aggregable max_by, not a per-url sort
    assert(!p.contains("Window"),
      s"latest validators must come from an aggregate, not a window:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("sharded suffix dictionary merge: folds the bucketed scan in place") {
    import graft.operators.{Bucketing, SuffixArray}
    Bucketing.scratchDb(spark, "plan_sfx",
      java.nio.file.Files.createTempDirectory("plan_sfx_db").toString)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    SuffixArray.writeShardedRankIndex(
      docs.where(col("doc_id") % 2 === 0), "doc_id", "text", 8,
      "plan_sfx.sh", buckets = 4, shard = 0L)
    SuffixArray.appendRankShard(
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text", 8,
      "plan_sfx.sh", shard = 1L)
    val p = physical(
      SuffixArray.repeatedWindowsSharded(spark, "plan_sfx.sh", 20))
    // the merge is the whole point of the sharded layout: the dictionary
    // is bucketed on snippet, so the cross-shard groupBy(snippet) must
    // aggregate the scan in place — no Exchange anywhere (the top-k is a
    // TakeOrdered, not a global sort)
    assert(p.contains("Bucketed: true"),
      s"the dictionary side must be the bucketed scan:\n$p")
    assert(!p.contains("Exchange"),
      s"the snippet merge must fold in place over the bucketing:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"the top-k must be bounded, never a global sort:\n$p")
  }

  test("CDX domain/prefix probes: range and StartsWith reach the scan") {
    import graft.operators.Bucketing
    import graft.sources.Warc
    Bucketing.scratchDb(spark, "plan_cdx",
      java.nio.file.Files.createTempDirectory("plan_cdx_db").toString)
    val caps = spark.read.parquet(s"$sf/documents.parquet")
      .select(
        concat(lit("test,graft)/doc/"), col("doc_id")).as("surt"),
        concat(lit("https://graft.test/doc/"), col("doc_id")).as("target_uri"),
        lit("resource").as("rec_type"), lit("2026-01-01").as("warc_date"),
        lit("a.warc").as("warc_file"), col("doc_id").as("rec_offset"),
        lit(1L).as("content_length"), sha2(col("text"), 256).as("digest"),
        col("doc_id").as("stored_offset"), lit(1L).as("stored_length"))
    Bucketing.writeBucketed(caps, "plan_cdx.cdx", "surt", 4)
    val pd = physical(Warc.lookupCdxDomain(spark, "plan_cdx.cdx",
      Seq("graft.test")))
    // the coarse range on the sort column must reach the parquet scan —
    // over the per-bucket-sorted layout that is the row-group prune; the
    // label-boundary check is the post-scan exactness filter
    assert(pd.contains("PushedFilters") &&
      pd.linesIterator.exists(l => l.contains("PushedFilters") &&
        l.contains("GreaterThanOrEqual(surt") && l.contains("LessThan(surt")),
      s"the domain range must push to the scan:\n$pd")
    val pp = physical(Warc.lookupCdxPrefix(spark, "plan_cdx.cdx",
      Seq("https://graft.test/doc")))
    assert(pp.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("StringStartsWith(surt")),
      s"the prefix probe must push StringStartsWith:\n$pp")
  }

  test("fetch-state index probe: latest-wins folds the bucketed scan in place") {
    import graft.operators.{Bucketing, FetchState}
    Bucketing.scratchDb(spark, "plan_fs",
      java.nio.file.Files.createTempDirectory("plan_fs_db").toString)
    val state = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"),
        concat(lit("e"), col("doc_id")).as("etag"),
        concat(lit("lm"), col("doc_id")).as("last_modified"),
        col("doc_id").as("fetch_time"),
        concat(lit("d"), col("doc_id")).as("digest"))
    FetchState.writeStateIndex(state, "plan_fs.state", buckets = 4)
    val frontier = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"))
    val p = physical(
      FetchState.conditionalFetchPlanIndexed(frontier, spark, "plan_fs.state"))
    // the fetch-state table is the crawl's LARGEST control structure (one
    // row per fetch attempt across releases): the latest-per-url fold must
    // aggregate the url-bucketed scan in place — no Window, no index-side
    // Exchange; the only shuffle is the frontier aligning to the bucketing
    assert(!p.contains("Window"),
      s"latest validators must come from an aggregate, not a window:\n$p")
    assert(p.contains("Bucketed: true"),
      s"the state side must be the bucketed scan:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange")) == 1,
      s"exactly one Exchange — the frontier probe aligning to the index's " +
        s"bucketing; the index side must fold in place:\n$p")
  }

  test("sitemap refetch plan: lastmod arbitration joins once, never a window") {
    import graft.operators.Frontier
    val entries = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"),
        col("doc_id").as("lastmod"))
    val state = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"),
        concat(lit("e"), col("doc_id")).as("etag"),
        concat(lit("lm"), col("doc_id")).as("last_modified"),
        col("doc_id").as("fetch_time"))
    val p = physical(Frontier.sitemapRefetchPlan(entries, state))
    assert(!p.contains("Window"),
      s"latest state must fold as an aggregate:\n$p")
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) <= 2,
      s"one url-keyed shuffle per side, no more:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("revisit fold over the bucketed CDX table: index side never re-shuffles") {
    import graft.sources.Warc
    import graft.operators.Bucketing
    val dir = java.nio.file.Files.createTempDirectory("revisit_pin").toString
    Bucketing.scratchDb(spark, "revisit_pin", dir)
    val caps = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("test,graft)/doc/"), col("doc_id")).as("surt"),
        concat(lit("https://graft.test/doc/"), col("doc_id")).as("target_uri"),
        lit("response").as("rec_type"),
        sha2(col("text").cast("binary"), 256).as("digest"),
        col("n_chars").cast("long").as("content_length"),
        lit("a.warc").as("warc_file"), col("doc_id").as("rec_offset"),
        col("doc_id").as("stored_offset"), lit(100L).as("stored_length"))
    Bucketing.writeBucketed(caps, "revisit_pin.cdx", "surt", 4)
    val p = physical(
      Warc.revisitCaptures(caps, spark.table("revisit_pin.cdx")))
    // the per-(surt,digest) pre-aggregate's clustering is satisfied by
    // the table's surt bucketing (equal (surt,digest) ⇒ equal surt ⇒
    // one bucket), so the prior side plans with ZERO Exchange — at
    // 100 TB only the new crawl's rows ever move
    val aggSide = p.linesIterator.dropWhile(!_.contains("min(struct"))
      .takeWhile(!_.contains("FileScan")).mkString("\n")
    assert(!aggSide.contains("Exchange hashpartitioning"),
      s"the bucketed prior side must not re-shuffle:\n$p")
    assert(p.contains("Bucketed: true"), s"prior scan must stay bucketed:\n$p")
  }

  test("canonical dedup: one min_by fold, never a window over the URL group") {
    import graft.functions.UrlOps
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("https://graft.test/doc/"), col("doc_id")).as("url"),
        when(col("doc_id") % 3 =!= 0,
          concat(lit("https://graft.test/doc/"),
            col("doc_id") - pmod(col("doc_id"), lit(3)))).as("canonical"))
    val p = physical(UrlOps.canonicalDedup(df, "doc_id", "url", "canonical"))
    assert(!p.contains("Window"),
      s"the keep rule must be the min_by aggregate:\n$p")
    assert(p.contains("partial_min_by") || p.contains("partial_minby") ||
      p.contains("min_by"),
      s"map-side partial keep per canonical key:\n$p")
  }

  test("mm interleave: extraction map-side, only image SLOTS join the sidecar") {
    import graft.operators.Multimodal
    val pages = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        concat(lit("<p>a <img src=\"i"), col("doc_id"),
          lit("\"> b</p>")).as("html"))
    val images = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), concat(lit("i"), col("doc_id")).as("src"),
        col("text").cast("binary").as("payload"))
    val p = physical(Multimodal.interleave(pages, "doc_id", "html",
      images, "doc_id", "src", "payload"))
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // the sidecar side pre-aggregates the presence FLAG (retry dedup)
    // before the join — payload bytes reduce to max(__has) and never
    // ride the join build side
    assert(p.contains("max(__has") || p.contains("partial_max(__has"),
      s"the sidecar must fold to a presence flag before joining:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
  }

  test("revisit fold: prior side pre-aggregates per (surt,digest) before the join") {
    import graft.sources.Warc
    def caps(off: Long) = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("test,graft)/doc/"), col("doc_id")).as("surt"),
        concat(lit("https://graft.test/doc/"), col("doc_id")).as("target_uri"),
        lit("response").as("rec_type"),
        sha2(col("text").cast("binary"), 256).as("digest"),
        col("n_chars").cast("long").as("content_length"),
        lit("a.warc").as("warc_file"), col("doc_id").as("rec_offset"),
        (col("doc_id") + off).as("stored_offset"), lit(100L).as("stored_length"))
    val p = physical(Warc.revisitCaptures(caps(1000L), caps(0L)))
    // duplicate prior captures of one payload collapse to ONE (key, ref)
    // row before the join — only references shuffle, never capture rows,
    // and the earliest-original pick is a combinable min, not a window
    assert(!p.contains("Window"),
      s"the earliest-original pick must be an aggregate:\n$p")
    // struct-min plans as SortAggregate — what matters is the PARTIAL
    // phase (map-side combine before any exchange)
    assert(p.contains("partial_min"),
      s"the prior side must pre-aggregate map-side per key:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("FIM transform: one map-side projection — no shuffle, no join, no window") {
    import graft.operators.Fim
    val p = physical(Fim.transform(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 40))
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("Window"),
      s"FIM must be a free rider on the scan:\n$p")
  }

  test("retrieval metrics: label side bounded-aggregates and broadcasts; " +
    "no window anywhere") {
    import graft.operators.Relevance
    val ranked = spark.read.parquet(s"$sf/documents.parquet")
      .select(lit("q").as("query"), col("doc_id").as("id"),
        (col("doc_id") % 10 + 1).as("rank"))
    val labels = spark.read.parquet(s"$sf/documents.parquet")
      .select(lit("q").as("query"), col("doc_id").as("id"),
        (col("doc_id") % 4).as("grade"))
    val p = physical(
      Relevance.retrievalMetrics(ranked, labels, "query", "id", 10))
    // a qrels table is small, but the plan must never assume it: the k
    // best grades come from the bounded top-k aggregate, not a per-query
    // sort or window, and the two ≤|Q|-row sides meet in a broadcast
    assert(!p.contains("Window"), s"no window over the label group:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the two per-query aggregates must broadcast-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("compression ratio: stays inside whole-stage codegen on the scan") {
    import graft.functions.QualityOps
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), QualityOps.compressionRatio(col("text")).as("r"))
    val p = physical(df)
    assert(!p.contains("Exchange"), s"map-side only:\n$p")
    // the deflate expression must not knock the projection out of codegen
    assert(p.linesIterator.next().contains("WholeStageCodegen") ||
      p.contains("*(1)"), s"projection must stay codegen'd:\n$p")
  }

  test("edit-confirm: text ships only via the shortlist semi-join, " +
    "Levenshtein stays codegen'd") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(Dedup.editConfirmPairs(docs, "doc_id", "text", 0.8))
    // the corpus must be pruned to ids appearing in some candidate pair
    // BEFORE the wide text join — O(L^2) verification only on the shortlist
    assert(p.contains("LeftSemi"),
      s"corpus must semi-join the shortlist ids before text joins:\n$p")
    assert(p.contains("levenshtein"),
      s"the verifier must be the native levenshtein expression:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("host-template strip: hot set broadcasts into the anti-join, " +
    "no window over the line partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
    val p = physical(
      Dedup.hostTemplateStrip(docs, "doc_id", "text", "source", 3))
    // a nav line on millions of pages of one host must not funnel a
    // window task; the template vocabulary is tiny and broadcasts
    assert(!p.contains("Window"),
      s"template detection must not window over (host, digest):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the hot set must broadcast into the anti-join:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("host mirrors: per-host sizes broadcast back; digest self-join is " +
    "keyed on the digest at scale") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // kill the size-based broadcast so the plan is the 100 TB one: at
    // scale the digest relation exceeds any broadcast threshold and the
    // self-join must be an EQUI-join on the digest (exchange reuse of the
    // hotness guard's digest partitioning lands at runtime via AQE); the
    // hinted size broadcasts survive the -1 threshold — hints override it
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = physical(Dedup.hostMirrorPairs(docs, "source", "text", 0.5))
      assert(p.contains("BroadcastHashJoin"),
        s"host-cardinality sizes must broadcast onto the pair stream:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"digest self-join must be keyed, never broadcast at scale:\n$p")
      assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("preference pairs: one combinable aggregate, never a window") {
    import graft.operators.Preference
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(
      Preference.pairs(docs, "source", "doc_id", "n_chars", "doc_id", 50))
    // a prompt group with millions of sampled responses must ship one
    // candidate per mapper (max_by/min_by partials), not funnel a window
    assert(!p.contains("Window"), s"no window over the prompt group:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"selection must be an aggregate:\n$p")
    assert(!p.contains("Join"), s"no join at all:\n$p")
  }

  test("winnow contamination: eval fingerprints broadcast, no window") {
    import graft.operators.Contamination
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(Contamination.winnowMatches(
      docs, docs.where(col("doc_id") < 10), "doc_id", "text"))
    // the train side ships (id, fp) only; the benchmark side broadcasts
    assert(p.contains("BroadcastHashJoin"),
      s"eval fingerprints must broadcast onto the train stream:\n$p")
    assert(!p.contains("Window"), s"no window anywhere:\n$p")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
  }

  test("mojibake repair: stays inside whole-stage codegen on the scan") {
    import graft.functions.QualityOps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(docs.select(col("doc_id"),
      QualityOps.mojibakeRepair(col("text")).as("r")))
    assert(!p.contains("Exchange"), s"map-side only:\n$p")
    assert(p.linesIterator.next().contains("WholeStageCodegen") ||
      p.contains("*(1)"), s"projection must stay codegen'd:\n$p")
  }

  test("luhn validation: candidate extraction + checksum stay map-side") {
    import graft.functions.QualityOps
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(docs.select(col("doc_id"),
      QualityOps.creditCardCandidates(col("text")).as("c")))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"PII extraction must be a free rider on the scan:\n$p")
  }

  test("mean pooling: combinable (key, pos) aggregate, no window") {
    import graft.operators.Pooling
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = physical(
      Pooling.meanPool(emb, col("vec_id") % 100, col("embedding")))
    // per-key state is dim longs via map-side partials — a key with
    // millions of chunks must not funnel a window or collect raw vectors
    assert(!p.contains("Window"), s"no window over the key partition:\n$p")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"),
      s"the element sums must be combinable aggregates:\n$p")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"no join anywhere:\n$p")
  }

  test("grid spatial join: cell equi-join, no cartesian, no pair distinct") {
    import graft.operators.GeoIndex
    val geoms = spark.read.parquet(s"$sf/orders.parquet")
      .where(col("o_orderkey") < 4000)
      .select(col("o_orderkey").as("id"),
        format_string("SRID=4167;POINT(%.6f %.6f)",
          (col("o_orderkey") % 360).cast("double") / 4.0,
          (col("o_orderkey") % 170).cast("double") / 2.0).as("g"))
    val pairs = GeoIndex.selfEnvelopeJoin(geoms, "id", "g", cellSize = 4.0)
    val p = physical(pairs)
    // the grid arm is an EQUI-join on the cell — a SortMergeJoin or
    // broadcast hash join, never a cartesian/BNL over the pair space
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin")
      || p.contains("ShuffledHashJoin"),
      s"grid arm must be an equi-join on the cell:\n$p")
    // the reference-point rule replaces a distinct over the pair stream:
    // the only aggregates allowed are none on (a_id, b_id)
    assert(!p.contains("HashAggregate(keys=[a_id"),
      s"pair dedup must be the reference-point rule, not a distinct:\n$p")
    // oversize arms broadcast the bounded side
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"oversize arm joins by bounded broadcast:\n$p")
  }

  test("chat format: pure map-side projection, no shuffle") {
    import graft.operators.Preference
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = physical(Preference.chatFormat(docs, "doc_id",
      lit("sys"), lit("ask"), col("text"), 60))
    assert(!p.contains("Exchange") && !p.contains("Join") &&
      !p.contains("Window"),
      s"chat assembly must be a free rider on the scan:\n$p")
  }
}
