package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Maintained AT-REST dedup indexes — the operator API behind the 100 TB
 * posture every incremental dedup operator documents ("the corpus side is
 * the persisted index of prior ingests, not a rescan of prior text").
 *
 * [[Dedup.incremental]] / [[Dedup.incrementalNearDup]] /
 * [[Dedup.incrementalSemDedup]] take the corpus as raw text/vector source
 * and recompute its signatures per call — correct, but a real ingest loop
 * pays a full corpus re-signature per batch. Here the corpus signatures
 * are computed ONCE, persisted as bucketed tables
 * ([[Bucketing.writeBucketed]]), and every subsequent ingest probes the
 * index in place:
 *
 *  - the index-side scan is bucketed on the probe key, so the equi-join
 *    plans with ZERO Exchange on the corpus side (pinned by
 *    `PlanAuditSpec`) — only the batch (the small side, per ingest)
 *    shuffles, and only to align to the index's bucketing;
 *  - after a batch commits, [[appendDigestIndex]] (and its band/cluster
 *    analogues via re-running the writer over survivors) folds the kept
 *    rows' signatures into the index for the next ingest — signature
 *    computation is paid once per document lifetime, at its own ingest.
 *
 * Each indexed probe is pinned (oracle `dedup_index_roundtrip` /
 * `dedup_band_index_roundtrip`) to return EXACTLY its rescan operator's
 * result: the index stores the same digests/bands/clusters the rescan
 * computes, so the only degrees of freedom are the at-rest layout.
 *
 * Reference analogue: the watermark/stats machinery persists exactly this
 * kind of between-runs state (`sql/02-bde_control_functions.sql.in:975-1071`
 * — per-table `last_upload_dataset` consulted by the next run instead of
 * re-scanning prior uploads).
 */
object DedupIndex {

  /** sha2-256 digest of `keyCol` — THE key of the exact-dedup index; hex
    * string, identical to what [[Dedup.incremental]] computes per call. */
  private def digest(keyCol: String) =
    sha2(col(keyCol).cast("binary"), 256)

  // =====================================================================
  // Exact (digest) index
  // =====================================================================

  /** Build the digest index rows for `corpus`: one (kh, id) per row. */
  private[graft] def digestRows(
      corpus: DataFrame, idCol: String, keyCol: String): DataFrame =
    corpus.select(digest(keyCol).as("kh"), col(idCol).cast("long").as("id"))

  /**
   * Persist `corpus`'s content digests as a bucketed managed table keyed
   * on `kh` — the maintained exact-dedup index. One corpus scan, one
   * bucketed write; every later [[incrementalIndexed]] probe scans it in
   * place with no Exchange.
   */
  def writeDigestIndex(
      corpus: DataFrame,
      idCol: String,
      keyCol: String,
      table: String,
      buckets: Int): Unit =
    Bucketing.writeBucketed(digestRows(corpus, idCol, keyCol), table, "kh", buckets)

  /**
   * Fold a committed batch's digests INTO the index (append; the table's
   * bucketing spec is preserved, so new files land in the same fixed
   * bucket layout and probes stay Exchange-free). Call with the SURVIVORS
   * of the batch's own dedup — each document's digest is computed exactly
   * once, at its own ingest.
   */
  def appendDigestIndex(
      batch: DataFrame, idCol: String, keyCol: String, table: String): Unit =
    appendBucketed(digestRows(batch, idCol, keyCol), table)

  /** Append rows into a bucketed index table: the append must RESTATE the
    * table's bucketing (Spark refuses an unbucketed append into a bucketed
    * table) — read from the catalog so new files land in the same fixed
    * bucket layout and probes stay Exchange-free. */
  private[graft] def appendBucketed(rows: DataFrame, table: String): Unit = {
    val spark = rows.sparkSession
    val spec = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec
      .getOrElse(sys.error(s"$table is not a bucketed index table"))
    // repartition by the bucket key first: a delta append otherwise lands
    // one file per (task × touched bucket) — see Bucketing.writeBucketed
    // for the multiple-of-buckets sizing (one bucket per write task at
    // ~full parallelism)
    val p = spark.sessionState.conf.numShufflePartitions
    val n = spec.numBuckets * math.max(1, p / spec.numBuckets)
    rows.repartition(n, col(spec.bucketColumnNames.head))
      .write.mode("append").format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head)
      .sortBy(spec.sortColumnNames.head)
      .saveAsTable(table)
  }

  /**
   * [[Dedup.incremental]] against the PERSISTED digest index: of `batch`,
   * keep rows whose content digest appears neither in the index (anti-join
   * probing the bucketed table in place) nor on an earlier (lowest-id)
   * batch row. Result ≡ `Dedup.incremental(batch, corpus, …)` whenever
   * `table` was written from `corpus` — pinned by the oracle.
   */
  def incrementalIndexed(
      batch: DataFrame,
      spark: SparkSession,
      table: String,
      idCol: String,
      keyCol: String): DataFrame = {
    val deduped = batch.withColumn("__kh", digest(keyCol))
      .join(Retract.readLive(spark, table).select(col("kh").as("__kh")),
        Seq("__kh"), "left_anti")
    deduped.groupBy(col("__kh"))
      .agg(min_by(struct(batch.columns.map(col): _*), col(idCol)).as("__row"))
      .select(col("__row.*"))
  }

  // =====================================================================
  // Near-dup (band + shingle) index
  // =====================================================================

  /** Batch/corpus side of the band index: (id, bb) per non-null band
    * bucket, (band, bucket) folded into one 64-bit key at build time — a
    * fold collision can only ADD a candidate, which exact-Jaccard
    * verification kills. */
  private[graft] def bandRows(sig: DataFrame): DataFrame =
    Dedup.banded(sig, "id", Nil)
      .where(col("bucket").isNotNull)
      .select(col("id"), xxhash64(col("band"), col("bucket")).as("bb"))

  /**
   * Persist `corpus`'s MinHash band index AND shingle verify table:
   *
   *  - `<table>_bands` (id, bb) bucketed on `bb` — candidate generation
   *    is the probe batch's bands equi-joining this table in place;
   *  - `<table>_shingles` (id, shingles) bucketed on `id` — exact-Jaccard
   *    verification joins candidate ids back to their shingle sets, again
   *    scanning in place.
   *
   * Signatures are computed once, here; [[incrementalNearDupIndexed]]
   * never touches corpus text again.
   */
  def writeBandIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      buckets: Int): Unit = {
    val sig = Dedup.withSignature(
        corpus.select(col(idCol).as("id"), col(textCol)), "id", textCol)
      .cache()
    Bucketing.writeBucketed(bandRows(sig), s"${table}_bands", "bb", buckets)
    Bucketing.writeBucketed(
      sig.select(col("id"), col("shingles")), s"${table}_shingles", "id", buckets)
    sig.unpersist()
  }

  /**
   * [[Dedup.incrementalNearDup]] against the PERSISTED band index: keep
   * batch documents that are near-duplicates of nothing — neither of an
   * indexed corpus document (shared band bucket + verified exact Jaccard
   * ≥ `minJaccard`) nor of a lower-id batch document. The corpus side is
   * `<table>_bands` / `<table>_shingles` — its text is never re-read, its
   * signatures never recomputed; both index scans are bucketed on their
   * join keys so only batch-derived rows shuffle.
   */
  def incrementalNearDupIndexed(
      batch: DataFrame,
      spark: SparkSession,
      table: String,
      idCol: String,
      textCol: String,
      minJaccard: Double): DataFrame = {
    val bSig = Dedup.withSignature(
        batch.select(col(idCol).as("id"), col(textCol)), "id", textCol)
      .cache()
    val probe = bandRows(bSig).select(col("id").as("bid"), col("bb"))
    val candidates = Retract.readLive(spark, s"${table}_bands")
      .select(col("id").as("cid"), col("bb"))
      .join(probe, Seq("bb"))
      .select(col("bid"), col("cid")).dropDuplicates("bid", "cid")
    val corpusHits = candidates
      .join(bSig.select(col("id").as("bid"), col("shingles").as("bsh")), Seq("bid"))
      .join(Retract.readLive(spark, s"${table}_shingles")
        .select(col("id").as("cid"), col("shingles").as("csh")), Seq("cid"))
      .where(TextOps.jaccard(col("bsh"), col("csh")) >= minJaccard)
      .select(col("bid").as(idCol)).distinct()
    // within-batch pairs from the SAME cached signatures — the batch is
    // tokenized/minhashed exactly once per ingest (a second
    // minHashLshPairs pass over the batch text was the one redundancy
    // left in this probe). Identical texts pair through their shared
    // buckets at Jaccard 1.0, short docs' null buckets join nothing —
    // the pinned minHashLshPairs semantics (the collapse there is a
    // perf shape for boilerplate-heavy FULL corpora; an ingest batch is
    // the small side)
    // probe rows carry no null bb by construction (bandRows drops null
    // buckets before folding), so both arms join it directly
    val withinPairs = probe.as("l")
      .join(probe.as("r"),
        col("l.bb") === col("r.bb") && col("l.bid") < col("r.bid"))
      .select(col("l.bid").as("id_a"), col("r.bid").as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(bSig.select(col("id").as("id_a"), col("shingles").as("ash")), Seq("id_a"))
      .join(bSig.select(col("id").as("id_b"), col("shingles").as("bsh2")), Seq("id_b"))
      .where(TextOps.jaccard(col("ash"), col("bsh2")) >= minJaccard)
      .select(col("id_a"), col("id_b"))
    val result = Dedup.minHashKeepFromPairs(batch, idCol, withinPairs)
      .join(corpusHits, Seq(idCol), "left_anti")
    CacheScope.unpersistAfterAction(result, Seq(bSig))
  }

  /** Fold a committed batch's signatures INTO the band index (bands +
    * shingle verify table, both appended in their bucket layouts). Call
    * with the SURVIVORS of the batch's own dedup. */
  def appendBandIndex(
      batch: DataFrame, idCol: String, textCol: String, table: String): Unit = {
    val sig = Dedup.withSignature(
        batch.select(col(idCol).as("id"), col(textCol)), "id", textCol)
      .cache()
    appendBucketed(bandRows(sig), s"${table}_bands")
    appendBucketed(sig.select(col("id"), col("shingles")), s"${table}_shingles")
    sig.unpersist()
  }

  // =====================================================================
  // Semantic (cluster) index
  // =====================================================================

  /**
   * Persist `corpus`'s SemDeDup cluster index:
   *
   *  - `<table>_cells` (cid, cv, cluster) bucketed on `cluster` — the
   *    corpus's inverted file, member vectors co-located by cell;
   *  - `<table>_seeds` (cluster, seed) — the nlist partitioner centroids
   *    (the corpus's `nlist` lowest-id vectors, exactly
   *    [[Dedup.incrementalSemDedup]]'s seeds), persisted so every later
   *    batch assigns against the SAME partition of vector space.
   *
   * Retraction caveat ([[Retract]] lifecycle): retracting a vector by
   * `cid` removes its CELLS rows, but if that vector also serves as a
   * SEED its embedding persists in `<table>_seeds` as a partitioner
   * centroid. A seed is space geometry, not corpus content — but a
   * takedown that must erase the embedding BYTES themselves requires a
   * seed re-election (rebuild via [[writeClusterIndex]] over the
   * retained corpus), stated here rather than silently half-done.
   */
  def writeClusterIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      table: String,
      nlist: Int,
      buckets: Int): Unit = {
    val seeds = Similarity.collectSeeds(corpus, idCol, vecCol, nlist)
    Bucketing.writeBucketed(
      Similarity.assignClusters(corpus, idCol, vecCol, seeds),
      s"${table}_cells", "cluster", buckets)
    val spark = corpus.sparkSession
    import spark.implicits._
    Bucketing.writeBucketed(
      seeds.toSeq.toDF("cluster", "seed"), s"${table}_seeds", "cluster", 1)
  }

  /**
   * [[Dedup.incrementalSemDedup]] against the PERSISTED cluster index:
   * keep batch vectors that are semantic duplicates of nothing — neither
   * of an indexed corpus vector (same cell, cosine ≥ `minCosine`) nor of
   * a lower-id batch vector. Seeds load from `<table>_seeds` (an
   * nlist-row collect), the batch assigns map-side against those
   * literals, and the batch-corpus candidate join equi-joins the bucketed
   * `<table>_cells` in place — per batch vector ~1/nlist of the corpus,
   * with zero corpus-side Exchange.
   */
  /** The persisted partitioner centroids, loaded for probe/append use —
    * an nlist-row collect. */
  private def loadSeeds(
      spark: SparkSession, table: String): Array[(Long, Array[Float])] =
    spark.table(s"${table}_seeds")
      .orderBy(col("cluster")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** Fold a committed batch's cluster assignments INTO the cells table —
    * assigned against the PERSISTED seeds, so the index keeps one
    * consistent partition of vector space across every ingest. */
  def appendClusterIndex(
      batch: DataFrame, idCol: String, vecCol: String, table: String): Unit = {
    val seeds = loadSeeds(batch.sparkSession, table)
    appendBucketed(
      Similarity.assignClusters(batch, idCol, vecCol, seeds), s"${table}_cells")
  }

  def incrementalSemDedupIndexed(
      batch: DataFrame,
      spark: SparkSession,
      table: String,
      idCol: String,
      vecCol: String,
      minCosine: Double): DataFrame = {
    val seeds = loadSeeds(spark, table)
    val bAssigned = Similarity.assignClusters(batch, idCol, vecCol, seeds)
    val corpusHits = bAssigned.as("b")
      .join(Retract.readLive(spark, s"${table}_cells").as("c"),
        col("b.cluster") === col("c.cluster"))
      .where(graft.functions.VectorOps.cosine(col("b.cv"), col("c.cv"))
        >= minCosine)
      .select(col("b.cid").as("__drop"))
    val withinHits = bAssigned.as("a")
      .join(bAssigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.cid") < col("b.cid"))
      .where(graft.functions.VectorOps.cosine(col("a.cv"), col("b.cv"))
        >= minCosine)
      .select(col("b.cid").as("__drop"))
    val drops = corpusHits.unionByName(withinHits).distinct()
    batch.join(drops, col(idCol).cast("long") === col("__drop"), "left_anti")
  }

  // =====================================================================
  // Duplicate-components label index
  // =====================================================================

  /**
   * Persist the corpus's duplicate-component labeling (id → canonical
   * min-id component, [[Dedup.connectedComponents]] output) as a
   * bucketed managed table — the at-rest answer to "which documents
   * duplicate which" that survivor election and removal lists read
   * WITHOUT re-running label propagation. Bucketed on the COMPONENT
   * label: the heavy consumers group by component (keep-first folds,
   * cluster-size profiles), so those folds plan with zero index-side
   * Exchange; the by-id lookup is a probe the layout doesn't hurt.
   */
  def writeComponentIndex(
      labels: DataFrame, table: String,
      idCol: String = "doc_id", labelCol: String = "component",
      buckets: Int = 16): Unit =
    Bucketing.writeBucketed(
      labels.select(col(idCol), col(labelCol)), table, labelCol, buckets)

  /**
   * Release-over-release label maintenance: fold THIS release's new
   * duplicate pairs (its LSH/digest join output) into the persisted
   * labels without re-reading any prior release's pair log —
   * [[Dedup.componentsMerge]]'s star-edge argument applied at rest.
   *
   * The propagation frame is DELTA-BOUND: only components containing a
   * new-pair member enter the merge loop (a merge only ever UNIONS
   * components, so a component disjoint from every new pair cannot
   * change its label — those rows copy through outside the loop). Per
   * merge the cost is: one id-keyed shuffle of the label table to find
   * touched components (the labels are bucketed on component, not id —
   * stated trade: the consumers' folds stay exchange-free every read,
   * the maintenance pays one shuffle per release), the propagation
   * rounds over the delta subgraph only, and one full-table rewrite
   * committed with the [[Bucketing.replaceBucketed]] rename-aside swap
   * (crash at any point leaves a readable incarnation). The label
   * table is 2 longs/doc — the rewrite is the cheap linear pass; the
   * pair log (the expensive artifact) is never re-scanned.
   */
  /**
   * Takedown for the component index: tombstone the retracted ids'
   * label rows ([[Retract]] lifecycle), and at [[purgeComponentIndex]]
   * time RE-CANONICALIZE — the canonical label is the component's min
   * member id, so retracting that member must re-elect the label from
   * the survivors (a groupBy on the bucketing column: zero Exchange).
   *
   * Stated semantics, deliberately CONSERVATIVE: retraction never
   * SPLITS a component. If the retracted document was the only bridge
   * between two duplicate clusters, the survivors stay co-labeled —
   * the pair evidence lives in each release's LSH join, which the
   * at-rest labels summarize precisely so it never needs re-scanning
   * ([[mergeComponentIndex]]'s contract). For dedup this errs in the
   * safe direction: an over-grouped component can only drop MORE
   * near-duplicates, never re-admit one. A rebuild from re-derived
   * pairs (the full [[Dedup.connectedComponents]] pass) is the exact
   * path when splits matter.
   */
  def retractComponentIndex(
      spark: SparkSession, table: String, ids: DataFrame): Unit = {
    val idCol = spark.table(table).schema.fieldNames.head
    Retract.retract(spark, table, idCol, ids)
  }

  /** Physical purge + label re-canonicalization for the component
    * index (see [[retractComponentIndex]]); crash-atomic via the
    * rename-aside swap like every whole-table rewrite here. */
  def purgeComponentIndex(spark: SparkSession, table: String): Unit =
    purgeComponentIndex(spark, table, () => ())

  private[graft] def purgeComponentIndex(
      spark: SparkSession, table: String, midSwapFault: () => Unit): Unit = {
    val Seq(idCol, labelCol) = spark.table(table).schema.fieldNames.toSeq
    Retract.purge(spark, table, df => {
      val relabel = df.groupBy(col(labelCol))
        .agg(min(col(idCol)).as("__newlab"))
      df.join(relabel, Seq(labelCol))
        .select(col(idCol), col("__newlab").as(labelCol))
    }, midSwapFault)
  }

  def mergeComponentIndex(
      spark: SparkSession, table: String, newPairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b"): Unit =
    mergeComponentIndex(spark, table, newPairs, aCol, bCol, () => ())

  private[graft] def mergeComponentIndex(
      spark: SparkSession, table: String, newPairs: DataFrame,
      aCol: String, bCol: String, midSwapFault: () => Unit): Unit = {
    // self-heal a crashed prior swap BEFORE resolving the table name —
    // after a death between the swap's renames only `<table>__old`
    // exists, and the maintenance entry point must be re-runnable
    // (the compactBucketed discipline)
    Bucketing.recoverCompaction(spark, table)
    // one materialized read of the (compact — 2 longs/doc) label table:
    // it feeds the touched/affected/untouched splits AND the star frame,
    // and the rewrite must not re-derive them from repeated table scans
    val prior = spark.table(table).persist()
    try {
      val Seq(idCol, labelCol) = prior.schema.fieldNames.toSeq
      val np = newPairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
        .localCheckpoint()
      val newIds = np.select(col("id_a").as(idCol))
        .unionByName(np.select(col("id_b").as(idCol))).distinct()
      val touched = prior.join(newIds, Seq(idCol), "left_semi")
        .select(col(labelCol)).distinct()
        .localCheckpoint() // delta-sized; read by the semi AND anti join
      val affected = prior.join(touched, Seq(labelCol), "left_semi")
        .select(col(idCol), col(labelCol))
      val untouched = prior.join(touched, Seq(labelCol), "left_anti")
        .select(col(idCol), col(labelCol))
      val merged = Dedup.componentsMerge(affected, idCol, labelCol, np)
        .withColumnRenamed("component", labelCol)
        .select(col(idCol), col(labelCol))
      Bucketing.replaceBucketed(spark, table,
        untouched.unionByName(merged), midSwapFault)
    } finally prior.unpersist()
  }
}
