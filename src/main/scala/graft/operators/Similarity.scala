package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Two tiers, as a 100 TB design demands:
 *  - [[bruteForceTopK]]: exact cosine top-k for a BROADCAST-SIZED query set.
 *    The query side is broadcast and scored map-side against one corpus
 *    scan; the top-k is a partial AGGREGATION (bounded k-buffer merged
 *    map-side first), so only k rows per (query, partition) ever cross the
 *    shuffle — never the N×Q scored set.
 *  - [[lshNeighborPairs]]: multi-table random-hyperplane (SRP) LSH;
 *    candidate pairs meet only inside a (table, bucket) join key, so the
 *    pair count is bucket-bounded rather than quadratic, and recall is
 *    tuned by adding tables rather than widening buckets.
 */
/** Bounded top-k buffer (public top-level so encoder codegen can construct it). */
final case class TopKBuf(items: Seq[(Double, Long)])

object Similarity {

  /** Bounded top-k ordered by (score desc, id asc). An Aggregator so Spark
    * plans partial aggregation: each map task reduces its partition to ≤ k
    * entries per group BEFORE the shuffle. */
  private final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, TopKBuf] {
    private val ord = Ordering.by[(Double, Long), (Double, Long)] {
      case (score, id) => (-score, id)
    }
    def zero: TopKBuf = TopKBuf(Vector.empty)
    def reduce(buf: TopKBuf, x: (Double, Long)): TopKBuf =
      TopKBuf((buf.items :+ x).sorted(ord).take(k))
    def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.items ++ b.items).sorted(ord).take(k))
    def finish(buf: TopKBuf): TopKBuf = buf
    def bufferEncoder = org.apache.spark.sql.Encoders.product[TopKBuf]
    def outputEncoder = org.apache.spark.sql.Encoders.product[TopKBuf]
  }

  /** The bounded top-k as a reusable column aggregator — (score desc, id
    * asc), ≤ k entries of state per group per map task. The skew-safe
    * alternative to a row_number window wherever "top N per group" must
    * survive a group holding half the corpus: a window partition can never
    * be split, while this combines map-side to k rows per task. */
  def topKUdaf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new TopKAgg(k))

  /**
   * Exact cosine top-k: for every query vector, the k most similar corpus
   * vectors (excluding itself), ranked by (similarity desc, corpus id asc)
   * for a total deterministic order.
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        VectorOps.cosine(col("qvec"), col("cvec")).as("cosine"))
    val topk = udaf(new TopKAgg(k))
    scored
      .groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("neighbor_id")).as("topk"))
      .select(col("query_id"), explode(col("topk.items")).as("nb"))
      .select(
        col("query_id"),
        col("nb._2").as("neighbor_id"),
        col("nb._1").as("cosine"))
  }

  /** The deterministic seed centroids: the `nlist` LOWEST-id corpus vectors.
    * Driver-bounded (nlist rows) — collecting them IS the broadcast, and
    * baking them in as literals makes cluster assignment a MAP-SIDE pass:
    * nlist native-cosine evals per row against constant vectors, zero
    * shuffle. (A trained-k-means variant would swap better centroids in
    * here; the relational shape is identical.) */
  private[operators] def collectSeeds(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nlist: Int): Array[(Long, Array[Float])] =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).cast("long"), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /** The `n` nearest seed centroids of `vec` as (cosine, -centroid_id)
    * structs: ascending struct order + reverse = cosine DESC with ties on
    * the LOWEST centroid id — a total order. */
  private[operators] def nearest(
      seedRows: Array[(Long, Array[Float])], vec: Column, n: Int): Column = {
    val seedStructs = seedRows.toIndexedSeq.map { case (cid, cvec) =>
      struct(VectorOps.cosine(vec, typedLit(cvec)).as("c"),
        lit(-cid).as("nid"))
    }
    slice(reverse(array_sort(array(seedStructs: _*))), 1, n)
  }

  /** (cid, cv, cluster): every corpus vector labelled with its nearest seed
    * centroid — the map-side inverted-file assignment shared by [[ivfTopK]]
    * and [[Dedup.semDedup]]. */
  private[operators] def assignClusters(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      seedRows: Array[(Long, Array[Float])]): DataFrame =
    corpus.select(
      col(idCol).cast("long").as("cid"), col(vecCol).as("cv"),
      (-nearest(seedRows, col(vecCol), 1).getItem(0).getField("nid"))
        .as("cluster"))

  /**
   * IVF-style cluster-pruned top-k: the inverted-file ANN shape. The corpus
   * partitions into `nlist` lists by nearest seed centroid; a query probes
   * only its `nprobe` nearest lists and runs exact cosine top-k within
   * those candidates — per query, `~nprobe/nlist` of the corpus is scanned
   * instead of all of it.
   *
   * Centroids are DETERMINISTIC seeds (the `nlist` lowest-id corpus
   * vectors) rather than trained k-means: the partitioner quality is lower,
   * but every step is a reproducible relational plan (the DuckDB oracle
   * verifies it end-to-end, which trained centroids with RNG could not).
   *
   * Scale: seeds broadcast (nlist rows); assignment is one map-side pass
   * over the corpus (nlist native-cosine evals per row, no shuffle); at
   * rest the assigned corpus would be WRITTEN partitioned by `cluster` so
   * a probe prunes to nprobe partitions — the candidate join here shuffles
   * by cluster id, the moral equivalent. Ranking reuses the bounded
   * [[bruteForceTopK]] top-k aggregation, so only k rows per
   * (query, partition) cross the final shuffle.
   */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int,
      nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= nlist, "need 1 <= nprobe <= nlist")
    val seedRows = collectSeeds(corpus, idCol, vecCol, nlist)
    val assigned = assignClusters(corpus, idCol, vecCol, seedRows)
    val probes = queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"),
      explode(nearest(seedRows, col(vecCol), nprobe)).as("pr"))
      .select(col("query_id"), col("qvec"), (-col("pr.nid")).as("cluster"))
    // candidates co-locate on the cluster id — the only shuffles in the
    // plan are this join and the bounded top-k aggregation; at rest the
    // assigned corpus would be written partitioned by `cluster`, making
    // the probe a partition-pruned scan
    val scored = probes.join(assigned, Seq("cluster"))
      .where(col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        VectorOps.cosine(col("qvec"), col("cv")).as("cosine"))
    val topk = udaf(new TopKAgg(k))
    scored.groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("neighbor_id")).as("topk"))
      .select(col("query_id"), explode(col("topk.items")).as("nb"))
      .select(col("query_id"), col("nb._2").as("neighbor_id"),
        col("nb._1").as("cosine"))
  }

  /**
   * Persist the corpus's IVF inverted file AT REST: the assigned corpus
   * written `partitionBy(cluster)` (one directory per cell —
   * [[Bucketing.writePartitioned]]) plus the seed centroids beside it, so
   * every later [[ivfTopKIndexed]] probe is a PARTITION-PRUNED scan of
   * exactly its probed cells. This is the written form of the posture
   * [[ivfTopK]] documents ("at rest the assigned corpus would be written
   * partitioned by cluster") — assignment is computed once per corpus
   * lifetime, and a probe reads ~nprobe/nlist of the data from disk, not
   * just post-scan.
   */
  def writeIvfIndex(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int): Unit = {
    val seeds = collectSeeds(corpus, idCol, vecCol, nlist)
    Bucketing.writePartitioned(
      assignClusters(corpus, idCol, vecCol, seeds), path, "cluster")
    val spark = corpus.sparkSession
    import spark.implicits._
    seeds.toSeq.toDF("cluster", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.seeds")
  }

  /** The persisted seed centroids of an at-rest inverted file — an
    * nlist-row collect shared by every probe/append entry point. */
  private def loadIvfSeeds(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Array[(Long, Array[Float])] =
    spark.read.parquet(s"$path.seeds")
      .orderBy(col("cluster")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))

  /**
   * Fold a committed batch INTO the persisted inverted file: vectors
   * assign against the index's OWN persisted seeds map-side and append
   * into their cell directories — the FAISS `add` semantics (centroids
   * fixed at ingest; assignment is paid once per vector lifetime, and
   * probes stay partition-pruned because new files land inside existing
   * cell partitions). Re-training the centroids is a separate maintenance
   * decision = a fresh [[writeIvfIndex]]; fixed seeds mean an append-heavy
   * index slowly drifts from what retrained centroids would give — the
   * standard IVF tradeoff, stated rather than hidden.
   */
  def appendIvfIndex(
      batch: DataFrame, idCol: String, vecCol: String, path: String): Unit =
    Bucketing.appendPartitioned(
      assignClusters(batch, idCol, vecCol,
        loadIvfSeeds(batch.sparkSession, path)),
      path, "cluster")

  /**
   * [[ivfTopK]] against the PERSISTED inverted file: queries assign to
   * their `nprobe` nearest persisted seeds map-side, the UNION of probed
   * cell ids (≤ queries × nprobe, driver-bounded because the query set
   * is) becomes a partition-pruning `IN` filter on the index scan —
   * unprobed cells are never read from disk (`PartitionFilters`, plan-
   * pinned) — and ranking reuses the bounded top-k aggregate. Result ≡
   * `ivfTopK(corpus, …)` whenever `path` was written from `corpus`
   * (pinned by the oracle): same seeds, same assignment, same candidates.
   */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame =
    ivfIndexedProbe(spark, path, queries, idCol, vecCol, k, nprobe,
      candCols = None, score = VectorOps.cosine(col("qvec"), col("cv")))

  /** The shared probe scaffolding of every at-rest IVF tier (raw / SQ8):
    * nprobe nearest seeds per query, the driver-bounded probed-cell set
    * turned into static partition pruning on the code scan, candidate
    * scoring by `score` over the (probes × cells) cluster join, and the
    * bounded per-query top-k aggregate. Tiers differ ONLY in which
    * columns the scan reads (`candCols`; None = all) and the scoring
    * expression — one place for the IVF probe shape to change. */
  private def ivfIndexedProbe(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int,
      candCols: Option[Seq[String]],
      score: org.apache.spark.sql.Column): DataFrame = {
    val seedRows = loadIvfSeeds(spark, path)
    require(nprobe >= 1 && nprobe <= seedRows.length,
      "need 1 <= nprobe <= nlist")
    val probes = queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec"),
      explode(nearest(seedRows, col(vecCol), nprobe)).as("pr"))
      .select(col("query_id"), col("qvec"), (-col("pr.nid")).as("cluster"))
      .cache()
    // the probed cell set: queries × nprobe ids, driver-bounded — this is
    // what turns the index read into static partition pruning
    val probedCells = probes.select(col("cluster"))
      .distinct().collect().map(_.getLong(0))
    val scan = spark.read.parquet(path)
      .where(col("cluster").isin(probedCells: _*))
    val cells = candCols.map(cs => scan.select(cs.map(col): _*)).getOrElse(scan)
    val scored = probes.join(cells, Seq("cluster"))
      .where(col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        score.as("cosine"))
    val topk = udaf(new TopKAgg(k))
    val result = scored.groupBy(col("query_id"))
      .agg(topk(col("cosine"), col("neighbor_id")).as("topk"))
      .select(col("query_id"), explode(col("topk.items")).as("nb"))
      .select(col("query_id"), col("nb._2").as("neighbor_id"),
        col("nb._1").as("cosine"))
    CacheScope.unpersistAfterAction(result, Seq(probes))
  }

  // =====================================================================
  // At-rest IVF-SQ8 — the FAISS IndexIVFScalarQuantizer tier between the
  // raw-vector inverted file (exact, 4·d bytes/vector) and IVF-PQ
  // (m bytes/vector, ADC-approximate)
  // =====================================================================

  /** (cid, cluster, scale, qv): each vector's cell plus its symmetric
    * int8 quantization — `scale = max|x|/127`, `qv[i] = round(x[i]/scale)`
    * — all map-side against the seed literals. */
  private def sq8Rows(
      df: DataFrame, idCol: String, vecCol: String,
      seeds: Array[(Long, Array[Float])]): DataFrame =
    assignClusters(df, idCol, vecCol, seeds)
      // scale in its OWN select: a same-projection reference would
      // lateral-alias-resolve to the rounded value (the embed_quantize
      // lesson)
      .select(col("cid"), col("cv"), col("cluster"),
        VectorOps.quantScale(col("cv")).as("scale"))
      // stored as array<tinyint>: values are in [-127, 127] by
      // construction, and the 1-byte leaf type is what makes the "4x
      // less storage than the raw float index" claim STRUCTURAL rather
      // than dependent on the parquet writer's dictionary encoding
      .select(col("cid"), col("cluster"), col("scale"),
        VectorOps.quantize(col("cv"), col("scale"))
          .cast("array<tinyint>").as("qv"))

  /**
   * Persist the corpus as an IVF inverted file of INT8 scalar-quantized
   * vectors (FAISS `IndexIVFScalarQuantizer` at rest): 4× less storage
   * than the raw-vector index, exact-rank cosine probes. The key
   * arithmetic fact this tier stands on: the per-vector `scale` CANCELS
   * in cosine — cosine(q·scale, y) ≡ cosine(q, y) — so a cosine probe
   * ranks on the integer codes directly, never dequantizes, and never
   * even READS the `scale` column (columnar pruning makes it free;
   * `scale` exists for L2/reconstruction consumers). Quantization is the
   * only approximation: ranks are the true cosine ranks of the rounded
   * vectors, with per-component error ≤ scale/2 (`embed_quantize`
   * measures it).
   */
  def writeIvfSq8Index(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      path: String,
      nlist: Int): Unit = {
    val seeds = collectSeeds(corpus, idCol, vecCol, nlist)
    Bucketing.writePartitioned(
      sq8Rows(corpus, idCol, vecCol, seeds), path, "cluster")
    val spark = corpus.sparkSession
    import spark.implicits._
    seeds.toSeq.toDF("cluster", "seed")
      .coalesce(1).write.mode("overwrite").parquet(s"$path.seeds")
  }

  /** FAISS `add` semantics against the persisted seeds, like
    * [[appendIvfIndex]] — quantization happens at ingest with the same
    * per-vector rule, so appended codes are indistinguishable from
    * build-time codes. */
  def appendIvfSq8Index(
      batch: DataFrame, idCol: String, vecCol: String, path: String): Unit =
    Bucketing.appendPartitioned(
      sq8Rows(batch, idCol, vecCol, loadIvfSeeds(batch.sparkSession, path)),
      path, "cluster")

  /** [[ivfTopKIndexed]] over the SQ8 index: partition-pruned cell scan
    * reading ONLY (cid, qv, cluster) — `ReadSchema` excludes `scale`,
    * plan-pinned — with the native codegen'd cosine over the codes (≤127
    * integers are exact in float, so the cast is lossless). */
  def ivfSq8TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int): DataFrame =
    ivfIndexedProbe(spark, path, queries, idCol, vecCol, k, nprobe,
      // explicit candidate projection: the probe never reads `scale`
      candCols = Some(Seq("cid", "qv", "cluster")),
      score = VectorOps.cosine(col("qvec"), col("qv").cast("array<float>")))

  /**
   * Multi-table SRP-LSH near-neighbor pairs: vectors colliding in at least
   * one table's `bits`-wide random-hyperplane bucket, verified by exact
   * cosine ≥ `minCosine`. Emits (id_a, id_b, cosine), id_a < id_b.
   *
   * The bucket join carries (id, table, bucket) rows only; embedding
   * vectors join back by id onto the deduplicated candidate set.
   */
  def lshNeighborPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      minCosine: Double,
      numTables: Int = 4): DataFrame = {
    val pre = df.select(col(idCol).as("id"), col(vecCol).as("vec")).cache()
    // all tables' buckets in ONE fold over the vector (bits×tables
    // projections accumulate in a single traversal), then posexplode:
    // pos IS the table index
    val tabled = pre.select(
      col("id"),
      posexplode(VectorOps.rpBuckets(col("vec"), bits, numTables))
        .as(Seq("tbl", "bucket")))
    val candidates = tabled.as("l")
      .join(tabled.as("r"),
        col("l.tbl") === col("r.tbl") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val result = candidates
      .join(pre.as("a"), col("id_a") === col("a.id"))
      .join(pre.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"),
        VectorOps.cosine(col("a.vec"), col("b.vec")).as("cosine"))
      .where(col("cosine") >= minCosine)
    CacheScope.unpersistAfterAction(result, Seq(pre))
  }

  /**
   * Per-query recall of an approximate-nearest-neighbor result against an
   * exact reference: of each query's exact top-k, the fraction the ANN
   * search also returned. The standard quality gauge run before trading
   * exactness for probe cost ([[ivfTopK]]'s nprobe, [[lshNeighborPairs]]'s
   * table count) — at 100 TB the exact side is computed once on a sampled
   * query set, never the full corpus.
   *
   * Both inputs are (query_id, neighbor_id, ...) frames, e.g. two
   * [[KMeans.ivfTopK]] calls at different nprobe. The join keys on the
   * (query, neighbor) id pairs — k rows per query per side, so cost is
   * query-set-sized; queries whose ANN arm found nothing still report
   * (recall 0), via the left join from the exact side.
   */
  /**
   * Cosine RANGE search (radius query): every corpus vector within
   * `minCosine` of each query vector — the fixed-threshold sibling of
   * [[bruteForceTopK]], e.g. "all near-duplicates of these probe docs"
   * rather than "the 5 nearest".
   *
   * Scale shape: the query set broadcasts; the corpus side is ONE
   * map-side scan evaluating the native cosine per (row, query) and
   * filtering in place — no shuffle at all (the plan is a
   * BroadcastNestedLoopJoin, which is exactly right here: the predicate
   * is a threshold, not an equi-key, and the stream side never moves).
   * Output is result-sized. For query sets too big to broadcast, compose
   * [[lshNeighborPairs]] buckets instead — same contract as bruteForce.
   */
  def rangeSearch(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).cast("long").as("query_id"), col(vecCol).as("qvec")))
    corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("cvec"))
      .join(q, col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorOps.cosine(col("qvec"), col("cvec")).as("cosine"))
      .where(col("cosine") >= minCosine)
  }

  /** Exact re-rank of an approximate shortlist — the FAISS refine stage
    * (`IndexRefineFlat` / the `RFlat` suffix of an index-factory string):
    * an ANN arm overfetches `k' > k` candidates cheaply (compressed-code
    * ADC), and the refine stage rescores ONLY those candidates with exact
    * squared-L2 against the RAW vectors, returning the true top-`k` of the
    * shortlist. This is the standard way to buy back the compression
    * loss: ADC mis-rankings inside the shortlist cost nothing, only
    * candidates the coarse arm never surfaced stay lost.
    *
    * Spark geometry: the shortlist (nq × k' id pairs — integers only) and
    * the queries BROADCAST; the corpus is probed by ONE hash join on
    * `neighbor_id` (a semi-join-sized read — at rest the corpus is the
    * parquet table itself, no second copy of the vectors lives in the
    * index, unlike FAISS's in-RAM refine layer). Distances quantize to
    * integer micro-units (`floor(d · 2^20)`) so the (d, id) rank is a
    * cross-engine total order, and the per-query top-k is the bounded
    * aggregate — never a corpus-wide window.
    *
    * `candidates`: (query_id, neighbor_id). Returns (query_id,
    * neighbor_id, d_micro), the exact-rescored top-`k` per query.
    */
  def refineTopK(
      candidates: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val top = topKUdaf(k)
    val cand = candidates.select(col("query_id").cast("long"),
      col("neighbor_id").cast("long"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
      col(vecCol).as("__qv"))
    corpus.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("__cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        floor(VectorOps.sqDist(col("__qv"), col("__cv")) *
          lit(KMeans.Quant.toDouble)).cast("long").as("d_micro"))
      .groupBy(col("query_id"))
      .agg(top(-col("d_micro").cast("double"), col("neighbor_id")).as("tk"))
      .select(col("query_id"), explode(col("tk.items")).as("e"))
      .select(col("query_id"), col("e._2").as("neighbor_id"),
        (-col("e._1")).cast("long").as("d_micro"))
  }

  /**
   * Maximal Marginal Relevance diversified top-k (Carbonell & Goldstein
   * 1998): greedy selection balancing relevance to the query against
   * redundancy with what's already picked —
   * `score = λ·rel − (1−λ)·max_{s∈S} cos(c, s)` (first pick scores its
   * raw relevance; ties break to the lower id). The de-duplication step
   * of retrieval-augmented data curation: plain top-k returns k copies of
   * the same popular passage, MMR returns one plus its best alternatives.
   *
   * Scale shape, stated honestly: the greedy loop is SEQUENTIAL, so the
   * DISTRIBUTED stage is the relevance scan + bounded top-`overfetch`
   * shortlist (TakeOrdered — map-side top-k per task, driver k-way
   * merge); the O(k·overfetch) greedy then runs driver-side over ≤
   * overfetch rows with the SAME sequential-fold cosine the SQL rendering
   * uses, so every comparison is bit-identical cross-engine.
   */
  def mmrTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Float],
      k: Int,
      lambda: Double = 0.5,
      overfetch: Int = 16): DataFrame = {
    require(k >= 1 && overfetch >= k, "mmr: need overfetch >= k >= 1")
    val spark = corpus.sparkSession
    val rel = VectorOps.cosine(col(vecCol), typedLit(query))
    val short = corpus.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("v"), rel.as("rel"))
      .orderBy(col("rel").desc, col("id")).limit(overfetch)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getDouble(2)))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      short.map(t => t._1 -> t).toSeq: _*)
    while (selected.length < k && remaining.nonEmpty) {
      val scored = remaining.values.map { case (id, v, r) =>
        val score =
          if (selVecs.isEmpty) r
          else lambda * r -
            (1 - lambda) * selVecs.map(s => cosSeq(v, s)).max
        (id, v, r, score)
      }
      val best = scored.minBy { case (id, _, _, sc) => (-sc, id) }
      selected += ((best._1, best._3, best._4))
      selVecs += best._2
      remaining.remove(best._1)
    }
    import spark.implicits._
    def r6(v: Double) =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    selected.zipWithIndex.map { case ((id, r, sc), i) =>
      ((i + 1).toLong, id, r6(r), r6(sc))
    }.toSeq.toDF("rank", "id", "rel", "mmr")
  }

  /** Driver-side cosine with EXACTLY the SQL rendering's fold: sequential
    * left-to-right double sums for dot and both norms, zero-denominator →
    * 0.0 — bit-identical to `VectorOpsSql.cosine`. */
  private def cosSeq(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0
    var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    var na = 0.0
    i = 0
    while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    var nb = 0.0
    i = 0
    while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    val den = math.sqrt(na) * math.sqrt(nb)
    if (den == 0) 0.0 else dot / den
  }

  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("neighbor_id"))
      .withColumn("__hit", lit(1L))
    exact.select(col("query_id"), col("neighbor_id"))
      .join(a, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
      .select(col("query_id"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_exact").cast("double"))
          .as("recall"))
  }
}
