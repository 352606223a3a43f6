package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/**
 * Window-bounded generalized suffix array over a document collection by
 * PREFIX DOUBLING (Manber & Myers 1990; the rank-doubling refinement is
 * Larsson–Sadakane's): rank EVERY suffix (doc, pos) of every document by
 * its first `window` code points, in global lexicographic (UTF-8 byte)
 * order. The suffix array is the primitive under exact-substring
 * deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
 * Language Models Better", arXiv:2107.06499 — their ExactSubstr pipeline
 * builds exactly this over the tokenized corpus); the `window` bound on
 * comparison depth matches that use (matches shorter than the dedup
 * threshold never need deeper comparisons) and caps the round count —
 * `window` ≥ the longest document gives the exact unbounded array.
 *
 * Comparison depth is EXACT: the FIRST pass ranks by the leading
 * c₀ = min(window, 16) code points directly (the key is the substring
 * itself — one pass instead of five; deeper starts trade shuffle width
 * for round count, and at ≤16 code points the key stays within a cache
 * line while saving a whole corpus-wide ranking round per doubling it
 * replaces), coverage then grows c₀, 2c₀, 4c₀, … by pure doubling, and
 * the last round takes the partial step d = window − c ≤ c (the key
 * (rank_c(i), rank_c(i+d)) orders by the first d + c code points — the
 * overlap is benign: given the first c equal, positions d..d+c decide),
 * so ranks compare suffixes by exactly `window` code points, not the
 * next power of two. For window 48 that is 3 ranking passes
 * (16, 32, 48) instead of the 7 a single-character start pays.
 *
 * Shape at 100 TB: ≤ ⌈log₂(window / 16)⌉ + 1 ranking rounds, each of which is
 *  - a per-document `lead(rank, d)` window (partitioned by doc — never a
 *    global window; group width is bounded by the document length), and
 *  - ONE distributed dense rank: range-repartition on the (rank, partner)
 *    key, count key RUNS per partition, collect P summary rows
 *    (partition count, not data), fix run numbering across partition
 *    boundaries driver-side, then assign `offset + local run index` in a
 *    second partition-local pass. No global-order window anywhere — a
 *    corpus-sized `dense_rank() OVER (ORDER BY …)` would funnel every
 *    suffix through one unsplittable task, which is the exact
 *    anti-pattern this module replaces. The per-partition passes are
 *    `mapPartitionsWithIndex` over the SAME persisted sorted frame (the
 *    genuinely imperative per-partition case: run-length numbering
 *    against the previous row), so both passes see identical partition
 *    indices; the frame persists COLUMNAR and the keys stay FLAT
 *    radix-sortable columns (see [[denseRank]]). Only a 2-deep persist
 *    window is held: round r reads only round r−1's frame, which is
 *    released as soon as round r is materialized by its stats pass.
 *
 * Early exit, twice over: when every rank is distinct (nothing left to
 * refine), and at the duplicate-content FIXED POINT — if a pure-doubling
 * round (d = c) splits no class, classes equal at depth c have equal
 * successors-at-c in equal classes, so by induction they are equal at
 * every depth and no later round can split them (the classical
 * stability argument; it does not hold for the partial final step,
 * which is the last round anyway). A dedup corpus full of identical
 * documents — the stated use case — converges in O(log max-doc-length)
 * rounds regardless of `window`.
 *
 * Ranks are DENSE 0-based — `dense_rank() − 1` over the window-bounded
 * suffix strings, ties (equal bounded suffixes) sharing a rank — which
 * is what the DuckDB oracle states independently. Content-deterministic:
 * range-partition sampling moves partition boundaries, never ranks.
 */
object SuffixArray {

  /**
   * (idCol, pos, rank) for every suffix position of every non-empty
   * document, `pos` 0-based in code points, `rank` the dense 0-based
   * global order of the suffix's first `window` code points. `idCol`
   * passes through untouched (any equatable type); `textCol` must be a
   * string.
   */
  def suffixRanks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    require(window >= 1 && window <= 65536,
      "suffixRanks: window must be in 1..65536")
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    // repartition BEFORE the ×length explode: documents arrive however
    // the source was laid out (the bench corpus is one parquet file →
    // one scan task), and the explode multiplies rows by ~mean doc
    // length, so spreading 1× document bytes here is ~2 orders of
    // magnitude cheaper than letting one task produce the whole suffix
    // table serially (measured: round 0 ran 2×~2 s single-task stages)
    val base = df.select(col(idCol).as("__id"), col(textCol).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) > 0)
      .repartition(p)
    val idField = StructField("__id",
      df.schema(df.schema.fieldIndex(idCol)).dataType, nullable = true)
    // first-pass coverage: rank by the leading c0 code points in ONE pass
    // (substr extracts code points; Spark string order is UTF-8 byte
    // order, the same collation every later round refines under).
    // 16 rather than the minimal 8: the first-pass key grows to ≤16 code
    // points (≤64 shuffle bytes vs 16-byte rank pairs) but saves a whole
    // ranking round for every window > 8 (window 48: 16→32→48, three
    // passes instead of five) — measured faster at both settings' break
    // points, and each avoided round is a shuffle + sort + two
    // per-partition passes at any scale
    val c0 = math.min(window, 16)
    val chars = base.select(col("__id"),
        explode(sequence(lit(0), length(col("__t")) - 1)).as("__p"),
        col("__t"))
      .select(col("__id"), col("__p").cast("long").as("__pos"),
        col("__t").substr(col("__p") + lit(1), lit(c0)).as("__c"))
      // one-round cache, as for `keyed` below: the range sampler would
      // re-run the explode
      .persist(StorageLevel.MEMORY_AND_DISK)
    var prevCache: DataFrame = null
    try {
      var (cur, cache, distinct, total) =
        denseRank(chars, Seq(col("__c")), idField)
      chars.unpersist(blocking = false)
      prevCache = cache
      var c = c0 // coverage: ranks currently order by the first c code points
      val perDoc = Window.partitionBy(col("__id")).orderBy(col("__pos"))
      var fixedPoint = distinct == total
      while (c < window && !fixedPoint) {
        val d = math.min(c, window - c)
        // PACK the (rank, partner) pair into ONE long when every rank fits
        // 32 bits (total suffixes < 2^31 — known exactly from the previous
        // round's stats pass): `rank · 2³² + (partner + 1)` preserves the
        // pair's lexicographic order and equality bit-for-bit (both
        // components non-negative after the +1, partner ∈ [-1, total)), so
        // ranks are unchanged, while the per-partition sort runs on the
        // RADIX path (an 8-byte prefix is the whole key; the two-column
        // key forced every comparison through TimSort + SpecificOrdering —
        // one of the two hottest frames in jstack sampling) and the
        // shuffle/cache key narrows 16 → 8 bytes (§2.3). Corpora past 2³¹
        // suffixes take the two-column arm unchanged — the pack is a
        // measured-size choice like broadcast-vs-SMJ, never a local tune.
        val packable = total < (1L << 31)
        val partner =
          coalesce(lead(col("__rank"), d).over(perDoc), lit(-1L))
        // cached for ONE round: repartitionByRange's range sampling would
        // otherwise execute the lead() window twice (once to pick the
        // boundaries, once for the real shuffle); released as soon as the
        // stats pass has materialized the sorted frame
        val keyed = (if (packable)
            cur.select(col("__id"), col("__pos"),
              (col("__rank") * lit(1L << 32) + (partner + lit(1L)))
                .as("__k0"))
          else
            cur.select(col("__id"), col("__pos"),
              col("__rank").as("__k0"), partner.as("__k1")))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val keyCols =
          if (packable) Seq(col("__k0")) else Seq(col("__k0"), col("__k1"))
        val r = denseRank(keyed, keyCols, idField)
        // r is materialized (stats pass ran): release the previous round
        keyed.unpersist(blocking = false)
        prevCache.unpersist(blocking = false)
        prevCache = r._2
        // pure-doubling stability (d == c, no class split) is final for
        // every depth; the partial step (d < c) is the last round anyway
        fixedPoint = r._3 == total || (d == c && r._3 == distinct)
        cur = r._1; distinct = r._3
        c += d
      }
      // materialize the result before releasing the cache it reads through
      cur.select(col("__id").as(idCol), col("__pos").as("pos"),
        col("__rank").as("rank")).localCheckpoint(true)
    } finally {
      if (prevCache != null) prevCache.unpersist(blocking = false)
    }
  }

  /**
   * Distributed dense rank: returns (frame with (__id, __pos, __rank),
   * its persisted sorted FRAME — materialized by the stats pass, owned
   * by the caller — distinct key count, row count). `keys` must be
   * orderable, null-free, and FLAT columns (one string, or two longs):
   * flat leading sort keys keep the per-partition sort on the radix /
   * 8-byte-prefix path of `UnsafeExternalRowSorter` — the struct-keyed
   * formulation this replaces fell back to `SpecificOrdering` calling
   * `UnsafeRow.equals` per comparison, which jstack sampling showed as
   * one of the two hottest frames of the whole build. The frame is
   * persisted COLUMNAR (DataFrame cache) instead of as an `RDD[Row]`
   * object store: object-store persists re-walk sampled row graphs in
   * `SizeEstimator` (the other hottest frame) and hold boxed rows; the
   * columnar cache sizes itself per batch. The two per-partition passes
   * (run summaries, run numbering) stay imperative — run-length logic
   * against the previous row has no set-oriented equivalent that does
   * not shuffle — but each is ONE conversion streamed out of the
   * columnar cache, never a persisted object graph, and pass 1 projects
   * the key columns only so id/pos are not even converted.
   */
  private def denseRank(
      df: DataFrame,
      keys: Seq[Column],
      idField: StructField): (DataFrame, DataFrame, Long, Long) = {
    val spark = df.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val nk = keys.length
    val kNames = keys.indices.map(i => s"__k$i")
    val sorted = df
      .select(keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } ++
        Seq(col("__id"), col("__pos")): _*)
      .repartitionByRange(p, kNames.map(col): _*)
      .sortWithinPartitions(kNames.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Both per-partition passes stream CATALYST rows (queryExecution
    // .toRdd), never external `Row`s: `.rdd` converted every value
    // through `createExternalRow` and the result re-encoded through
    // `RowEncoder` — jstack showed the conversions among the build's
    // hot frames. Values held ACROSS rows must be copied out of the
    // operator's reused row buffer (UTF8String aliases it; longs are
    // read by value).
    val kTypes = sorted.schema.take(nk).map(_.dataType)
    def copied(v: Any): Any = v match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
      case other => other
    }
    // pass 1: per-partition run summaries — P driver rows, not data;
    // keys-only projection off the columnar cache
    val stats = sorted.select(kNames.map(col): _*)
      .queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        var d = 0L
        var f0: Any = null
        var f1: Any = null
        var l0: Any = null
        var l1: Any = null
        it.foreach { r =>
          val k0 = r.get(0, kTypes(0))
          val k1 = if (nk > 1) r.get(1, kTypes(1)) else null
          // l0/l1 hold the current RUN's key (copied out of the reused
          // buffer once per run — an unchanged key equals the held copy)
          if (n == 0L || k0 != l0 || (nk > 1 && k1 != l1)) {
            d += 1
            l0 = copied(k0); l1 = copied(k1)
            if (n == 0L) { f0 = l0; f1 = l1 }
          }
          n += 1
        }
        if (n == 0L) Iterator.empty
        else Iterator.single((pid, n, d, Seq(f0, f1), Seq(l0, l1)))
      }.collect().sortBy(_._1)
    // driver: global run numbering across partition boundaries — a key
    // run spanning partitions counts once and every partition of the
    // span starts at the run's first number
    val start = new Array[Long](p)
    var cum = 0L
    var total = 0L
    var prevLast: Seq[Any] = null
    stats.foreach { case (pid, n, d, first, last) =>
      val shared = prevLast != null && first == prevLast
      start(pid) = cum - (if (shared) 1L else 0L)
      cum += d - (if (shared) 1L else 0L)
      total += n
      prevLast = last
    }
    val bc = spark.sparkContext.broadcast(start)
    // pass 2: same cached frame, same partition indices (narrow reads
    // preserve them) — assign offset + local run index
    val idType = idField.dataType
    val assigned = sorted.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var p0: Any = null
        var p1: Any = null
        var any = false
        var local = -1L
        it.map { r =>
          val k0 = r.get(0, kTypes(0))
          val k1 = if (nk > 1) r.get(1, kTypes(1)) else null
          if (!any || k0 != p0 || (nk > 1 && k1 != p1)) {
            local += 1; p0 = copied(k0); p1 = copied(k1); any = true
          }
          val out = new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(3)
          out.update(0, copied(r.get(nk, idType)))
          out.update(1, r.getLong(nk + 1))
          out.update(2, bc.value(pid) + local)
          out: org.apache.spark.sql.catalyst.InternalRow
        }
      }
    val schema = StructType(Seq(idField,
      StructField("__pos", LongType, nullable = false),
      StructField("__rank", LongType, nullable = false)))
    (org.apache.spark.sql.graftbridge.ColumnBridge
      .internalCreateDataFrame(spark, assigned, schema), sorted, cum, total)
  }

  /**
   * Persist the rank table as the AT-REST suffix-array artifact: one
   * prefix-doubling build per corpus release, shared by every downstream
   * probe ([[rankChecksums]] / [[topSuffixes]] / [[repeatedWindows]] all
   * take the rank table — pass `spark.table(table)` and none of them
   * re-ranks anything; pinned by `PlanAuditSpec`). Bucketed (and
   * per-bucket sorted) on `rank`, because the heavy consumer is
   * [[repeatedWindows]]'s rank-groupBy — over the bucketed scan the
   * aggregation runs in place with ZERO Exchange on the index side.
   *
   * Append semantics, stated honestly: ranks are CORPUS-GLOBAL — one
   * appended document shifts, in general, the rank of every suffix that
   * sorts after any of its suffixes, so there is no per-document append;
   * the artifact is rebuilt per corpus release (call this again). That is
   * the same build-once-per-release posture as FAISS's retrain cycle for
   * IVF centroids (contrast `Similarity.writeIvfIndex`, which accepts
   * seed drift to buy cheap appends — a suffix array has no analogous
   * slack: a stale rank is a WRONG rank, not an approximate one). The
   * build cost this amortizes is the engine's largest: ~⌈log₂ window⌉
   * corpus-wide ranking rounds, paid once here instead of once per
   * consumer per session.
   */
  def writeRankIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      table: String,
      buckets: Int): Unit =
    Bucketing.writeBucketed(
      suffixRanks(df, idCol, textCol, window), table, "rank", buckets)

  /** Per-document verification fold of a [[suffixRanks]] table:
    * (id, n_suffixes, Σ rank·(pos+1)) — every rank participates, so a
    * single wrong rank anywhere moves some document's checksum. Derived
    * ops take the rank table rather than recomputing it: the array is
    * built once per corpus release and persisted ([[writeRankIndex]]),
    * like the dedup indexes. */
  def rankChecksums(ranks: DataFrame, idCol: String): DataFrame =
    ranks
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_suffixes"),
        sum(col("rank") * (col("pos") + 1)).as("rank_checksum"))
      .orderBy(col(idCol))

  /**
   * Exact repeated windows — the ExactSubstr dedup outcome (Lee et al.
   * 2022): every `window`-code-point substring occurring more than once
   * in the corpus, with its occurrence and document counts; top `k` by
   * (count desc, snippet asc). Suffixes sharing a rank ARE the equal
   * windows (restricted to positions with a full window left), so the
   * heavy groupBy shuffles 8-byte RANK keys instead of shipping
   * `window`-sized substrings, and the snippet string is materialized
   * only for the one witness occurrence per surviving group.
   */
  def repeatedWindows(
      ranks: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      k: Int): DataFrame = {
    val lens = df.select(col(idCol),
      length(col(textCol)).cast("long").as("__len"))
    val groups = ranks.join(lens, Seq(idCol))
      .where(col("pos") + window <= col("__len"))
      .groupBy(col("rank"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        min(struct(col(idCol), col("pos"))).as("__w"))
      .where(col("n_occurrences") > 1)
    groups
      .join(df.select(col(idCol).as("__wid"), col(textCol).as("__t")),
        col("__w").getField(idCol) === col("__wid"))
      .select(expr(s"substring(__t, __w.pos + 1, $window)").as("snippet"),
        col("n_occurrences"), col("n_docs"))
      .orderBy(col("n_occurrences").desc, col("snippet"))
      .limit(k)
  }

  /**
   * The EXCISION positions of the ExactSubstr pass (Lee et al. 2022 §4:
   * "remove the repeated substring" — this is the position set a cleaner
   * cuts): every (id, pos) whose `window`-code-point substring occurs in
   * MORE THAN ONE document, derived entirely from the rank table — equal
   * windows ARE shared ranks (restricted to positions with a full window
   * left), so cross-document multiplicity is one rank-groupBy and the
   * position set comes back via a semi-join on the same key. Over the
   * PERSISTED artifact ([[writeRankIndex]], bucketed on `rank`) both the
   * groupBy and the join co-locate on the bucketing — text is touched
   * only for the per-document length bound, never for window strings
   * (contrast the shingle-hash formulation in `Dedup.repeatedSpans`,
   * which re-hashes text per call and can collide; ranks are exact).
   */
  def repeatedPositions(
      ranks: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    val lens = df.select(col(idCol),
      length(col(textCol)).cast("long").as("__len"))
    val full = ranks.join(lens, Seq(idCol))
      .where(col("pos") + window <= col("__len"))
    val multi = full.groupBy(col("rank"))
      .agg(countDistinct(col(idCol)).as("__nd"))
      .where(col("__nd") > 1)
      .select(col("rank"))
    full.join(multi, Seq("rank"), "left_semi")
      .select(col(idCol), col("pos"))
  }

  /**
   * The ExactSubstr CLEANING step itself (Lee et al. 2022 §4): every
   * document with its cross-document-repeated `window`-code-point spans
   * CUT OUT — (id, clean_text, n_cut), `n_cut` the number of removed code
   * points. Composes [[repeatedPositions]]: positions expand to covered
   * character indices (×`window` bounded fan-out, proportional to
   * repeated content — the `Dedup.repeatedSpans` bound), and only
   * documents that HAVE repeated spans pay the character-level surgery —
   * the overwhelmingly-clean majority of a real corpus passes through
   * map-side untouched (an anti-join, no explode). Surgery is
   * explode-chars → anti-join covered → ordered reassembly; a document
   * whose every character is covered comes back as the empty string, not
   * a dropped row.
   */
  def exciseRepeated(
      ranks: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame =
    exciseAtPositions(
      repeatedPositions(ranks, df, idCol, textCol, window),
      df, idCol, textCol, window)

  /** The character surgery of [[exciseRepeated]] over an arbitrary
    * excision-position frame (idCol, pos) — shared by the monolithic and
    * sharded position derivations. */
  private def exciseAtPositions(
      positions: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int): DataFrame = {
    val base = df.select(col(idCol), col(textCol).as("__t"))
      .where(col("__t").isNotNull && length(col("__t")) > 0)
    // cached: the final plan reaches `covered` through four paths (the
    // clean anti-join, the dirty semi-join, rebuilt's explode input, and
    // rebuilt's anti-join) — without the cache each re-runs the whole
    // rank-groupBy + semi-join + explode chain (ReuseExchange shares only
    // the bottom shuffles), multiplying the op's dominant cost ~4x
    val covered = positions
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + window - 1)).as("__i"))
      .distinct()
      .cache()
    val dirtyIds = covered.select(col(idCol)).distinct()
    val clean = base.join(dirtyIds, Seq(idCol), "left_anti")
      .select(col(idCol), col("__t").as("clean_text"), lit(0L).as("n_cut"))
    val dirty = base.join(dirtyIds, Seq(idCol), "left_semi")
    val rebuilt = dirty
      .select(col(idCol), col("__t"),
        explode(sequence(lit(0L), length(col("__t")).cast("long") - 1))
          .as("__i"))
      .select(col(idCol), col("__i"),
        col("__t").substr((col("__i") + lit(1)).cast("int"), lit(1)).as("__ch"))
      .join(covered, Seq(idCol, "__i"), "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__i"), col("__ch")))),
        x => x.getField("__ch")), "").as("__kept"))
    val cut = dirty
      .join(rebuilt, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("__kept"), lit("")).as("clean_text"),
        (length(col("__t")) - coalesce(length(col("__kept")), lit(0)))
          .cast("long").as("n_cut"))
    CacheScope.unpersistAfterAction(clean.unionByName(cut), Seq(covered))
  }

  /** The head of the suffix array with its window-bounded suffix strings
    * — bounded `TakeOrderedAndProject`, ties by (id, pos). */
  def topSuffixes(
      ranks: DataFrame,
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int,
      k: Int): DataFrame =
    ranks
      .join(df.select(col(idCol), col(textCol).as("__t")), Seq(idCol))
      .select(col("rank"), col(idCol), col("pos"),
        expr(s"substring(__t, pos + 1, $window)").as("suffix"))
      .orderBy(col("rank"), col(idCol), col("pos"))
      .limit(k)

  // =====================================================================
  // SHARDED maintenance — the delta-bound arm of the one index family
  // that had none: a corpus RELEASE becomes a SHARD. Ranks are
  // shard-local (one prefix-doubling build over ONLY the release's
  // documents — the delta, never the accumulated corpus), and each
  // shard additionally persists its WINDOW DICTIONARY: one row per
  // distinct full-window string with its occurrence/doc counts and a
  // witness snippet. The ExactSubstr consumers then merge DICTIONARIES
  // across shards by snippet equality — exact, because within a shard
  // full-window positions share a rank iff their window strings are
  // identical, and shards partition the documents so per-shard doc
  // counts sum. Results are pinned EQUAL to the monolithic rebuild.
  //
  // Stated trades: (1) the dictionary stores one `window`-length string
  // per DISTINCT window per shard — bounded by the shard's text volume,
  // compressing well at rest, and the price of never re-ranking old
  // releases; (2) the global rank ORDER is not maintained across shards
  // — [[topSuffixes]]-style order queries still take the monolithic
  // [[writeRankIndex]]; the dedup consumers (repeated windows /
  // positions / excision — the reason the index exists, Lee et al.
  // 2022) never needed it.
  // =====================================================================

  /** One shard's window dictionary: per distinct full-window string —
    * i.e. per rank over full-window positions — its occurrence count,
    * distinct-doc count, and witness snippet (one string materialized
    * per GROUP, the [[repeatedWindows]] economy, without its >1 cut:
    * a window occurring once here may repeat in another shard). */
  private def shardWindowRows(
      ranks: DataFrame, df: DataFrame, idCol: String, textCol: String,
      window: Int, shard: Long): DataFrame = {
    val lens = df.select(col(idCol),
      length(col(textCol)).cast("long").as("__len"))
    ranks.join(lens, Seq(idCol))
      .where(col("pos") + window <= col("__len"))
      .groupBy(col("rank"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col(idCol)).as("n_docs"),
        min(struct(col(idCol), col("pos"))).as("__w"))
      .join(df.select(col(idCol).as("__wid"), col(textCol).as("__t")),
        col("__w").getField(idCol) === col("__wid"))
      .select(lit(shard).as("shard"), col("rank"),
        expr(s"substring(__t, __w.pos + 1, $window)").as("snippet"),
        col("n_occurrences"), col("n_docs"))
  }

  private def shardRankRows(
      df: DataFrame, idCol: String, textCol: String, window: Int,
      shard: Long): (DataFrame, DataFrame) = {
    val ranks = suffixRanks(df, idCol, textCol, window)
    (ranks.select(lit(shard).as("shard"), col(idCol), col("pos"),
        col("rank")),
      shardWindowRows(ranks, df, idCol, textCol, window, shard))
  }

  /** Create the sharded index from its first release: `<table>` the
    * shard-local rank rows (bucketed on `rank` — the grouping/probing
    * key; `shard` rides along, and grouping by (shard, rank) still
    * clusters on a superset of the bucketing), `<table>_windows` the
    * dictionary (bucketed on `snippet` — the cross-shard merge key, so
    * the merge fold aggregates the scan in place). */
  def writeShardedRankIndex(
      df: DataFrame, idCol: String, textCol: String, window: Int,
      table: String, buckets: Int, shard: Long = 0L): Unit = {
    val (ranks, windows) = shardRankRows(df, idCol, textCol, window, shard)
    Bucketing.writeBucketed(ranks, table, "rank", buckets)
    Bucketing.writeBucketed(windows, s"${table}_windows", "snippet", buckets)
  }

  /** Fold a NEW RELEASE into the sharded index: rank and summarize ONLY
    * `df` (the delta) as shard `shard`, append both tables in their
    * bucket layouts. No prior release's text, ranks, or pair structure
    * is touched — the maintenance cost is the delta's own build plus
    * two appends (the component-merge evidence standard; rehearsed at
    * 10× in `ScaleRehearsal`). */
  def appendRankShard(
      df: DataFrame, idCol: String, textCol: String, window: Int,
      table: String, shard: Long): Unit = {
    val (ranks, windows) = shardRankRows(df, idCol, textCol, window, shard)
    DedupIndex.appendBucketed(ranks, table)
    DedupIndex.appendBucketed(windows, s"${table}_windows")
  }

  /** [[repeatedWindows]] over the sharded index: ONE aggregate over the
    * window dictionaries — occurrence and doc counts SUM across shards
    * (shards partition the documents), snippets equal iff windows equal.
    * Positions, ranks, and text never enter the merge. Result ≡ the
    * monolithic [[repeatedWindows]] (pinned by the shared oracle). */
  def repeatedWindowsSharded(
      spark: org.apache.spark.sql.SparkSession, table: String,
      k: Int): DataFrame =
    spark.table(s"${table}_windows")
      .groupBy(col("snippet"))
      .agg(sum(col("n_occurrences")).as("n_occurrences"),
        sum(col("n_docs")).as("n_docs"))
      .where(col("n_occurrences") > 1)
      .orderBy(col("n_occurrences").desc, col("snippet"))
      .limit(k)

  /** [[repeatedPositions]] over the sharded index: snippets whose doc
    * count summed across shards exceeds one select their per-shard
    * (shard, rank) groups, and the position set comes back via one
    * semi-join against the rank table (full-window positions only) —
    * the probe side is dictionary-derived, orders of magnitude under
    * the position table it prunes. */
  def repeatedPositionsSharded(
      spark: org.apache.spark.sql.SparkSession, table: String,
      df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame = {
    val dict = spark.table(s"${table}_windows")
    val hot = dict.groupBy(col("snippet"))
      .agg(sum(col("n_docs")).as("__nd"))
      .where(col("__nd") > 1)
      .select(col("snippet"))
    val hotGroups = dict.join(hot, Seq("snippet"), "left_semi")
      .select(col("shard"), col("rank"))
    val lens = df.select(col(idCol),
      length(col(textCol)).cast("long").as("__len"))
    spark.table(table).join(lens, Seq(idCol))
      .where(col("pos") + window <= col("__len"))
      .join(hotGroups, Seq("shard", "rank"), "left_semi")
      .select(col(idCol), col("pos"))
  }

  /** [[exciseRepeated]] over the sharded index — the same character
    * surgery fed by the cross-shard position derivation. */
  def exciseRepeatedSharded(
      spark: org.apache.spark.sql.SparkSession, table: String,
      df: DataFrame, idCol: String, textCol: String,
      window: Int): DataFrame =
    exciseAtPositions(
      repeatedPositionsSharded(spark, table, df, idCol, textCol, window),
      df, idCol, textCol, window)
}
