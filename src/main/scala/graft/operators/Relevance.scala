package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, TextOpsSql}

/**
 * Corpus relevance scoring — Okapi BM25 of every document against a fixed
 * query term set (the retrieval primitive behind quality-targeted corpus
 * selection, e.g. "books-like" upsampling or eval-adjacent document
 * surfacing in pretraining pipelines).
 *
 * Plan shape, sized for a 100 TB corpus:
 *  - corpus statistics (N, avgdl) are ONE aggregate producing two driver
 *    scalars, embedded as literals — no per-row join against a stats table;
 *  - term frequencies ride the token explode but are filtered to the query
 *    term set MAP-SIDE before any shuffle, so the (doc, term) aggregate is
 *    proportional to documents-containing-query-terms, not corpus tokens;
 *  - document frequencies aggregate to |Q| rows and broadcast back onto
 *    the tf stream — the corpus never self-joins.
 *
 * The BM25 formula (Robertson/Okapi, +1-floored IDF as in Lucene):
 *   score(d, Q) = Σ_q ln(1 + (N - df_q + 0.5)/(df_q + 0.5))
 *                   · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
 */
object Relevance {

  /** Top-`topK` documents by BM25 against `query`, ranked on the 6-decimal
    * ROUNDED score with id tie-break (deterministic across engines — an
    * unrounded rank could cut the top-k at an ulp boundary). Documents
    * matching no query term score nothing and never reach the ranking. */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(query.nonEmpty, "bm25TopK: empty query")
    val base = df.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
    // two driver scalars from one aggregate: count is exact, and avgdl's
    // integer token-count sum is exact in a double (< 2^53), so the literal
    // matches any engine's avg() bit-for-bit
    val stats = base.agg(
      count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl")).first()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("tok"))
      .where(col("tok").isin(query: _*))
      .groupBy(col(idCol), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("tok"))
      .agg(countDistinct(col(idCol)).cast("double").as("dfq"))
    val idf = log(lit(1.0) + (lit(n) - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5)))
    val term = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(broadcast(dfreq), "tok")
      .groupBy(col(idCol))
      .agg(round(sum(term), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /**
   * DSIR-style importance score (Data Selection via Importance Resampling,
   * Xie et al. 2023, arXiv:2302.03169): per raw document, the hashed-
   * unigram log-likelihood ratio log p_target(doc) − log p_raw(doc) —
   * positive means the doc looks more like the target (high-quality /
   * in-domain) corpus than like the raw pool. Resampling = keep the top
   * fraction by score (compose with the quota/sampling operators).
   *
   * Features are token hashes folded into `buckets` bins (DSIR's hashed
   * n-grams at n = 1), with add-1 smoothing: p(b) = (c_b + 1) / (T + B).
   *
   * Scale posture: both bucket-count models are ≤ `buckets` rows — one
   * map-side-combined aggregate over each corpus, then a BROADCAST join
   * back to the raw token stream; the only corpus-sized shuffle is the
   * per-doc score aggregate, and the target corpus (curated, small) is
   * read once. Scores round to 6 decimals before any ranking so an ulp of
   * libm `ln` divergence cannot flip a selection cut.
   */
  def dsirScores(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 256): DataFrame = {
    require(buckets > 0, "dsirScores: buckets must be positive")
    def tokBuckets(df: DataFrame, cols: Column*) = df
      .select(cols :+ explode(TextOps.tokenHashes(
        TextOps.tokens(col(textCol)))).as("__h"): _*)
      .select(cols :+ pmod(col("__h"), lit(buckets.toLong)).as("b"): _*)
    def model(toks: DataFrame) = {
      val counts = toks.groupBy(col("b")).agg(count(lit(1)).as("c"))
      val total = counts.agg(sum(col("c"))).first().getLong(0)
      (counts, total)
    }
    val rawToks = tokBuckets(raw, col(idCol)).cache()
    val (ct, tt) = model(tokBuckets(target))
    val (cr, tr) = model(rawToks.select(col("b")))
    // ln p_t(b) − ln p_r(b), both sides add-1 smoothed; missing buckets
    // coalesce to count 0 (their probability is the smoothing floor)
    val ratio =
      log((coalesce(col("ct"), lit(0L)).cast("double") + lit(1.0)) /
        lit(tt.toDouble + buckets)) -
      log((coalesce(col("cr"), lit(0L)).cast("double") + lit(1.0)) /
        lit(tr.toDouble + buckets))
    val scored = rawToks
      .join(broadcast(ct.select(col("b"), col("c").as("ct"))), Seq("b"), "left_outer")
      .join(broadcast(cr.select(col("b"), col("c").as("cr"))), Seq("b"), "left_outer")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"), round(sum(ratio), 6).as("dsir_score"))
    CacheScope.unpersistAfterAction(scored, Seq(rawToks))
  }

  /**
   * Reciprocal-rank fusion of a lexical (BM25) and a dense (embedding
   * cosine) ranking — the standard hybrid-retrieval combiner (Cormack,
   * Clarke & Büttcher 2009, "Reciprocal rank fusion outperforms Condorcet
   * and individual rank learning methods", SIGIR):
   *
   *   rrf(d) = Σ_arms 1/(k + rank_arm(d)),   k = 60 conventionally
   *
   * Scale posture: each arm reduces the corpus to a BOUNDED `armK`-row
   * ranking first (BM25 through [[bm25TopK]]'s broadcast-stats plan, the
   * dense arm through the bounded top-k aggregate in
   * [[Similarity.bruteForceTopK]] — swap in the IVF/PQ probe at 100 TB,
   * identical downstream shape). Rank assignment and the full-outer
   * fusion then run over two ≤ armK-row tables — the only windows in the
   * plan order driver-bounded tables, never a corpus partition; they
   * carry a constant partition key so the (correct-but-noisy) "No
   * Partition Defined" WindowExec warning cannot muddy run logs where it
   * WOULD signal a real risk. The fused score is two double divisions
   * summed in a fixed expression order, so it is bit-identical
   * cross-engine; ties break on id.
   */
  def rrfHybrid(
      docs: DataFrame,
      embeddings: DataFrame,
      docIdCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      queryVecId: Long,
      armK: Int = 30,
      rrfK: Int = 60,
      topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bmRank = bm25TopK(docs, docIdCol, textCol, queryTerms, topK = armK)
      .select(col(docIdCol).as("id"), col("bm25"))
      .withColumn("r_text", row_number()
        // pmod(id, 1) ≡ 0 but is non-foldable: a LITERAL key would be
        // constant-folded out of the partition spec and WindowExec would
        // warn "No Partition Defined" — noise here (armK-bounded input),
        // but worth silencing so real unbounded windows stay visible
        .over(Window.partitionBy(pmod(col("id"), lit(1)))
          .orderBy(col("bm25").desc, col("id"))).cast("long"))
    val cosRank = Similarity.bruteForceTopK(
        embeddings, embeddings.where(col(vecIdCol) === queryVecId),
        vecIdCol, vecCol, armK)
      .select(col("neighbor_id").as("id"), col("cosine"))
      .withColumn("r_vec", row_number()
        .over(Window.partitionBy(pmod(col("id"), lit(1)))
          .orderBy(col("cosine").desc, col("id"))).cast("long"))
    bmRank.select(col("id"), col("r_text"))
      .join(cosRank.select(col("id"), col("r_vec")), Seq("id"), "full_outer")
      .select(col("id").as(docIdCol),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("r_text")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("r_vec")), lit(0.0)),
          9).as("rrf_score"),
        col("r_text"), col("r_vec"))
      .orderBy(col("rrf_score").desc, col(docIdCol))
      .limit(topN)
  }

  // =====================================================================
  // Persisted inverted (postings) index — at-rest lexical retrieval
  // =====================================================================

  /** POSITIONAL postings rows for `corpus`: one (tok, id, tf, dl, pos)
    * per distinct (document, token) — tf/dl are exactly the per-term
    * stream [[bm25TopK]] derives from raw text on every call, and `pos`
    * is the sorted 0-based occurrence list that phrase probes fold over.
    * Because the layout is columnar, positions are FREE for probes that
    * don't use them: a BM25 probe's scan never reads the `pos` column
    * (`ReadSchema` pinned pos-free in `PlanAuditSpec`). */
  private def postingsRows(
      corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("id"),
        TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("dl", size(col("toks")).cast("double"))
      .select(col("id"), col("dl"),
        posexplode(col("toks")).as(Seq("p", "tok")))
      .groupBy(col("tok"), col("id"), col("dl"))
      .agg(count(lit(1)).cast("double").as("tf"),
        sort_array(collect_list(col("p"))).as("pos"))
      .select(col("tok"), col("id"), col("tf"), col("dl"), col("pos"))

  /** Corpus-statistics row that keeps the index self-describing AND
    * append-foldable: every write/append contributes ONE (n_docs, n_dl,
    * sum_dl) row; a probe reads N = Σ n_docs and avgdl = Σ sum_dl / Σ n_dl.
    * The split between n_docs (all rows) and n_dl (rows with a token
    * array) reproduces [[bm25TopK]]'s `count(*)` / `avg(dl)` pair exactly
    * — avg() skips null-text rows, count(*) doesn't. All three are exact
    * longs, so folding appends by SUM loses nothing. */
  /** Per-document `(id, dl)` sidecar rows (`<table>_docs`): one row per
    * ingested document, INCLUDING zero-token and null-text documents,
    * which have no postings rows at all. The sidecar is what lets a
    * takedown recover a tokenless document's +1 in `n_docs` — derived
    * from the postings it would silently drift (the pre-sidecar
    * limitation). `dl` uses the stats row's exact expression, so the
    * correction folds against `_stats` without rounding. */
  private def docRows(
      corpus: DataFrame, idCol: String, textCol: String): DataFrame =
    corpus.select(col(idCol).cast("long").as("id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("dl"))

  private def postingsStatsRow(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .select(size(TextOps.tokens(col(textCol))).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), count(col("dl")).as("n_dl"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      // batch_key is NULL for ingest rows; a retraction's correction row
      // carries its takedown batch's digest so a crashed-and-retried
      // takedown can detect the correction already landed (see
      // [[retractPostings]])
      .withColumn("batch_key", lit(null).cast("long"))

  /**
   * Persist `corpus` as an inverted index: a (tok, id, tf, dl) postings
   * table BUCKETED AND SORTED on `tok`, plus a `<table>_stats` companion
   * holding the corpus statistics. The third leg of the at-rest index
   * story next to [[graft.operators.DedupIndex]] (digest/band/cluster)
   * and [[Similarity.writeIvfIndex]] (IVF cells): tokenization and term
   * counting are paid ONCE per document lifetime, at its own ingest —
   * every later [[bm25TopKIndexed]] probe reads postings in place and
   * never touches corpus text.
   *
   * 100 TB shape: postings rows are Σ distinct (doc, term) — the classic
   * inverted-file size, ~corpus tokens in the worst case, laid out
   * hash-bucketed on term so (a) a query-term probe BUCKET-PRUNES the scan
   * to the buckets holding its terms (`SelectedBucketsCount` in the plan,
   * pinned) and (b) the per-term document-frequency aggregate groups on
   * the bucketing key — no Exchange. Term-frequency skew (stopwords) is
   * bounded per bucket by the per-bucket sort: a probe for rare terms
   * reads a sorted sliver, and a stopword probe degrades to that term's
   * posting list, never a corpus rescan.
   */
  def writePostingsIndex(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      table: String,
      buckets: Int): Unit = {
    Bucketing.writeBucketed(
      postingsRows(corpus, idCol, textCol), table, "tok", buckets)
    Bucketing.writeTable(postingsStatsRow(corpus, textCol), s"${table}_stats")
    Bucketing.writeBucketed(
      docRows(corpus, idCol, textCol), s"${table}_docs", "id", buckets)
  }

  /** Fold a committed batch INTO the index: postings append in the table's
    * fixed bucket layout (probes stay Exchange-free and bucket-pruned),
    * and the batch's statistics land as one more stats row — probes fold
    * stats rows by SUM, so N/avgdl stay exact across any append history. */
  def appendPostingsIndex(
      batch: DataFrame, idCol: String, textCol: String, table: String): Unit = {
    DedupIndex.appendBucketed(postingsRows(batch, idCol, textCol), table)
    postingsStatsRow(batch, textCol)
      .write.mode("append").format("parquet").saveAsTable(s"${table}_stats")
    val spark = batch.sparkSession
    val docsT = s"${table}_docs"
    val dr = docRows(batch, idCol, textCol)
    if (spark.catalog.tableExists(docsT)) DedupIndex.appendBucketed(dr, docsT)
    else {
      // index persisted before the sidecar existed: backfill from the
      // LIVE postings (one row per doc that has any; pre-sidecar
      // tokenless docs stay unrecoverable — that is the drift the
      // sidecar ends from this append on) and fold the batch in
      val n = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(table))
        .bucketSpec.map(_.numBuckets).getOrElse(16)
      val backfill = Retract.readLive(spark, table)
        .select(col("id"), col("dl").cast("long").as("dl")).distinct()
      Bucketing.writeBucketed(backfill.unionByName(dr), docsT, "id", n)
    }
  }

  /**
   * Takedown for the postings index: tombstone every postings row of
   * `ids` ([[Retract]] lifecycle — masked immediately, physically
   * dropped at the next [[Retract.purge]]), AND append a NEGATIVE
   * corpus-statistics correction row so N/avgdl stay exact for probes
   * from this moment on (stats fold by SUM; the correction is computed
   * from the per-doc `dl` the index itself carries, over NEW keys only
   * — re-submitting a takedown list must not double-subtract).
   *
   * Crash ordering: the correction lands BEFORE the tombstones, tagged
   * with the batch's key digest. A death between the two writes leaves
   * the correction applied and the keys still fresh; the retry
   * recomputes the SAME digest (the tombstone table is unchanged, so
   * the fresh set is identical), finds it already in `_stats`, skips
   * the correction, and appends the tombstones — exactly-once for both
   * writes without needing them atomic. (The reverse order was
   * unhealable: once the keys are tombstoned the retry's fresh set is
   * empty and the lost correction can never be recomputed.) The digest
   * is an order-independent 64-bit fold of the fresh keys — a collision
   * between two DIFFERENT in-flight batches would skip one correction,
   * at hash64 odds. Digest lifetime is ONE takedown epoch: the tags fold
   * away at [[purgePostings]] (use it, not a bare Retract.purge, on
   * postings tables), because after a purge clears the tombstones the
   * same key set can legitimately be retracted again and must not find
   * its predecessor's tag.
   *
   * The per-doc correction source is the `<table>_docs` sidecar (one
   * `(id, dl)` row per ingested document, written at build/append time),
   * so a ZERO-token document's +1 in `n_docs` is recovered exactly —
   * such docs have no postings rows, which is why the previous
   * postings-derived correction let idf's N drift until a stats
   * rebuild. Indexes persisted before the sidecar existed fall back to
   * the postings derivation (same values for every doc with tokens) and
   * grow their sidecar at the next append.
   */
  def retractPostings(
      spark: org.apache.spark.sql.SparkSession, table: String,
      ids: DataFrame): Unit = {
    val tomb = Retract.tombTable(table)
    val keys = ids.select(col(ids.columns.head).cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
    val fresh =
      if (!spark.catalog.tableExists(tomb)) keys
      else keys.join(
        spark.table(tomb).where(col("col_name") === "id").select("key"),
        Seq("key"), "left_anti")
    // one driver row: the correction AND the batch digest, materialized
    // eagerly before anything is written. The per-doc source is the
    // `_docs` sidecar when it exists — it carries zero-token documents,
    // which have no postings rows and whose +1 in n_docs the postings
    // derivation could never recover; the postings fallback serves
    // pre-sidecar indexes (their tokenless docs drift until a rebuild)
    val docsT = s"${table}_docs"
    val perDoc =
      if (spark.catalog.tableExists(docsT))
        spark.table(docsT).select(col("id"), col("dl"))
      else spark.table(table).select(col("id"), col("dl"))
    val head = perDoc
      .join(broadcast(fresh), col("id").cast("string") === col("key"),
        "left_semi")
      .distinct()
      .agg((count(lit(1)) * -1).as("n_docs"),
        (count(col("dl")) * -1).as("n_dl"),
        (coalesce(sum(col("dl").cast("long")), lit(0L)) * -1).as("sum_dl"))
      .crossJoin(fresh.agg(
        // xor fold: order-independent AND overflow-free under ANSI (the
        // keys are distinct, so no pair can self-cancel a real change)
        coalesce(expr("bit_xor(xxhash64(key))"), lit(0L)).as("__h"),
        count(lit(1)).as("__n")))
      .first()
    val (nDocs, nDl, sumDl) = (head.getLong(0), head.getLong(1),
      head.getLong(2))
    val batchKey = head.getLong(3) * 31L + head.getLong(4)
    if (head.getLong(4) > 0L) {
      import spark.implicits._
      val stats = spark.table(s"${table}_stats")
      // a _stats table persisted before digests existed has 3 columns;
      // migrate it in place (null tags) so the 4-column append can land
      if (!stats.columns.contains("batch_key")) {
        val legacy = stats
          .select(col("n_docs"), col("n_dl"), col("sum_dl"),
            lit(null).cast("long").as("batch_key"))
          .collect().toSeq
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            Option.empty[Long]))
          .toDF("n_docs", "n_dl", "sum_dl", "batch_key")
        Bucketing.writeTable(legacy, s"${table}_stats")
      }
      val applied = !spark.table(s"${table}_stats")
        .where(col("batch_key") === batchKey).isEmpty
      if (!applied) {
        Seq((nDocs, nDl, sumDl, batchKey))
          .toDF("n_docs", "n_dl", "sum_dl", "batch_key")
          .write.mode("append").format("parquet")
          .saveAsTable(s"${table}_stats")
      }
    }
    Retract.retract(spark, table, "id", ids)
    // keep the sidecar consistent with the postings: masked now, dropped
    // at the same purge — a stale sidecar row surviving an epoch would
    // double-subtract on a post-purge re-retraction
    if (spark.catalog.tableExists(docsT))
      Retract.retract(spark, docsT, "id", ids)
  }

  /**
   * Physical purge for a postings index: [[Retract.purge]] PLUS the end
   * of the takedown epoch for the stats digests — every batch_key tag
   * folds away into the one unkeyed stats row (sums unchanged). The tags
   * exist only to heal a crash between a correction write and its
   * tombstone append; once the purge has physically removed the rows,
   * a LATER retraction of the same key set (possible only after the
   * purge cleared the tombstones) is a NEW takedown that must compute
   * its own correction — a surviving tag would silently suppress it.
   * Use this instead of a bare [[Retract.purge]] on postings tables.
   */
  def purgePostings(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    Retract.purge(spark, table)
    if (spark.catalog.tableExists(s"${table}_docs"))
      Retract.purge(spark, s"${table}_docs")
    import spark.implicits._
    val folded = spark.table(s"${table}_stats")
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_dl")), lit(0L)).as("n_dl"),
        coalesce(sum(col("sum_dl")), lit(0L)).as("sum_dl"))
      .collect()
    val one = folded.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("n_docs", "n_dl", "sum_dl")
      .withColumn("batch_key", lit(null).cast("long"))
    Bucketing.writeTable(one, s"${table}_stats")
  }

  /** Maintenance fold for the postings index: compact the bucketed
    * postings back to one sorted file per bucket
    * ([[Bucketing.compactBucketed]]) and collapse the accumulated
    * per-append stats rows into their SUM (exact long folds — N/avgdl are
    * unchanged by construction). Run on the ingest loop's maintenance
    * cadence; probes before and after return identical results
    * (exercised inside the `bm25_indexed` oracle row). */
  def compactPostingsIndex(
      spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    Bucketing.compactBucketed(spark, table)
    if (spark.catalog.tableExists(s"${table}_docs"))
      Bucketing.compactBucketed(spark, s"${table}_docs")
    val stats = spark.table(s"${table}_stats")
    val hasKey = stats.columns.contains("batch_key")
    // fold only the UNKEYED rows: a keyed row is a takedown correction
    // whose batch digest must survive compaction, or a takedown retry
    // straddling a maintenance pass would re-apply its correction.
    // Keyed rows are one per takedown batch — driver-bounded by nature
    val foldable = if (hasKey) stats.where(col("batch_key").isNull) else stats
    val keyed: Seq[(Long, Long, Long, Long)] =
      if (!hasKey) Seq.empty
      else stats.where(col("batch_key").isNotNull)
        .select(col("n_docs"), col("n_dl"), col("sum_dl"), col("batch_key"))
        .collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val folded = foldable
      .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
        coalesce(sum(col("n_dl")), lit(0L)).as("n_dl"),
        coalesce(sum(col("sum_dl")), lit(0L)).as("sum_dl"))
      .collect()
    import spark.implicits._
    val one = folded.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("n_docs", "n_dl", "sum_dl")
      .withColumn("batch_key", lit(null).cast("long"))
    val kept = keyed.toDF("n_docs", "n_dl", "sum_dl", "batch_key")
    Bucketing.writeTable(one.unionByName(kept), s"${table}_stats")
  }

  /**
   * [[bm25TopK]] against the PERSISTED postings index: the corpus text is
   * never read — the probe filters the postings table to the query terms
   * (bucket-pruned scan), re-derives per-term document frequencies from
   * the filtered postings (so the score is structurally identical to the
   * rescan arm's), broadcasts them back, and aggregates per document.
   * Result ≡ `bm25TopK(corpus, …)` whenever `table` was written/appended
   * from exactly `corpus` — pinned by the `bm25_indexed` oracle. The only
   * Exchange in the probe moves matched postings (documents containing
   * query terms), never the index.
   */
  def bm25TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(query.nonEmpty, "bm25TopKIndexed: empty query")
    val st = spark.table(s"${table}_stats")
      .agg(sum(col("n_docs")), sum(col("n_dl")), sum(col("sum_dl"))).first()
    val n = st.getLong(0).toDouble
    // integer-valued doubles < 2^53 sum exactly, so this equals the rescan
    // arm's avg(dl) bit-for-bit regardless of how many appends contributed
    val avgdl = st.getLong(2).toDouble / st.getLong(1).toDouble
    val p = Retract.readLive(spark, table).where(col("tok").isin(query: _*))
    val dfreq = p.groupBy(col("tok"))
      .agg(countDistinct(col("id")).cast("double").as("dfq"))
    val idf = log(lit(1.0) +
      (lit(n) - col("dfq") + lit(0.5)) / (col("dfq") + lit(0.5)))
    val term = idf * col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) *
        (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    p.join(broadcast(dfreq), "tok")
      .groupBy(col("id"))
      .agg(round(sum(term), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("id"))
      .limit(topK)
  }

  /**
   * Exact PHRASE search against the positional postings index: documents
   * where `phrase`'s tokens occur consecutively, with the (overlapping)
   * occurrence count. The classic positional-index query (Manning,
   * Raghavan & Schütze, IIR §2.4.2), folded as position-list arithmetic:
   * starting from the first term's occurrence list, each next term
   * intersects its list with the previous survivors shifted by one —
   * after k−1 folds the survivors are exactly the phrase's end positions.
   * A repeated-term phrase ("table table") needs no special case: the
   * same list intersects against its own shift.
   *
   * Scale shape: the scan BUCKET-PRUNES to the phrase's terms (same pin
   * as the BM25 probe), the only shuffle groups the matched postings by
   * document, and the fold is a map-side array expression — corpus text
   * is never read, and documents missing any phrase term die in the
   * intersection (null kills the fold) before the filter.
   */
  /** Per-document tok → position-list map for the given query terms —
    * the shared front half of every positional probe: bucket-pruned scan
    * of the terms' postings, ONE Exchange grouping matched postings by
    * document. (tok, id) rows are unique by construction, so the map has
    * no duplicate keys. */
  private def positionsByDoc(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      terms: Seq[String]): DataFrame =
    Retract.readLive(spark, table)
      .where(col("tok").isin(terms.distinct: _*))
      .groupBy(col("id"))
      .agg(map_from_entries(collect_list(
        struct(col("tok"), col("pos")))).as("m"))

  def phraseSearch(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch: empty phrase")
    val byDoc = positionsByDoc(spark, table, phrase)
    val matched = phrase.drop(1).foldLeft(
      element_at(col("m"), phrase.head))((acc, t) =>
        array_intersect(transform(acc, _ + 1), element_at(col("m"), t)))
    byDoc.select(col("id"), size(matched).as("n_matches"))
      .where(col("n_matches") >= 1)
  }

  /**
   * PROXIMITY (slop-k) search against the positional postings index:
   * documents where `termA` and `termB` occur within `slop` token
   * positions of each other, with the pair count — the `/k` operator of
   * IIR §2.4.2's `PositionalIntersect` (the within-k generalization of
   * [[phraseSearch]]'s exact adjacency), the standard probe for
   * licensed-span / boilerplate-neighborhood detection where the phrase
   * varies but the terms stay close.
   *
   * `n_matches` counts ordered position pairs (pa ∈ A, pb ∈ B) with
   * pa ≠ pb and |pa − pb| ≤ slop — symmetric in the two terms, and for a
   * self-query (termA == termB) each unordered pair counts twice, a
   * stated convention the oracle restates independently.
   *
   * Scale shape: identical to the phrase probe — the scan BUCKET-PRUNES
   * to the two terms, the only shuffle groups matched postings by
   * document, and the pair count is a map-side array fold over the two
   * position lists (bounded by document length). Documents missing either
   * term die on the null list before the filter.
   */
  def proximitySearch(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      termA: String,
      termB: String,
      slop: Int): DataFrame = {
    require(slop >= 1, "proximitySearch: slop must be >= 1")
    val byDoc = positionsByDoc(spark, table, Seq(termA, termB))
    val la = element_at(col("m"), termA)
    val lb = element_at(col("m"), termB)
    val pairs = size(flatten(transform(la, pa =>
      filter(lb, pb => pb =!= pa && abs(pb - pa) <= slop))))
    byDoc.select(col("id"), pairs.as("n_matches"))
      .where(col("n_matches") >= 1)
  }

  /**
   * Ranked-retrieval quality metrics — the trec_eval measures every
   * retrieval stack is graded on (nDCG: Järvelin & Kekäläinen 2002,
   * "Cumulated gain-based evaluation of IR techniques", TOIS 20(4);
   * MRR: Voorhees 1999, TREC-8 QA track; AP/P@k/R@k: classic TREC):
   * given per-query RANKINGS and graded relevance LABELS (qrels), emit
   * one metrics row per query.
   *
   *  - `ranked`: (query, id, rank) — rank 1-based; rows with rank > k are
   *    ignored. Bounded ≤ k per query by construction (every ranking in
   *    this engine comes out of a bounded top-k probe).
   *  - `labels`: (query, id, grade) — integer grade ≥ 1 means relevant;
   *    unlabeled retrieved documents count grade 0 (the TREC convention).
   *
   * Definitions, pinned so the oracle can restate them exactly:
   *  - DCG@k  = Σ_{r≤k} (2^grade(r) − 1) / log2(r + 1)
   *  - IDCG@k = the same sum over the k highest label grades, descending
   *  - nDCG@k = DCG/IDCG (null when the query has no positive label)
   *  - MRR    = 1 / min{r : grade(r) > 0} (0.0 when nothing relevant
   *    was retrieved)
   *  - AP@k   = Σ_{r≤k, rel(r)} P(r) / R, P(r) = relevant-in-top-r / r,
   *    R = TOTAL relevant in labels (trec_eval "map" with cutoff k)
   *  - P@k = relevant-retrieved / k;  R@k = relevant-retrieved / R
   *
   * Scale shape: the retrieved side folds to ≤ |Q| rows in ONE aggregate
   * over per-query arrays bounded by k (sort + higher-order folds, all
   * map-side after the query groupBy); the label side folds to ≤ |Q| rows
   * with the bounded top-k aggregate carrying the k best grades (a qrels
   * table is small by construction — human judgments — but the plan never
   * assumes it: no window, no unbounded collect). The two ≤|Q|-row sides
   * meet in one broadcast join. Doubles round to 6 decimals, and every
   * sum folds a sorted bounded array in a FIXED order, so the values are
   * engine-portable.
   */
  def retrievalMetrics(
      ranked: DataFrame,
      labels: DataFrame,
      queryCol: String,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "retrievalMetrics: k must be >= 1")
    val lab = labels.select(col(queryCol).as("query"), col(idCol).as("id"),
      col("grade").cast("long").as("grade"))
    // retrieved side: per query, the rank-sorted (rank, grade) array
    val rg = ranked
      .select(col(queryCol).as("query"), col(idCol).as("id"),
        col("rank").cast("long").as("rank"))
      .where(col("rank") <= k)
      .join(lab, Seq("query", "id"), "left_outer")
      .select(col("query"), col("rank"), coalesce(col("grade"), lit(0L)).as("grade"))
      .groupBy(col("query"))
      .agg(sort_array(collect_list(struct(col("rank"), col("grade")))).as("rg"))
    val gain = (g: Column) => pow(lit(2.0), g.cast("double")) - lit(1.0)
    val dcg = aggregate(col("rg"), lit(0.0), (acc, x) =>
      acc + gain(x.getField("grade")) /
        log2(x.getField("rank").cast("double") + lit(1.0)))
    val relRanks = transform(
      filter(col("rg"), x => x.getField("grade") > 0), _.getField("rank"))
    val mrr = coalesce(lit(1.0) / array_min(relRanks).cast("double"), lit(0.0))
    // AP numerator: fold in rank order carrying (relevant-so-far, sum)
    val apNum = aggregate(col("rg"),
      struct(lit(0L).as("seen"), lit(0.0).as("s")),
      (acc, x) => {
        val rel = x.getField("grade") > 0
        val seen = acc.getField("seen") + when(rel, 1L).otherwise(0L)
        struct(seen.as("seen"),
          (acc.getField("s") + when(rel,
            seen.cast("double") / x.getField("rank").cast("double"))
            .otherwise(lit(0.0))).as("s"))
      }).getField("s")
    val nHit = size(relRanks).cast("long")
    val retrieved = rg.select(col("query"), dcg.as("__dcg"), mrr.as("__mrr"),
      apNum.as("__apnum"), nHit.as("n_hit"))
    // label side: R and IDCG@k from the k best grades (bounded aggregate)
    val topg = Similarity.topKUdaf(k)
    val ideal = lab.where(col("grade") > 0)
      .groupBy(col("query"))
      .agg(count(lit(1)).as("n_rel"),
        topg(col("grade").cast("double"), col("id").cast("long")).as("tg"))
      .select(col("query"), col("n_rel"),
        // items are (grade, id) in grade-desc order; position i (0-based)
        // discounts by log2(i + 2) — fold carries (i, sum)
        aggregate(col("tg.items"),
          struct(lit(0L).as("i"), lit(0.0).as("s")),
          (acc, x) => struct((acc.getField("i") + 1L).as("i"),
            (acc.getField("s") + gain(x.getField("_1")) /
              log2(acc.getField("i").cast("double") + lit(2.0))).as("s")))
          .getField("s").as("__idcg"))
    retrieved.join(broadcast(ideal), Seq("query"), "full_outer")
      .select(col("query"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(when(col("__idcg") > 0, coalesce(col("__dcg"), lit(0.0)) / col("__idcg")), 6)
          .as("ndcg"),
        round(coalesce(col("__mrr"), lit(0.0)), 6).as("mrr"),
        round(when(col("n_rel") > 0,
          coalesce(col("__apnum"), lit(0.0)) / col("n_rel").cast("double")), 6)
          .as("ap"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / lit(k.toDouble), 6)
          .as("precision_k"),
        round(when(col("n_rel") > 0,
          coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_rel").cast("double")), 6)
          .as("recall_k"))
  }
}

/** DuckDB rendering of [[Relevance.bm25TopK]] — same arithmetic, with the
  * corpus statistics recomputed IN SQL (not the Spark literals), so the two
  * engines derive N/avgdl independently and the compare checks the formula,
  * not an echo of one engine's constants. */
object RelevanceSql {

  def bm25TopK(
      table: String,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): String = {
    val toks = graft.functions.TextOpsSql.tokens(textCol)
    val qList = query.map(q => s"'$q'").mkString("(", ", ", ")")
    s"""WITH d AS (SELECT $idCol, $toks AS toks FROM $table),
       |st AS (SELECT count(*)::DOUBLE AS n, avg(len(toks))::DOUBLE AS avgdl
       |       FROM d),
       |tf AS (SELECT $idCol, len(toks)::DOUBLE AS dl, tok,
       |              count(*)::DOUBLE AS tf
       |       FROM (SELECT $idCol, len(toks) AS len_toks, toks,
       |                    unnest(toks) AS tok FROM d)
       |       WHERE tok IN $qList GROUP BY 1, 2, 3),
       |dfq AS (SELECT tok, count(DISTINCT $idCol)::DOUBLE AS dfq
       |        FROM tf GROUP BY tok)
       |SELECT $idCol,
       |       round(sum(
       |         ln(CAST(1.0 AS DOUBLE)
       |            + (st.n - dfq.dfq + CAST(0.5 AS DOUBLE))
       |              / (dfq.dfq + CAST(0.5 AS DOUBLE)))
       |         * tf.tf * CAST(${k1 + 1.0} AS DOUBLE)
       |         / (tf.tf + CAST($k1 AS DOUBLE)
       |            * (CAST(${1.0 - b} AS DOUBLE)
       |               + CAST($b AS DOUBLE) * tf.dl / st.avgdl))), 6) AS bm25
       |FROM tf JOIN dfq USING (tok), st
       |GROUP BY $idCol
       |ORDER BY bm25 DESC, $idCol LIMIT $topK""".stripMargin
  }

  /** Mirror of [[Relevance.rrfHybrid]]: the BM25 CTE is the independent
    * [[bm25TopK]] rendering, the dense arm re-derives cosine with DuckDB
    * list arithmetic, and fusion repeats the fixed-order two-term sum. */
  def rrfHybrid(
      docsTable: String,
      embTable: String,
      docIdCol: String,
      textCol: String,
      vecIdCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      queryVecId: Long,
      armK: Int = 30,
      rrfK: Int = 60,
      topN: Int = 20): String = {
    val bm = bm25TopK(docsTable, docIdCol, textCol, queryTerms, topK = armK)
    val cos = graft.functions.VectorOpsSql.cosine(s"q.$vecCol", s"c.$vecCol")
    s"""WITH bm AS ($bm),
       |bmr AS (SELECT $docIdCol AS id,
       |               row_number() OVER (ORDER BY bm25 DESC, $docIdCol)
       |                 AS r_text FROM bm),
       |cs AS (SELECT c.$vecIdCol AS id, $cos AS cos
       |       FROM $embTable c,
       |            (SELECT $vecCol FROM $embTable
       |             WHERE $vecIdCol = $queryVecId) q
       |       WHERE c.$vecIdCol <> $queryVecId),
       |csr AS (SELECT id, r_vec FROM (
       |          SELECT id, row_number() OVER (ORDER BY cos DESC, id)
       |                   AS r_vec FROM cs)
       |        WHERE r_vec <= $armK),
       |f AS (SELECT coalesce(b.id, c.id) AS id,
       |             round(coalesce(CAST(1.0 AS DOUBLE) / ($rrfK + b.r_text),
       |                            CAST(0.0 AS DOUBLE))
       |                 + coalesce(CAST(1.0 AS DOUBLE) / ($rrfK + c.r_vec),
       |                            CAST(0.0 AS DOUBLE)), 9) AS rrf_score,
       |             b.r_text, c.r_vec
       |      FROM bmr b FULL OUTER JOIN csr c ON b.id = c.id)
       |SELECT id AS $docIdCol, rrf_score, r_text, r_vec
       |FROM f ORDER BY rrf_score DESC, id LIMIT $topN""".stripMargin
  }

  /** Mirror of [[Relevance.retrievalMetrics]]: `rankedSql` / `labelsSql`
    * are full SELECTs producing (query, id, rank) / (query, id, grade)
    * rows; the metrics restate the pinned definitions with window
    * functions (per-query partitions over k-bounded ranked lists). */
  def retrievalMetrics(rankedSql: String, labelsSql: String, k: Int): String =
    s"""WITH ranked AS ($rankedSql),
       |labels AS ($labelsSql),
       |j AS (SELECT r.query, r.rank, coalesce(l.grade, 0) AS grade
       |      FROM ranked r LEFT JOIN labels l
       |        ON r.query = l.query AND r.id = l.id
       |      WHERE r.rank <= $k),
       |ret AS (SELECT query,
       |          sum((pow(CAST(2.0 AS DOUBLE), grade) - 1.0)
       |              / log2(rank + CAST(1.0 AS DOUBLE))) AS dcg,
       |          coalesce(CAST(1.0 AS DOUBLE)
       |              / min(CASE WHEN grade > 0 THEN rank END), 0.0) AS mrr,
       |          CAST(sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |            AS n_hit
       |        FROM j GROUP BY query),
       |apx AS (SELECT query, rank, grade,
       |          sum(CASE WHEN grade > 0 THEN 1 ELSE 0 END)
       |            OVER (PARTITION BY query ORDER BY rank) AS cum
       |        FROM j),
       |ap AS (SELECT query,
       |         sum(CASE WHEN grade > 0
       |                  THEN cum::DOUBLE / rank ELSE 0.0 END) AS apnum
       |       FROM apx GROUP BY query),
       |nrel AS (SELECT query, count(*) AS n_rel
       |         FROM labels WHERE grade > 0 GROUP BY query),
       |idl AS (SELECT query,
       |          sum((pow(CAST(2.0 AS DOUBLE), grade) - 1.0)
       |              / log2(i + CAST(1.0 AS DOUBLE))) AS idcg
       |        FROM (SELECT query, grade,
       |                row_number() OVER (PARTITION BY query
       |                                   ORDER BY grade DESC, id) AS i
       |              FROM labels WHERE grade > 0)
       |        WHERE i <= $k GROUP BY query),
       |lbl AS (SELECT query, n_rel, idcg
       |        FROM nrel JOIN idl USING (query))
       |SELECT coalesce(r.query, l.query) AS query,
       |       CAST(coalesce(l.n_rel, 0) AS BIGINT) AS n_rel,
       |       CAST(coalesce(r.n_hit, 0) AS BIGINT) AS n_hit,
       |       round(CASE WHEN l.idcg > 0
       |                  THEN coalesce(r.dcg, 0.0) / l.idcg END, 6) AS ndcg,
       |       round(coalesce(r.mrr, 0.0), 6) AS mrr,
       |       round(CASE WHEN l.n_rel > 0
       |                  THEN coalesce(a.apnum, 0.0) / l.n_rel END, 6) AS ap,
       |       round(coalesce(r.n_hit, 0)::DOUBLE / $k, 6) AS precision_k,
       |       round(CASE WHEN l.n_rel > 0
       |                  THEN coalesce(r.n_hit, 0)::DOUBLE / l.n_rel END, 6)
       |         AS recall_k
       |FROM ret r
       |FULL OUTER JOIN lbl l ON r.query = l.query
       |LEFT JOIN ap a ON coalesce(r.query, l.query) = a.query""".stripMargin

  /** Mirror of [[Relevance.dsirScores]]. `rawFrom`/`targetFrom` are FROM
    * bodies producing ($idCol,) $textCol rows; the ((h % B) + B) % B
    * bucket fold matches Spark's `pmod` on negative hashes exactly. */
  def dsirScores(
      rawFrom: String,
      targetFrom: String,
      idCol: String,
      textCol: String,
      buckets: Int = 256): String = {
    val th = TextOpsSql.tokenHashes(TextOpsSql.tokens(textCol))
    def bucketed(from: String, withId: Boolean): String = {
      val id = if (withId) s"$idCol, " else ""
      s"SELECT $id((h % $buckets) + $buckets) % $buckets AS b " +
        s"FROM (SELECT ${id}unnest($th) AS h FROM $from)"
    }
    s"""WITH rt AS (${bucketed(rawFrom, withId = true)}),
       |tt AS (${bucketed(targetFrom, withId = false)}),
       |ct AS (SELECT b, count(*) AS c FROM tt GROUP BY b),
       |cr AS (SELECT b, count(*) AS c FROM rt GROUP BY b),
       |tot AS (SELECT (SELECT count(*) FROM tt) AS tt_n,
       |               (SELECT count(*) FROM rt) AS tr_n)
       |SELECT rt.$idCol, count(*) AS n_toks,
       |       round(sum(
       |           ln((coalesce(ct.c, 0)::DOUBLE + 1.0)
       |              / (tt_n::DOUBLE + $buckets))
       |         - ln((coalesce(cr.c, 0)::DOUBLE + 1.0)
       |              / (tr_n::DOUBLE + $buckets))), 6) AS dsir_score
       |FROM rt LEFT JOIN ct USING (b) LEFT JOIN cr USING (b), tot
       |GROUP BY rt.$idCol""".stripMargin
  }
}
