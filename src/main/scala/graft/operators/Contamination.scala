package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, TextOpsSql}

/**
 * Benchmark-contamination check: how much of each training document's
 * n-gram content also appears in a held-out evaluation set. The standard
 * decontamination step of a pretraining pipeline — eval-overlapping
 * documents are dropped or down-weighted before training.
 *
 * Shape: the eval split is chosen DETERMINISTICALLY by [[Sampling.hash16]]
 * (so the same ids form the eval set on every run and in the oracle), each
 * document is reduced to its DISTINCT word-k-gram hashes
 * ([[TextOps.shingleHashes]]), and a train-side explode joins against the
 * union of eval shingles.
 *
 * Scale posture: the eval side is benchmarks — thousands of documents, a
 * few million distinct shingles — while the train side is the 100 TB
 * corpus. The eval shingle set is therefore the BROADCAST side; the train
 * side streams map-side through explode → broadcast-hash-join → per-doc
 * partial-aggregated count, with no shuffle of train shingles at all (the
 * final groupBy keys on doc_id, which AQE coalesces; counts are combined
 * map-side first).
 */
object Contamination {

  /**
   * Per-train-document contamination against the hash-selected eval split.
   *
   * @param evalRate  fraction of documents (by id-hash) forming the eval set
   * @return contaminated train docs only (inner join): doc_id, n_shingles
   *         (distinct k-grams in the doc), n_shared (of them, how many occur
   *         anywhere in the eval set), contam_frac = n_shared / n_shingles
   */
  def check(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalRate: Double,
      seed: Long = 0L,
      k: Int = 3): DataFrame = {
    val shingles = array_distinct(
      TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col(textCol))), k))
    val isEval = Sampling.hash16(col(idCol), seed) <
      lit(math.round(evalRate * Sampling.Buckets))

    // filter BEFORE shingling on both branches: the eval scan prunes to the
    // sampled ~evalRate of rows (predicate on the id column pushes into the
    // scan), so only the small side ever shingles twice
    val evalShingles = docs.where(isEval)
      .select(explode(shingles).as("sh")).distinct()

    docs.where(!isEval)
      .select(col(idCol), shingles.as("shs"))
      .select(col(idCol), size(col("shs")).cast("bigint").as("n_shingles"),
        explode(col("shs")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contam_frac"))
  }

  /**
   * Contamination against SEVERAL eval benchmarks at once, with per-set
   * hit attribution: one output row per (train doc, eval set it overlaps).
   *
   * The set-tagged shingle union — (eval_set, shingle), deduped per set —
   * is built once and broadcast ONCE; the 100 TB train side still streams
   * through a single explode → one broadcast-hash-join → one per-(doc, set)
   * partially-aggregated count, identical plan shape and train-side cost
   * to the single-set [[check]] no matter how many benchmarks are checked.
   * Callers pass each benchmark as its own DataFrame (and exclude eval
   * rows from `docs` if the sets are carved from the corpus itself).
   */
  def checkMulti(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      evalSets: Seq[(String, DataFrame)],
      k: Int = 3): DataFrame = {
    require(evalSets.nonEmpty, "checkMulti: no eval sets given")
    val shingles = array_distinct(
      TextOps.shingleHashes(TextOps.tokenHashes(TextOps.tokens(col(textCol))), k))
    val evalShingles = evalSets.map { case (name, ev) =>
      ev.select(explode(shingles).as("sh")).distinct()
        .select(lit(name).as("eval_set"), col("sh"))
    }.reduce(_.unionByName(_))

    docs
      .select(col(idCol), shingles.as("shs"))
      .select(col(idCol), size(col("shs")).cast("bigint").as("n_shingles"),
        explode(col("shs")).as("sh"))
      .join(broadcast(evalShingles), "sh")
      .groupBy(col(idCol), col("eval_set"), col("n_shingles"))
      .agg(count(lit(1)).as("n_shared"))
      .select(col(idCol), col("eval_set"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contam_frac"))
  }

  /**
   * FUZZY (near-duplicate) contamination: train documents whose word-
   * shingle set has Jaccard ≥ `minJaccard` with some eval document —
   * the decontamination step exact n-gram overlap misses (a benchmark
   * answer lightly paraphrased, truncated, or re-wrapped still leaks).
   * Candidates come from MinHash-LSH banding BETWEEN the corpora (a train
   * doc and an eval doc must share a band bucket), verified by exact
   * Jaccard on the candidate pairs only — never a train-side self-join.
   *
   * Scale posture: the eval side is benchmark-sized, so its banded rows
   * AND its shingle sets broadcast; the 100 TB train side streams map-side
   * through signature → band-explode → two broadcast joins, shuffling only
   * the candidate (train, eval) id pairs for the distinct. Docs too short
   * to shingle have null buckets and never pair — the batch operators'
   * parity rule.
   *
   * @return (idCol, eval_id, jaccard) — one row per contaminated
   *         (train doc, eval doc) pair at or above the threshold
   */
  def fuzzy(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double): DataFrame = {
    val tSig = Dedup.withSignature(
      train.select(col(idCol), col(textCol)), idCol, textCol).cache()
    val eSig = Dedup.withSignature(
      evalSet.select(col(idCol).as("eval_id"), col(textCol)),
      "eval_id", textCol).cache()
    val tBands = Dedup.banded(tSig, idCol, Nil)
    val eBands = Dedup.banded(eSig, "eval_id", Nil)
      .select(col("id").as("eval_id"), col("band"), col("bucket"))
    val candidates = tBands
      .join(broadcast(eBands), Seq("band", "bucket"))
      .select(col("id").as(idCol), col("eval_id"))
      .dropDuplicates(idCol, "eval_id")
    val verified = candidates
      .join(tSig.select(col(idCol), col("shingles").as("__tsh")), Seq(idCol))
      .join(broadcast(
        eSig.select(col("eval_id"), col("shingles").as("__esh"))),
        Seq("eval_id"))
      .select(col(idCol), col("eval_id"),
        graft.functions.TextOps.jaccard(col("__tsh"), col("__esh"))
          .as("jaccard"))
      .where(col("jaccard") >= minJaccard)
    CacheScope.unpersistAfterAction(verified, Seq(tSig, eSig))
  }

  /**
   * Winnowing-fingerprint contamination (the MOSS match, Schleimer et al.
   * 2003): train and eval documents each reduce to their winnow-SELECTED
   * fingerprint sets (density 2/(w+1) of the full shingle stream), the two
   * fingerprint relations equi-join on the hash, and pairs sharing at
   * least `minShared` fingerprints report. The winnowing guarantee makes
   * this a substring detector: any shared run of ≥ w+k−1 tokens shares a
   * selected fingerprint — Jaccard-style whole-document similarity can
   * miss a verbatim paragraph pasted into an otherwise-unrelated document;
   * this cannot.
   *
   * Scale shape: the train side carries (id, fp) only — the ~3×-reduced
   * selected stream, never text or positions; the eval side (benchmark
   * suites are small) aggregates to distinct (eval_id, fp) and BROADCASTS.
   */
  def winnowMatches(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 4,
      minShared: Int = 2): DataFrame = {
    // ONE fingerprint projection serves the in-session and indexed paths
    // (a second inline copy had already diverged on the id cast)
    val tFps = winnowRows(train, idCol, textCol, w)
      .select(col("id").as(idCol), col("fp"))
    val eFps = winnowRows(
      evalSet.select(col(idCol).as("eval_id"), col(textCol)),
      "eval_id", textCol, w)
      .select(col("id").as("eval_id"), col("fp"))
    tFps.join(broadcast(eFps), Seq("fp"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** [[winnowMatches]] with the TRAIN side's fingerprints precomputed
    * (`(id, fp)` rows from [[winnowFingerprints]]) — extraction is the
    * expensive stage, so a caller gauging several winnow paths over one
    * corpus pays it once and hands the rows to each. */
  def winnowMatchesRows(
      trainFps: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 4,
      minShared: Int = 2): DataFrame = {
    val eFps = winnowRows(
      evalSet.select(col(idCol).as("eval_id"), col(textCol)),
      "eval_id", textCol, w)
      .select(col("id").as("eval_id"), col("fp"))
    trainFps.select(col("id").as(idCol), col("fp"))
      .join(broadcast(eFps), Seq("fp"))
      .groupBy(col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Public face of [[winnowRows]]: the distinct (id, fp) winnow-selected
    * fingerprints of `df` — the reusable extraction product. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      w: Int = 4): DataFrame = winnowRows(df, idCol, textCol, w)

  /** [[writeWinnowIndex]] from precomputed (id, fp) rows. */
  def writeWinnowIndexRows(rows: DataFrame, table: String,
      buckets: Int): Unit =
    Bucketing.writeBucketed(rows.select(col("id"), col("fp")),
      table, "fp", buckets)

  /** [[appendWinnowIndex]] from precomputed (id, fp) rows. */
  def appendWinnowIndexRows(rows: DataFrame, table: String): Unit =
    DedupIndex.appendBucketed(rows.select(col("id"), col("fp")), table)

  /** The (id, fp) winnow-fingerprint rows [[winnowMatches]] computes for
    * its train side — extracted so they can persist. */
  private[operators] def winnowRows(df: DataFrame, idCol: String,
      textCol: String, w: Int): DataFrame = {
    import graft.functions.TextOps
    df.select(col(idCol).cast("long").as("id"),
        explode(TextOps.winnow(TextOps.shingleHashes(
          TextOps.tokenHashes(TextOps.tokens(col(textCol)))), w)).as("__s"))
      .select(col("id"), col("__s.fp").as("fp"))
      .distinct()
  }

  /**
   * Persist the train corpus's winnow-SELECTED fingerprints as an at-rest
   * index (the same bucketed ingest-loop lifecycle as the digest/band/
   * postings indexes): fingerprint EXTRACTION — tokenize + shingle +
   * winnow over every corpus byte — is the expensive stage, and it is
   * paid exactly once per document at its own ingest; every later
   * benchmark release probes the index without touching corpus text.
   * Bucketed on `fp`, so a non-broadcast probe co-locates without an
   * index-side Exchange.
   */
  def writeWinnowIndex(train: DataFrame, idCol: String, textCol: String,
      w: Int, table: String, buckets: Int): Unit =
    Bucketing.writeBucketed(winnowRows(train, idCol, textCol, w),
      table, "fp", buckets)

  /** Blind per-release append — restates the table's bucket spec, same
    * as every index family. */
  def appendWinnowIndex(batch: DataFrame, idCol: String, textCol: String,
      w: Int, table: String): Unit =
    DedupIndex.appendBucketed(winnowRows(batch, idCol, textCol, w), table)

  /** [[winnowMatches]] against the PERSISTED train fingerprints: the
    * eval side fingerprints fresh (benchmarks are small) and broadcasts
    * onto the index scan — no corpus re-fingerprinting, ever. */
  def winnowMatchesIndexed(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 4,
      minShared: Int = 2): DataFrame = {
    val eFps = winnowRows(
      evalSet.select(col(idCol).as("eval_id"), col(textCol)),
      "eval_id", textCol, w)
      .select(col("id").as("eval_id"), col("fp"))
    Retract.readLive(spark, table)
      .join(broadcast(eFps), Seq("fp"))
      .groupBy(col("id").as(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}

/** DuckDB rendering of [[Contamination.check]] for the oracle. */
object ContaminationSql {

  /** Staged CTE chain ending in `(idCol, shingles)` — the distinct shingle
    * hashes of `textCol`, computed ONCE per row. Inlining the composed
    * shingle expression into a consumer that references it 2-3 times makes
    * DuckDB re-evaluate the whole tokenize→hash→shingle pipeline per
    * reference (observed 100+ s per arm); the column-per-stage layering
    * keeps every downstream reference a plain column read. */
  private def shingleCtes(
      prefix: String,
      table: String,
      idCol: String,
      textCol: String,
      k: Int): String =
    s"""${prefix}tok AS (SELECT $idCol, ${TextOpsSql.tokens(textCol)} AS toks
       |               FROM $table),
       |${prefix}th AS (SELECT $idCol, ${TextOpsSql.tokenHashes("toks")} AS thash
       |              FROM ${prefix}tok),
       |${prefix}shl AS (SELECT $idCol,
       |                    list_distinct(${TextOpsSql.shingleHashes("thash", k)}) AS shingles
       |               FROM ${prefix}th)""".stripMargin

  def check(
      idCol: String,
      textCol: String,
      evalRate: Double,
      seed: Long = 0L,
      k: Int = 3,
      table: String = "documents"): String = {
    val isEval =
      s"${SamplingSql.hash16(idCol, seed)} < ${math.round(evalRate * Sampling.Buckets)}"
    s"""WITH ${shingleCtes("c", table, idCol, textCol, k)},
       |sh AS (
       |  SELECT $idCol, $isEval AS is_eval,
       |         len(shingles) AS n_shingles, unnest(shingles) AS sh
       |  FROM cshl),
       |ev AS (SELECT DISTINCT sh FROM sh WHERE is_eval)
       |SELECT sh.$idCol, n_shingles, count(*) AS n_shared,
       |       count(*)::DOUBLE / n_shingles::DOUBLE AS contam_frac
       |FROM sh JOIN ev USING (sh)
       |WHERE NOT is_eval
       |GROUP BY sh.$idCol, n_shingles""".stripMargin
  }

  /** Mirror of [[Contamination.checkMulti]] with `nSets` eval sets carved
    * as adjacent id-hash ranges (set i = buckets [i*r, (i+1)*r), named
    * eval_$i) and the train side = everything past the last range. */
  def checkMulti(
      idCol: String,
      textCol: String,
      nSets: Int,
      evalRate: Double,
      seed: Long = 0L,
      k: Int = 3,
      table: String = "documents"): String = {
    val r = math.round(evalRate * Sampling.Buckets)
    val setCase = (0 until nSets).map { i =>
      s"WHEN h < ${(i + 1) * r} THEN 'eval_$i'"
    }.mkString(" ")
    s"""WITH ${shingleCtes("c", table, idCol, textCol, k)},
       |sh AS (
       |  SELECT $idCol, ${SamplingSql.hash16(idCol, seed)} AS h,
       |         len(shingles) AS n_shingles, unnest(shingles) AS sh
       |  FROM cshl),
       |ev AS (SELECT DISTINCT CASE $setCase END AS eval_set, sh
       |       FROM sh WHERE h < ${nSets * r})
       |SELECT sh.$idCol, ev.eval_set, n_shingles, count(*) AS n_shared,
       |       count(*)::DOUBLE / n_shingles::DOUBLE AS contam_frac
       |FROM sh JOIN ev USING (sh)
       |WHERE h >= ${nSets * r}
       |GROUP BY sh.$idCol, ev.eval_set, n_shingles""".stripMargin
  }

  /** Mirror of [[Contamination.fuzzy]]: `trainFrom`/`evalFrom` are FROM
    * bodies producing ($idCol, $textCol) rows for each corpus. */
  def fuzzy(
      idCol: String,
      textCol: String,
      trainFrom: String,
      evalFrom: String,
      minJaccard: Double): String = {
    val toks = TextOpsSql.tokens(textCol)
    val thash = TextOpsSql.tokenHashes("toks")
    val shingles = TextOpsSql.shingleHashes("thash")
    val sig = TextOpsSql.minHashSignature("shingles")
    val bucketCase = (0 until TextOps.Bands)
      .map(b => s"WHEN ${b} THEN ${TextOpsSql.bandHash("sig", b)}")
      .mkString("CASE band ", " ", " END")
    val bandVals = (0 until TextOps.Bands)
      .map(b => s"($b)").mkString("(VALUES ", ", ", ") b(band)")
    def side(name: String, from: String, id: String) =
      s"""${name}tok AS (SELECT $idCol AS $id, $toks AS toks FROM $from),
         |${name}th AS (SELECT $id, $thash AS thash FROM ${name}tok),
         |${name}sh AS (SELECT $id, list_distinct($shingles) AS shingles
         |              FROM ${name}th),
         |${name}sg AS (SELECT $id, shingles, $sig AS sig FROM ${name}sh),
         |${name}bands AS (SELECT $id, shingles, band, $bucketCase AS bucket
         |                 FROM ${name}sg, $bandVals)""".stripMargin
    s"""WITH ${side("t", trainFrom, idCol)},
       |${side("e", evalFrom, "eval_id")}
       |SELECT $idCol, eval_id, round(j, 6) AS jaccard FROM (
       |  SELECT DISTINCT t.$idCol, e.eval_id,
       |         ${TextOpsSql.jaccard("t.shingles", "e.shingles")} AS j
       |  FROM tbands t JOIN ebands e
       |    ON t.band = e.band AND t.bucket = e.bucket)
       |WHERE j >= $minJaccard""".stripMargin
  }
}
