package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * CCNet-style perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting
 * High Quality Monolingual Datasets from Web Crawl Data", LREC — §4.3
 * "perplexity buckets"): a language model is trained on a CLEAN reference
 * slice of the corpus, every document is scored under it, and the corpus
 * splits into head / middle / tail terciles by score — head (lowest
 * perplexity ≈ highest mean log-probability) is the "looks like the
 * reference" slice a pretraining pipeline keeps or upsamples.
 *
 * Reduced to Spark geometry (the reference uses a KenLM 5-gram; the
 * contract here is the GEOMETRY, with a unigram Laplace model standing in
 * for the scorer):
 *
 *  - TRAINING is one vocabulary-sized aggregate over the REFERENCE slice
 *    (token counts) — map-side combined, shuffle rows proportional to
 *    distinct tokens, never corpus tokens;
 *  - the model BROADCASTS to the scoring join (vocabulary-sized, the same
 *    must-broadcast argument as [[LanguageModel]]); unseen tokens take the
 *    Laplace floor `1 / (T + V)` where `V` counts the distinct tokens of
 *    the WHOLE corpus — both engines derive `V` independently, so
 *    out-of-reference tokens score identically everywhere;
 *  - SCORING is map-side per token + one per-doc combinable aggregate;
 *  - BUCKETING computes the two tercile thresholds with ONE exact
 *    `percentile` aggregate (collect of exactly 2 doubles) and assigns
 *    buckets map-side by comparison — deliberately NOT `ntile()` over a
 *    global ORDER BY, which is an unsplittable single-partition window at
 *    corpus scale. At 100 TB swap `approx_percentile` in the same plan
 *    shape (mergeable sketch; same two-double collect) — the exact
 *    aggregate is the correctness anchor, per the `profile_quantiles`
 *    precedent.
 *
 * Token identity is the 31-bit polynomial token hash (native
 * `TokenHashesExpr`); scores round to 6 decimals BEFORE thresholding so
 * both engines rank identical values. Documents with no tokens score the
 * Laplace floor (they have no evidence of quality); ties on a threshold
 * fall to the lower bucket in both renderings (`<=`).
 */
object Perplexity {

  /** (idCol, mean_logprob, n_toks, bucket) for every document; `refPred`
    * selects the clean reference slice (its docs are scored too). */
  def pplBuckets(
      df: DataFrame,
      idCol: String,
      textCol: String,
      refPred: Column): DataFrame = {
    val th = TextOps.tokenHashes(TextOps.tokens(col(textCol)))
    val base = df.select(col(idCol), th.as("th"))
    val toks = base.select(col(idCol), explode(col("th")).as("u"))
    // reference model: token -> count over the reference slice only
    val ref = df.where(refPred)
      .select(explode(TextOps.tokenHashes(TextOps.tokens(col(textCol)))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val total = ref.agg(coalesce(sum(col("cu")), lit(0L))).first().getLong(0)
    val vocab = toks.select(col("u")).distinct().count()
    val denom = (total + vocab).toDouble
    // per-token Laplace log-prob, unseen -> log10(1 / (T + V))
    val scored = toks
      .join(broadcast(ref), Seq("u"), "left")
      .select(col(idCol),
        log10((coalesce(col("cu"), lit(0L)).cast("double") + lit(1.0))
          / lit(denom)).as("lp"))
      .groupBy(col(idCol))
      .agg(round(avg(col("lp")), 6).as("mean_logprob"),
        count(lit(1)).as("n_toks"))
    // token-free docs: no rows above — they take the floor score
    val floorLp = math.log10(1.0 / denom)
    val all = df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("mean_logprob"), round(lit(floorLp), 6)).as("mean_logprob"),
        coalesce(col("n_toks"), lit(0L)).as("n_toks"))
    // tercile thresholds: one exact-percentile aggregate, two doubles out
    val row = all.agg(expr(
      "percentile(mean_logprob, array(CAST(1.0/3.0 AS DOUBLE), CAST(2.0/3.0 AS DOUBLE)))")).first()
    val qs = row.getSeq[Double](0)
    // thresholds round like the scores: the bucket comparison happens on
    // 6-decimal values in BOTH renderings (HALF_UP — what Spark's and
    // DuckDB's round() both do, unlike rint's half-even)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (t1, t2) = (r6(qs(0)), r6(qs(1)))
    all.withColumn("bucket",
      when(col("mean_logprob") <= t1, lit("tail"))
        .when(col("mean_logprob") <= t2, lit("middle"))
        .otherwise(lit("head")))
  }
}

/** DuckDB rendering of [[Perplexity.pplBuckets]] — same token hashes, same
  * Laplace arithmetic, same rounded scores; thresholds from DuckDB's own
  * `quantile_cont` (an independent linear-interpolation implementation, the
  * `profile_quantiles` precedent). */
object PerplexitySql {
  import graft.functions.TextOpsSql

  /** Full query: (id, mean_logprob, n_toks, bucket) ordered by id.
    * `refPred` is a SQL predicate over the base table's columns. */
  def pplBuckets(table: String, idCol: String, textCol: String,
      refPred: String): String = {
    val th = TextOpsSql.tokenHashes(TextOpsSql.tokens(textCol))
    s"""WITH tok AS (SELECT $idCol, unnest($th) AS u FROM $table),
       |ref AS (SELECT u, count(*) AS cu
       |        FROM (SELECT unnest($th) AS u FROM $table WHERE $refPred)
       |        GROUP BY u),
       |t AS (SELECT coalesce(sum(cu), 0)::BIGINT AS total FROM ref),
       |v AS (SELECT count(DISTINCT u)::BIGINT AS vocab FROM tok),
       |scored AS (
       |  SELECT $idCol,
       |         round(avg(log10((coalesce(cu, 0)::DOUBLE + 1.0)
       |                         / (total + vocab)::DOUBLE)), 6) AS mean_logprob,
       |         count(*) AS n_toks
       |  FROM tok LEFT JOIN ref USING (u), t, v
       |  GROUP BY $idCol),
       |alld AS (
       |  SELECT b.$idCol,
       |         coalesce(s.mean_logprob,
       |                  round(log10(1.0 / (total + vocab)::DOUBLE), 6))
       |           AS mean_logprob,
       |         coalesce(s.n_toks, 0) AS n_toks
       |  FROM $table b LEFT JOIN scored s USING ($idCol), t, v),
       |q AS (SELECT round(quantile_cont(mean_logprob, 1.0/3.0), 6) AS t1,
       |             round(quantile_cont(mean_logprob, 2.0/3.0), 6) AS t2 FROM alld)
       |SELECT $idCol, mean_logprob, n_toks,
       |       CASE WHEN mean_logprob <= t1 THEN 'tail'
       |            WHEN mean_logprob <= t2 THEN 'middle'
       |            ELSE 'head' END AS bucket
       |FROM alld, q ORDER BY $idCol""".stripMargin
  }
}
