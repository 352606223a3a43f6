package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Corpus-trained bigram language-model scoring with a PRUNED, BROADCAST
 * model — the KenLM-shaped quality filter (CCNet-style perplexity gating)
 * reduced to its Spark geometry:
 *
 *  - TRAINING is two vocabulary-sized aggregates over the corpus (bigram
 *    counts, unigram counts) — map-side partial combine, shuffle rows
 *    proportional to DISTINCT n-grams, never corpus tokens;
 *  - the bigram table is PRUNED to the top-K by count (deterministic
 *    count-desc, id-asc tie-break) — real LMs ship pruned/quantized for
 *    exactly this reason: the model must broadcast, because scoring 100 TB
 *    pays per-token model lookups and a shuffle-join against a corpus-sized
 *    n-gram table would dwarf the scan;
 *  - SCORING is map-side: adjacent token-hash pairs stream through two
 *    broadcast joins (pruned bigrams; unigrams for the Katz-style backoff
 *    `alpha·c(w2)/T`), then one per-doc aggregate.
 *
 * Token identity is the 31-bit polynomial token hash (native
 * `TokenHashesExpr`) — hash collisions merge tokens identically in every
 * rendering, so the oracle reproduces scores exactly. Documents with fewer
 * than two tokens have no bigrams and no score row.
 */
object LanguageModel {

  def bigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 10000,
      alpha: Double = 0.4): DataFrame = {
    val th = TextOps.tokenHashes(TextOps.tokens(col(textCol)))
    val base = df.select(col(idCol), th.as("th"))
    // adjacent (u1, u2) pairs via slice+zip — codegen'd builtins, one pass,
    // no lambda capture (the shingle re-inlining trap does not apply)
    val pairs = base
      .where(size(col("th")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("th"), lit(1), size(col("th")) - 1),
        slice(col("th"), lit(2), size(col("th")) - 1))).as("p"))
      .select(col(idCol), col("p.0").as("u1"), col("p.1").as("u2"))
    val uni = base.select(explode(col("th")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val total = uni.agg(sum(col("cu"))).first().getLong(0)
    val bgTop = pairs.groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("cb"))
      .orderBy(col("cb").desc, col("u1"), col("u2"))
      .limit(topK)
    // model table: retained bigram -> (cb, c(w1)); built once at train time
    val model = bgTop.join(
      uni.select(col("u").as("u1"), col("cu").as("cu1")), "u1")
    val lp = when(col("cb").isNotNull,
        log(col("cb").cast("double") / col("cu1").cast("double")))
      .otherwise(log(
        lit(alpha) * col("cu2").cast("double") / lit(total.toDouble)))
    pairs
      .join(broadcast(model), Seq("u1", "u2"), "left")
      .join(broadcast(uni.select(col("u").as("u2"), col("cu").as("cu2"))),
        Seq("u2"))
      .withColumn("lp", lp)
      .groupBy(col(idCol))
      .agg(round(avg(col("lp")), 6).as("mean_bigram_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /**
   * Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
   * smoothing KenLM ships by default, Heafield 2011) with a fixed
   * absolute discount `d`:
   *
   *   P(w2|w1) = max(c(w1 w2) − d, 0)/c(w1 ·)
   *              + d · N1+(w1 ·)/c(w1 ·) · N1+(· w2)/N1+(· ·)
   *
   * where c(w1 ·) is w1's CONTEXT count (bigrams starting at w1),
   * N1+(w1 ·)/N1+(· w2) are the distinct-continuation counts and
   * N1+(· ·) the distinct-bigram total — the continuation distribution
   * that makes KN famously robust ("Francisco" is frequent but follows
   * only "San", so its continuation probability is tiny).
   *
   * Spark geometry, sized for 100 TB:
   *  - ONE distinct-bigram-sized aggregate; every model table derives
   *    from it (context counts, forward/reverse continuation counts) at
   *    VOCABULARY size — all broadcast, the corpus never shuffle-joins;
   *  - N1+(· ·) is one driver scalar (exact long);
   *  - the bigram table PRUNES to the top-`topK` by count (count-desc,
   *    (u1, u2)-asc tie-break). A pruned-out or unseen bigram scores the
   *    continuation arm alone — the same pruned-backoff approximation
   *    real shipped LMs make, stated rather than hidden;
   *  - scoring is map-side: three broadcast joins, one per-doc aggregate.
   *
   * A token never observed as a context (corpus-final position only) has
   * no c(w1 ·) row; its mass coalesces to the bare continuation
   * probability. Scores round to 6 decimals before comparison.
   */
  def knBigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 10000,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, "knBigramLogProb: discount must be in (0, 1)")
    val th = TextOps.tokenHashes(TextOps.tokens(col(textCol)))
    val base = df.select(col(idCol), th.as("th"))
    val pairs = base
      .where(size(col("th")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("th"), lit(1), size(col("th")) - 1),
        slice(col("th"), lit(2), size(col("th")) - 1))).as("p"))
      .select(col(idCol), col("p.0").as("u1"), col("p.1").as("u2"))
    val bg = pairs.groupBy(col("u1"), col("u2"))
      .agg(count(lit(1)).as("cb"))
    // vocabulary-sized model tables, all derived from the ONE bigram agg
    val ctx = bg.groupBy(col("u1"))
      .agg(sum(col("cb")).as("ctx"), count(lit(1)).as("n1f"))
    val rev = bg.groupBy(col("u2")).agg(count(lit(1)).as("n1r"))
    val n1pAll = bg.count()
    val bgTop = bg.orderBy(col("cb").desc, col("u1"), col("u2")).limit(topK)
    val pcont = col("n1r").cast("double") / lit(n1pAll.toDouble)
    val lam = lit(d) * col("n1f").cast("double") / col("ctx").cast("double")
    val prob = when(col("ctx").isNull, pcont).otherwise(
      when(col("cb").isNotNull,
        (col("cb").cast("double") - lit(d)) / col("ctx").cast("double") +
          lam * pcont)
        .otherwise(lam * pcont))
    pairs
      .join(broadcast(bgTop), Seq("u1", "u2"), "left")
      .join(broadcast(ctx), Seq("u1"), "left")
      .join(broadcast(rev), Seq("u2"))
      .withColumn("lp", log(prob))
      .groupBy(col(idCol))
      .agg(round(avg(col("lp")), 6).as("mean_kn_logprob"),
        count(lit(1)).as("n_bigrams"))
  }
}

/** DuckDB rendering of [[LanguageModel.bigramLogProb]] — same counts, same
  * pruning tie-break, same backoff arithmetic; the token total is recomputed
  * IN SQL so the engines derive it independently. */
object LanguageModelSql {

  def bigramLogProb(
      table: String,
      idCol: String,
      textCol: String,
      topK: Int = 10000,
      alpha: Double = 0.4): String = {
    val toks = graft.functions.TextOpsSql.tokens(textCol)
    val thash = graft.functions.TextOpsSql.tokenHashes("toks")
    s"""WITH tok AS (SELECT $idCol, $toks AS toks FROM $table),
       |d AS (SELECT $idCol, $thash AS th FROM tok),
       |pr AS (SELECT $idCol, p[1] AS u1, p[2] AS u2 FROM (
       |         SELECT $idCol, unnest(list_transform(range(0, len(th)-1),
       |                        i -> [th[i+1], th[i+2]])) AS p
       |         FROM d WHERE len(th) >= 2)),
       |uni AS (SELECT u, count(*) AS cu
       |        FROM (SELECT unnest(th) AS u FROM d) GROUP BY u),
       |tot AS (SELECT CAST(sum(cu) AS DOUBLE) AS t FROM uni),
       |bg AS (SELECT u1, u2, count(*) AS cb FROM pr GROUP BY u1, u2
       |       ORDER BY cb DESC, u1, u2 LIMIT $topK)
       |SELECT $idCol,
       |       round(avg(CASE WHEN bg.cb IS NOT NULL
       |         THEN ln(bg.cb::DOUBLE / c1.cu::DOUBLE)
       |         ELSE ln(CAST($alpha AS DOUBLE) * c2.cu::DOUBLE / tot.t)
       |         END), 6) AS mean_bigram_logprob,
       |       count(*) AS n_bigrams
       |FROM pr
       |LEFT JOIN bg USING (u1, u2)
       |JOIN uni c1 ON pr.u1 = c1.u
       |JOIN uni c2 ON pr.u2 = c2.u, tot
       |GROUP BY $idCol ORDER BY $idCol""".stripMargin
  }

  /** Mirror of [[LanguageModel.knBigramLogProb]] — same counts, pruning
    * tie-break, discount arithmetic and coalesce rules; the
    * distinct-bigram total is recomputed IN SQL so the engines derive the
    * continuation denominator independently. */
  def knBigramLogProb(
      table: String,
      idCol: String,
      textCol: String,
      topK: Int = 10000,
      d: Double = 0.75): String = {
    val toks = graft.functions.TextOpsSql.tokens(textCol)
    val thash = graft.functions.TextOpsSql.tokenHashes("toks")
    s"""WITH tok AS (SELECT $idCol, $toks AS toks FROM $table),
       |docs AS (SELECT $idCol, $thash AS th FROM tok),
       |pr AS (SELECT $idCol, p[1] AS u1, p[2] AS u2 FROM (
       |         SELECT $idCol, unnest(list_transform(range(0, len(th)-1),
       |                        i -> [th[i+1], th[i+2]])) AS p
       |         FROM docs WHERE len(th) >= 2)),
       |bg AS (SELECT u1, u2, count(*) AS cb FROM pr GROUP BY u1, u2),
       |ctx AS (SELECT u1, sum(cb) AS ctx, count(*) AS n1f FROM bg GROUP BY u1),
       |rev AS (SELECT u2, count(*) AS n1r FROM bg GROUP BY u2),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n1p FROM bg),
       |bgtop AS (SELECT u1, u2, cb FROM bg
       |          ORDER BY cb DESC, u1, u2 LIMIT $topK)
       |SELECT $idCol,
       |       round(avg(ln(
       |         CASE WHEN ctx.ctx IS NULL
       |              THEN rev.n1r::DOUBLE / tot.n1p
       |              WHEN bgtop.cb IS NOT NULL
       |              THEN (bgtop.cb::DOUBLE - CAST($d AS DOUBLE))
       |                     / ctx.ctx::DOUBLE
       |                   + CAST($d AS DOUBLE) * ctx.n1f::DOUBLE
       |                     / ctx.ctx::DOUBLE
       |                     * (rev.n1r::DOUBLE / tot.n1p)
       |              ELSE CAST($d AS DOUBLE) * ctx.n1f::DOUBLE
       |                     / ctx.ctx::DOUBLE
       |                     * (rev.n1r::DOUBLE / tot.n1p)
       |         END)), 6) AS mean_kn_logprob,
       |       count(*) AS n_bigrams
       |FROM pr
       |LEFT JOIN bgtop USING (u1, u2)
       |LEFT JOIN ctx USING (u1)
       |JOIN rev USING (u2), tot
       |GROUP BY $idCol ORDER BY $idCol""".stripMargin
  }
}

object VocabCoverage {

  /**
   * Tokenizer-vocabulary coverage: with a frequency-truncated vocabulary
   * of `vocabSize` types (top-K by count, token tie-break — the
   * zeroth-order tokenizer-planning question), what fraction of corpus
   * TOKEN OCCURRENCES is covered, i.e. the OOV rate a closed vocabulary
   * of that size would pay.
   *
   * Shape: token counts are one map-side-combined aggregate (vocabulary-
   * sized shuffle), the top-K cut is a bounded TakeOrderedAndProject
   * (per-partition top-K + driver merge, never a global sort), and the
   * coverage probe is ONE left-outer join of the token stream against the
   * BROADCAST vocabulary — total and covered counts ride the same
   * aggregate, so the probe scans (and tokenizes) the corpus exactly
   * once. Totals are exact LONGs; the one double division happens once.
   */
  def vocabCoverage(
      df: DataFrame,
      textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabCoverage: vocabSize must be positive")
    val toks = df.select(
      explode(graft.functions.TextOps.tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"), lit(1L).as("__in"))
    toks.join(broadcast(vocab), Seq("token"), "left_outer")
      .agg(count(lit(1)).as("total_tokens"),
        count(col("__in")).as("covered_tokens"))
      .select(col("total_tokens"), col("covered_tokens"),
        round(lit(1.0) -
          col("covered_tokens").cast("double") /
            col("total_tokens").cast("double"), 6).as("oov_rate"))
  }
}
