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

  /**
   * Interpolated Kneser–Ney TRIGRAM scoring (Chen & Goodman 1999 §3 —
   * the full CCNet/KenLM order-3 shape), same fixed absolute discount
   * `d` at every level:
   *
   *   P(w3|w1w2) = max(c(w1w2w3)−d, 0)/c(w1w2·)
   *                + d·N1+(w1w2·)/c(w1w2·) · P(w3|w2)
   *   P(w3|w2)   = max(N1+(·w2w3)−d, 0)/N1+(·w2·)
   *                + d·N1+(w2·)/N1+(·w2·) · Pcont(w3)
   *   Pcont(w3)  = N1+(·w3)/N1+(··)
   *
   * — the middle and bottom levels run on CONTINUATION counts (distinct
   * predecessors), the defining KN move, all derived from the ONE
   * distinct-trigram aggregate. Stated boundary contract: counts derive
   * from the TRIGRAM stream, so a document's first bigram (no
   * predecessor) contributes no continuation evidence — the standard
   * sentence-boundary approximation, identical in the oracle.
   *
   * 100 TB shape, exactly [[knBigramLogProb]]'s: one trigram-sized
   * aggregate; the trigram, trigram-context, and middle-level tables
   * PRUNE to `topK` (count-desc, key-asc tie-breaks) before broadcast —
   * a pruned entry falls to its lower level (the pruned-backoff
   * approximation shipped LMs make, stated); the per-`w2` and per-`w3`
   * tables are vocabulary-sized and broadcast unpruned; N1+(··) is one
   * driver scalar. Scoring is map-side: five broadcast joins, one
   * per-doc aggregate. Mass conservation (Σ_w3 P = 1 per context,
   * unpruned) is spec-pinned.
   */
  def knTrigramLogProb(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 10000,
      d: Double = 0.75): DataFrame = {
    require(d > 0 && d < 1, "knTrigramLogProb: discount must be in (0, 1)")
    val th = TextOps.tokenHashes(TextOps.tokens(col(textCol)))
    val base = df.select(col(idCol), th.as("th"))
    val triples = base
      .where(size(col("th")) >= 3)
      .select(col(idCol), explode(arrays_zip(
        slice(col("th"), lit(1), size(col("th")) - 2),
        slice(col("th"), lit(2), size(col("th")) - 2),
        slice(col("th"), lit(3), size(col("th")) - 2))).as("p"))
      .select(col(idCol), col("p.0").as("u1"), col("p.1").as("u2"),
        col("p.2").as("u3"))
    // THE aggregate: one row per distinct trigram
    val tg = triples.groupBy(col("u1"), col("u2"), col("u3"))
      .agg(count(lit(1)).as("ct"))
    // trigram context counts c(w1w2·) and N1+(w1w2·)
    val ctx2 = tg.groupBy(col("u1"), col("u2"))
      .agg(sum(col("ct")).as("c12"), count(lit(1)).as("n1f12"))
    // continuation counts: tg is distinct by (u1,u2,u3), so count(*) per
    // (u2,u3) IS the distinct-predecessor count N1+(·w2w3)
    val contTri = tg.groupBy(col("u2"), col("u3"))
      .agg(count(lit(1)).as("n1t"))
    val midCtx = contTri.groupBy(col("u2"))
      .agg(sum(col("n1t")).as("n1mid"), count(lit(1)).as("nfol2"))
    val pcontT = contTri.groupBy(col("u3")).agg(count(lit(1)).as("n1c3"))
    val n1pp = contTri.count()
    val tgTop = tg.orderBy(col("ct").desc, col("u1"), col("u2"), col("u3"))
      .limit(topK)
    val ctx2Top = ctx2.orderBy(col("c12").desc, col("u1"), col("u2"))
      .limit(topK)
    val midTop = contTri.orderBy(col("n1t").desc, col("u2"), col("u3"))
      .limit(topK)
    val pc = col("n1c3").cast("double") / lit(n1pp.toDouble)
    val lamMid = lit(d) * col("nfol2").cast("double") /
      col("n1mid").cast("double")
    val pMid = when(col("n1t").isNotNull,
        (col("n1t").cast("double") - lit(d)) / col("n1mid").cast("double") +
          lamMid * pc)
      .otherwise(lamMid * pc)
    val lamTop = lit(d) * col("n1f12").cast("double") /
      col("c12").cast("double")
    val prob = when(col("c12").isNotNull,
        when(col("ct").isNotNull,
          (col("ct").cast("double") - lit(d)) / col("c12").cast("double") +
            lamTop * pMid)
          .otherwise(lamTop * pMid))
      .otherwise(pMid)
    triples
      .join(broadcast(tgTop), Seq("u1", "u2", "u3"), "left")
      .join(broadcast(ctx2Top), Seq("u1", "u2"), "left")
      .join(broadcast(midTop), Seq("u2", "u3"), "left")
      .join(broadcast(midCtx), Seq("u2"))
      .join(broadcast(pcontT), Seq("u3"))
      .withColumn("lp", log(prob))
      .groupBy(col(idCol))
      .agg(round(avg(col("lp")), 6).as("mean_kn3_logprob"),
        count(lit(1)).as("n_trigrams"))
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

  /** Mirror of [[LanguageModel.knTrigramLogProb]] — same single
    * distinct-trigram aggregate, same derived continuation tables, same
    * pruning tie-breaks and coalesce ladder; the distinct-bigram total
    * is recomputed IN SQL so the engines derive the bottom denominator
    * independently. */
  def knTrigramLogProb(
      table: String,
      idCol: String,
      textCol: String,
      topK: Int = 10000,
      d: Double = 0.75): String = {
    val toks = graft.functions.TextOpsSql.tokens(textCol)
    val thash = graft.functions.TextOpsSql.tokenHashes("toks")
    val dd = s"CAST($d AS DOUBLE)"
    s"""WITH tok AS (SELECT $idCol, $toks AS toks FROM $table),
       |docs AS (SELECT $idCol, $thash AS th FROM tok),
       |tr AS (SELECT $idCol, p[1] AS u1, p[2] AS u2, p[3] AS u3 FROM (
       |         SELECT $idCol, unnest(list_transform(range(0, len(th)-2),
       |                        i -> [th[i+1], th[i+2], th[i+3]])) AS p
       |         FROM docs WHERE len(th) >= 3)),
       |tg AS (SELECT u1, u2, u3, count(*) AS ct FROM tr GROUP BY u1, u2, u3),
       |ctx2 AS (SELECT u1, u2, sum(ct) AS c12, count(*) AS n1f12
       |         FROM tg GROUP BY u1, u2),
       |ctr AS (SELECT u2, u3, count(*) AS n1t FROM tg GROUP BY u2, u3),
       |midc AS (SELECT u2, sum(n1t) AS n1mid, count(*) AS nfol2
       |         FROM ctr GROUP BY u2),
       |pct AS (SELECT u3, count(*) AS n1c3 FROM ctr GROUP BY u3),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n1pp FROM ctr),
       |tgtop AS (SELECT u1, u2, u3, ct FROM tg
       |          ORDER BY ct DESC, u1, u2, u3 LIMIT $topK),
       |ctxtop AS (SELECT u1, u2, c12, n1f12 FROM ctx2
       |           ORDER BY c12 DESC, u1, u2 LIMIT $topK),
       |midtop AS (SELECT u2, u3, n1t FROM ctr
       |           ORDER BY n1t DESC, u2, u3 LIMIT $topK)
       |SELECT $idCol,
       |       round(avg(ln(
       |         CASE WHEN ctxtop.c12 IS NULL THEN
       |           CASE WHEN midtop.n1t IS NOT NULL
       |                THEN (midtop.n1t::DOUBLE - $dd)
       |                       / midc.n1mid::DOUBLE
       |                     + $dd * midc.nfol2::DOUBLE
       |                       / midc.n1mid::DOUBLE
       |                       * (pct.n1c3::DOUBLE / tot.n1pp)
       |                ELSE $dd * midc.nfol2::DOUBLE
       |                       / midc.n1mid::DOUBLE
       |                       * (pct.n1c3::DOUBLE / tot.n1pp) END
       |         ELSE
       |           CASE WHEN tgtop.ct IS NOT NULL
       |                THEN (tgtop.ct::DOUBLE - $dd) / ctxtop.c12::DOUBLE
       |                ELSE CAST(0 AS DOUBLE) END
       |           + $dd * ctxtop.n1f12::DOUBLE / ctxtop.c12::DOUBLE
       |             * (CASE WHEN midtop.n1t IS NOT NULL
       |                THEN (midtop.n1t::DOUBLE - $dd)
       |                       / midc.n1mid::DOUBLE
       |                     + $dd * midc.nfol2::DOUBLE
       |                       / midc.n1mid::DOUBLE
       |                       * (pct.n1c3::DOUBLE / tot.n1pp)
       |                ELSE $dd * midc.nfol2::DOUBLE
       |                       / midc.n1mid::DOUBLE
       |                       * (pct.n1c3::DOUBLE / tot.n1pp) END)
       |         END)), 6) AS mean_kn3_logprob,
       |       count(*) AS n_trigrams
       |FROM tr
       |LEFT JOIN tgtop USING (u1, u2, u3)
       |LEFT JOIN ctxtop USING (u1, u2)
       |LEFT JOIN midtop USING (u2, u3)
       |JOIN midc USING (u2)
       |JOIN pct USING (u3), tot
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
