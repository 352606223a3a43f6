package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Data selection under a TOKEN BUDGET — "keep the best documents until the
 * training budget is spent", the selection rule of quality-ranked corpus
 * releases (the FineWeb-Edu / DCLM-style classifier-threshold cut,
 * generalized from "score ≥ τ" to "best N tokens"; see Penedo et al. 2024,
 * arXiv:2406.17557 §4, and Li et al. 2024, arXiv:2406.11794): documents ordered by (quality bucket desc, id asc) are admitted
 * while the running token total fits the budget; the first document that
 * would cross it ends the selection (the maximal admissible prefix — the
 * running total is monotone, so nothing after the crossing can ever fit).
 *
 * Scale shape — the greedy rule WITHOUT a corpus-wide ordered cumsum (a
 * `sum() OVER (ORDER BY ...)` over the corpus is ONE unsplittable task):
 *
 *  1. scores quantize map-side into `buckets` integer levels
 *     (`⌊round(score,6)·B⌋`, clamped — the rounding kills float tails, the
 *     quantization is the documented selection granularity);
 *  2. ONE bounded aggregate builds the (bucket → token count) histogram —
 *     ≤ B rows, collected driver-side like any other bounded metadata;
 *  3. the budget walk over the sorted histogram happens ON THE DRIVER:
 *     buckets that fit entirely become a map-side `bucket > β` filter
 *     (zero shuffle for the overwhelming majority of kept rows);
 *  4. only the single BOUNDARY bucket pays an ordered running sum — a
 *     window over that one bucket's rows, expected corpus/B of the data.
 *     A score with near-constant mass (e.g. a 5-gate composite) collapses
 *     many rows into one bucket and re-grows that window; feed a
 *     continuous score (a classifier margin, a perplexity) when the
 *     boundary must stay small.
 *
 * Determinism: the bucket is integer, the within-bucket order is the
 * unique id, and the admitted set is a pure function of (score, tokens,
 * budget) — bit-identical cross-engine when the score is.
 */
object Selection {

  def selectTokenBudget(
      df: DataFrame,
      idCol: String,
      scoreCol: Column,
      tokensCol: Column,
      budget: Long,
      buckets: Int = 65536): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    val bucket = least(
      floor(round(scoreCol, 6) * buckets).cast("long"),
      lit(buckets - 1L))
    // cached: the scored projection (often tokenize + a quality model —
    // the plan's dominant CPU) feeds the histogram job AND both returned
    // branches; uncached it would evaluate three times. Scoped to the
    // caller's first action, as every operator cache here
    val tagged = df.select(col(idCol), bucket.as("__bucket"),
      tokensCol.cast("long").as("n_tokens"))
      .cache()

    // bounded histogram (≤ `buckets` rows) + driver budget walk
    val hist = tagged.groupBy(col("__bucket"))
      .agg(sum(col("n_tokens")).as("btoks"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    var cum = 0L
    var boundary = Long.MinValue
    var remaining = 0L
    var i = 0
    while (i < hist.length && boundary == Long.MinValue) {
      val (b, btoks) = hist(i)
      if (cum + btoks <= budget) cum += btoks
      else { boundary = b; remaining = budget - cum }
      i += 1
    }

    val full = tagged.where(col("__bucket") > lit(boundary))
    val partial = tagged.where(col("__bucket") === lit(boundary))
      .withColumn("__cum", sum(col("n_tokens")).over(
        Window.partitionBy(col("__bucket")).orderBy(col(idCol))))
      .where(col("__cum") <= lit(remaining))
      .drop("__cum")
    CacheScope.unpersistAfterAction(
      full.unionByName(partial)
        .select(col(idCol), col("__bucket").as("bucket"), col("n_tokens")),
      Seq(tagged))
  }
}

/** DuckDB rendering: the SAME rule as one global ordered cumsum — an
  * INDEPENDENT formulation (the oracle may funnel; the operator may not),
  * so a boundary-handling bug in the split plan can't echo. */
object SelectionSql {

  /** `scoreSql`/`tokensSql` are scalar SQL over `table`'s columns. */
  def selectTokenBudget(
      table: String,
      idCol: String,
      scoreSql: String,
      tokensSql: String,
      budget: Long,
      buckets: Int = 65536): String =
    s"""WITH scored AS (
       |  SELECT $idCol,
       |         least(CAST(floor(round($scoreSql, 6) * $buckets) AS BIGINT),
       |               ${buckets - 1}) AS bucket,
       |         CAST($tokensSql AS BIGINT) AS n_tokens
       |  FROM $table),
       |o AS (SELECT *, sum(n_tokens) OVER (ORDER BY bucket DESC, $idCol)
       |                 AS cum FROM scored)
       |SELECT $idCol, bucket, n_tokens FROM o WHERE cum <= $budget""".stripMargin
}

object PerGroupQuantile {

  /**
   * Per-group quantile filtering — the CCNet-style LANGUAGE-ADAPTIVE cut
   * (Wenzek et al. 2020, arXiv:1911.00359 §4.3): a single global
   * threshold over a multilingual corpus mostly measures language mix, so
   * the cut is computed PER GROUP (language/source) and each row competes
   * only within its group.
   *
   * Shape: one exact-percentile aggregate per group — group-count-sized
   * output (languages/sources number in the hundreds, never corpus-sized)
   * — broadcast back onto the corpus, where the keep decision is a
   * map-side comparison. `approx_percentile` swaps into the identical
   * plan at 100 TB (the mergeable-sketch path the profile operators pin).
   */
  def filter(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      scoreCol: String,
      quantile: Double): org.apache.spark.sql.DataFrame = {
    require(quantile > 0.0 && quantile < 1.0,
      "perGroupQuantile: quantile must be in (0, 1)")
    val cuts = df.groupBy(col(groupCol))
      .agg(percentile(col(scoreCol), lit(quantile)).as("__cut"))
    df.join(broadcast(cuts), Seq(groupCol))
      .where(col(scoreCol) >= col("__cut"))
      .withColumn("group_cut", round(col("__cut"), 6))
      .drop("__cut")
  }
}

/**
 * Per-group PERCENTILE-RANK normalization — the step before combining
 * heterogeneous quality signals (a classifier margin, a perplexity, a
 * length prior live on incomparable scales; their within-group rank is
 * the commensurable quantity — rank transformations are the standard
 * normalization for exactly this, cf. CCNet's per-language terciles).
 *
 * rank_pct(x) = (# of group rows with strictly smaller quantized score)
 *               / (group size)  ∈ [0, 1)
 *
 * Skew-safe shape — the naive `percent_rank() OVER (PARTITION BY group
 * ORDER BY score)` sorts each group in ONE task (a group holding half
 * the corpus is one unsplittable sort): here scores quantize map-side to
 * `buckets` integer levels (granularity is the operator's contract, as
 * in token-budget selection), ONE bounded aggregate builds the per-
 * (group, bucket) histogram, the cumulative fold runs as a window over
 * the BOUNDED histogram (≤ `buckets` rows per group — never corpus
 * rows), and the result broadcasts back onto the corpus as a map-side
 * (group, bucket) lookup.
 */
object RankNormalize {

  /** Adds `rank_pct` (rounded to 6). `scoreCol` must land in [0, 1] —
    * clamp/normalize upstream; values quantize to ⌊round(s,6)·B⌋. Rows
    * with a NULL group or NULL score are EXCLUDED up front (a null score
    * cannot rank, and silently handing it the clamp's top bucket would be
    * the worst possible default for a quality signal). The scored
    * projection is cached (scoped to the caller's action): it feeds both
    * the histogram and the probe side of the join. */
  def percentileRank(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      scoreCol: Column,
      buckets: Int = 65536): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "rankNormalize: buckets must be positive")
    val bucket = greatest(lit(0L), least(
      floor(round(scoreCol, 6) * buckets).cast("long"),
      lit(buckets - 1L)))
    val tagged = df
      .where(col(groupCol).isNotNull && scoreCol.isNotNull)
      .withColumn("__qb", bucket)
      .cache()
    val hist = tagged.groupBy(col(groupCol), col("__qb"))
      .agg(count(lit(1)).as("__c"))
    val ordered = Window.partitionBy(col(groupCol)).orderBy(col("__qb"))
    val whole = Window.partitionBy(col(groupCol))
    val lookup = hist
      .withColumn("__below", sum(col("__c")).over(ordered) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(whole))
      .select(col(groupCol), col("__qb"), col("__below"), col("__n"))
    val out = tagged.join(broadcast(lookup), Seq(groupCol, "__qb"))
      .withColumn("rank_pct",
        round(col("__below").cast("double") / col("__n").cast("double"), 6))
      .drop("__qb", "__below", "__n")
    CacheScope.unpersistAfterAction(out, Seq(tagged))
  }
}
