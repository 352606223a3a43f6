package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus mixing for training-data pipelines: realize target
 * mixture WEIGHTS per stratum (source / domain / language) by per-stratum
 * downsampling — never upsampling — at the largest total size the corpus
 * supports.
 *
 * Math: with stratum sizes n_s and target proportions p_s (weights
 * normalized to sum 1), the largest total N' with keep-rates ≤ 1 is
 * N' = min_s (n_s / p_s); each stratum keeps rate_s = p_s · N' / n_s of its
 * rows. The limiting stratum (the argmin) keeps everything; every other
 * stratum is thinned to match the mixture.
 *
 * Scale posture: stratum sizes are ONE tiny aggregate (`groupBy.count`,
 * map-side combined; rows = number of strata, driver-bounded by
 * construction), and the keep decision is a map-side CASE over
 * [[Sampling.hash16]] — no join, no shuffle of the corpus, no RNG, and a
 * row's fate is reproducible from (id, seed) alone, so re-running the mix
 * after appending data keeps every previously-kept row whose stratum rate
 * did not change. Rates are REALIZED in expectation (hash-thinning is
 * binomial, the scalable idiom — exact-count realization would need a
 * per-stratum global sort); at corpus scale the deviation is O(1/√n_s).
 *
 * The arithmetic (double division order, floor(x·65536 + 0.5) threshold)
 * is pinned to be bit-identical with the DuckDB rendering in [[MixingSql]].
 */
object Mixing {

  /** Per-stratum keep-thresholds (stratum → hash16 threshold in
    * [0, 65536]), from target weights and observed stratum sizes. Strata
    * absent from `weights` get threshold 0 (dropped — an unlisted stratum
    * is excluded from the mixture by definition). */
  def thresholds(
      counts: Map[String, Long],
      weights: Seq[(String, Double)]): Map[String, Long] = {
    require(weights.nonEmpty, "need at least one stratum weight")
    require(weights.forall(_._2 > 0), "weights must be positive")
    val wsum = weights.map(_._2).sum
    val norm = weights.map { case (s, w) => s -> w / wsum }
    norm.foreach { case (s, _) =>
      require(counts.getOrElse(s, 0L) > 0L, s"stratum '$s' has no rows") }
    // N' = min_s n_s / p_s; rate_s = p_s * N' / n_s  (the argmin keeps all)
    val nPrime = norm.map { case (s, p) => counts(s) / p }.min
    norm.map { case (s, p) =>
      s -> math.round(p * nPrime / counts(s) * Sampling.Buckets)
    }.toMap
  }

  /**
   * Thin `df` to the target mixture: keeps rows whose
   * `hash16(idCol, seed)` falls under their stratum's threshold. Returns
   * the kept rows unchanged (all columns).
   */
  def mix(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      weights: Seq[(String, Double)],
      seed: Long = 0L): DataFrame = {
    val counts = df.groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val th = thresholds(counts, weights)
    val thresholdCol = th.foldLeft(lit(0L): Column) {
      case (onward, (s, t)) =>
        when(col(strataCol) === lit(s), lit(t)).otherwise(onward)
    }
    df.where(Sampling.hash16(col(idCol), seed) < thresholdCol)
  }
}

/** DuckDB rendering of the identical mixing arithmetic, for the oracle.
  * The rate expression `p * nprime / n * 65536 + 0.5` keeps the exact
  * operation ORDER of [[Mixing.thresholds]] so the IEEE-double results are
  * bit-identical across engines. */
object MixingSql {

  /** Weights VALUES clause, normalized in SQL exactly as in Scala. */
  private def weightsSql(weights: Seq[(String, Double)]): String = {
    val wsum = weights.map(_._2).sum
    weights.map { case (s, w) => s"('$s', ${w / wsum})" }
      .mkString("(VALUES ", ", ", ")")
  }

  /** Kept-rows-per-stratum query over `table`, mirroring [[Mixing.mix]]
    * followed by a per-stratum count. */
  def mixCounts(
      table: String,
      idCol: String,
      strataCol: String,
      weights: Seq[(String, Double)],
      seed: Long = 0L): String =
    s"""WITH c AS (SELECT $strataCol AS s, count(*) AS n FROM $table GROUP BY 1),
       |w AS (SELECT * FROM ${weightsSql(weights)} t(s, p)),
       |j AS (SELECT c.s, c.n, w.p FROM c JOIN w USING (s)),
       |np AS (SELECT min(n / p) AS nprime FROM j),
       |r AS (SELECT s, CAST(floor(p * nprime / n * 65536 + 0.5) AS BIGINT)
       |             AS threshold FROM j, np)
       |SELECT d.$strataCol, count(*) AS n_kept
       |FROM $table d JOIN r ON d.$strataCol = r.s
       |WHERE ${SamplingSql.hash16(idCol, seed)} < threshold
       |GROUP BY d.$strataCol ORDER BY d.$strataCol""".stripMargin
}
