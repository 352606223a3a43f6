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
    val th = thresholds(strataCounts(df, strataCol), weights)
    applyThresholds(df, idCol, strataCol, th, seed)
  }

  /**
   * Temperature-scaled mixing: target weights DERIVED from the observed
   * stratum sizes, p_s ∝ n_s^(1/T) — the standard multilingual/multi-source
   * resampling rule (T = 1 keeps natural proportions; T > 1 flattens the
   * distribution toward small strata; T → ∞ approaches uniform). The
   * derived weights feed the same no-upsampling thinning as [[mix]].
   *
   * Cross-engine exactness: at the common T = 2 the exponent is 1/2 and
   * both engines compute `sqrt` — IEEE-754-correctly-rounded everywhere,
   * so thresholds are bit-identical. Other exponents go through libm
   * `pow`, whose last bit is NOT portable; the oracle therefore pins T = 2
   * (callers may use any T; a one-ulp pow difference can only flip rows at
   * an exact threshold boundary).
   */
  def mixByTemperature(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      temperature: Double,
      seed: Long = 0L): DataFrame = {
    val counts = strataCounts(df, strataCol)
    val th = thresholds(counts, temperatureWeights(counts, temperature))
    applyThresholds(df, idCol, strataCol, th, seed)
  }

  /** n_s^(1/T) per stratum, in sorted-stratum order (the order the
    * normalizing sum folds in — mirrored by the oracle's ordered sum). */
  def temperatureWeights(
      counts: Map[String, Long],
      temperature: Double): Seq[(String, Double)] = {
    require(temperature > 0, "temperature must be positive")
    val a = 1.0 / temperature
    counts.toSeq.sortBy(_._1).map { case (s, n) =>
      s -> (if (a == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, a))
    }
  }

  /**
   * Fractional-EPOCH corpus mixing — the upsampling counterpart of [[mix]]
   * (which only thins): each stratum is repeated `epochs_s` times, e.g.
   * `books -> 2.3` emits every books row twice plus a deterministic 30%
   * of them a third time (the standard "N.x epochs of source S" training
   * recipe). The extra copy is decided by the portable 16-bit row hash —
   * seed-stable, reproducible from the id alone — and each emitted copy
   * carries its 1-based `epoch` index (so downstream shuffling can salt
   * on it). Strata absent from the recipe emit zero copies.
   *
   * Scale shape: pure MAP-SIDE — the recipe folds into a literal `when`
   * chain (no join), and the copy fan-out is a generator (`explode` of
   * `sequence`), so the plan has ZERO exchanges: epoch materialization
   * runs at scan speed however large the corpus, and output volume is
   * exactly the requested Σ_s epochs_s·n_s. The fractional threshold is
   * computed ONCE driver-side in integer bucket units (`round(frac·65536)`)
   * so both engines compare against the same integer — no float
   * portability surface.
   */
  def mixEpochs(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      epochs: Seq[(String, Double)],
      seed: Long = 0L): DataFrame = {
    require(epochs.forall(_._2 >= 0), "epochs must be non-negative")
    val whole = epochs.map { case (s, w) => s -> math.floor(w).toLong }
    val extraTh = epochs.map { case (s, w) =>
      s -> math.round((w - math.floor(w)) * Sampling.Buckets)
    }
    def chain(m: Seq[(String, Long)]): Column = m.foldLeft(lit(0L): Column) {
      case (onward, (s, v)) =>
        when(col(strataCol) === lit(s), lit(v)).otherwise(onward)
    }
    val copies = chain(whole) +
      when(Sampling.hash16(col(idCol), seed) < chain(extraTh), lit(1L))
        .otherwise(lit(0L))
    df.withColumn("__copies", copies)
      .where(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(1L), col("__copies"))))
      .drop("__copies")
  }

  private def strataCounts(df: DataFrame, strataCol: String): Map[String, Long] =
    df.groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def applyThresholds(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      th: Map[String, Long],
      seed: Long): DataFrame = {
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

  /** Mirror of [[Mixing.mixByTemperature]] + per-stratum count. The
    * unnormalized weight is `sqrt(n)` at exponent 0.5 (IEEE-exact in both
    * engines) and the normalizing sum folds in stratum order
    * (`sum(.. ORDER BY s)`), matching the Scala sorted-Seq fold — both
    * pinned so the derived thresholds are bit-identical. */
  def temperatureCounts(
      table: String,
      idCol: String,
      strataCol: String,
      temperature: Double,
      seed: Long = 0L): String = {
    val a = 1.0 / temperature
    val pw = if (a == 0.5) "sqrt(n::DOUBLE)" else s"pow(n::DOUBLE, $a)"
    s"""WITH c AS (SELECT $strataCol AS s, count(*) AS n FROM $table GROUP BY 1),
       |w0 AS (SELECT s, n, $pw AS pw FROM c),
       |ws AS (SELECT sum(pw ORDER BY s) AS wsum FROM w0),
       |j AS (SELECT s, n, pw / wsum AS p FROM w0, ws),
       |np AS (SELECT min(n / p) AS nprime FROM j),
       |r AS (SELECT s, CAST(floor(p * nprime / n * 65536 + 0.5) AS BIGINT)
       |             AS threshold FROM j, np)
       |SELECT d.$strataCol, count(*) AS n_kept
       |FROM $table d JOIN r ON d.$strataCol = r.s
       |WHERE ${SamplingSql.hash16(idCol, seed)} < threshold
       |GROUP BY d.$strataCol ORDER BY d.$strataCol""".stripMargin
  }

  /** Mirror of [[Mixing.mixEpochs]]: same driver-computed integer
    * thresholds, copies fanned out with `generate_series` (empty when the
    * stratum is absent from the recipe — DuckDB's series of 1..0 is
    * empty, matching Spark's `sequence` never being reached under the
    * `copies > 0` filter). */
  def epochRows(
      table: String,
      idCol: String,
      strataCol: String,
      epochs: Seq[(String, Double)],
      seed: Long = 0L): String = {
    def chain(f: Double => Long): String =
      epochs.map { case (s, w) => s"WHEN '$s' THEN ${f(w)}" }
        .mkString(s"CASE $strataCol ", " ", " ELSE 0 END")
    val whole = chain(w => math.floor(w).toLong)
    val extra = chain(w => math.round((w - math.floor(w)) * Sampling.Buckets))
    s"""SELECT $idCol, $strataCol,
       |       unnest(generate_series(1, copies)) AS epoch
       |FROM (SELECT $idCol, $strataCol,
       |             ($whole) + (CASE WHEN ${SamplingSql.hash16(idCol, seed)}
       |                              < ($extra) THEN 1 ELSE 0 END) AS copies
       |      FROM $table)
       |WHERE copies > 0""".stripMargin
  }
}
