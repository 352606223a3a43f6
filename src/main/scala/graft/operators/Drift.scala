package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Corpus DRIFT detection: how far has the token distribution of a new
 * corpus slice moved from a reference slice? (Total-variation distance —
 * the standard dataset-shift metric of the data-validation literature,
 * e.g. TFX data validation, Breck et al., SysML 2019.) The monitoring primitive of a
 * continuously-crawled pipeline — a crawl-config regression, a new spam
 * campaign, or a source going dark all show up as unigram-distribution
 * shift long before they show up in model metrics.
 *
 * Numerical contract (cross-engine exactness): per-token probabilities are
 * compared in integer PARTS-PER-MILLION — `ppm = cnt * 1_000_000 / n_total`
 * with INTEGER division — so every drift value is an exact integer in both
 * engines (double sums are order-dependent and would hash-mismatch; ppm
 * resolution is the documented floor). The per-token contribution
 * `|ppm_a − ppm_b|` is ≤ 10⁶ and the corpus-wide sum is ≤ vocab·10⁶ —
 * overflow-free in 64 bits at any corpus size, where a raw
 * `cnt_a·n_b − cnt_b·n_a` cross-product would overflow past ~3·10⁹ tokens
 * per side.
 *
 * Plan shape: BOTH slices tokenize in one pass each, union into a single
 * (slice, token) exploded stream, ONE map-side-combined aggregate produces
 * the joint (token, cnt_a, cnt_b) vocabulary table (conditional sums — no
 * join of two vocabularies), and the slice totals ride the same aggregate
 * re-folded (a second tiny aggregate over the vocab table, never a second
 * corpus scan). Top-k drifted tokens use `orderBy(...).limit(k)` — Spark
 * plans TakeOrderedAndProject: per-partition bounded top-k then a driver
 * merge of k·partitions rows, never a global sort or a single-partition
 * window.
 */
object Drift {

  /** Joint vocabulary table: (token, cnt_a, cnt_b) via one union + one
    * aggregate. Internal building block — vocabulary-sized. */
  private def jointCounts(
      a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def side(df: DataFrame, tag: Int) = df
      .select(explode(TextOps.tokens(col(textCol))).as("token"))
      .select(col("token"), lit(tag).as("slice"))
    side(a, 0).unionByName(side(b, 1))
      .groupBy(col("token"))
      .agg(
        sum(when(col("slice") === 0, 1L).otherwise(0L)).as("cnt_a"),
        sum(when(col("slice") === 1, 1L).otherwise(0L)).as("cnt_b"))
  }

  /** Exact integral division (Spark's `/` on longs is double division,
    * which loses exactness past 2^53 — e.g. `cnt·10⁶` at trillion-token
    * corpora); `div` keeps the whole chain in 64-bit integers. */
  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Integer parts-per-million share — the exact cross-engine unit every
    * drift comparison here rides (also the streaming window monitor's). */
  private[graft] def ppm(cnt: Column, total: Column): Column =
    intDiv(cnt * lit(1000000L), total)

  private[graft] def halved(sumCol: Column): Column = intDiv(sumCol, lit(2L))

  /** One-row drift summary: slice token totals, joint vocabulary size,
    * and the total-variation distance in ppm units
    * (`tvd_ppm = Σ|ppm_a − ppm_b| / 2`, integer-exact). */
  def summary(a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    val j = jointCounts(a, b, textCol)
    val totals = j.agg(
      sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"),
      count(lit(1)).as("vocab"))
    j.crossJoin(totals)
      .select(col("n_a"), col("n_b"), col("vocab"),
        abs(ppm(col("cnt_a"), col("n_a")) - ppm(col("cnt_b"), col("n_b")))
          .as("d"))
      .groupBy(col("n_a"), col("n_b"), col("vocab"))
      .agg(sum(col("d")).as("__s"))
      .select(col("n_a"), col("n_b"), col("vocab"),
        intDiv(col("__s"), lit(2L)).as("tvd_ppm"))
  }

  /** The k tokens whose frequency moved most between the slices, by
    * (|Δppm| desc, token asc) — a total order; ties can't flap. */
  def topDrift(
      a: DataFrame, b: DataFrame, textCol: String, k: Int): DataFrame = {
    val j = jointCounts(a, b, textCol)
    val totals = j.agg(sum(col("cnt_a")).as("n_a"), sum(col("cnt_b")).as("n_b"))
    j.crossJoin(totals)
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        abs(ppm(col("cnt_a"), col("n_a")) - ppm(col("cnt_b"), col("n_b")))
          .as("drift_ppm"))
      .orderBy(col("drift_ppm").desc, col("token"))
      .limit(k)
  }
}

/** DuckDB rendering of the identical ppm drift arithmetic. DuckDB's `/` on
  * BIGINT is float division, so the integer ppm division is spelled `//`. */
object DriftSql {
  import graft.functions.TextOpsSql

  private def joint(tableA: String, tableB: String): String = {
    val toksA = TextOpsSql.tokens("text")
    s"""u AS (
       |  SELECT unnest(${toksA}) AS token, 0 AS slice FROM $tableA
       |  UNION ALL
       |  SELECT unnest(${toksA}) AS token, 1 AS slice FROM $tableB),
       |j AS (SELECT token,
       |             sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END)::BIGINT AS cnt_a,
       |             sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END)::BIGINT AS cnt_b
       |      FROM u GROUP BY token),
       |t AS (SELECT sum(cnt_a)::BIGINT AS n_a, sum(cnt_b)::BIGINT AS n_b,
       |             count(*)::BIGINT AS vocab FROM j)""".stripMargin
  }

  def summary(tableA: String, tableB: String): String =
    s"""WITH ${joint(tableA, tableB)}
       |SELECT n_a, n_b, vocab,
       |       (sum(abs(cnt_a * 1000000 // n_a - cnt_b * 1000000 // n_b))
       |          // 2)::BIGINT AS tvd_ppm
       |FROM j, t GROUP BY n_a, n_b, vocab""".stripMargin

  def topDrift(tableA: String, tableB: String, k: Int): String =
    s"""WITH ${joint(tableA, tableB)}
       |SELECT token, cnt_a, cnt_b,
       |       abs(cnt_a * 1000000 // n_a - cnt_b * 1000000 // n_b) AS drift_ppm
       |FROM j, t
       |ORDER BY drift_ppm DESC, token LIMIT $k""".stripMargin
}
