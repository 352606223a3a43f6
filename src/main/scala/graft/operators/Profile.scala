package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * One-pass multi-column data profiling — the ingest-gate "is this batch
 * sane" report (the scaled-up cousin of the reference's row-count
 * tolerance checks, `lib/LINZ/BdeUpload.pm` row_tol): for each requested
 * column — row count, non-null count, exact distinct count, min and max
 * (rendered as strings so heterogeneous columns share one schema) — all
 * computed in ONE aggregation over ONE scan of the table.
 *
 * Scale: every metric rides the same partial-aggregate pass (Spark plans
 * the multiple DISTINCT aggregates with a single Expand + two-level
 * aggregation — one shuffle, map-side combined), so profiling a 100 TB
 * table costs one scan regardless of how many columns are profiled; the
 * result is one driver-bounded row, unpivoted to one row per column.
 */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val metrics: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__${c}_nn"),
        countDistinct(col(c)).as(s"__${c}_nd"),
        min(col(c)).cast("string").as(s"__${c}_min"),
        max(col(c)).cast("string").as(s"__${c}_max"))
    }
    val one = df.agg(metrics.head, metrics.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        col(s"__${c}_nn").as("n_nonnull"),
        col(s"__${c}_nd").as("n_distinct"),
        col(s"__${c}_min").as("vmin"),
        col(s"__${c}_max").as("vmax"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}

/** DuckDB rendering: one SELECT per column, UNION ALL — semantically the
  * same profile (the oracle checks values, not the single-pass plan). */
object ProfileSql {
  def profile(table: String, cols: Seq[String]): String =
    cols.map { c =>
      s"""SELECT '$c' AS "column", count(*) AS n_rows,
         |       count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
         |       CAST(min($c) AS VARCHAR) AS vmin,
         |       CAST(max($c) AS VARCHAR) AS vmax
         |FROM $table""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
}

object Expectations {

  /**
   * Declarative data-quality audit — the "expectations" pattern (one
   * named row-level predicate per contract clause: non-null, in-set,
   * cross-field consistency, format regex), evaluated in ONE corpus scan:
   * every check is a conditional partial sum riding a single aggregate,
   * so the audit costs one pass regardless of how many expectations run.
   * A NULL predicate result counts as a VIOLATION (coalesce to false) —
   * a null can never satisfy a contract.
   *
   * Output: one row per expectation — (expectation, n_rows,
   * n_violations, pass), pass = zero violations.
   */
  def audit(
      df: DataFrame,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "expectations: empty check list")
    require(checks.map(_._1).distinct.size == checks.size,
      "expectations: duplicate check names")
    val aggs = checks.map { case (name, p) =>
      coalesce(sum(when(coalesce(p, lit(false)), 0L).otherwise(1L)), lit(0L))
        .as(s"__v_$name")
    } :+ count(lit(1)).as("__n")
    // ONE corpus scan; the result is checks.size rows of driver metadata
    val one = df.agg(aggs.head, aggs.tail: _*).head()
    val n = one.getAs[Long]("__n")
    val spark = df.sparkSession
    import spark.implicits._
    checks.map { case (name, _) =>
      val v = one.getAs[Long](s"__v_$name")
      (name, n, v, v == 0L)
    }.sortBy(_._1)
      .toDF("expectation", "n_rows", "n_violations", "pass")
  }
}
