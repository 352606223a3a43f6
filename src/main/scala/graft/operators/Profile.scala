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
