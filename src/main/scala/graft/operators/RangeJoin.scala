package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval (band) join via GRID BUCKETING — the scalable form of
 * the theta join `p >= lo AND p < hi` (quality-band lookups, time-bucket
 * pricing, IP-range geolocation). Spark's native plan for a pure range
 * predicate is a broadcast-nested-loop / cartesian — O(points ×
 * intervals) comparisons; the grid decomposition turns it into an
 * EQUI-join:
 *
 *  - each interval explodes to the grid cells it overlaps — fan-out
 *    ⌈width/grid⌉ + 1, bounded when the grid is chosen near the typical
 *    interval width;
 *  - each point computes its cell MAP-SIDE;
 *  - the join is cell-equality (hash-joinable, AQE-skew-splittable) with
 *    the exact range predicate re-checked inside the join condition.
 *
 * A (point, interval) match surfaces EXACTLY once: the point lives in one
 * cell, and an interval contributes at most one row per cell — no
 * distinct pass needed.
 */
object RangeJoin {

  /**
   * NULL bounds: a null `lo` or `hi` fails the `lo < hi` predicate and the
   * row is DROPPED — a half-open interval with an unknown endpoint has no
   * defined membership, so dropping (not matching everything) is the
   * contract. `maxCellsPerInterval` bounds the per-interval cell fan-out:
   * an interval vastly wider than `grid` would otherwise explode toward
   * Spark's array-length cap and fail the job mid-shuffle with an opaque
   * error (or silently dominate the join); the guard raises a NAMED error
   * on the offending row instead. Pick `grid` near the median interval
   * width — the cap is a misconfiguration tripwire, not a tuning knob.
   */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      grid: Long,
      maxCellsPerInterval: Long = 100000L): DataFrame = {
    require(grid > 0, "rangeJoin: grid must be positive")
    require(maxCellsPerInterval > 0, "rangeJoin: cell cap must be positive")
    // degenerate/inverted intervals ([lo, hi) with hi <= lo) match nothing
    // by definition — dropped BEFORE the cell explode, where an inverted
    // pair would otherwise make sequence() build a descending cell array
    // sized (lo-hi)/grid
    val loCell = floor(col(loCol).cast("double") / grid).cast("long")
    val hiCell = floor(col(hiCol).cast("double") / grid).cast("long")
    val cells = when(hiCell - loCell >= lit(maxCellsPerInterval),
        raise_error(concat(
          lit(s"rangeJoin: interval [${loCol}, ${hiCol}) spans >= " +
            s"$maxCellsPerInterval grid cells at grid=$grid (lo="),
          col(loCol).cast("string"), lit(", hi="), col(hiCol).cast("string"),
          lit(") — widen the grid or raise maxCellsPerInterval"))))
      .otherwise(sequence(loCell, hiCell))
    val iv = intervals.where(col(loCol) < col(hiCol))
      .select(col("*"), explode(cells).as("__ib"))
    val pt = points.withColumn("__pb",
      floor(col(pointCol).cast("double") / grid).cast("long"))
    pt.join(iv,
        col("__pb") === col("__ib") &&
        col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__pb", "__ib")
  }
}
