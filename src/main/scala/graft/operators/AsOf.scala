package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * As-of (point-in-time) join — attach to each left row the value of the
 * LATEST right row with the same key and `rightTs <= leftTs` (inclusive).
 * The temporal-lookup primitive behind feature stores, slowly-changing
 * dimensions and event attribution; Spark has no native operator for it,
 * and the naive formulation (range join + per-row max) is quadratic in hot
 * keys.
 *
 * Spark-first geometry — the UNION + WINDOW formulation:
 * tag build rows 0 and probe rows 1, union them, and run ONE window
 * `last(value, ignoreNulls)` over (key) ordered by (ts, tag): every probe
 * row sees exactly the build values at-or-before it (the tag orders a
 * same-timestamp build row BEFORE the probe, making the match inclusive).
 * Cost is one shuffle on the key and one sort — no join operator at all,
 * no candidate blowup however many probe rows share a build row. At 100 TB
 * the shuffle carries (key, ts, value) plus the probe payload once; a
 * key-skewed probe stream salts the same way any windowed plan does
 * (sub-bucket by time range, then a second pass for bucket boundaries).
 *
 * Right-side (key, ts) uniqueness is the caller's contract (pre-aggregate
 * ties); with duplicates the window picks the last in (ts, tag) order,
 * which is well-defined but engine-ordering-dependent.
 */
object AsOf {

  /** Left columns + `asof_<valueCol>` (null when no right row precedes). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      valueCol: String): DataFrame = {
    val leftRowT = StructType(left.schema.fields)
    val valueT = right.schema(valueCol).dataType
    val build = right.select(
      col(keyCol).as("__k"), col(rightTsCol).as("__ts"),
      col(valueCol).as("__v"), lit(0).as("__probe"),
      lit(null).cast(leftRowT).as("__row"))
    val probe = left.select(
      col(keyCol).as("__k"), col(leftTsCol).as("__ts"),
      lit(null).cast(valueT).as("__v"), lit(1).as("__probe"),
      struct(left.columns.map(col): _*).as("__row"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    build.unionByName(probe)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__probe") === 1)
      .select(col("__row.*"), col("__asof").as(s"asof_$valueCol"))
  }
}
