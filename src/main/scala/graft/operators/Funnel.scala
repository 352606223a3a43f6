package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis over an event stream — "of the users who did
 * A, how many later did B, and later still C" (the standard
 * product-analytics conversion query; here the data-pipeline use is
 * ingest-flow auditing: staged → cleaned → published event chains).
 *
 * Semantics: a user completes stage k at the EARLIEST event of stage
 * k's type that is STRICTLY after their stage-(k−1) completion time;
 * stage 1 is the user's earliest stage-1 event. A user reaches stage k
 * only via a strictly increasing timestamp chain through all k types.
 *
 * Scale posture: stage k is ONE user-keyed conditional-min aggregate —
 * the event stream filters to stage k's type MAP-SIDE (a tiny fraction
 * of the stream), joins the previous stage's per-user completion table
 * on the user key, and min-aggregates with map-side partials. Per-user
 * state is k timestamps, never an event list — the collect-and-sort
 * formulation (all events of a user in one task) is exactly what this
 * avoids; a user with millions of events costs partial mins, not a
 * sort. k stages = k bounded user-sized shuffles on the SAME key.
 */
object Funnel {

  /** Per-user completion times for each stage: one row per user who
    * completed ALL stages of the prefix reached; frame i (0-based) holds
    * users completing stages 1..i+1 with columns __t1..__t(i+1) (the `__`
    * prefix shields the working columns from input-column collisions).
    * Each frame is CACHED: it feeds both the next stage's join and its
    * own count — without the cache, stage 1's scan would re-run once per
    * later stage (O(k²) corpus scans for a k-stage funnel). */
  private def stageFrames(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): Seq[DataFrame] = {
    require(stages.nonEmpty, "funnel: empty stage list")
    val first = events.where(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t1"))
      .cache()
    stages.zipWithIndex.drop(1).scanLeft(first) {
      case (prev, (stage, i)) =>
        val k = i + 1
        val carry = (1 to i).map(j => min(col(s"__t$j")).as(s"__t$j"))
        events.where(col(typeCol) === stage)
          .join(prev, Seq(userCol))
          .where(col(tsCol) > col(s"__t$i"))
          .groupBy(col(userCol))
          .agg(carry.head, carry.tail :+ min(col(tsCol)).as(s"__t$k"): _*)
          .cache()
    }
  }

  /** Per-user stage times for users completing the WHOLE funnel, columns
    * t1..tn in stage order. */
  def funnelTimes(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    val frames = stageFrames(events, userCol, typeCol, tsCol, stages)
    val out = stages.indices.foldLeft(frames.last) {
      (df, i) => df.withColumnRenamed(s"__t${i + 1}", s"t${i + 1}")
    }
    CacheScope.unpersistAfterAction(out, frames)
  }

  /** The funnel summary: (stage, event_type, n_users) — how many users
    * reach each stage through a strictly ordered chain. */
  def funnelCounts(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      stages: Seq[String]): DataFrame = {
    val frames = stageFrames(events, userCol, typeCol, tsCol, stages)
    val out = frames.zip(stages).zipWithIndex.map { case ((f, stage), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1L).as("stage"), lit(stage).as("event_type"),
          col("n_users"))
    }.reduce(_.union(_)).orderBy(col("stage"))
    CacheScope.unpersistAfterAction(out, frames)
  }
}

/**
 * Cohort retention over an event stream — users grouped by their
 * first-activity period (the cohort), counted again in each later
 * period they stay active (the audit view of a rolling ingest: does a
 * source that appeared in week w keep producing in weeks w+k).
 *
 * Period indices are INTEGER floor-divisions of epoch seconds — exact
 * and identical in every engine (a date-function cohort would drag in
 * timezone/week-start conventions). Shape: one distinct (user, period)
 * projection, one user-keyed min aggregate for the cohort, one
 * (cohort, offset) count-distinct — all map-side combinable; per-user
 * state is one long, the result is cohorts × offsets rows.
 */
object Retention {

  def cohortRetention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodSeconds: Long = 604800L,
      maxOffset: Int = 4): DataFrame = {
    require(periodSeconds > 0 && maxOffset >= 0, "retention: bad params")
    // native integer floor-division — no double quotient in the path
    val per = events.select(col(userCol),
        expr(s"CAST(unix_timestamp($tsCol) AS BIGINT) div $periodSeconds")
          .as("per"))
      .distinct()
    val cohorts = per.groupBy(col(userCol))
      .agg(min(col("per")).as("cohort_period"))
    per.join(cohorts, Seq(userCol))
      .where(col("per") - col("cohort_period") <= maxOffset)
      .groupBy(col("cohort_period"),
        (col("per") - col("cohort_period")).as("period_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("cohort_period"), col("period_offset"))
  }
}
