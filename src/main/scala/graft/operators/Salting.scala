package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Key-salting for SKEWED shuffles — the manual fallback when AQE's runtime
 * skew handling can't apply (first-stage aggregations, storage-partitioned
 * plans, or a join AQE won't split because one key dominates a single
 * partition that is also the build side's hot key).
 *
 * A shuffle partitions by key hash, so one hot key — a `lang` holding half
 * the corpus, an `event_type` carrying most of the stream — lands on ONE
 * task however many executors exist; the stage runs at the speed of that
 * straggler. Salting refines the shuffle key with a deterministic salt so
 * the hot key spreads over `salts` tasks:
 *
 *  - [[aggregate]]: two-stage decomposable aggregation — partials group on
 *    (key, salt), finals merge per key. The second shuffle carries at most
 *    `groups × salts` pre-aggregated rows, so its cost is negligible next
 *    to the straggler it removes.
 *  - [[join]]: the probe side salts each row, the build side replicates
 *    each row once per salt value, and the join key becomes (key, salt) —
 *    build-side rows multiply by `salts` (bounded, chosen), probe rows
 *    never multiply.
 *
 * Results are provably IDENTICAL to the unsalted plan: a salt refines
 * groups without moving rows across keys, and merge aggregates (sum of
 * counts, sum of sums, min of mins, max of maxes) recompose exactly; the
 * replicated join matches each probe row against the full build row set of
 * its key exactly once (its single salt value).
 */
object Salting {

  /** One decomposable aggregate: `fn` ∈ count | sum | min | max applied to
    * `column`, surfaced as `as`. */
  final case class Agg(fn: String, column: String, as: String)

  /** Deterministic row salt in [0, salts): hash of the full row struct —
    * no row id or partition id involved, so the salt survives re-planning
    * and retries unchanged. */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(struct(df.columns.map(col).toSeq: _*)), lit(salts))

  /**
   * Two-stage salted aggregation of `df` by `keys`. Stage one groups on
   * (keys, salt) — the hot key fans out over `salts` reducers; stage two
   * merges the ≤ groups×salts partial rows per key. Both stages keep
   * map-side partial aggregation, so the extra stage adds one small
   * shuffle, not a second pass over the data.
   */
  def aggregate(
      df: DataFrame, keys: Seq[String], salts: Int, aggs: Seq[Agg]): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val partial = df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
  }

  private implicit final class AggOps(private val a: Agg) {
    /** Stage-one partial over raw rows. */
    def partial: Column = (a.fn match {
      case "count" => count(lit(1))
      case "sum"   => sum(col(a.column))
      case "min"   => min(col(a.column))
      case "max"   => max(col(a.column))
      case other   => throw new IllegalArgumentException(
        s"non-decomposable aggregate: $other")
    }).as(a.as)
    /** Stage-two merge over partials (count partials merge by SUM). */
    def merge: Column = (a.fn match {
      case "count" => sum(col(a.as))
      case "min"   => min(col(a.as))
      case "max"   => max(col(a.as))
      case _       => sum(col(a.as))
    }).as(a.as)
  }

  /**
   * Salted equi-join: `probe` rows salt deterministically, `build` rows
   * replicate once per salt value (`explode` of a literal range — bounded
   * fan-out chosen by the caller), and the join runs on (keys, salt). Use
   * when the build side is too large to broadcast AND the key distribution
   * is too skewed for a plain shuffle join; `salts` bounds the straggler
   * at 1/salts of the hot key.
   */
  def join(
      probe: DataFrame, build: DataFrame, keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val salted = probe.withColumn("__salt", rowSalt(probe, salts))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
