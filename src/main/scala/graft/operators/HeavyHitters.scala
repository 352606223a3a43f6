package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Frequent-item (heavy hitter) estimation with a MERGEABLE bounded-state
 * summary — Misra–Gries (Misra & Gries 1982, "Finding repeated elements";
 * mergeability per Agarwal et al. 2013, "Mergeable summaries", PODS'12).
 *
 * Why this exists next to the exact `text_top_tokens` aggregate: the exact
 * top-k shuffles one row per DISTINCT TOKEN — at 100 TB the token
 * vocabulary (trillions of distinct n-grams in the tail) dominates the
 * shuffle. The Misra–Gries path reduces each map task to a summary of at
 * most `capacity` counters BEFORE the shuffle, so the wire cost is
 * O(tasks × capacity) regardless of vocabulary size, and the merged result
 * guarantees: every token with true frequency > N/(capacity+1) is present,
 * with its reported count undercounting by at most N/(capacity+1). With
 * `capacity` ≥ distinct-token count the summary never evicts and the
 * counts are EXACT — which is what the DuckDB oracle checks; the
 * approximation guarantee under eviction is spec-pinned.
 */
object HeavyHitters {

  /** Aggregation buffer: the counter table (≤ capacity entries). */
  final case class MgBuf(m: Map[String, Long])

  /** Misra–Gries as a typed Aggregator so Spark plans partial aggregation:
    * `reduce` is the classic streaming update (decrement-all on overflow —
    * amortized O(1): each k-wide decrement pays for k prior inserts), and
    * `merge` is the summary merge: sum counters, then subtract the
    * (capacity+1)-th largest count from all and drop the non-positive —
    * the error bounds add, staying ≤ N/(capacity+1) total. */
  private final class MisraGriesAgg(capacity: Int)
      extends Aggregator[String, MgBuf, MgBuf] {
    require(capacity > 0, "capacity must be positive")
    def zero: MgBuf = MgBuf(Map.empty)
    def reduce(b: MgBuf, t: String): MgBuf = b.m.get(t) match {
      case Some(c)                   => MgBuf(b.m.updated(t, c + 1L))
      case None if b.m.size < capacity => MgBuf(b.m.updated(t, 1L))
      case None =>
        // table full: the new token's +1 cancels against the global -1
        MgBuf(b.m.collect { case (tk, c) if c > 1L => tk -> (c - 1L) })
    }
    def merge(a: MgBuf, b: MgBuf): MgBuf = {
      val sum = b.m.foldLeft(a.m) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= capacity) MgBuf(sum)
      else {
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)
          .apply(capacity)
        MgBuf(sum.collect { case (t, c) if c > cut => t -> (c - cut) })
      }
    }
    def finish(b: MgBuf): MgBuf = b
    def bufferEncoder = org.apache.spark.sql.Encoders.product[MgBuf]
    def outputEncoder = org.apache.spark.sql.Encoders.product[MgBuf]
  }

  /** The raw summary: one row per surviving counter, (token, cnt) where
    * cnt is the Misra–Gries lower bound (exact when nothing evicted). */
  def summary(df: DataFrame, token: Column, capacity: Int): DataFrame = {
    val mg = udaf(new MisraGriesAgg(capacity))
    df.select(token.as("__t"))
      .agg(mg(col("__t")).as("hh"))
      .select(explode(map_entries(col("hh.m"))).as("e"))
      .select(col("e.key").as("token"), col("e.value").as("cnt"))
  }

  /** Top-`n` heavy hitters by (count desc, token asc). */
  def topTokens(df: DataFrame, token: Column, capacity: Int, n: Int): DataFrame =
    summary(df, token, capacity)
      .orderBy(col("cnt").desc, col("token"))
      .limit(n)
}
