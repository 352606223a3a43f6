package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / split assignment for training-data pipelines.
 *
 * Everything keys off a 16-bit multiplicative hash of the row id
 * ([[Sampling.hash16]]): two Fibonacci-multiplier rounds whose intermediate
 * products stay far below 2^63, so the SAME integer arithmetic runs as a
 * Spark `Column` expression and as ANSI SQL in the DuckDB oracle
 * ([[SamplingSql]]) — no RNG, no engine-specific hash builtin, and a row's
 * assignment never changes when the corpus grows (the property a 100 TB
 * pipeline needs: re-running a split after ingesting new data must not
 * reshuffle existing rows between train and test).
 *
 * Both operators are MAP-SIDE projections — the hash is codegen'd integer
 * arithmetic per row, there is no shuffle and no driver round-trip; at rest
 * the assigned frame would be written `partitionBy("split")`.
 */
object Sampling {

  /** Hash bucket count; assignments are fractions of this. */
  val Buckets = 65536L

  private val Mult = 40503L // 16-bit golden-ratio (Fibonacci) multiplier

  /** Two-round multiplicative hash of a non-negative integral id into
    * [0, 65536). Max intermediate: h1 * 40503 < 2^32 — overflow-safe in any
    * 64-bit engine (a 32-bit golden multiplier would overflow BIGINT once
    * ids pass ~3.5e9 rows, which a 100 TB corpus does). */
  def hash16(id: Column, seed: Long = 0L): Column = {
    val h1 = pmod(id * lit(Mult) + lit(14029L + seed), lit(Buckets))
    pmod(h1 * lit(Mult) + pmod(id, lit(Buckets)), lit(Buckets))
  }

  /**
   * Assign every row to one named split (e.g. train/val/test) by hash
   * bucket: fractions map to contiguous bucket ranges, so the assignment is
   * deterministic, seed-stable, and exactly reproducible from the id alone.
   * Fractions must sum to ≤ 1; any remainder falls into the LAST split.
   */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val h = hash16(col(idCol), seed)
    // cumulative upper bounds; last split absorbs rounding remainder
    val bounds = splits.init.scanLeft(0L) { case (acc, (_, frac)) =>
      acc + math.round(frac * Buckets)
    }.tail
    val label = splits.init.zip(bounds).foldRight(
        lit(splits.last._1): Column) { case (((name, _), bound), onward) =>
      when(h < lit(bound), lit(name)).otherwise(onward)
    }
    df.withColumn("split", label)
  }

  /**
   * Deterministic rate-sample: keep a row iff its hash bucket falls under
   * `rate`. With the hash independent of `strataCol`, each stratum is
   * sampled at the same rate (proportional / stratified-by-construction);
   * different seeds draw disjoint-ish independent samples.
   */
  def sampleByHash(
      df: DataFrame,
      idCol: String,
      rate: Double,
      seed: Long = 0L): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0,1]")
    df.where(hash16(col(idCol), seed) < lit(math.round(rate * Buckets)))
  }

  /**
   * Deterministic global shuffle for training order: every row gets a
   * pseudo-random but id-reproducible (shuffle_bucket, shuffle_key) pair.
   * Writing `partitionBy("shuffle_bucket")` with `sortWithinPartitions
   * (shuffle_key, id)` materializes the permutation WITHOUT a global
   * total-order sort — readers stream buckets in bucket order and each
   * bucket is internally ordered, which is how a 100 TB corpus gets
   * shuffled: no single-partition `row_number` window, no driver
   * involvement, one hash-partition exchange at most.
   */
  def shuffleAssign(
      df: DataFrame,
      idCol: String,
      nBuckets: Int,
      seed: Long = 0L): DataFrame = {
    require(nBuckets > 0, "need at least one bucket")
    val key = hash16(col(idCol), seed)
    df.withColumn("shuffle_key", key)
      .withColumn("shuffle_bucket", pmod(key, lit(nBuckets.toLong)))
  }

  /**
   * Offset-based greedy sequence packing: within each `groupCol` shard,
   * documents are laid end-to-end in `orderCol` order and cut into
   * fixed-`budget` token sequences. Each document is assigned the sequence
   * its FIRST token lands in (`seq_id`) plus its starting offset there
   * (`tok_offset`); a document straddling a boundary continues into the
   * next sequence — the standard packed-pretraining layout where sequences
   * are filled without padding.
   *
   * The running total is a window sum PARTITIONED BY the shard column, so
   * packing parallelizes across shards (one shuffle by shard key, no global
   * sort) — exactly how a 100 TB corpus is packed: per input shard, after
   * [[shuffleAssign]] has randomized shard contents.
   */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      nTokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(col(nTokensCol)).over(w) - col(nTokensCol)
    df.withColumn("seq_id", floor(cumBefore / lit(budget)))
      .withColumn("tok_offset", cumBefore % lit(budget))
  }
}

/** DuckDB renderings of the identical arithmetic, for the oracle. */
object SamplingSql {

  def hash16(id: String, seed: Long = 0L): String =
    s"((($id * 40503 + ${14029L + seed}) % 65536) * 40503 + ($id % 65536)) % 65536"

  def splitCase(id: String, splits: Seq[(String, Double)], seed: Long = 0L): String = {
    val bounds = splits.init.scanLeft(0L) { case (acc, (_, frac)) =>
      acc + math.round(frac * Sampling.Buckets)
    }.tail
    val whens = splits.init.zip(bounds).map { case ((name, _), bound) =>
      s"WHEN ${hash16(id, seed)} < $bound THEN '$name'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${splits.last._1}' END"
  }

  def sampleWhere(id: String, rate: Double, seed: Long = 0L): String =
    s"${hash16(id, seed)} < ${math.round(rate * Sampling.Buckets)}"

  def shuffleKey(id: String, seed: Long = 0L): String = hash16(id, seed)

  def shuffleBucket(id: String, nBuckets: Int, seed: Long = 0L): String =
    s"(${hash16(id, seed)} % $nBuckets)"

  /** Window mirror of [[Sampling.packSequences]]'s cumulative offset. */
  def cumBefore(groupCol: String, orderCol: String, nTokens: String): String =
    s"(sum($nTokens) OVER (PARTITION BY $groupCol ORDER BY $orderCol " +
      s"ROWS UNBOUNDED PRECEDING) - $nTokens)"
}
