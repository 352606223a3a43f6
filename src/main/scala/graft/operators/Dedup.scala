package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Deduplication operators for training-data pipelines, all expressed as
 * shuffle-conscious DataFrame plans:
 *
 *  - exact dedup: one hash-partitioned groupBy on the dedup key (map-side
 *    partial aggregation makes this a single shuffle of distinct keys);
 *  - MinHash-LSH near-dup: banded signature → explode bands → self-join on
 *    (band, bucket) — candidates only ever meet inside a bucket, never an
 *    all-pairs cross join, so the plan survives a 100x scale-up;
 *  - SimHash: 20-bit fingerprint clusters (identical-fingerprint grouping);
 *  - blocked n-gram Jaccard: exact Jaccard within a blocking key.
 */
object Dedup {

  /**
   * Exact deduplication: keep the smallest `idCol` per distinct `keyCol`
   * value. Returns (dedup key, kept id, group size). A single groupBy —
   * Catalyst plans partial aggregation before the shuffle, so only distinct
   * keys cross the wire.
   */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_dups"))

  /** Columns (doc id, minhash signature) for [[minHashCandidates]]. */
  def withSignature(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol))
      .withColumn("toks", TextOps.tokens(col(textCol)))
      .withColumn("thash", TextOps.tokenHashes(col("toks")))
      .withColumn("shingles", array_distinct(TextOps.shingleHashes(col("thash"))))
      .withColumn("sig", TextOps.minHashSignature(col("shingles")))

  /**
   * MinHash-LSH candidate pairs: documents sharing at least one band bucket.
   * Emits (id_a, id_b, jaccard) with id_a < id_b, exact Jaccard computed on
   * the candidate pairs only. `minJaccard` filters the verified pairs.
   *
   * Scale: the only shuffle is the (band, bucket) self-join; bucket width is
   * controlled by the signature geometry, and no pair outside a shared
   * bucket is ever materialized.
   */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.0): DataFrame = {
    val sig = withSignature(df, idCol, textCol)
    val banded = sig.select(
      col(idCol).as("id"),
      col("shingles"),
      explode(array((0 until TextOps.Bands).map(b =>
        struct(lit(b).as("band"), TextOps.bandHash(col("sig"), b).as("bucket"))
      ): _*)).as("bb"))
      .select(col("id"), col("shingles"), col("bb.band"), col("bb.bucket"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r,
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"),
        col("r.id").as("id_b"),
        TextOps.jaccard(col("l.shingles"), col("r.shingles")).as("jaccard"))
      .distinct()
      .where(col("jaccard") >= minJaccard)
  }

  /**
   * SimHash duplicate clusters: rows sharing an identical 20-bit SimHash.
   * Returns (simhash, kept_id, n_dups) for clusters of size > 1.
   */
  def simHashClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        TextOps.simHash(TextOps.tokenHashes(TextOps.tokens(col(textCol))))
          .as("simhash"))
      .groupBy("simhash")
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)

  /**
   * Blocked exact n-gram Jaccard: all pairs *within a blocking key* (e.g.
   * language) whose word-shingle Jaccard clears the threshold. The blocking
   * key bounds the join fan-out; an unblocked variant would be an all-pairs
   * cross join and is deliberately not offered.
   */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      minJaccard: Double): DataFrame = {
    val pre = df.select(
      col(idCol).as("id"),
      col(blockCol).as("block"),
      array_distinct(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens(col(textCol))))).as("shingles"))
    val l = pre.as("l")
    val r = pre.as("r")
    l.join(r, col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"),
        col("r.id").as("id_b"),
        TextOps.jaccard(col("l.shingles"), col("r.shingles")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** Window-based variant of [[exact]] keeping full rows (first per key). */
  def keepFirst(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.withColumn("__rn",
        row_number().over(Window.partitionBy(col(keyCol)).orderBy(col(idCol))))
      .where(col("__rn") === 1)
      .drop("__rn")
}
