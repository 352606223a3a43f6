package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/**
 * Approximate-nearest-neighbor search over an embedding column.
 *
 * Two tiers, as a 100 TB design demands:
 *  - [[bruteForceTopK]]: exact cosine top-k for a BROADCAST-SIZED query set.
 *    The query side is broadcast; the corpus is scanned once, partition-local,
 *    and only k rows per query survive the window — no shuffle of the corpus.
 *  - [[lshNeighborPairs]]: sign-bit LSH bucketing; candidate pairs meet only
 *    inside their bucket (the join key), so the pair count is bucket-bounded
 *    rather than quadratic.
 */
object Similarity {

  /**
   * Exact cosine top-k: for every query vector, the k most similar corpus
   * vectors (excluding itself), ranked by (similarity desc, corpus id asc)
   * for a total deterministic order.
   */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q, col("neighbor_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        VectorOps.cosine(col("qvec"), col("cvec")).as("cosine"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .drop("rank")
  }

  /**
   * LSH-bucketed near-neighbor pairs: vectors sharing a sign-bit bucket with
   * cosine ≥ `minCosine`. Emits (id_a, id_b, cosine), id_a < id_b.
   */
  def lshNeighborPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      bits: Int,
      minCosine: Double): DataFrame = {
    val pre = df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      VectorOps.signBucket(col(vecCol), bits).as("bucket"))
    val l = pre.as("l")
    val r = pre.as("r")
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .select(
        col("l.id").as("id_a"),
        col("r.id").as("id_b"),
        VectorOps.cosine(col("l.vec"), col("r.vec")).as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
