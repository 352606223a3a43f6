package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Sliding-window document chunking — the context-window segmentation step
 * of a pretraining pipeline: each document's token stream becomes
 * overlapping chunks of `chunkSize` tokens taken every `stride` tokens
 * (stride < size ⇒ overlap, the usual LM training setup; the final chunk
 * is short rather than padded).
 *
 * Entirely MAP-SIDE: chunk starts come from `sequence`, the per-chunk
 * content digest is a fold over an array slice, and `posexplode` emits one
 * row per chunk — no shuffle, no state, so the operator scales with scan
 * bandwidth alone. The digest ((acc·131 + h) mod P over the chunk's token
 * hashes) gives downstream exact-dedup of chunks an 8-byte key without
 * re-reading text.
 */
object Chunking {

  /**
   * One row per (document, chunk): `chunk_id` (0-based window index),
   * `start` (token offset), `chunk_len` (≤ chunkSize; the tail chunk is
   * shorter), `chunk_hash` (order-sensitive fold of the chunk's token
   * hashes mod [[TextOps.HashMod]]). Documents with no tokens yield no
   * rows. Chunk starts are 0, stride, 2·stride, … while < n_tokens.
   */
  def slidingChunks(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1, "chunkSize and stride must be >= 1")
    val len = least(lit(chunkSize), size(col("th")) - col("start"))
    df.select(col(idCol),
        TextOps.tokenHashes(TextOps.tokens(col(textCol))).as("th"))
      .where(size(col("th")) > 0)
      .select(col(idCol), col("th"),
        posexplode(sequence(lit(0), size(col("th")) - 1, lit(stride)))
          .as(Seq("chunk_id", "start")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("start").cast("long").as("start"),
        len.cast("long").as("chunk_len"),
        aggregate(slice(col("th"), col("start") + 1, len), lit(0L),
          (acc, h) => (acc * lit(131L) + h) % lit(TextOps.HashMod))
          .as("chunk_hash"))
  }
}

/** DuckDB renderings of [[Chunking]] for the correctness oracle. */
object ChunkingSql {

  /** Per-chunk rows from a CTE exposing (idCol, th) with len(th) > 0. */
  def slidingChunks(idCol: String, chunkSize: Int, stride: Int): String = {
    val len = s"least($chunkSize, len(th) - st)"
    // list_reduce has no init value: a single-element fold returns the
    // element unmodified — equal to Spark's ((0*131 + h) mod P) = h because
    // token hashes are already < HashMod.
    s"""SELECT $idCol,
       |       CAST(st // $stride AS BIGINT) AS chunk_id,
       |       CAST(st AS BIGINT) AS start,
       |       CAST($len AS BIGINT) AS chunk_len,
       |       list_reduce(th[st+1 : st+$len],
       |                   (a, b) -> (a*131 + b) % ${TextOps.HashMod}) AS chunk_hash
       |FROM (SELECT $idCol, th, unnest(range(0, len(th), $stride)) AS st
       |      FROM chunk_src)""".stripMargin
  }
}
