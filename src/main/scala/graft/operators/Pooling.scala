package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/**
 * Chunk→document embedding pooling — the aggregation step of every
 * long-document retrieval/dedup pipeline: documents embed per CHUNK
 * (encoder context limits), and the document vector is the element-wise
 * MEAN of its chunk vectors, usually re-normalized to unit length
 * (mean-pooling, the Sentence-BERT/E5-family convention).
 *
 * Determinism contract (the KMeans trick): floats sum as FLOORED
 * MICRO-UNIT INTEGERS (`floor(x · 2^20)` per element — exact long
 * arithmetic, so the sum is order-independent where a double sum is
 * partition-order-dependent), and the mean divides in the fixed order
 * sum / count / unit, mirrored verbatim by the SQL rendering.
 *
 * Scale shape: posexplode ships (key, pos, 8-byte long) rows into a
 * map-side-combinable (key, pos) aggregate — per-key state is `dim`
 * longs, the same reduction a custom UDAF would buy but inside codegen
 * with built-ins; reassembly is one key-keyed aggregate over `dim`-row
 * groups (collect + sort, never a window).
 */
object Pooling {

  /** Micro-unit quantization (2^20), shared with the SQL rendering. */
  val Quant: Long = 1L << 20

  /** Element-wise mean of `vecCol` per `keyCol`: (`key`, `n_chunks`,
    * `vec` array<double>). */
  def meanPool(df: DataFrame, keyCol: Column, vecCol: Column): DataFrame = {
    val parts = df.select(keyCol.as("key"),
        posexplode(vecCol).as(Seq("pos", "x")))
      .groupBy(col("key"), col("pos"))
      .agg(sum(floor(col("x").cast("double") * Quant).cast("long")).as("sq"),
        count(lit(1)).as("n"))
      .select(col("key"), col("pos"), col("n"),
        (col("sq").cast("double") / col("n").cast("double") /
          Quant.toDouble).as("m"))
    parts.groupBy(col("key"))
      .agg(max(col("n")).as("n_chunks"),
        array_sort(collect_list(struct(col("pos"), col("m")))).as("__s"))
      .select(col("key"), col("n_chunks"),
        transform(col("__s"), s => s.getField("m")).as("vec"))
  }

  /** [[meanPool]] + unit-length normalization (the retrieval convention —
    * cosine against a pooled vector must not reward chunk count); zero
    * vectors pass through unnormalized rather than dividing by zero.
    *
    * Known cost trade, stated: CollapseProject inlines the norm fold into
    * the per-element division lambda (the shingleHashes lesson), so
    * normalization is O(d) folds per row — bounded at embedding dims
    * (d ≤ ~1k) and kept because the SEQUENTIAL fold is what makes the
    * norm bit-identical to the SQL rendering; a native expression is the
    * upgrade path if d ever grows past that. */
  def meanPoolNormalized(df: DataFrame, keyCol: Column,
      vecCol: Column): DataFrame = {
    val pooled = meanPool(df, keyCol, vecCol)
    val nrm = VectorOps.norm(col("vec"))
    pooled.select(col("key"), col("n_chunks"),
      when(nrm > 0.0, transform(col("vec"), e => e / nrm))
        .otherwise(col("vec")).as("vec"))
  }
}

/** DuckDB renderings of [[Pooling]] — same micro-unit integer sums, same
  * fixed division order. */
object PoolingSql {
  import Pooling.Quant

  /** CTE body producing (key, n_chunks, vec) from `src(key, emb)`. */
  def meanPoolCtes(src: String): String =
    s"""px AS (SELECT key,
       |         unnest(range(len(emb))) AS pos,
       |         unnest(emb) AS x
       |       FROM $src),
       |agg AS (SELECT key, pos,
       |          sum(CAST(floor(CAST(x AS DOUBLE) * $Quant) AS BIGINT))
       |            AS sq,
       |          count(*) AS n
       |        FROM px GROUP BY key, pos),
       |pooled AS (SELECT key, CAST(max(n) AS BIGINT) AS n_chunks,
       |             list(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
       |                  / ${Quant.toDouble} ORDER BY pos) AS vec
       |           FROM agg GROUP BY key)""".stripMargin
}
