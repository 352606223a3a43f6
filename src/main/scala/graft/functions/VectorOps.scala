package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector operations over `array<float>` columns, built entirely
 * from codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs.
 *
 * Numerical contract: every reduction is a SEQUENTIAL left-to-right fold
 * over doubles (elements cast float→double first). That makes the results
 * bit-identical to any engine that evaluates the same fold order (the DuckDB
 * correctness oracle mirrors it with `list_reduce`), so similarity ranks are
 * exactly reproducible — no tolerance windows needed.
 *
 * Scale posture: cosine/top-k over 100 TB must never be an all-pairs cross
 * join. The scalable path is [[signBucket]] (random-hyperplane-style LSH on
 * sign bits) to co-partition candidates, with brute force reserved for a
 * broadcast-sized query set ([[Similarity.bruteForceTopK]]).
 */
object VectorOps {

  private def seqSum(arr: Column): Column =
    aggregate(arr, lit(0d), (acc, x) => acc + x)

  /** Sequential dot product of two float vectors, in double precision. */
  def dot(a: Column, b: Column): Column =
    seqSum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  /** Sequential sum of squares. */
  def norm2(a: Column): Column =
    seqSum(transform(a, x => x.cast("double") * x.cast("double")))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity (0.0 when either vector is all-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = sqrt(norm2(a)) * sqrt(norm2(b))
    when(den === 0d, lit(0d)).otherwise(d / den)
  }

  /**
   * Sign-bit LSH bucket over the first `bits` dimensions: bit i is set when
   * component i is non-negative. Vectors in the same bucket are "near" under
   * a crude random-hyperplane sketch; used to co-partition candidate pairs
   * so near-duplicate search joins bucket-local data instead of all pairs.
   */
  def signBucket(a: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      when(get(a, lit(i)) >= 0f, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}

/** DuckDB renderings of [[VectorOps]] — same folds, same order, same bits. */
object VectorOpsSql {

  private def seqSum(arr: String): String =
    s"(case when len($arr) = 0 then 0.0 else list_reduce($arr, (a, b) -> a + b) end)"

  def dot(a: String, b: String): String =
    seqSum(s"list_transform(range(1, len($a)+1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE)")

  def norm2(a: String): String =
    seqSum(s"list_transform($a, x -> x::DOUBLE * x::DOUBLE)")

  def norm(a: String): String = s"sqrt(${norm2(a)})"

  def cosine(a: String, b: String): String = {
    val den = s"(sqrt(${norm2(a)}) * sqrt(${norm2(b)}))"
    s"(case when $den = 0 then 0.0 else ${dot(a, b)} / $den end)"
  }

  def signBucket(a: String, bits: Int = 8): String =
    (0 until bits)
      .map(i => s"(case when $a[${i + 1}] >= 0 then ${1L << i} else 0 end)")
      .mkString("(", " + ", ")")
}
