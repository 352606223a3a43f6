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

  /** Cosine similarity (0.0 when either vector is all-zero), via the native
    * codegen'd [[graft.plans.CosineExpr]] — the hot verify step of every
    * similarity join. */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.CosineExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Higher-order-fold reference for [[cosine]] — Catalyst interprets
    * lambdas, so this is slow; it exists to PIN the native expression's
    * arithmetic (the spec compares them bit-for-bit). */
  private[graft] def cosineHof(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val den = sqrt(norm2(a)) * sqrt(norm2(b))
    when(den === 0d, lit(0d)).otherwise(d / den)
  }

  /** Native squared-L2 distance between two numeric array columns (see
    * [[graft.plans.SqDistExpr]]) — the k-means hot path evaluates k of
    * these per row, one per centroid. */
  def sqDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.SqDistExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Native element-wise vector subtraction (see
    * [[graft.plans.VecSubExpr]]) — the IVF-PQ residual step, `v −
    * centroid[cell]` once per row at encode time. */
  def vecSub(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.VecSubExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Higher-order reference for [[vecSub]], pinning the native loop's
    * arithmetic (spec compares them bit-for-bit). */
  private[graft] def vecSubHof(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") - y.cast("double"))

  /** Higher-order-fold reference for [[sqDist]] — the original k-means
    * formulation, kept to PIN the native expression's sequential fold
    * arithmetic (the spec compares them bit-for-bit). */
  private[graft] def sqDistHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0d), (acc, x) => acc + x)

  /** ±1 pseudo-random hyperplane weight for (plane, component j): parity of
    * a deterministic LCG step, identical arithmetic in any engine. `j` is a
    * column (the array index); `plane` folds the table+bit identity in. */
  private def rpWeight(plane: Int, j: Column): Column =
    (((lit(1103515245L) * (j + lit(plane.toLong * 1000033L)) + lit(12345L))
      % lit(1000003L)) % lit(2L) * lit(2L) - lit(1L)).cast("double")

  /** Signed projection of `a` onto pseudo-random hyperplane `plane`:
    * sequential fold of a[j] * (±1), exactly reproducible cross-engine. */
  def rpProjection(a: Column, plane: Int): Column =
    // empty-array guard: Spark's sequence(0, -1) is a DESCENDING range
    when(size(a) === 0, lit(0d)).otherwise(
      seqSum(transform(sequence(lit(0), size(a) - 1), j =>
        get(a, j).cast("double") * rpWeight(plane, j))))

  /** One fold over the vector accumulating the projections for all `planes`
    * at once: the accumulator is the whole projection vector and element j
    * contributes to every plane via one `zip_with` — per-plane arithmetic
    * stays the exact sequential double fold of [[rpProjection]] (same j
    * order, same ops), so results are bit-identical, but the array is
    * traversed once instead of once per plane. The finish lambda maps the
    * projection vector to per-table bucket ids (bit i of table t set when
    * plane t*64+i projects non-negative); projections are referenced as a
    * lambda variable, so nothing re-aggregates.
    *
    * This is the executable REFERENCE for [[graft.plans.RpBucketsExpr]] —
    * Catalyst interprets lambda functions per element, so the hot path uses
    * the codegen'd expression instead; the spec pins the two together. */
  private[graft] def rpBucketsHof(a: Column, bits: Int, tables: Seq[Int]): Column = {
    val planes = tables.flatMap(t => (0 until bits).map(i => t * 64 + i))
    // empty-array guard: projections are all 0.0, 0 >= 0 sets every bit
    val emptyBucket = (0 until bits).map(1L << _).sum
    when(size(a) === 0, array(tables.map(_ => lit(emptyBucket)): _*)).otherwise(
      aggregate(
        sequence(lit(0), size(a) - 1),
        array_repeat(lit(0d), planes.size),
        (acc, j) => {
          val x = get(a, j).cast("double")
          zip_with(acc, array(planes.map(p => rpWeight(p, j)): _*),
            (v, w) => v + x * w)
        },
        projs => array(tables.indices.map(ti =>
          (0 until bits).map(i =>
            when(get(projs, lit(ti * bits + i)) >= 0d, lit(1L << i))
              .otherwise(lit(0L)))
            .reduce(_ + _)): _*)))
  }

  /**
   * Random-hyperplane LSH bucket: bit i is set when the projection of the
   * vector onto pseudo-random ±1 hyperplane (table, i) is non-negative —
   * genuine SRP-LSH (collision probability 1 - θ/π per bit), unlike a
   * fixed axis-aligned sign sketch whose recall is data-dependent. Multiple
   * `table` values give independent hash tables; near pairs are candidates
   * if they collide in ANY table, so recall is tunable without widening a
   * single bucket. Used to co-partition candidate pairs so near-neighbor
   * search joins bucket-local data instead of all pairs.
   */
  def rpBucket(a: Column, bits: Int, table: Int): Column =
    get(rpBuckets(a, bits, Seq(table)), lit(0))

  /** All tables' buckets of [[rpBucket]] as one `array<bigint>` via the
    * native codegen'd [[graft.plans.RpBucketsExpr]] — bits×tables
    * projections cost one flat JIT'd loop over the vector instead of
    * bits×tables interpreted lambda folds. */
  def rpBuckets(a: Column, bits: Int, tables: Seq[Int]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.RpBucketsExpr(ColumnBridge.expression(a), bits, tables))
  }

  def rpBuckets(a: Column, bits: Int, numTables: Int): Column =
    rpBuckets(a, bits, 0 until numTables)

  // ---- int8 scalar quantization -----------------------------------------
  // Per-vector symmetric quantization: q[i] = round(x[i] / scale) with
  // scale = max|x| / 127, so dequantized error is bounded by scale/2 per
  // component. Storage drops 4x (int8 vs float32) — the standard trick for
  // fitting a 100 TB embedding store in memory-mapped ANN serving.
  // Rounding is pinned as floor(v + 0.5) (round-half-up toward +inf) so
  // Spark and the DuckDB oracle agree bit-for-bit; max is order-independent
  // over doubles, so the greatest-fold needs no sequential contract.

  /** Max |x| over the vector, 0.0 for empty vectors. */
  def maxAbs(a: Column): Column =
    aggregate(a, lit(0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Quantization scale; 1.0 for all-zero vectors (q = 0 everywhere, exact). */
  def quantScale(a: Column): Column = {
    val m = maxAbs(a)
    when(m === 0d, lit(1.0)).otherwise(m / lit(127d))
  }

  /** int8-range quantized vector (as array<bigint>; values in [-127, 127]). */
  def quantize(a: Column, scale: Column): Column =
    transform(a, x => floor(x.cast("double") / scale + lit(0.5)).cast("long"))

  /** Max per-component |x - q*scale| reconstruction error. */
  def dequantMaxErr(a: Column, q: Column, scale: Column): Column =
    aggregate(
      zip_with(a, q, (x, qv) => abs(x.cast("double") - qv.cast("double") * scale)),
      lit(0d), (acc, e) => greatest(acc, e))
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

  private def rpWeight(plane: Int, j: String): String =
    s"((((1103515245 * ($j + ${plane.toLong * 1000033L}) + 12345) % 1000003) % 2) * 2 - 1)::DOUBLE"

  def rpProjection(a: String, plane: Int): String =
    seqSum(s"list_transform(range(0, len($a)), j -> $a[j+1]::DOUBLE * ${rpWeight(plane, "j")})")

  /** ±1 weight with a SYMBOLIC plane expression (mirrors the Int overload). */
  private def rpWeightSym(plane: String, j: String): String =
    s"((((1103515245 * ($j + ($plane) * 1000033) + 12345) % 1000003) % 2) * 2 - 1)::DOUBLE"

  /** One-fold mirror of [[VectorOps.rpBucket]]: element j's contribution to
    * every bit rides one vector-valued reduce (per-bit adds stay in the same
    * sequential j order, so values are bit-identical to the per-bit fold);
    * the projection vector binds once as a lambda variable via the
    * single-element list_transform trick. */
  def rpBucket(a: String, bits: Int, table: Int): String = {
    val contribs =
      s"""list_transform(range(0, len($a)), j ->
         |  list_transform(range(0, $bits), i ->
         |    $a[j+1]::DOUBLE * ${rpWeightSym(s"$table*64 + i", "j")}))""".stripMargin
    val votes =
      s"list_reduce($contribs, (acc, v) -> list_transform(range(1, $bits + 1), i -> acc[i] + v[i]))"
    val bucket =
      s"""(list_transform([$votes], p ->
         |  (${(0 until bits)
             .map(i => s"(case when p[${i + 1}] >= 0 then ${1L << i} else 0 end)")
             .mkString(" + ")})))[1]""".stripMargin
    s"(case when len($a) = 0 then ${(0 until bits).map(1L << _).sum} else $bucket end)"
  }

  def maxAbs(a: String): String =
    s"(case when len($a) = 0 then 0.0 else " +
      s"list_reduce(list_transform($a, x -> abs(x::DOUBLE)), (a, b) -> greatest(a, b)) end)"

  def quantScale(a: String): String = {
    val m = maxAbs(a)
    s"(case when $m = 0 then 1.0 else $m / 127.0 end)"
  }

  def quantize(a: String, scale: String): String =
    s"list_transform($a, x -> floor(x::DOUBLE / $scale + 0.5)::BIGINT)"

  def dequantMaxErr(a: String, q: String, scale: String): String =
    s"(case when len($a) = 0 then 0.0 else list_reduce(" +
      s"list_transform(range(1, len($a)+1), i -> " +
      s"abs($a[i]::DOUBLE - $q[i]::DOUBLE * $scale)), (a, b) -> greatest(a, b)) end)"
}
