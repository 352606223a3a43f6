package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Optimized Product Quantization (Ge, He, Ke & Sun 2013, "Optimized
 * Product Quantization for Approximate Nearest Neighbor Search", CVPR;
 * the FAISS `OPQMatrix` pre-transform): learn an ORTHOGONAL rotation R
 * so the product quantizer's independent-subspace assumption fits the
 * data — PQ then runs on R·x, and because rotations preserve L2, ADC
 * distances in the rotated space ARE distances in the original space.
 * The standard recall upgrade at an unchanged code budget (same m,
 * ksub, same 8 bytes per vector).
 *
 * Non-parametric alternating minimization (the paper's Algorithm —
 * min over R and codebooks of ‖R·X − Q(R·X)‖²):
 *
 *  1. fix R: train/encode PQ on the rotated TRAIN set ([[Pq]] — the
 *     house micro-unit Lloyd contract, untouched);
 *  2. fix the codes: the optimal rotation is the orthogonal Procrustes
 *     solution — with N = Σ_rows q·xᵀ (q the decoded quantization,
 *     x the original vector), SVD N = U·S·Vᵀ gives R = U·Vᵀ.
 *
 * Spark geometry: rotation application is a map-side literal
 * matrix-vector product (d fixed-order [[Pca]]-style dot folds — zero
 * shuffle); the Procrustes statistic N is ONE (i, j)-keyed aggregation
 * of integer micro-unit products (d² groups — driver-bounded; the
 * rotation is scale-invariant in N, so the quantization constant
 * cancels); the d×d SVD runs driver-side by one-sided Jacobi
 * (Hestenes) with a fixed sweep order — deterministic, no library.
 * Like FAISS, the rotation trains on a SAMPLE (`train`); encoding the
 * corpus then pays one extra map-side product per vector.
 *
 * Exactness posture: the trained rotation is data-derived through an
 * iterative SVD, so the RECALL gauge (`ann_opq_recall`) is a rows-only
 * row; the integer-exact ADC contract itself is pinned by
 * `ann_opq_roundtrip`, which runs THIS pipeline with zero OPQ
 * iterations (R = I applied through the full rotation path) and must
 * equal plain [[Pq.adcTopK]] bit for bit under the PQ oracle.
 */
object Opq {

  /** R·x as a map-side projection — the native literal matrix-vector
    * product ([[graft.plans.MatVecExpr]]: one JIT'd d×d loop per row;
    * the HOF formulation is CodegenFallback and re-interprets d² lambda
    * steps per row per pass — [[rotateHof]] pins the arithmetic). */
  def rotate(vecCol: Column, r: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.plans.MatVecExpr(ColumnBridge.expression(vecCol), r))
  }

  /** Higher-order reference for [[rotate]], pinning the native loop's
    * fixed-order sums (spec compares them bit-for-bit). */
  private[graft] def rotateHof(vecCol: Column, r: Array[Array[Double]]): Column =
    array(r.toIndexedSeq.map(row =>
      aggregate(
        zip_with(vecCol, typedlit(row.toSeq),
          (a, b) => a.cast("double") * b),
        lit(0.0), (acc, x) => acc + x)): _*)

  private def identity(d: Int): Array[Array[Double]] =
    Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

  private def matMulT(
      u: Array[Array[Double]], v: Array[Array[Double]]): Array[Array[Double]] = {
    val d = u.length
    Array.tabulate(d, d)((i, j) =>
      (0 until d).foldLeft(0.0)((acc, k) => acc + u(i)(k) * v(j)(k)))
  }

  /**
   * One-sided Jacobi (Hestenes) SVD of a square matrix: returns (U, V)
   * with A = U·diag(s)·Vᵀ, both orthogonal. Deterministic — fixed
   * (p, q) sweep order, fixed tolerance and sweep cap; rank-deficient
   * columns (zero singular values) complete U's basis by Gram–Schmidt
   * against the canonical axes, so R = U·Vᵀ stays orthogonal on
   * degenerate inputs instead of collapsing.
   */
  private[operators] def svd(
      a: Array[Array[Double]]): (Array[Array[Double]], Array[Array[Double]]) = {
    val d = a.length
    val w = a.map(_.clone()) // columns of w orthogonalize in place
    val v = identity(d)
    def colDot(x: Int, y: Int): Double =
      (0 until d).foldLeft(0.0)((acc, i) => acc + w(i)(x) * w(i)(y))
    val eps = 1e-12
    var sweep = 0
    var rotated = true
    while (rotated && sweep < 60) {
      rotated = false
      for (p <- 0 until d - 1; q <- p + 1 until d) {
        val alpha = colDot(p, p); val beta = colDot(q, q)
        val gamma = colDot(p, q)
        if (math.abs(gamma) > eps * math.sqrt(alpha * beta) &&
          math.abs(gamma) > eps) {
          rotated = true
          val zeta = (beta - alpha) / (2.0 * gamma)
          val t = math.signum(zeta) /
            (math.abs(zeta) + math.sqrt(1.0 + zeta * zeta))
          val c = 1.0 / math.sqrt(1.0 + t * t)
          val s = c * t
          for (i <- 0 until d) {
            val wp = w(i)(p); val wq = w(i)(q)
            w(i)(p) = c * wp - s * wq; w(i)(q) = s * wp + c * wq
            val vp = v(i)(p); val vq = v(i)(q)
            v(i)(p) = c * vp - s * vq; v(i)(q) = s * vp + c * vq
          }
        }
      }
      sweep += 1
    }
    val u = identity(d).map(_.map(_ => 0.0))
    val norms = (0 until d).map(k => math.sqrt(colDot(k, k)))
    for (k <- 0 until d if norms(k) > 1e-9; i <- 0 until d)
      u(i)(k) = w(i)(k) / norms(k)
    // complete null columns: Gram–Schmidt the canonical axes against
    // the columns already placed (deterministic axis order)
    for (k <- 0 until d if norms(k) <= 1e-9) {
      var placed = false
      var axis = 0
      while (!placed && axis < d) {
        val cand = Array.tabulate(d)(i => if (i == axis) 1.0 else 0.0)
        for (c2 <- 0 until d if c2 != k) {
          val dot = (0 until d).foldLeft(0.0)((acc, i) => acc + cand(i) * u(i)(c2))
          for (i <- 0 until d) cand(i) -= dot * u(i)(c2)
        }
        val n = math.sqrt(cand.map(x => x * x).sum)
        if (n > 1e-6) {
          for (i <- 0 until d) u(i)(k) = cand(i) / n
          placed = true
        }
        axis += 1
      }
      require(placed, "opq svd: could not complete an orthogonal basis")
    }
    (u, v)
  }

  /**
   * Train the OPQ rotation on `train` (a sample at scale — the FAISS
   * posture): `itersOpq` alternations of PQ-fit and Procrustes update.
   * `itersOpq = 0` returns the identity — the oracle-pinned degenerate
   * arm.
   */
  def trainRotation(
      train: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, itersPq: Int, itersOpq: Int): Array[Array[Double]] = {
    val dim = train.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0))
      .getOrElse(throw new IllegalArgumentException("opq: empty train set"))
    require(dim % m == 0, s"opq: dim $dim not divisible into $m subspaces")
    var r = identity(dim)
    for (_ <- 0 until itersOpq) {
      // cached per alternation: the PQ trainer makes itersPq+1 passes
      // and the Procrustes statistic two more — rotate the train set
      // once per alternation, not once per pass (all actions run inside
      // this loop body, so the release is synchronous)
      val rot = train.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).as("xv"), rotate(col(vecCol), r).as("rv"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val books = Pq.trainCodebooks(rot, "vec_id", "rv", m, ksub, itersPq)
      val booksLit = books.toIndexedSeq.map(b => typedlit(b.map(_.toSeq).toSeq))
      val q = flatten(array((0 until m).map(j =>
        element_at(booksLit(j), col("codes").getItem(j) + 1)): _*))
      // N = Σ q·xᵀ in integer micro-units (associative — deterministic
      // under any partitioning; the Procrustes solution is invariant to
      // N's positive scale, so the constant never divides back out)
      val cells = Pq.encode(rot, "vec_id", "rv", books, carry = Seq("xv"))
        .select(col("xv"), q.as("__q"))
        .select(col("xv"), posexplode(col("__q")).as(Seq("__i", "__qi")))
        .select(col("__i"), col("__qi"),
          posexplode(col("xv")).as(Seq("__j", "__xj")))
        .groupBy(col("__i"), col("__j"))
        .agg(sum(floor(col("__qi") * col("__xj").cast("double") *
          lit(KMeans.Quant.toDouble)).cast("long")).as("__n"))
        .collect()
      rot.unpersist(blocking = false)
      val n = Array.ofDim[Double](dim, dim)
      cells.foreach(row =>
        n(row.getInt(0))(row.getInt(1)) = row.getLong(2).toDouble)
      val (u, v) = svd(n)
      r = matMulT(u, v) // U·Vᵀ
    }
    r
  }

  /**
   * [[Pq.adcTopK]] in the learned rotated space: corpus and queries
   * rotate map-side, PQ trains/encodes/ranks on the rotated vectors —
   * the same integer-ADC total order, the same plan shapes, one extra
   * projection per row. With `itersOpq = 0` this IS plain PQ through
   * the rotation plumbing (the `ann_opq_roundtrip` pin).
   */
  def adcTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, k: Int, itersOpq: Int,
      train: Option[DataFrame] = None): DataFrame =
    adcTopKRotated(corpus, queries, idCol, vecCol, m, ksub, iters, k,
      trainRotation(train.getOrElse(corpus), idCol, vecCol,
        m, ksub, iters, itersOpq))

  /** [[adcTopK]] with a PRECOMPUTED rotation — the train-once posture:
    * like FAISS, one `OPQMatrix` is trained per corpus release and every
    * searcher applies it; callers that gauge several arms over the same
    * corpus (recall vs plain PQ, composed IVF-PQ) share one training
    * instead of re-alternating per arm. */
  def adcTopKRotated(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int, k: Int,
      rotation: Array[Array[Double]]): DataFrame = {
    // the PQ trainer re-scans its corpus iters+1 times and the ADC code
    // build once more: rotate the corpus ONCE and cache, released on the
    // caller's first action (the CacheScope convention)
    val rc = corpus.select(col(idCol), rotate(col(vecCol), rotation).as("__rv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rq = queries.select(col(idCol),
      rotate(col(vecCol), rotation).as("__rv"))
    CacheScope.unpersistAfterAction(
      Pq.adcTopK(rc, rq, idCol, "__rv", m, ksub, iters, k), Seq(rc))
  }

  /**
   * Deterministic seeded orthogonal rotation: a 64-bit LCG drives a fixed
   * sequence of Givens plane rotations with RATIONAL sine/cosine —
   * c = p/h, s = q/h, h = √(p²+q²) for integer draws p, q — so every
   * floating-point step is a correctly-rounded IEEE-754 primitive
   * (integer wrap, sqrt, divide, multiply, subtract) in a fixed order,
   * and an independent implementation in any language reproduces the
   * matrix BIT FOR BIT (`tools/opq_reference.py` prints the pinned
   * entries `OpqSpec` asserts against).
   *
   * Purpose: the OPQ recall gauges (`ann_opq_recall`,
   * `ann_opq_ivfpq_recall`) run the full rotated pipeline under a
   * rotation BOTH the Spark side and the DuckDB oracle can state exactly
   * (the matrix renders into the oracle as literals via
   * [[OpqSql.rotationLiteral]]), making those rows value-pinned instead
   * of rows-only. A TRAINED rotation ([[trainRotation]]) is data-derived
   * through an iterative SVD and has no SQL restatement — its recall
   * advantage is asserted in `OpqSpec`, not the oracle.
   */
  def seededRotation(d: Int, seed: Long, nRot: Int = 192): Array[Array[Double]] = {
    var state = seed
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      state >>> 33 // top bits of the LCG — the well-mixed ones
    }
    val r = identity(d)
    var k = 0
    while (k < nRot) {
      val i = (next() % d).toInt
      val j = (next() % d).toInt
      val p = (next() % 1000 + 1).toDouble
      val q = (next() % 1000 + 1).toDouble
      if (i != j) {
        val h = math.sqrt(p * p + q * q)
        val c = p / h
        val s = q / h
        var t = 0
        while (t < d) {
          val a = r(i)(t); val b = r(j)(t)
          r(i)(t) = c * a - s * b
          r(j)(t) = s * a + c * b
          t += 1
        }
      }
      k += 1
    }
    r
  }
}

/** DuckDB rendering of the seeded-rotation arms: the rotation matrix as a
  * nested list literal and R·x as the same ascending-j fold as
  * [[graft.plans.MatVecExpr]] (list_reduce seeds from the first product;
  * 0.0 + x ≡ x exactly for the native loop's zero-seeded accumulator). */
object OpqSql {

  /** `[[r00, r01, …], …]`: `Double.toString` emits the shortest decimal
    * that round-trips, and DuckDB's parse is correctly rounded, so the
    * SQL matrix IS the Scala matrix bit for bit. */
  def rotationLiteral(r: Array[Array[Double]]): String =
    r.map(_.map(_.toString).mkString("[", ", ", "]"))
      .mkString("[", ",\n ", "]")

  /** R·`vec` with `rotLit` a [[rotationLiteral]] rendering — one output
    * element per matrix row, each an ascending-j sequential fold. */
  def matVec(rotLit: String, vec: String, d: Int): String =
    s"list_transform($rotLit, rr -> list_reduce(" +
      s"list_transform(range(1, ${d + 1}), j -> rr[j] * $vec[j]), " +
      "(a, b) -> a + b))"
}
