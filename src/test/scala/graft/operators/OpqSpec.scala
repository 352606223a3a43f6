package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The OPQ building blocks: the hand-rolled one-sided Jacobi SVD (the
  * Procrustes solver) and the rotation projection. */
class OpqSpec extends SparkSuite {
  import spark.implicits._

  private def orthogonalityError(m: Array[Array[Double]]): Double = {
    val d = m.length
    (for (i <- 0 until d; j <- 0 until d) yield {
      val dot = (0 until d).map(k => m(k)(i) * m(k)(j)).sum
      math.abs(dot - (if (i == j) 1.0 else 0.0))
    }).max
  }

  test("jacobi svd: orthogonal factors reconstructing A on a dense matrix") {
    val d = 8
    // deterministic full-rank-ish matrix
    val a = Array.tabulate(d, d)((i, j) =>
      math.sin(i * 2.3 + j * 1.7) + (if (i == j) 2.0 else 0.0))
    val (u, v) = Opq.svd(a)
    assert(orthogonalityError(u) < 1e-9, "U must be orthogonal")
    assert(orthogonalityError(v) < 1e-9, "V must be orthogonal")
    // A·v_k = σ_k·u_k with σ_k = ‖A·v_k‖ — the defining SVD relation
    for (k <- 0 until d) {
      val av = Array.tabulate(d)(i =>
        (0 until d).map(j => a(i)(j) * v(j)(k)).sum)
      val sigma = math.sqrt(av.map(x => x * x).sum)
      val err = (0 until d).map(i => math.abs(av(i) - sigma * u(i)(k))).max
      assert(err < 1e-8, s"column $k: ‖A·v − σ·u‖∞ = $err")
    }
  }

  test("jacobi svd: rank-deficient input still yields orthogonal factors") {
    val d = 6
    // rank-1: every Procrustes factor must still be a full rotation
    val x = Array.tabulate(d)(i => i + 1.0)
    val a = Array.tabulate(d, d)((i, j) => x(i) * x(j))
    val (u, v) = Opq.svd(a)
    assert(orthogonalityError(u) < 1e-6,
      "U must complete to an orthogonal basis on rank-deficient input")
    assert(orthogonalityError(v) < 1e-6, "V must be orthogonal")
  }

  test("native rotate equals the higher-order fold bit-for-bit") {
    val d = 6
    val r = Array.tabulate(d, d)((i, j) => math.sin(i * 1.9 + j * 0.7))
    val df = (0 until 40).map(k =>
      (k.toLong, (0 until d).map(j => (k * 0.37f + j * 1.21f) - 7.5f)))
      .toDF("id", "v")
    val got = df.select(col("id"), Opq.rotate(col("v"), r).as("rv"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Double](1)).toMap
    val want = df.select(col("id"), Opq.rotateHof(col("v"), r).as("rv"))
      .collect().map(x => x.getLong(0) -> x.getSeq[Double](1)).toMap
    assert(got == want, "native mat-vec must reproduce the HOF fold exactly")
  }

  test("rotate with the identity is value-preserving") {
    val r = Array.tabulate(4, 4)((i, j) => if (i == j) 1.0 else 0.0)
    val df = Seq((1L, Seq(1.5f, -2.25f, 0.0f, 7.125f)))
      .toDF("id", "v")
    val out = df.select(Opq.rotate(col("v"), r).as("rv"))
      .collect()(0).getSeq[Double](0)
    assert(out == Seq(1.5, -2.25, 0.0, 7.125))
  }
}
