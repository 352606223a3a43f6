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

  test("seeded rotation matches the independent Python reference bit for bit") {
    // literals printed by tools/opq_reference.py (d=64, seed=7, nRot=192):
    // an independent pure-Python implementation of the generator contract
    val r = Opq.seededRotation(64, 7)
    def bits(v: Double) = java.lang.Double.doubleToLongBits(v)
    val csum = r.flatten.foldLeft(0L)((acc, v) => acc ^ bits(v))
    assert(csum == 0x3e8224e5962c5fb5L,
      f"xor-of-bits checksum mismatch: got 0x$csum%016x")
    assert(bits(r(0)(0)) == 0x3fa142966b6fea62L)
    assert(bits(r(1)(7)) == 0xbfac2f3509fdc9bdL)
    assert(bits(r(17)(42)) == 0L)
    assert(bits(r(32)(32)) == 0x3fbff74825119082L)
    assert(bits(r(47)(2)) == 0xbfc306c52f34b892L)
    assert(bits(r(63)(63)) == 0x3fb7003c29564b0dL)
    assert(orthogonalityError(r) < 1e-12,
      "the Givens product must stay orthogonal")
  }

  test("trained rotation buys recall over plain PQ on a correlated corpus") {
    // the Ge et al. 2013 motivating case, in miniature: a rank-1 shared
    // component spread across every subspace — contiguous-slice PQ spends
    // codebook budget re-encoding the shared direction in all m
    // subspaces; the learned rotation concentrates it. This is the
    // QUALITY claim the seeded-rotation oracle rows deliberately do not
    // carry (the trained rotation is SVD-derived and has no SQL
    // restatement), so it lives here.
    val d = 16
    val n = 96
    val rng = new scala.util.Random(11)
    val rows = (0 until n).map { i =>
      val base = Array.fill(d)(rng.nextGaussian().toFloat)
      val shared = rng.nextGaussian().toFloat * 4.0f
      (i.toLong, base.map(_ + shared).toSeq)
    }
    val emb = rows.toDF("vec_id", "embedding").localCheckpoint(true)
    val q = emb.where(col("vec_id") < 16)
    def exactTopK(k: Int) = {
      val topk = Similarity.topKUdaf(k)
      emb.as("c").crossJoin(broadcast(q.select(
          col("vec_id").as("query_id"), col("embedding").as("qv"))))
        .where(col("c.vec_id") =!= col("query_id"))
        .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
          graft.functions.VectorOps.sqDist(col("c.embedding"), col("qv"))
            .as("d"))
        .groupBy(col("query_id"))
        .agg(topk(-col("d"), col("neighbor_id")).as("tk"))
        .select(col("query_id"), explode(col("tk.items._2")).as("neighbor_id"))
    }
    val exact = exactTopK(10).localCheckpoint(true)
    val rot = Opq.trainRotation(emb, "vec_id", "embedding",
      m = 4, ksub = 8, itersPq = 2, itersOpq = 3)
    val opq = Opq.adcTopKRotated(emb, q, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2, k = 10, rotation = rot)
    val pq = Pq.adcTopK(emb, q, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2, k = 10)
    def meanRecall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, exact)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
    val (rOpq, rPq) = (meanRecall(opq), meanRecall(pq))
    assert(rOpq >= rPq,
      s"trained rotation must not hurt recall: opq=$rOpq pq=$rPq")
    assert(rOpq > 0.0, "gauge must not be vacuous")
  }
}
