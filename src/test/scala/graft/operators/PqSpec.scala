package graft.operators

import graft.SparkSuite

class PqSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("trainCodebooks: per-subspace dims and shapes; indivisible dim rejected") {
    val df = vecs(
      0L -> Seq(0f, 0f, 10f, 10f),
      1L -> Seq(1f, 1f, 11f, 11f),
      2L -> Seq(8f, 8f, 2f, 2f))
    val books = Pq.trainCodebooks(df, "vec_id", "embedding", m = 2, ksub = 2, iters = 1)
    assert(books.length == 2)
    assert(books.forall(_.length == 2))          // ksub codewords each
    assert(books.forall(_.forall(_.length == 2))) // dsub = 4 / 2
    intercept[IllegalArgumentException] {
      Pq.trainCodebooks(df, "vec_id", "embedding", m = 3, ksub = 2, iters = 1)
    }
  }

  test("encode: with ksub >= distinct subvectors, codes identify the vector") {
    // 2 subspaces of 2 dims; 4 vectors built from 2 distinct subvectors per
    // subspace — k-means with ksub=2 separates them exactly, so codes are
    // a lossless id here and ADC reproduces exact squared-L2 (quantized)
    val df = vecs(
      0L -> Seq(0f, 0f, 9f, 9f),
      1L -> Seq(0f, 0f, 1f, 1f),
      2L -> Seq(8f, 8f, 9f, 9f),
      3L -> Seq(8f, 8f, 1f, 1f))
    val books = Pq.trainCodebooks(df, "vec_id", "embedding", m = 2, ksub = 2, iters = 2)
    val codes = Pq.encode(df, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // same first-subspace code for (0,1) and (2,3); same second-subspace
    // code for (0,2) and (1,3); all four full code tuples distinct
    assert(codes(0L)(0) == codes(1L)(0) && codes(2L)(0) == codes(3L)(0))
    assert(codes(0L)(0) != codes(2L)(0))
    assert(codes(0L)(1) == codes(2L)(1) && codes(1L)(1) == codes(3L)(1))
    assert(codes(0L)(1) != codes(1L)(1))
    assert(codes.values.toSeq.distinct.size == 4)
  }

  test("adcTopK: exact-codebook ADC ranks by true distance, self excluded") {
    val df = vecs(
      0L -> Seq(0f, 0f, 9f, 9f),
      1L -> Seq(0f, 0f, 1f, 1f),
      2L -> Seq(8f, 8f, 9f, 9f),
      3L -> Seq(8f, 8f, 1f, 1f))
    val out = Pq.adcTopK(df, df.where($"vec_id" === 0L), "vec_id", "embedding",
        m = 2, ksub = 2, iters = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.forall(_._1 == 0L))
    assert(!out.exists(_._2 == 0L), "self-match must be excluded")
    // true squared-L2 from 0: d(1)=128, d(2)=128, d(3)=256 — with exact
    // (centroid == subvector) codebooks the quantized ADC preserves order,
    // ties rank by neighbor id
    val ranked = out.sortBy(r => (r._3, r._2)).map(_._2).toSeq
    assert(ranked == Seq(1L, 2L, 3L), out.mkString(","))
    val byId = out.map(r => r._2 -> r._3).toMap
    assert(byId(1L) == byId(2L), "equidistant neighbors quantize equally")
    assert(byId(3L) == 2L * byId(1L), "256 = 2 x 128 in micro-units")
  }

  test("ivfPq single cell: residual coding reproduces exact distances") {
    // one coarse cell -> residuals are v - mean; with exact codebooks the
    // per-subspace ADC term is ||q_sub - v_sub||^2 EXACTLY (the centroid
    // cancels; integer-valued inputs keep the float arithmetic exact), so
    // IVF-PQ ranks identically to true squared-L2
    val df = vecs(
      0L -> Seq(0f, 0f, 9f, 9f),
      1L -> Seq(0f, 0f, 1f, 1f),
      2L -> Seq(8f, 8f, 9f, 9f),
      3L -> Seq(8f, 8f, 1f, 1f))
    val out = IvfPq.topK(df, df.where($"vec_id" === 0L), "vec_id", "embedding",
        nCells = 1, m = 2, ksub = 2, iters = 2, nprobe = 1, k = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val byId = out.toMap
    val q = KMeans.Quant
    assert(byId == Map(1L -> 128L * q, 2L -> 128L * q, 3L -> 256L * q),
      out.mkString(","))
  }

  test("ivfPq probe pruning: unprobed cells never surface candidates") {
    // two far-apart blobs; coarse k-means separates them; a query from
    // blob A with nprobe=1 probes only its own cell, so blob-B vectors
    // cannot appear no matter their (meaningless) cross-cell code overlap
    val blobA = (0L until 4L).map(i => i -> Seq(i.toFloat, 0f, 0f, 0f))
    val blobB = (4L until 8L).map(i => i -> Seq(1000f + i, 1000f, 1000f, 1000f))
    val df = vecs((blobA ++ blobB): _*)
    val out = IvfPq.topK(df, df.where($"vec_id" === 1L), "vec_id", "embedding",
        nCells = 2, m = 2, ksub = 4, iters = 2, nprobe = 1, k = 8)
      .collect().map(_.getLong(1)).toSet
    assert(out.nonEmpty && out.subsetOf(Set(0L, 2L, 3L)), out.toString)
  }

  test("refineTopK: exact rescore of a shortlist, micro-unit distances, " +
      "bounded to the candidates") {
    val df = vecs(
      0L -> Seq(0f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f),   // d=1
      2L -> Seq(2f, 0f, 0f, 0f),   // d=4
      3L -> Seq(3f, 0f, 0f, 0f),   // d=9
      4L -> Seq(0.5f, 0f, 0f, 0f)) // d=0.25 — but NOT in the shortlist
    val q = df.where($"vec_id" === 0L)
    // a deliberately mis-ranked shortlist (as an ADC arm might produce):
    // refine must restore the true order and NEVER resurrect id 4
    val shortlist = Seq((0L, 3L), (0L, 1L), (0L, 2L))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.refineTopK(shortlist, df, q, "vec_id", "embedding",
        k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val qm = KMeans.Quant
    assert(out.toSeq == Seq((0L, 1L, 1L * qm), (0L, 2L, 4L * qm)),
      out.mkString(","))
  }

  test("refineTopK: refined recall can only see shortlist candidates; " +
      "within them it is exact") {
    // corpus on a line; query at origin; shortlist = ids 1..6 shuffled —
    // refine@3 returns exactly {1,2,3} in distance order
    val pts = (0L to 8L).map(i => i -> Seq(i.toFloat, 0f, 0f, 0f))
    val df = vecs(pts: _*)
    val q = df.where($"vec_id" === 0L)
    val shortlist = Seq(6L, 4L, 2L, 5L, 1L, 3L).map(n => (0L, n))
      .toDF("query_id", "neighbor_id")
    val out = Similarity.refineTopK(shortlist, df, q, "vec_id", "embedding",
        k = 3).collect().map(_.getLong(1)).toSeq
    assert(out.sorted == Seq(1L, 2L, 3L), out.mkString(","))
  }
}
