package graft.operators

import graft.SparkSuite

class KMeansSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("assign labels each vector with its nearest centroid, ties to lowest index") {
    val df = vecs(1L -> Seq(0f, 0f), 2L -> Seq(10f, 10f), 3L -> Seq(5f, 5f))
    val cents = Array(Array(0d, 0d), Array(10d, 10d))
    val out = KMeans.assign(df, "vec_id", "embedding", cents)
      .select("cid", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // id 3 is equidistant — the tie must break to cluster 0
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("two Lloyd rounds separate two obvious blobs") {
    val blobA = (1L to 4L).map(i => i -> Seq(0.1f * i, 0f))
    val blobB = (5L to 8L).map(i => i -> Seq(10f + 0.1f * i, 0f))
    val df = vecs(blobA ++ blobB: _*)
    // seeds = ids 1, 2 — both in blob A; training must still split the blobs
    val cents = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 2)
    val out = KMeans.assign(df, "vec_id", "embedding", cents)
      .select("cid", "cluster").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.filter(_._1 <= 4L).values.toSet.size == 1)
    assert(out.filter(_._1 >= 5L).values.toSet.size == 1)
    assert(out(1L) != out(8L), "blobs must land in different clusters")
  }

  test("centroid mean is the exact quantized-integer mean") {
    val df = vecs(1L -> Seq(1.5f, -2.25f), 2L -> Seq(2.5f, -0.75f))
    val cents = KMeans.train(df, "vec_id", "embedding", k = 1, iters = 1)
    val q = KMeans.Quant.toDouble
    def qmean(xs: Double*): Double =
      xs.map(x => math.floor(x * q).toLong).sum.toDouble / xs.size.toDouble / q
    assert(cents(0)(0) == qmean(1.5, 2.5))
    assert(cents(0)(1) == qmean(-2.25, -0.75))
  }

  test("ivfTopK probing every cell equals exact L2 top-k") {
    val pts = (1L to 12L).map(i => i -> Seq((i % 5).toFloat, (i % 3).toFloat))
    val df = vecs(pts: _*)
    val got = KMeans.ivfTopK(df, df.where($"vec_id" <= 2), "vec_id",
        "embedding", kClusters = 3, iters = 2, nprobe = 3, k = 4)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference: squared L2 over the same doubles, ties by id
    val m = pts.toMap.map { case (id, v) => id -> v.map(_.toDouble) }
    val want = (for (q <- Seq(1L, 2L)) yield {
      m.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          val d = m(q).zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
          (d, id)
        }.sorted.take(4).map { case (_, id) => (q, id) }
    }).flatten.toSet
    assert(got == want)
  }

  test("a cluster that loses all members keeps its previous centroid") {
    // seeds 1 and 2 are IDENTICAL vectors — every point ties to cluster 0,
    // so cluster 1 empties immediately and must keep its seed coordinates
    val df = vecs(1L -> Seq(0f, 0f), 2L -> Seq(0f, 0f), 3L -> Seq(5f, 0f))
    val cents = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(cents(1).toSeq == Seq(0d, 0d))
  }
}
