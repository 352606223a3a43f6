package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PoolingSpec extends SparkSuite {
  import spark.implicits._

  test("meanPool: element-wise mean per key, dims independent") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)), (1L, Seq(3.0f, 6.0f)),
      (2L, Seq(5.0f, 5.0f))
    ).toDF("id", "emb")
    val out = Pooling.meanPool(df, col("id"), col("emb"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toSeq)).sortBy(_._1)
    assert(out(0) == ((1L, 2L, Seq(2.0, 4.0))), out.mkString(";"))
    assert(out(1) == ((2L, 1L, Seq(5.0, 5.0))), out.mkString(";"))
  }

  test("meanPool quantization: values floor to micro-units (2^-20 grid)") {
    // 1/3 is not representable on the grid: the mean of quantized units
    // is floor(x*Q)/Q-accurate, within 1 ulp of the true mean
    val df = Seq((1L, Seq(1.0f)), (1L, Seq(0.0f)), (1L, Seq(0.0f)))
      .toDF("id", "emb")
    val m = Pooling.meanPool(df, col("id"), col("emb"))
      .collect().head.getSeq[Double](2).head
    assert(math.abs(m - 1.0 / 3.0) <= 1.0 / Pooling.Quant, m.toString)
  }

  test("meanPoolNormalized: unit length; zero vectors pass through") {
    val df = Seq(
      (1L, Seq(3.0f, 0.0f)), (1L, Seq(0.0f, 4.0f)),   // mean (1.5, 2)
      (2L, Seq(0.0f, 0.0f))
    ).toDF("id", "emb")
    val out = Pooling.meanPoolNormalized(df, col("id"), col("emb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](2).toSeq).toMap
    val n1 = math.sqrt(out(1L).map(x => x * x).sum)
    assert(math.abs(n1 - 1.0) < 1e-12, n1.toString)
    assert(math.abs(out(1L).head / out(1L)(1) - 0.75) < 1e-9)
    assert(out(2L) == Seq(0.0, 0.0), out(2L).toString)
  }

  test("meanPool result is partition-order independent (integer sums)") {
    val vecs = (0 until 40).map(i =>
      (1L, Seq.tabulate(8)(d => ((i * 31 + d * 17) % 1000) / 999.0f)))
    val a = Pooling.meanPool(vecs.toDF("id", "emb").repartition(1),
      col("id"), col("emb")).collect().head.getSeq[Double](2)
    val b = Pooling.meanPool(vecs.reverse.toDF("id", "emb").repartition(7),
      col("id"), col("emb")).collect().head.getSeq[Double](2)
    assert(a == b, "micro-unit sums must be order-free")
  }
}
