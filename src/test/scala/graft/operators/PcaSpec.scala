package graft.operators

import graft.SparkSuite

class PcaSpec extends SparkSuite {

  import spark.implicits._

  test("power iteration recovers the dominant axis of an anisotropic cloud") {
    // variance 9 along e1, 1 along e2: top direction is ±e1
    val df = Seq(
      Tuple1(Seq(3f, 0f)), Tuple1(Seq(-3f, 0f)), Tuple1(Seq(3f, 0.5f)),
      Tuple1(Seq(-3f, -0.5f)), Tuple1(Seq(0f, 1f)), Tuple1(Seq(0f, -1f)))
      .toDF("embedding")
    val v = Pca.topComponentVector(df, "embedding", dim = 2, iters = 8)
    assert(math.abs(math.abs(v(0)) - 1.0) < 0.01, v.mkString(","))
    assert(math.abs(v(1)) < 0.2)
    // unit norm
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("removeComponent leaves vectors orthogonal to the removed direction") {
    val df = Seq(
      Tuple1(Seq(3f, 1f)), Tuple1(Seq(-2f, 0.5f)), Tuple1(Seq(1f, -1f)))
      .toDF("embedding")
    val v = Array(1.0, 0.0) // remove e1: corrected x-components must be ~0
    val got = Pca.removeComponent(df, "embedding", v)
      .select("corrected").collect().map(_.getSeq[Float](0))
    got.foreach(c => assert(math.abs(c(0)) < 1e-6, c.mkString(",")))
    assert(got.map(_(1)).toSeq == Seq(1f, 0.5f, -1f))
  }

  test("deflation recovers orthogonal components in variance order") {
    // variance 100 along e1, 25 along e2, 1 along e3
    val rnd = new scala.util.Random(7)
    val df = (0 until 400).map { _ =>
      Tuple1(Seq(
        (rnd.nextGaussian() * 10).toFloat,
        (rnd.nextGaussian() * 5).toFloat,
        (rnd.nextGaussian() * 1).toFloat))
    }.toDF("embedding")
    val comps = Pca.topComponents(df, "embedding", dim = 3, k = 2, iters = 10)
    val Seq(v1, v2) = comps
    assert(math.abs(v1(0)) > 0.99, s"first component must be ~e1: ${v1.toSeq}")
    assert(math.abs(v2(1)) > 0.98, s"second component must be ~e2: ${v2.toSeq}")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.02, s"components must be orthogonal: $dot")
  }

  test("the trajectory is bit-identical under any partitioning") {
    val base = (0L until 300L)
      .map(i => Tuple1(Seq.tabulate(8)(j => ((i * 31 + j * 7) % 13 - 6) / 6f)))
      .toDF("embedding")
    val a = Pca.topComponentVector(base.repartition(1), "embedding", 8)
    val b = Pca.topComponentVector(base.repartition(7), "embedding", 8)
    assert(a.toSeq == b.toSeq,
      "integer micro-unit sums must make the matvec combine-order independent")
  }

  test("ragged or null vectors fail loudly before any iteration") {
    val df = Seq(Tuple1(Seq(1f, 0f)), Tuple1(Seq(1f, 0f, 9f)))
      .toDF("embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponentVector(df, "embedding", dim = 2, iters = 2)
    }
    assert(e.getMessage.contains("ragged"))
    val withNull = Seq(Some(Seq(1f, 0f)), None).toDF("embedding")
    intercept[IllegalArgumentException] {
      Pca.topComponentVector(withNull, "embedding", dim = 2, iters = 2)
    }
  }
}
