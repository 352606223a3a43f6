package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/**
 * The grid decomposition's correctness property: for ARBITRARY interval
 * sets, point sets, and grid sizes, the bucketed equi-join must produce
 * EXACTLY the pairs the naive theta join `lo <= p < hi` defines — no
 * pair lost at a cell boundary, no pair duplicated by a multi-cell
 * interval. Randomized inputs hit the boundary cases (points exactly on
 * cell edges, on lo, on hi, degenerate lo == hi intervals, grids larger
 * than the whole range) that hand fixtures cannot enumerate.
 */
class RangeJoinPropertySpec extends SparkSuite {
  import spark.implicits._

  private val genCase = for {
    grid <- Gen.oneOf(1L, 2L, 7L, 16L, 64L)
    nIv <- Gen.choose(0, 12)
    ivs <- Gen.listOfN(nIv, for {
      lo <- Gen.choose(0, 100)
      w <- Gen.choose(0, 40) // width 0 = degenerate [lo, lo)
    } yield (lo.toDouble, (lo + w).toDouble))
    nPt <- Gen.choose(0, 25)
    // integers, halves, and exact cell-boundary values
    pts <- Gen.listOfN(nPt, Gen.oneOf(
      Gen.choose(0, 140).map(_.toDouble),
      Gen.choose(0, 280).map(_ / 2.0),
      Gen.choose(0, 10).map(_ * 16.0)))
  } yield (grid, ivs, pts)

  test("grid-bucketed join equals the naive theta join, pair for pair") {
    val prop = Prop.forAllNoShrink(genCase) { case (grid, ivs, pts) =>
      val iv = ivs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("band_id", "lo", "hi")
      val pt = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("pid", "v")
      val got = RangeJoin.pointInInterval(pt, "v", iv, "lo", "hi", grid)
        .select("pid", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val want = for {
        (v, pi) <- pts.zipWithIndex
        ((lo, hi), ii) <- ivs.zipWithIndex
        if v >= lo && v < hi
      } yield (pi.toLong, ii.toLong)
      (got.sorted == want.sorted) :|
        s"grid=$grid got=${got.sorted} want=${want.sorted}"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }
}
