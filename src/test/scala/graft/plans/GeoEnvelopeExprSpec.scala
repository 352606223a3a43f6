package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.GeoOps

/** The native one-pass [[GeoEnvelopeExpr]] accessors pinned against the
  * declarative HOF chain they replaced (still exposed as
  * `GeoOps.stXs`/`stYs` — the executable reference whose shape the
  * DuckDB oracle twin replays), over a fixture matrix covering every
  * behavioral arm: min/max null-skipping, the n>0 null convention, and
  * the aggregate fold's null-poisoning on unparsable elements. */
class GeoEnvelopeExprSpec extends SparkSuite {
  import spark.implicits._

  private val fixtures = Seq(
    "SRID=4167;POINT(174.530000 -41.250000)",
    "POINT(-45.25 12.75)",
    "LINESTRING(170.1 -45.5,170.2 -45.6)",
    "POLYGON((174.5 -41.2,175.0 -41.3,174.8 -40.9,174.5 -41.2))",
    "MULTIPOLYGON(((1 2,3 4,5 6,1 2)),((7 8,9 10,11 12,7 8)))",
    "MULTIPOINT((10 40),(40 30))",
    "GEOMETRYCOLLECTION(POINT(4 6),LINESTRING(4 6,7 10))",
    "POINT EMPTY",
    "not a geometry at all",
    "174.5 some text",
    "",
    "POINT(1e2 -3.5e-1)",           // exponents
    "POINT(1e999 2)",               // overflow -> Infinity both forms
    "POINT(1.2.3 4)",               // unparsable x: min/max skip, sum poisons
    "POINT(4 1.2.3)",               // unparsable y
    "LINESTRING(1.2.3 4,5 6)",      // mixed parsable/unparsable
    "POINT(+5 -0.25)",              // signs
    "POINT(.5 .25)",                // leading-dot numbers
    "5 7",                          // bare pair, no keyword
    "1 2,3 4",                      // bare pair list
    "POINT(5)",                     // single number: no pair match
    "POINT(1 2")                    // unterminated

  // the declarative aggregates, exactly as GeoOps computed them before
  private def refNPoints(e: org.apache.spark.sql.Column) = {
    val n = size(GeoOps.stXs(e)) // same match count as group-0 extract
    when(n > 0, n)
  }

  test("native accessors == declarative chain over the fixture matrix") {
    val e = col("s")
    val df = (fixtures :+ null).toDF("s").select(
      col("s"),
      GeoOps.stXMin(e).as("xmin_n"), array_min(GeoOps.stXs(e)).as("xmin_r"),
      GeoOps.stXMax(e).as("xmax_n"), array_max(GeoOps.stXs(e)).as("xmax_r"),
      GeoOps.stYMin(e).as("ymin_n"), array_min(GeoOps.stYs(e)).as("ymin_r"),
      GeoOps.stYMax(e).as("ymax_n"), array_max(GeoOps.stYs(e)).as("ymax_r"),
      GeoOps.stNPoints(e).as("n_n"), refNPoints(e).as("n_r"),
      GeoOps.stCentroidX(e).as("cx_n"),
      (aggregate(GeoOps.stXs(e), lit(0.0), (acc, x) => acc + x) /
        refNPoints(e)).as("cx_r"),
      GeoOps.stCentroidY(e).as("cy_n"),
      (aggregate(GeoOps.stYs(e), lit(0.0), (acc, y) => acc + y) /
        refNPoints(e)).as("cy_r"))
    df.collect().foreach { r =>
      val in = Option(r.get(0)).getOrElse("<null>")
      (1 until r.length by 2).foreach { i =>
        assert(Option(r.get(i)) == Option(r.get(i + 1)),
          s"input=$in field#$i: native=${r.get(i)} reference=${r.get(i + 1)}")
      }
    }
  }

  test("envelope predicates match the declarative forms") {
    val e = col("s")
    def refIntersects = array_min(GeoOps.stXs(e)) <= 200.0 &&
      array_max(GeoOps.stXs(e)) >= 160.0 &&
      array_min(GeoOps.stYs(e)) <= 10.0 &&
      array_max(GeoOps.stYs(e)) >= -45.0
    def refWithin = array_min(GeoOps.stXs(e)) >= 160.0 &&
      array_max(GeoOps.stXs(e)) <= 200.0 &&
      array_min(GeoOps.stYs(e)) >= -45.0 &&
      array_max(GeoOps.stYs(e)) <= 10.0
    val df = (fixtures :+ null).toDF("s").select(col("s"),
      GeoOps.stEnvelopeIntersects(e, 160.0, -45.0, 200.0, 10.0).as("i_n"),
      refIntersects.as("i_r"),
      GeoOps.stEnvelopeWithin(e, 160.0, -45.0, 200.0, 10.0).as("w_n"),
      refWithin.as("w_r"))
    df.collect().foreach { r =>
      val in = Option(r.get(0)).getOrElse("<null>")
      assert(Option(r.get(1)) == Option(r.get(2)), s"intersects: $in")
      assert(Option(r.get(3)) == Option(r.get(4)), s"within: $in")
    }
  }

  test("randomized WKT-ish inputs agree") {
    val rnd = new scala.util.Random(4167)
    val alphabet = "0123456789.eE+- (),POINTLGYMU"
    val rows = (1 to 300).map { _ =>
      (1 to rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val e = col("s")
    val df = rows.toDF("s").select(col("s"),
      GeoOps.stXMin(e).as("a"), array_min(GeoOps.stXs(e)).as("b"),
      GeoOps.stCentroidX(e).as("c"),
      (aggregate(GeoOps.stXs(e), lit(0.0), (acc, x) => acc + x) /
        refNPoints(e)).as("d"))
    df.collect().foreach { r =>
      assert(Option(r.get(1)) == Option(r.get(2)), s"xmin: ${r.get(0)}")
      assert(Option(r.get(3)) == Option(r.get(4)), s"cx: ${r.get(0)}")
    }
  }
}
