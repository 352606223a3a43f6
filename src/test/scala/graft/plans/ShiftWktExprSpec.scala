package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.bde.Clean

/** The native [[ShiftWktExpr]] pinned element-for-element against the
  * declarative `Clean.shiftWktColumns` chain (the executable reference
  * whose shape the DuckDB oracle twin replays) over a fixture matrix
  * covering every behavioral arm, plus randomized WKT-ish inputs. */
class ShiftWktExprSpec extends SparkSuite {
  import spark.implicits._

  private val fixtures = Seq(
    "POINT(174.53 -41.25)",
    "POINT(-45.25 12.75)",
    "LINESTRING(170.1 -45.5,170.2 -45.6)",
    "POLYGON((174.5 -41.2,175.0 -41.3,174.8 -40.9,174.5 -41.2))",
    "MULTIPOLYGON(((1 2,3 4,5 6,1 2)),((7 8,9 10,11 12,7 8)))",
    "MULTIPOINT((10 40),(40 30))",
    "GEOMETRYCOLLECTION(POINT(4 6),LINESTRING(4 6,7 10))",
    "POINT Z (1 2 3)",
    "12  POLYGON((1 2,3 4,5 6,1 2))",
    "007 POINT(1 2)",
    "POINT EMPTY",
    "POLYGON EMPTY",
    "not a geometry at all",
    "174.5 some text",
    "",
    "POINT(1e2 -3.5e-1)",          // exponent forms
    "POINT(1e999 2)",              // overflow -> Infinity in both forms
    "LINESTRING(bad x,1 2)",       // non-numeric group passes through
    "LINESTRING(1 2..3,4 5)",      // unparsable TAIL number skipped
    "LINESTRING(2..3 1,4 5)",      // unparsable FIRST number -> fallback
    "POINT(. .)",                  // bare dots -> fallback
    "POINT(+5 -0.25)",             // signs
    "POINT(\t1 2)",                // exotic whitespace inside the group
    "POINT(  1   2  )",            // extra spaces
    "POINT(5)",                    // single-number group
    "POINT((1 2))",                // extra nesting
    "POINT()",                     // empty group
    "POINTX(1 2)")                 // keyword prefix still guards (rlike)

  test("native == declarative chain over the fixture matrix") {
    val df = fixtures.toDF("s")
      .select(col("s"),
        Clean.shiftWkt(col("s")).as("native"),
        Clean.shiftWktColumns(col("s")).as("reference"))
    df.collect().foreach { r =>
      assert(Option(r.get(1)) == Option(r.get(2)),
        s"input=${r.get(0)}: native=${r.get(1)} reference=${r.get(2)}")
    }
    // null in -> null out, both forms
    val nr = Seq(Option.empty[String]).toDF("s")
      .select(Clean.shiftWkt(col("s")), Clean.shiftWktColumns(col("s")))
      .collect().head
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("native == declarative chain on randomized coordinate soup") {
    val rnd = new scala.util.Random(4167)
    val types = Seq("POINT", "LINESTRING", "POLYGON", "MULTIPOLYGON",
      "JUNK", "")
    def num() = f"${rnd.nextDouble() * 400 - 200}%.4f"
    val gen = (1 to 300).map { _ =>
      val t = types(rnd.nextInt(types.size))
      val coords = (1 to 1 + rnd.nextInt(4))
        .map(_ => s"${num()} ${num()}").mkString(",")
      val lead = if (rnd.nextBoolean()) "" else s"${rnd.nextInt(99)} "
      s"$lead$t($coords)"
    }
    val out = gen.toDF("s")
      .select(Clean.shiftWkt(col("s")).as("native"),
        Clean.shiftWktColumns(col("s")).as("reference"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("non-default offset and prefix flow through the expression") {
    val cfg = Clean.CleanConfig(
      wktPrefix = "SRID=2193;", longitudeOffset = -30.5)
    val got = Seq("LINESTRING(100 2,50 3)").toDF("s")
      .select(Clean.shiftWkt(col("s"), cfg)).collect().head.getString(0)
    assert(got ==
      "SRID=2193;LINESTRING(69.500000 2.000000,19.500000 3.000000)")
  }
}
