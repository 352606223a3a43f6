package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** EWKT POINT accessors/predicates: literal cases incl. malformed input
  * (NULL, never an exception) and the cleanser's own output format. */
class GeoOpsSpec extends SparkSuite {
  import spark.implicits._

  private val rows = Seq(
    (1L, "SRID=4167;POINT(160.250000 -41.500000)"),
    (2L, "POINT(0.5 2.25)"),                    // bare WKT: no SRID
    (3L, "SRID=4326;POINT(-175.25 89.0)"),
    (4L, "LINESTRING(0 0, 1 1)"),               // not a point
    (5L, "garbage"),
    (6L, null.asInstanceOf[String]))
    .toDF("id", "e")

  test("srid / x / y accessors with NULL on non-points") {
    val got = rows.select(col("id"), GeoOps.stSrid(col("e")).as("srid"),
        GeoOps.stX(col("e")).as("x"), GeoOps.stY(col("e")).as("y"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(got(1L) == (Some(4167), Some(160.25), Some(-41.5)))
    assert(got(2L) == (None, Some(0.5), Some(2.25)))
    assert(got(3L) == (Some(4326), Some(-175.25), Some(89.0)))
    assert(got(4L) == (None, None, None))
    assert(got(5L) == (None, None, None))
    assert(got(6L) == (None, None, None))
  }

  test("distance, bbox and dwithin predicates") {
    val a = lit("SRID=4167;POINT(3.000000 0.000000)")
    val b = lit("SRID=4167;POINT(0.000000 4.000000)")
    val d = rows.limit(1).select(GeoOps.stDistance(a, b)).collect()(0).getDouble(0)
    assert(d == 5.0)
    val in = rows.where(GeoOps.stWithinBBox(col("e"), 0.0, 0.0, 1.0, 3.0))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(in == Seq(2L), in.toString) // only the bare point qualifies
    val dw = rows.limit(1)
      .select(GeoOps.stDWithin(a, b, 5.0), GeoOps.stDWithin(a, b, 4.9))
      .collect()(0)
    assert(dw.getBoolean(0) && !dw.getBoolean(1))
  }

  test("round-trips the cleanser's shiftPointWkt output") {
    val raw = Seq((1L, "POINT(0.25 -42.25)")).toDF("id", "wkt")
    val e = graft.bde.Clean.shiftPointWkt(col("wkt"))
    val got = raw.select(GeoOps.stSrid(e), GeoOps.stX(e), GeoOps.stY(e))
      .collect()(0)
    assert(got.getInt(0) == 4167)
    assert(got.getDouble(1) == 160.25)
    assert(got.getDouble(2) == -42.25)
  }

  test("general-geometry envelope, vertex centroid and npoints") {
    val geoms = Seq(
      (1L, "SRID=4167;POLYGON((1.0 2.0,3.0 6.0,5.0 4.0,1.0 2.0))"),
      (2L, "SRID=4167;LINESTRING(-1.5 0.5,2.5 -3.5)"),
      (3L, "SRID=4167;POINT(7.0 8.0)"),
      (4L, "no geometry here"),
      (5L, null.asInstanceOf[String])).toDF("id", "e")
    val got = geoms.select(col("id"),
        GeoOps.stXMin(col("e")), GeoOps.stXMax(col("e")),
        GeoOps.stYMin(col("e")), GeoOps.stYMax(col("e")),
        GeoOps.stCentroidX(col("e")), GeoOps.stCentroidY(col("e")),
        GeoOps.stNPoints(col("e")))
      .collect().map(r => r.getLong(0) ->
        (1 to 7).map(i => Option(r.get(i))).toList).toMap
    // polygon: closing vertex counted (vertex centroid, 4 points)
    assert(got(1L) == List(Some(1.0), Some(5.0), Some(2.0), Some(6.0),
      Some(2.5), Some(3.5), Some(4)))
    assert(got(2L) == List(Some(-1.5), Some(2.5), Some(-3.5), Some(0.5),
      Some(0.5), Some(-1.5), Some(2)))
    assert(got(3L) == List(Some(7.0), Some(7.0), Some(8.0), Some(8.0),
      Some(7.0), Some(8.0), Some(1)))
    assert(got(4L) == List.fill(7)(None))
    assert(got(5L) == List.fill(7)(None))
    // envelope predicates over the same rows
    val within = geoms
      .where(GeoOps.stEnvelopeWithin(col("e"), 0.0, 0.0, 6.0, 7.0))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(within == Seq(1L))
    val hits = geoms
      .where(GeoOps.stEnvelopeIntersects(col("e"), 4.0, 3.0, 8.0, 9.0))
      .select(col("id")).collect().map(_.getLong(0)).toSeq
    assert(hits == Seq(1L, 3L))
  }
}
