package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Minimal EWKT POINT operations over the spatial strings the cleanser
 * produces (`Clean.shiftPointWkt` renders `SRID=4167;POINT(lon lat)` —
 * the reference's `wkt_prefix`/`longitude_offset` treatment,
 * /root/reference/conf/linz_bde_uploader.conf:390-391). The reference
 * itself never queries geometry (PostGIS is required only by its test
 * harness, /root/reference/t/linz_bde_uploader.t:72-75), so EWKT-as-string
 * is full storage parity; these accessors make the carried column
 * QUERYABLE — coordinate extraction, SRID, planar distance, bbox and
 * radius predicates — without a geometry engine.
 *
 * All pure `functions._` compositions (regexp over the fixed POINT
 * grammar + arithmetic), so every op stays inside whole-stage codegen
 * and pushes through scans like any other string expression. Non-POINT
 * or malformed input yields NULL coordinates and NULL-propagating
 * predicates — the SQL convention, never an exception.
 */
object GeoOps {

  private val PointRe = "POINT\\(([-0-9.eE+]+) ([-0-9.eE+]+)\\)"

  /** Render an EWKT POINT from coordinates (the cleanser's format, 6dp). */
  def ewktPoint(lon: Column, lat: Column, srid: Int = 4167): Column =
    format_string(s"SRID=$srid;POINT(%.6f %.6f)", lon, lat)

  /** SRID of an EWKT string: the `SRID=n;` prefix, or NULL when absent. */
  def stSrid(ewkt: Column): Column = {
    val s = regexp_extract(ewkt, "^SRID=([0-9]+);", 1)
    when(s =!= "", s.cast("int"))
  }

  /** X (longitude) of an EWKT/WKT POINT, NULL when not a point. */
  def stX(ewkt: Column): Column = {
    val s = regexp_extract(ewkt, PointRe, 1)
    when(s =!= "", s.cast("double"))
  }

  /** Y (latitude) of an EWKT/WKT POINT, NULL when not a point. */
  def stY(ewkt: Column): Column = {
    val s = regexp_extract(ewkt, PointRe, 2)
    when(s =!= "", s.cast("double"))
  }

  /** Planar (Cartesian) distance between two EWKT POINTs. */
  def stDistance(a: Column, b: Column): Column = {
    val dx = stX(a) - stX(b)
    val dy = stY(a) - stY(b)
    sqrt(dx * dx + dy * dy)
  }

  /** Point within the closed envelope [minX..maxX] × [minY..maxY]. */
  def stWithinBBox(ewkt: Column, minX: Double, minY: Double,
      maxX: Double, maxY: Double): Column =
    stX(ewkt) >= minX && stX(ewkt) <= maxX &&
      stY(ewkt) >= minY && stY(ewkt) <= maxY

  /** Points within planar distance `d` of each other (ST_DWithin). */
  def stDWithin(a: Column, b: Column, d: Double): Column =
    stDistance(a, b) <= d
}

/** DuckDB rendering of [[GeoOps]] — plain regexp + arithmetic, no
  * spatial extension, so the oracle replays the same grammar. */
object GeoOpsSql {

  private val PointRe = "POINT\\(([-0-9.eE+]+) ([-0-9.eE+]+)\\)"

  def stSrid(e: String): String =
    s"(CASE WHEN regexp_extract($e, '^SRID=([0-9]+);', 1) <> '' " +
      s"THEN regexp_extract($e, '^SRID=([0-9]+);', 1)::INT END)"

  def stX(e: String): String =
    s"(CASE WHEN regexp_extract($e, '$PointRe', 1) <> '' " +
      s"THEN regexp_extract($e, '$PointRe', 1)::DOUBLE END)"

  def stY(e: String): String =
    s"(CASE WHEN regexp_extract($e, '$PointRe', 2) <> '' " +
      s"THEN regexp_extract($e, '$PointRe', 2)::DOUBLE END)"

  def stDistance(a: String, b: String): String =
    s"sqrt((${stX(a)} - ${stX(b)}) * (${stX(a)} - ${stX(b)}) + " +
      s"(${stY(a)} - ${stY(b)}) * (${stY(a)} - ${stY(b)}))"

  def stWithinBBox(e: String, minX: Double, minY: Double,
      maxX: Double, maxY: Double): String =
    s"(${stX(e)} >= $minX AND ${stX(e)} <= $maxX AND " +
      s"${stY(e)} >= $minY AND ${stY(e)} <= $maxY)"
}
