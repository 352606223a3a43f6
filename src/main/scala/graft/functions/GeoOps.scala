package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * EWKT operations over the spatial strings the cleanser produces
 * (`Clean.shiftWkt` renders `SRID=4167;<WKT>` with all longitudes
 * shifted, for ANY geometry type —
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

  // ---- general-geometry accessors over the coordinate list -----------
  // The cleanser now shifts ALL geometry types (Clean.shiftWkt), so the
  // carried column can hold LINESTRING/POLYGON/MULTI* EWKT. These
  // operate on the flat vertex list: every `x y` pair in the text, via
  // one non-overlapping regexp scan — no geometry engine, and the
  // DuckDB twin replays the identical pattern. A POLYGON ring's closing
  // vertex (first==last) is counted like any other vertex, so the
  // centroid is the VERTEX centroid (a dedupe/bucketing gauge, not the
  // area centroid).

  private val PairRe =
    "([-+]?[.0-9][0-9.eE+-]*) ([-+]?[.0-9][0-9.eE+-]*)"

  /** All vertex x values of any WKT/EWKT geometry, in text order.
    * Declarative reference form — the accessors below derive the same
    * aggregates through the compiled one-pass
    * [[graft.plans.GeoEnvelopeExpr]] (HOF `transform` is
    * CodegenFallback and each accessor re-ran the full pair scan;
    * GeoEnvelopeExprSpec pins the two forms equal). `try_cast`, not
    * `cast`: the DuckDB twin below is TRY_CAST, and under Spark 4's
    * default ANSI mode a plain cast would THROW on an unparsable
    * capture instead of the twins' null — unreachable from the
    * cleanser's %.6f re-rendered output, but the accessor contract is
    * null-propagating, never an exception. */
  def stXs(ewkt: Column): Column =
    transform(regexp_extract_all(ewkt, lit(PairRe), lit(1)),
      v => v.try_cast("double"))

  /** All vertex y values of any WKT/EWKT geometry, in text order
    * (declarative reference — see [[stXs]]). */
  def stYs(ewkt: Column): Column =
    transform(regexp_extract_all(ewkt, lit(PairRe), lit(2)),
      v => v.try_cast("double"))

  /** The one-pass envelope scan all aggregate accessors share: struct
    * (xmin, xmax, ymin, ymax, n, sumx, sumy). Identical sibling
    * instances collapse via codegen subexpression elimination, so a
    * projection of several accessors scans the text once. */
  private def envelope(ewkt: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.GeoEnvelopeExpr(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(ewkt)))

  /** Vertex count of any geometry (0-vertex/non-geometry → NULL so the
    * downstream aggregates NULL-propagate like the POINT accessors). */
  def stNPoints(ewkt: Column): Column = {
    val n = envelope(ewkt).getField("n")
    when(n > 0, n)
  }

  /** Envelope bounds of any geometry (NULL when it has no vertices). */
  def stXMin(ewkt: Column): Column = envelope(ewkt).getField("xmin")
  def stXMax(ewkt: Column): Column = envelope(ewkt).getField("xmax")
  def stYMin(ewkt: Column): Column = envelope(ewkt).getField("ymin")
  def stYMax(ewkt: Column): Column = envelope(ewkt).getField("ymax")

  /** Vertex-centroid coordinates (mean of all vertices). */
  def stCentroidX(ewkt: Column): Column =
    envelope(ewkt).getField("sumx") / stNPoints(ewkt)
  def stCentroidY(ewkt: Column): Column =
    envelope(ewkt).getField("sumy") / stNPoints(ewkt)

  /** Geometry envelope fully inside the closed query box — the
    * general-geometry analogue of [[stWithinBBox]]. */
  def stEnvelopeWithin(ewkt: Column, minX: Double, minY: Double,
      maxX: Double, maxY: Double): Column =
    stXMin(ewkt) >= minX && stXMax(ewkt) <= maxX &&
      stYMin(ewkt) >= minY && stYMax(ewkt) <= maxY

  /** Geometry envelope overlapping the closed query box (the coarse
    * spatial-index predicate: envelope test first, exact test later). */
  def stEnvelopeIntersects(ewkt: Column, minX: Double, minY: Double,
      maxX: Double, maxY: Double): Column =
    stXMin(ewkt) <= maxX && stXMax(ewkt) >= minX &&
      stYMin(ewkt) <= maxY && stYMax(ewkt) >= minY
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

  // general-geometry accessors: the same one-pass pair scan as
  // GeoOps.stXs/stYs, in RE2 + DuckDB list functions
  private val PairRe =
    "([-+]?[.0-9][0-9.eE+-]*) ([-+]?[.0-9][0-9.eE+-]*)"

  def stXs(e: String): String =
    s"list_transform(regexp_extract_all($e, '$PairRe', 1), " +
      "v -> TRY_CAST(v AS DOUBLE))"

  def stYs(e: String): String =
    s"list_transform(regexp_extract_all($e, '$PairRe', 2), " +
      "v -> TRY_CAST(v AS DOUBLE))"

  def stNPoints(e: String): String =
    s"(CASE WHEN len(regexp_extract_all($e, '$PairRe', 0)) > 0 " +
      s"THEN len(regexp_extract_all($e, '$PairRe', 0)) END)"

  def stXMin(e: String): String = s"list_aggregate(${stXs(e)}, 'min')"
  def stXMax(e: String): String = s"list_aggregate(${stXs(e)}, 'max')"
  def stYMin(e: String): String = s"list_aggregate(${stYs(e)}, 'min')"
  def stYMax(e: String): String = s"list_aggregate(${stYs(e)}, 'max')"

  def stCentroidX(e: String): String =
    s"(list_aggregate(${stXs(e)}, 'sum') / ${stNPoints(e)})"
  def stCentroidY(e: String): String =
    s"(list_aggregate(${stYs(e)}, 'sum') / ${stNPoints(e)})"

  def stEnvelopeIntersects(e: String, minX: Double, minY: Double,
      maxX: Double, maxY: Double): String =
    s"(${stXMin(e)} <= $maxX AND ${stXMax(e)} >= $minX AND " +
      s"${stYMin(e)} <= $maxY AND ${stYMax(e)} >= $minY)"
}
