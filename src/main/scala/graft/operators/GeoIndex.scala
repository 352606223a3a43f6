package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoOps

/**
 * At-rest SPATIAL CELL index over an EWKT geometry column — the
 * dedup/postings/CDX index lifecycle applied to space. The cleanser
 * emits `SRID=4167;<WKT>` strings ([[graft.bde.Clean.shiftWkt]]); LINZ's
 * production tables are parcel POLYGONs and road-centreline LINESTRINGs,
 * and "all features inside this bounding box" is the query every spatial
 * consumer starts with. A 100 TB table cannot answer it by scanning —
 * this index gives the probe the same shape as every other at-rest
 * family here: bucket-pruned scan of only the relevant slice, never a
 * corpus rescan, with envelope geometry carried IN the index so probes
 * never touch the WKT text.
 *
 * Layout: one row per (cell, id) with the geometry's ENVELOPE
 * (xmin/xmax/ymin/ymax), bucketed AND sorted on `cell`. The cell is a
 * uniform grid key `floor(x/cellSize) ⋅ 2²¹ + floor(y/cellSize)` (grid
 * algebra, not a curve — the probe enumerates the query box's cell range
 * directly). A geometry spanning k cells lands k rows (extraction and
 * the regexp coordinate scan are paid ONCE per geometry lifetime, at
 * ingest); a geometry spanning more than `maxCellsPerGeom` cells — or
 * one whose envelope leaves the packable ±2²⁰-cell range — lands ONE row
 * in the OVERSIZE cell, which every probe additionally scans (the
 * classic oversize-object sidecar: pathological geometries degrade the
 * probe by |oversize|, never break it).
 *
 * Probe ([[probeBBox]]): the query box's cell ids (plus the oversize
 * cell) are a driver-side literal list, so the bucketed scan prunes to
 * the buckets holding those cells (`SelectedBucketsCount`, plan-pinned
 * in PlanAuditSpec), then the exact envelope-intersects predicate
 * filters within the cells and a distinct collapses multi-cell
 * geometries. Semantics are ENVELOPE-level (the coarse index predicate);
 * exact-geometry refinement, when a consumer needs it, is a semi-join of
 * the returned ids back to the corpus — the two-stage
 * filter-then-confirm shape every coarse index here uses.
 *
 * Maintenance is the shared lifecycle: [[appendGeoIndex]] folds a new
 * batch in the fixed bucket layout, `Bucketing.compactBucketed` folds
 * appended files, and the generic [[Retract]] tombstone → purge path
 * applies unchanged (the table is a single-column-bucketed sorted table
 * like every other index family; exercised in GeoIndexSpec).
 */
object GeoIndex {

  /** Cell-coordinate pack base (2^21) and the guarded coordinate range. */
  private val CellPack = 1L << 21
  private val CoordLimit = (1L << 20) - 1

  /** The always-scanned cell for geometries too large (or too far out of
    * range) to enumerate. */
  val OversizeCell: Long = Long.MinValue

  /** Cell ids covered by an envelope, as pure column arithmetic over the
    * already-extracted bounds (NULL bounds → NULL: not indexable). */
  private def cellsFromEnvelope(
      xmin: Column, xmax: Column, ymin: Column, ymax: Column,
      cellSize: Double, maxCellsPerGeom: Int): Column = {
    val cxMin = floor(xmin / cellSize).cast("long")
    val cxMax = floor(xmax / cellSize).cast("long")
    val cyMin = floor(ymin / cellSize).cast("long")
    val cyMax = floor(ymax / cellSize).cast("long")
    val n = (cxMax - cxMin + lit(1L)) * (cyMax - cyMin + lit(1L))
    val outOfRange =
      abs(cxMin) > CoordLimit || abs(cxMax) > CoordLimit ||
        abs(cyMin) > CoordLimit || abs(cyMax) > CoordLimit
    when(cxMin.isNull || cyMin.isNull, lit(null).cast("array<bigint>"))
      .when(outOfRange || n > maxCellsPerGeom, array(lit(OversizeCell)))
      .otherwise(flatten(transform(sequence(cxMin, cxMax),
        cx => transform(sequence(cyMin, cyMax),
          cy => cx * lit(CellPack) + cy))))
  }

  private def indexRows(
      df: DataFrame, idCol: String, ewktCol: String,
      cellSize: Double, maxCellsPerGeom: Int): DataFrame = {
    val g = col(ewktCol)
    df.select(col(idCol).cast("long").as("id"),
        GeoOps.stXMin(g).as("xmin"), GeoOps.stXMax(g).as("xmax"),
        GeoOps.stYMin(g).as("ymin"), GeoOps.stYMax(g).as("ymax"))
      .withColumn("cells", cellsFromEnvelope(
        col("xmin"), col("xmax"), col("ymin"), col("ymax"),
        cellSize, maxCellsPerGeom))
      .where(col("cells").isNotNull)
      .select(explode(col("cells")).as("cell"), col("id"),
        col("xmin"), col("xmax"), col("ymin"), col("ymax"))
  }

  /** Persist the spatial index: (cell, id, envelope) bucketed + sorted
    * on `cell`. Non-geometry / vertex-less rows are not indexable and
    * are skipped. */
  def writeGeoIndex(
      df: DataFrame, idCol: String, ewktCol: String, table: String,
      cellSize: Double, buckets: Int, maxCellsPerGeom: Int = 64): Unit =
    Bucketing.writeBucketed(
      indexRows(df, idCol, ewktCol, cellSize, maxCellsPerGeom),
      table, "cell", buckets)

  /** Fold a committed batch INTO the index in its fixed bucket layout
    * (probes stay bucket-pruned; `Bucketing.compactBucketed` is the
    * maintenance fold). `cellSize`/`maxCellsPerGeom` must match the
    * build — the grid is part of the table's contract. */
  def appendGeoIndex(
      batch: DataFrame, idCol: String, ewktCol: String, table: String,
      cellSize: Double, maxCellsPerGeom: Int = 64): Unit =
    DedupIndex.appendBucketed(
      indexRows(batch, idCol, ewktCol, cellSize, maxCellsPerGeom), table)

  /** Ids of geometries whose ENVELOPE intersects the closed query box.
    * One bucket-pruned scan of the box's cells (+ the oversize cell),
    * the exact envelope predicate within them, and a distinct over the
    * matched ids (a multi-cell geometry must count once). The cell list
    * is (box cells + 1) driver-side literals — callers size the box in
    * cells, not bytes; a continent-sized box at a fine cellSize belongs
    * in a coarser index, and the require below says so loudly. */
  def probeBBox(
      spark: SparkSession, table: String,
      minX: Double, minY: Double, maxX: Double, maxY: Double,
      cellSize: Double, maxProbeCells: Int = 4096): DataFrame = {
    require(minX <= maxX && minY <= maxY,
      s"probeBBox: degenerate box [$minX..$maxX]x[$minY..$maxY]")
    val cxMin = math.floor(minX / cellSize).toLong
    val cxMax = math.floor(maxX / cellSize).toLong
    val cyMin = math.floor(minY / cellSize).toLong
    val cyMax = math.floor(maxY / cellSize).toLong
    val nCells = (cxMax - cxMin + 1) * (cyMax - cyMin + 1)
    require(nCells <= maxProbeCells,
      s"probeBBox: box covers $nCells cells of size $cellSize (max " +
        s"$maxProbeCells) — use a coarser index for boxes this large")
    val cells = (for {
      cx <- cxMin to cxMax
      cy <- cyMin to cyMax
    } yield cx * CellPack + cy) :+ OversizeCell
    Retract.readLive(spark, table)
      .where(col("cell").isin(cells: _*))
      .where(col("xmin") <= maxX && col("xmax") >= minX &&
        col("ymin") <= maxY && col("ymax") >= minY)
      .select(col("id")).distinct()
  }
}
