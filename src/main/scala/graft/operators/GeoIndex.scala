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
  /** One side of [[envelopeJoin]], prepared: envelope bounds + covered
    * cells, unindexable rows dropped. */
  private def joinSide(
      df: DataFrame, idCol: String, ewktCol: String, tag: String,
      cellSize: Double, maxCellsPerGeom: Int): DataFrame = {
    val g = col(ewktCol)
    df.select(col(idCol).cast("long").as(s"${tag}_id"),
        GeoOps.stXMin(g).as(s"${tag}_xmin"),
        GeoOps.stXMax(g).as(s"${tag}_xmax"),
        GeoOps.stYMin(g).as(s"${tag}_ymin"),
        GeoOps.stYMax(g).as(s"${tag}_ymax"))
      .withColumn("cells", cellsFromEnvelope(
        col(s"${tag}_xmin"), col(s"${tag}_xmax"),
        col(s"${tag}_ymin"), col(s"${tag}_ymax"),
        cellSize, maxCellsPerGeom))
      .where(col("cells").isNotNull)
  }

  private def intersects(a: String, b: String): Column =
    col(s"${a}_xmin") <= col(s"${b}_xmax") &&
      col(s"${a}_xmax") >= col(s"${b}_xmin") &&
      col(s"${a}_ymin") <= col(s"${b}_ymax") &&
      col(s"${a}_ymax") >= col(s"${b}_ymin")

  /**
   * Grid SPATIAL JOIN (the PBSM shape, Patel & DeWitt 1996): every
   * (a, b) pair whose envelopes intersect, co-partitioned by grid cell
   * so the work distributes — the operation a 100 TB parcels ×
   * centrelines overlay actually is, and one no amount of bbox probing
   * composes. Both sides explode to their covered cells and join ON the
   * cell (an equi-join Spark shuffles/broadcasts like any other) with
   * the envelope predicate inside the cell. A pair whose envelopes
   * share k cells would surface k times; instead of a distinct shuffle
   * over the full pair stream, the REFERENCE-POINT rule keeps exactly
   * one copy map-side: the intersection envelope's lower-left corner
   * `(max(xmin), max(ymin))` lies in exactly ONE cell, and the pair
   * reports only where that cell is the join cell. OVERSIZE rows (too
   * many cells / out of range) cannot ride the grid; they join by
   * BROADCAST nested-loop against the other side — bounded by the
   * oversize count, which maxCellsPerGeom keeps a deliberate, sized
   * choice, and never double-counted (an oversize×oversize pair reports
   * only from the a-side arm; grid rows never carry the oversize cell).
   *
   * Returns (a_id, b_id) pairs, each exactly once.
   */
  def envelopeJoin(
      a: DataFrame, aId: String, aEwkt: String,
      b: DataFrame, bId: String, bEwkt: String,
      cellSize: Double, maxCellsPerGeom: Int = 64): DataFrame = {
    // cached: each prepared side is consumed by three arms (grid, own
    // oversize, other side's oversize), and the preparation is the
    // expensive part — the regexp coordinate scan over the WKT text —
    // which would otherwise re-run per arm
    val sa = joinSide(a, aId, aEwkt, "a", cellSize, maxCellsPerGeom)
      .persist()
    val sb = joinSide(b, bId, bEwkt, "b", cellSize, maxCellsPerGeom)
      .persist()
    CacheScope.unpersistAfterAction(
      envelopeJoinPrepared(sa, sb, cellSize), Seq(sa, sb))
  }

  /** The three join arms over PREPARED (tagged, cached) sides. */
  private def envelopeJoinPrepared(
      sa: DataFrame, sb: DataFrame, cellSize: Double): DataFrame = {
    def grid(s: DataFrame) =
      s.where(col("cells") =!= array(lit(OversizeCell)))
        .withColumn("cell", explode(col("cells"))).drop("cells")
    def oversize(s: DataFrame) =
      s.where(col("cells") === array(lit(OversizeCell))).drop("cells")
    val (ga, gb) = (grid(sa), grid(sb))
    val (oa, ob) = (oversize(sa), oversize(sb))
    // reference-point rule: report in the cell holding the intersection
    // envelope's lower-left corner
    val rx = greatest(col("a_xmin"), col("b_xmin"))
    val ry = greatest(col("a_ymin"), col("b_ymin"))
    val refCell = floor(rx / cellSize).cast("long") * lit(CellPack) +
      floor(ry / cellSize).cast("long")
    val gridPairs = ga.join(gb, ga("cell") === gb("cell"))
      .where(intersects("a", "b") && refCell === ga("cell"))
      .select(col("a_id"), col("b_id"))
    val aOversize = broadcast(oa).join(sb.drop("cells"),
        intersects("a", "b"))
      .select(col("a_id"), col("b_id"))
    val bOversize = sa.where(col("cells") =!= array(lit(OversizeCell)))
      .drop("cells")
      .join(broadcast(ob), intersects("a", "b"))
      .select(col("a_id"), col("b_id"))
    gridPairs.unionByName(aOversize).unionByName(bOversize)
  }

  /**
   * k nearest geometries to a point by ENVELOPE distance (0 when the
   * point is inside the envelope; exact-geometry refinement is the
   * caller's semi-join, as with [[probeBBox]]), via expanding RING
   * search over the cell grid: ring r scans only the 8r cells at
   * Chebyshev distance r from the probe's cell (bucket-pruned literal
   * list, plus the oversize sidecar once), and the search stops as soon
   * as the k-th best distance is ≤ the next ring's minimum possible
   * distance `(r ⋅ cellSize)` — for a probe in a dense region the scan
   * touches a handful of cells of a 100 TB index. `maxRings` bounds the
   * driver-paced loop for a probe in EMPTY space: past it the search
   * falls back to ONE distributed full top-k over the index (the
   * oracle's own shape — exact by construction, and one job instead of
   * an unbounded ring walk whose per-ring literal lists grow as 8r).
   * Per ring only the k best candidates ride to the driver (k-bounded
   * collect, the [[Selection]] precedent); returns (id, dist) — dist
   * full-precision, ordered (dist, id).
   */
  def probeKnn(
      spark: SparkSession, table: String, px: Double, py: Double, k: Int,
      cellSize: Double, maxRings: Int = 8): DataFrame = {
    require(k >= 1, s"probeKnn: k must be >= 1, got $k")
    val cx0 = math.floor(px / cellSize).toLong
    val cy0 = math.floor(py / cellSize).toLong
    val live = Retract.readLive(spark, table)
    val dist = {
      val dx = greatest(col("xmin") - px, lit(px) - col("xmax"), lit(0.0))
      val dy = greatest(col("ymin") - py, lit(py) - col("ymax"), lit(0.0))
      sqrt(dx * dx + dy * dy)
    }
    def ringCells(r: Int): Seq[Long] = {
      val cells =
        if (r == 0) Seq((cx0, cy0))
        else {
          val top = (cx0 - r to cx0 + r).map(cx => (cx, cy0 - r))
          val bot = (cx0 - r to cx0 + r).map(cx => (cx, cy0 + r))
          val lft = (cy0 - r + 1 to cy0 + r - 1).map(cy => (cx0 - r, cy))
          val rgt = (cy0 - r + 1 to cy0 + r - 1).map(cy => (cx0 + r, cy))
          top ++ bot ++ lft ++ rgt
        }
      cells.collect { case (cx, cy)
          if math.abs(cx) <= CoordLimit && math.abs(cy) <= CoordLimit =>
        cx * CellPack + cy
      }
    }
    // best-so-far, deduped by id (an envelope seen in several rings
    // carries the identical distance every time)
    val best = scala.collection.mutable.HashMap.empty[Long, Double]
    var r = 0
    var done = false
    while (!done && r <= maxRings) {
      val cells = ringCells(r) ++ (if (r == 0) Seq(OversizeCell) else Nil)
      if (cells.nonEmpty) {
        live.where(col("cell").isin(cells: _*))
          .select(col("id"), dist.as("dist"))
          // a geometry spanning several of the ring's cells carries one
          // row per cell (same envelope → same dist); without the
          // distinct those duplicates crowd genuine candidates out of
          // the ring-local top-k
          .distinct()
          .orderBy(col("dist"), col("id")).limit(k)
          .collect()
          .foreach(row => best.getOrElseUpdate(
            row.getLong(0), row.getDouble(1)))
      }
      val kth =
        if (best.size < k) Double.PositiveInfinity
        else best.values.toSeq.sorted.apply(k - 1)
      // every cell of ring r+1 lies at least r*cellSize from the probe
      done = kth <= r * cellSize
      r += 1
    }
    if (!done) {
      // sparse-region fallback: the rings found too few (or too far)
      // candidates to bound the search — one exact distributed top-k
      // over the whole index replaces the remaining ring walk
      best.clear()
      live.select(col("id"), dist.as("dist")).distinct()
        .orderBy(col("dist"), col("id")).limit(k)
        .collect()
        .foreach(row => best.getOrElseUpdate(row.getLong(0), row.getDouble(1)))
    }
    import spark.implicits._
    best.toSeq.sortBy { case (id, d) => (d, id) }.take(k)
      .toDF("id", "dist")
  }

  /** [[envelopeJoin]] of a set with itself, each unordered pair once
    * (`id_a < id_b`, self-pairs excluded). The side is PREPARED ONCE
    * (one regexp coordinate scan, one cache) and aliased as both join
    * sides — the two-frame entry point would extract the identical
    * envelopes twice. */
  def selfEnvelopeJoin(
      df: DataFrame, idCol: String, ewktCol: String,
      cellSize: Double, maxCellsPerGeom: Int = 64): DataFrame = {
    val sa = joinSide(df, idCol, ewktCol, "a", cellSize, maxCellsPerGeom)
      .persist()
    val sb = sa.toDF("b_id", "b_xmin", "b_xmax", "b_ymin", "b_ymax", "cells")
    CacheScope.unpersistAfterAction(
      envelopeJoinPrepared(sa, sb, cellSize)
        .where(col("a_id") < col("b_id"))
        .select(col("a_id").as("id_a"), col("b_id").as("id_b")),
      Seq(sa))
  }

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
