package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Spatial cell index: probe == brute-force envelope filter over every
  * geometry shape (multi-cell, oversize, negative coords, non-geometry),
  * append and retract lifecycles, and the bucket-pruned probe plan. */
class GeoIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val db = {
    val dir = java.nio.file.Files.createTempDirectory("geoidx_spec").toString
    Bucketing.scratchDb(spark, "geoidx_spec", dir)
    "geoidx_spec"
  }

  // envelopes spanning one cell, several cells, cell boundaries,
  // negative space, an oversize monster, and unindexable rows
  private def geoms = Seq(
    (1L, "SRID=4167;POINT(0.500000 0.500000)"),
    (2L, "SRID=4167;LINESTRING(0.100000 0.100000,5.900000 3.900000)"),
    (3L, "SRID=4167;POLYGON((-3.500000 -1.500000,-0.500000 -1.500000," +
      "-0.500000 1.500000,-3.500000 -1.500000))"),
    (4L, "SRID=4167;POINT(2.000000 2.000000)"),   // exactly on a boundary
    (5L, "SRID=4167;LINESTRING(-500.000000 -500.000000," +
      "500.000000 500.000000)"),                   // oversize: > 64 cells
    (6L, "SRID=4167;POINT(100.250000 -45.750000)"),
    (7L, "no geometry at all"),
    (8L, null.asInstanceOf[String])).toDF("id", "g")

  private def brute(minX: Double, minY: Double,
      maxX: Double, maxY: Double): Set[Long] =
    geoms.where(
        graft.functions.GeoOps.stEnvelopeIntersects(
          col("g"), minX, minY, maxX, maxY))
      .collect().map(_.getLong(0)).toSet

  private def probe(t: String, minX: Double, minY: Double,
      maxX: Double, maxY: Double): Set[Long] =
    GeoIndex.probeBBox(spark, t, minX, minY, maxX, maxY, cellSize = 2.0)
      .collect().map(_.getLong(0)).toSet

  test("probe equals the brute-force envelope filter on every box") {
    val t = s"$db.cells"
    GeoIndex.writeGeoIndex(geoms, "id", "g", t, cellSize = 2.0, buckets = 8)
    // unindexable rows never land in the index
    assert(spark.table(t).select(col("id")).distinct()
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    val boxes = Seq(
      (0.0, 0.0, 1.0, 1.0),       // single cell
      (-4.0, -2.0, 6.0, 4.0),     // spans many cells, hits most rows
      (1.9, 1.9, 2.1, 2.1),       // straddles the cell-boundary point
      (99.0, -46.0, 101.0, -45.0),// far-away point
      (1000.0, 1000.0, 1001.0, 1001.0)) // only the oversize row's range
    boxes.foreach { case (a, b, c, d) =>
      assert(probe(t, a, b, c, d) == brute(a, b, c, d),
        s"box [$a..$c]x[$b..$d]")
    }
    // a multi-cell geometry appears ONCE per probe (distinct)
    val multi = GeoIndex.probeBBox(spark, t, -4.0, -2.0, 6.0, 4.0, 2.0)
      .collect().map(_.getLong(0)).toSeq
    assert(multi.size == multi.distinct.size)
  }

  test("append folds a batch in; probe sees both releases") {
    val t = s"$db.cells_append"
    GeoIndex.writeGeoIndex(geoms.where(col("id") <= 3), "id", "g", t,
      cellSize = 2.0, buckets = 8)
    GeoIndex.appendGeoIndex(geoms.where(col("id") > 3), "id", "g", t,
      cellSize = 2.0)
    val boxes = Seq((-4.0, -2.0, 6.0, 4.0), (99.0, -46.0, 101.0, -45.0))
    boxes.foreach { case (a, b, c, d) =>
      assert(probe(t, a, b, c, d) == brute(a, b, c, d))
    }
  }

  test("generic retract lifecycle: masked at probe, purged physically") {
    val t = s"$db.cells_retract"
    GeoIndex.writeGeoIndex(geoms, "id", "g", t, cellSize = 2.0, buckets = 8)
    Retract.retract(spark, t, "id", Seq(2L).toDF("id"))
    assert(!probe(t, -4.0, -2.0, 6.0, 4.0).contains(2L))
    Retract.purge(spark, t)
    assert(spark.table(t).where(col("id") === 2L).isEmpty)
    assert(probe(t, -4.0, -2.0, 6.0, 4.0) ==
      brute(-4.0, -2.0, 6.0, 4.0) - 2L)
  }

  test("probe plan bucket-prunes to the box's cells") {
    val t = s"$db.cells_plan"
    GeoIndex.writeGeoIndex(geoms, "id", "g", t, cellSize = 2.0, buckets = 8)
    val p = GeoIndex.probeBBox(spark, t, 0.0, 0.0, 1.0, 1.0, 2.0)
      .queryExecution.executedPlan.toString
    val sel = p.linesIterator.find(_.contains("SelectedBucketsCount"))
      .getOrElse(fail(s"probe must bucket-prune on the cell ids:\n$p"))
    val selected = "SelectedBucketsCount: (\\d+) out of 8".r
      .findFirstMatchIn(sel).map(_.group(1).toInt)
      .getOrElse(fail(s"unparseable bucket count:\n$sel"))
    assert(selected <= 2, s"1-cell box + oversize cell => <=2 buckets:\n$sel")
  }

  test("grid spatial join equals the brute-force pair set, each pair once") {
    // brute force: all unordered pairs with intersecting envelopes
    val env = geoms.select(col("id"),
        graft.functions.GeoOps.stXMin(col("g")).as("xmin"),
        graft.functions.GeoOps.stXMax(col("g")).as("xmax"),
        graft.functions.GeoOps.stYMin(col("g")).as("ymin"),
        graft.functions.GeoOps.stYMax(col("g")).as("ymax"))
      .where(col("xmin").isNotNull)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val want = (for {
      (ia, axn, axx, ayn, ayx) <- env
      (ib, bxn, bxx, byn, byx) <- env
      if ia < ib && axn <= bxx && axx >= bxn && ayn <= byx && ayx >= byn
    } yield (ia, ib)).toSet
    assert(want.nonEmpty && want.exists(_._2 == 5L),
      s"fixture must produce pairs incl. the oversize row: $want")
    val gotRows = GeoIndex.selfEnvelopeJoin(geoms, "id", "g", cellSize = 2.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // exactly once per pair: multi-cell overlaps dedupe by the
    // reference-point rule, not by a distinct
    assert(gotRows.size == gotRows.distinct.size, "duplicate pairs")
    assert(gotRows.toSet == want,
      s"missing=${want -- gotRows.toSet} extra=${gotRows.toSet -- want}")
  }

  test("ring-search knn equals brute-force by envelope distance") {
    val t = s"$db.cells_knn"
    GeoIndex.writeGeoIndex(geoms, "id", "g", t, cellSize = 2.0, buckets = 8)
    def bruteKnn(px: Double, py: Double, k: Int): Seq[(Long, Double)] =
      geoms.select(col("id"),
          graft.functions.GeoOps.stXMin(col("g")).as("xmin"),
          graft.functions.GeoOps.stXMax(col("g")).as("xmax"),
          graft.functions.GeoOps.stYMin(col("g")).as("ymin"),
          graft.functions.GeoOps.stYMax(col("g")).as("ymax"))
        .where(col("xmin").isNotNull)
        .collect().map { r =>
          val dx = math.max(math.max(r.getDouble(1) - px,
            px - r.getDouble(2)), 0.0)
          val dy = math.max(math.max(r.getDouble(3) - py,
            py - r.getDouble(4)), 0.0)
          (r.getLong(0), math.sqrt(dx * dx + dy * dy))
        }.sortBy { case (id, d) => (d, id) }.take(k).toSeq
    // probe inside an envelope (dist 0), near the cluster, and far away
    // (the ring search must walk out many empty rings before finding
    // the distant point and the oversize row)
    val probes = Seq((0.5, 0.5, 3), (2.0, 2.0, 5), (100.0, -45.0, 2),
      (50.0, 50.0, 4))
    probes.foreach { case (px, py, k) =>
      val got = GeoIndex.probeKnn(spark, t, px, py, k, cellSize = 2.0,
          maxRings = 256)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(got == bruteKnn(px, py, k), s"probe ($px,$py) k=$k: $got")
    }
    // k larger than the index returns everything, still ordered
    val all = GeoIndex.probeKnn(spark, t, 0.0, 0.0, 100, cellSize = 2.0,
        maxRings = 512)
      .collect().map(_.getLong(0)).toSeq
    assert(all.size == 6 && all.toSet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // sparse-region arm: the probe sits so far out that maxRings = 2
    // cannot bound the search — the full-scan fallback must still
    // return the exact top-k
    val sparse = GeoIndex.probeKnn(spark, t, 5000.0, 5000.0, 3,
        cellSize = 2.0, maxRings = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(sparse == bruteKnn(5000.0, 5000.0, 3), s"sparse probe: $sparse")
  }

  test("oversize guard: a probe box over the cell cap refuses loudly") {
    val t = s"$db.cells_guard"
    GeoIndex.writeGeoIndex(geoms, "id", "g", t, cellSize = 2.0, buckets = 8)
    val e = intercept[IllegalArgumentException] {
      GeoIndex.probeBBox(spark, t, -10000.0, -10000.0, 10000.0, 10000.0,
        cellSize = 2.0)
    }
    assert(e.getMessage.contains("coarser index"))
  }
}
