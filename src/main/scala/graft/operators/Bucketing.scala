package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-at-rest storage — the join-heavy posture a 100 TB corpus wants.
 *
 * A table written `bucketBy(n, key).sortBy(key)` is hash-partitioned into a
 * FIXED bucket count on disk; two tables bucketed the same way co-locate,
 * and an equi-join on the bucket key plans with ZERO Exchange on either
 * side — no shuffle, however many times the join runs (pinned by
 * `PlanAuditSpec`). This is the at-rest analogue of the in-memory
 * repartition the diff engine relies on: pay the partitioning once at
 * write time, amortize it over every downstream join/aggregation on the
 * same key. Per-bucket `sortBy` additionally lets sort-merge joins skip
 * their sort.
 *
 * Managed-table mechanics: bucketing metadata lives in the session catalog,
 * so the writers target a named database; [[scratchDb]] roots one in a
 * caller-supplied location (tests and the correctness gate use a temp dir)
 * — on a cluster the database would live on shared storage.
 */
object Bucketing {

  /** Create (idempotently) a database rooted at `location`. */
  def scratchDb(spark: SparkSession, db: String, location: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$location'")

  /** Drop `table` AND clear a leftover table directory: the in-memory
    * catalog forgets managed tables at JVM exit but the filesystem doesn't,
    * and creating a managed table over a non-empty location is an error
    * (`LOCATION_ALREADY_EXISTS`). */
  private[graft] def resetTable(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    table.split('.') match {
      case Array(db, name) =>
        deleteDir(java.nio.file.Paths.get(
          new java.net.URI(spark.catalog.getDatabase(db).locationUri).getPath)
          .resolve(name))
      case _ => () // default database: DROP TABLE alone cleared the location
    }
  }

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table
    * (previous incarnations dropped and their directories cleared first).
    *
    * Rows are repartitioned BY THE BUCKET KEY first: Spark's bucketed
    * write otherwise emits one file per (write task × non-empty bucket)
    * — tasks×buckets small files per index build, the guide-§6 small-
    * file anti-pattern that [[compactBucketed]] exists to repair later.
    * The shuffle lands on a MULTIPLE m·buckets of the bucket count
    * sized to the session's parallelism: both the repartition and the
    * bucket id are `pmod(murmur3, n)` over the same key, so hash ≡ p
    * (mod m·buckets) implies hash ≡ p (mod buckets) — every write task
    * still holds exactly ONE bucket (m files per bucket, not
    * tasks×buckets) while the parquet encode keeps ~full parallelism
    * (repartitioning straight to `buckets` was measured to serialize
    * the write onto `buckets` cores and regressed every index-build
    * row). The extra exchange moves the index rows once — the same
    * bytes the bucketed layout was always going to cluster. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    resetTable(df.sparkSession, table)
    import org.apache.spark.sql.functions.col
    val p = df.sparkSession.sessionState.conf.numShufflePartitions
    val n = buckets * math.max(1, p / buckets)
    df.repartition(n, col(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }

  /** Write `df` as a plain (unbucketed) managed parquet table with the same
    * drop-and-clear hygiene — for small index companion tables (stats rows)
    * that later `mode("append")` writes fold into. */
  def writeTable(df: DataFrame, table: String): Unit = {
    resetTable(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Compact a bucketed table in place: every append lands one MORE file
    * per touched bucket, so an ingest loop's probe cost and file-listing
    * overhead creep with append count — the maintenance debt of the
    * append-friendly layout (the at-rest analogue of the reference's `-m`
    * maintenance mode, `bin/linz_bde_uploader.pl` version pruning). One
    * rewrite folds each bucket back to a single sorted file:
    * `repartition(buckets, key)` aligns rows to their bucket task (the
    * repartition hash IS the bucketing hash, so each task holds exactly
    * one bucket), the rewrite lands in a temp table, and a two-rename
    * catalog swap commits it — the bucketing spec, probe plans, and
    * results are unchanged (spec-pinned).
    *
    * Crash-atomicity: nothing live is deleted before the compacted copy is
    * committed. The swap is rename-aside (live→`__old`, `__compact`→live,
    * drop `__old`), so a driver death at ANY point leaves the full data
    * under exactly one of the three names and [[recoverCompaction]] (run
    * automatically on the next call) restores the live table — the same
    * publish-then-point discipline as `ParquetTableSink`'s atomic swap. */
  def compactBucketed(spark: SparkSession, table: String): Unit =
    compactBucketed(spark, table, () => ())

  /** Test seam: `midSwapFault` fires between the two renames — the widest
    * crash window — so a spec can kill the swap and prove recovery. */
  private[graft] def compactBucketed(
      spark: SparkSession, table: String, midSwapFault: () => Unit): Unit = {
    recoverCompaction(spark, table) // heal any prior crashed swap first
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec
      .getOrElse(sys.error(s"$table is not a bucketed table"))
    val tmp = s"${table}__compact"
    resetTable(spark, tmp)
    import org.apache.spark.sql.functions.col
    // read the FILES, not the table: over a bucketed-table read the planner
    // elides a repartition on the bucket column, leaving arbitrary
    // file-slice tasks that each write files for several buckets — the
    // plain-parquet read keeps the explicit repartition, so each write
    // task holds exactly one bucket
    spark.read.schema(spark.table(table).schema)
      .parquet(meta.location.toString)
      .repartition(spec.numBuckets, col(spec.bucketColumnNames.head))
      .write.format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head)
      .sortBy(spec.sortColumnNames.head)
      .saveAsTable(tmp)
    swapCommitted(spark, table, tmp, midSwapFault)
  }

  /** The rename-aside commit shared by every whole-table rewrite: the
    * built `tmp` supersedes `table` via live→`__old`, tmp→live, drop
    * `__old` — nothing live is deleted before the new copy is committed,
    * and [[recoverCompaction]] heals a death at any point. */
  private[operators] def swapTables(
      spark: SparkSession, table: String, tmp: String,
      midSwapFault: () => Unit): Unit =
    swapCommitted(spark, table, tmp, midSwapFault)

  private def swapCommitted(
      spark: SparkSession, table: String, tmp: String,
      midSwapFault: () => Unit): Unit = {
    val old = s"$table$OldSuffix"
    resetTable(spark, old) // only ever clears a fully-superseded leftover
    spark.sql(s"ALTER TABLE $table RENAME TO $old")
    midSwapFault()
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    resetTable(spark, old)
  }

  /** Atomically replace a bucketed table's CONTENTS with `df` (bucket
    * spec restated from the catalog, like every append): the new copy
    * builds beside the live table, then commits with the
    * [[compactBucketed]] rename-aside swap — a crash at any point
    * leaves a complete readable incarnation under the live or `__old`
    * name, healed by [[recoverCompaction]]. The maintenance primitive
    * for indexes whose rows CHANGE between releases (component labels)
    * rather than only accumulate (digests, bands, captures). */
  def replaceBucketed(spark: SparkSession, table: String, df: DataFrame): Unit =
    replaceBucketed(spark, table, df, () => ())

  private[graft] def replaceBucketed(
      spark: SparkSession, table: String, df: DataFrame,
      midSwapFault: () => Unit): Unit = {
    recoverCompaction(spark, table)
    val meta = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec
      .getOrElse(sys.error(s"$table is not a bucketed table"))
    val tmp = s"${table}$CompactSuffix"
    resetTable(spark, tmp)
    import org.apache.spark.sql.functions.col
    df.repartition(spec.numBuckets, col(spec.bucketColumnNames.head))
      .write.format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head)
      .sortBy(spec.sortColumnNames.head)
      .saveAsTable(tmp)
    swapCommitted(spark, table, tmp, midSwapFault)
  }

  private val OldSuffix = "__old"

  /** Restore `table` after a compaction swap died mid-way. The swap's
    * invariant is that the full pre-compaction data always survives under
    * `table` or `table__old` (never deleted before commit), so recovery is
    * pure catalog surgery: roll BACK to `__old` if the live name is gone
    * (the compacted `__compact`, though logically identical, is not
    * trusted here — a crash during its build also leaves one), or drop a
    * superseded `__old` if the live name already points at the new copy.
    * Idempotent; a no-op on a healthy table. */
  def recoverCompaction(spark: SparkSession, table: String): Unit = {
    val old = s"$table$OldSuffix"
    val liveExists = spark.catalog.tableExists(table)
    val oldExists = spark.catalog.tableExists(old)
    if (!liveExists && oldExists) spark.sql(s"ALTER TABLE $old RENAME TO $table")
    else if (liveExists && oldExists) resetTable(spark, old)
  }

  /** Compact a `partitionBy(col)` parquet index DIRECTORY (the IVF /
    * IVF-PQ layout): every append lands one more file per touched cell
    * directory, creeping probe listing cost — one rewrite folds each cell
    * back to a single file (`repartition(col)` routes each partition
    * value to exactly one task). Same crash discipline as
    * [[compactBucketed]]: the compacted copy builds beside the live
    * directory, the swap is two renames (live→`__old`, `__compact`→live,
    * delete `__old`), nothing live is deleted before the new copy
    * commits, and [[recoverPartitionedCompaction]] (run automatically on
    * entry) heals a crashed swap. Companion files (`<path>.seeds`,
    * `<path>.cells`, `<path>.books`) are untouched — they are
    * driver-bounded and never accumulate. */
  def compactPartitioned(
      spark: SparkSession, path: String, partCol: String): Unit =
    compactPartitioned(spark, path, partCol, () => ())

  private[graft] def compactPartitioned(
      spark: SparkSession, path: String, partCol: String,
      midSwapFault: () => Unit): Unit = {
    recoverPartitionedCompaction(spark, path) // also clears a stale __compact
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Paths.get(s"$path$CompactSuffix")
    val old = java.nio.file.Paths.get(s"$path$OldSuffix")
    spark.read.parquet(path)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    deleteDir(old) // only ever a fully-superseded leftover
    val live = java.nio.file.Paths.get(path)
    java.nio.file.Files.move(live, old)
    midSwapFault()
    java.nio.file.Files.move(tmp, live)
    deleteDir(old)
  }

  /** Heal a [[compactPartitioned]] swap that died mid-way: the live data
    * always survives under `path` or `path__old`, so recovery is pure
    * renames — roll back to `__old` if the live directory is gone, or
    * drop a superseded `__old` if the live directory exists. A leftover
    * `__compact` (a full-size orphan copy from a crash during the tmp
    * rewrite or before the swap committed) is cleared in both arms — it
    * is never trusted for recovery, and left alone it would silently
    * double the index's storage footprint. Idempotent. */
  def recoverPartitionedCompaction(spark: SparkSession, path: String): Unit = {
    val live = java.nio.file.Paths.get(path)
    val old = java.nio.file.Paths.get(s"$path$OldSuffix")
    if (!java.nio.file.Files.exists(live) && java.nio.file.Files.exists(old))
      java.nio.file.Files.move(old, live)
    else if (java.nio.file.Files.exists(live)) deleteDir(old)
    deleteDir(java.nio.file.Paths.get(s"$path$CompactSuffix"))
  }

  private val CompactSuffix = "__compact"

  private[operators] def deleteDir(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  /** Equi-join of two tables bucketed on `key` with the SAME bucket count:
    * both sides scan their buckets in place — no Exchange in the plan. */
  def join(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Partition a dataset at rest by a low-cardinality column (`lang`,
    * `source`, `split`, date): one directory per value, so any read
    * filtering on that column prunes to the matching directories BEFORE
    * listing files — the scan never touches excluded partitions
    * (`PartitionFilters` in the plan, pinned by `PlanAuditSpec`). The
    * at-rest complement of [[writeBucketed]]: partitioning prunes scans,
    * bucketing co-locates joins; a 100 TB corpus wants both
    * (`partitionBy(split).bucketBy(n, doc_id)`).
    *
    * Rows are CLUSTERED by the partition value first (the
    * [[compactBucketed]]/[[writeBucketed]] posture): an unclustered
    * `partitionBy` write emits one file per (write task × value it
    * holds) — tasks×cells small files per index build that every probe
    * then pays at listing/open time and [[compactPartitioned]] exists to
    * repair. Hash-repartitioning on the value sends each value's rows to
    * exactly ONE task → one file per value per write; the exchange moves
    * the rows once, the same bytes the layout clusters anyway. */
  def writePartitioned(df: DataFrame, path: String, col: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(col))
      .write.mode("overwrite").partitionBy(col).parquet(path)

  /** The append door of [[writePartitioned]] — same one-file-per-value
    * clustering, `mode("append")` folding into existing value dirs. */
  def appendPartitioned(df: DataFrame, path: String, col: String): Unit =
    df.repartition(org.apache.spark.sql.functions.col(col))
      .write.mode("append").partitionBy(col).parquet(path)
}
