package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * At-rest DELETION lifecycle for the engine's index families — the
 * takedown path a production corpus needs monthly (opt-out lists,
 * license retractions, legal removals) and the one operation every
 * append-oriented index here lacked.
 *
 * Design is the LSM delete, restated over bucketed/partitioned parquet:
 *
 *  1. **[[retract]] appends TOMBSTONES** — a tiny side table
 *     (`<table>__tomb`) of (column, key) pairs. O(|keys|), immediate,
 *     never touches the index's data files. A takedown list is
 *     effective the moment this commits.
 *  2. **[[readLive]] is the probe view** — the index minus tombstoned
 *     rows, applied as one BROADCAST anti-join per tombstoned column
 *     (takedown lists are small against a 100 TB index; the index side
 *     keeps its bucketed layout, so downstream equi-joins/folds still
 *     plan Exchange-free and bucket-pruned — plan-pinned in
 *     `RetractSpec`).
 *  3. **[[purge]] makes deletion PHYSICAL** — an anti-join rewrite
 *     committed with the existing crash-atomic rename-aside swap
 *     ([[Bucketing.replaceBucketed]]; a death at ANY point leaves a
 *     complete readable incarnation, healed by
 *     [[Bucketing.recoverCompaction]]), then clears the tombstones.
 *     Cost is one linear pass over the table — the SAME pass
 *     [[Bucketing.compactBucketed]] already pays on the maintenance
 *     cadence, so production co-schedules purge with compaction and
 *     physical deletion costs nothing extra. Tombstones clear only
 *     AFTER the swap commits: a crash in between leaves them in place,
 *     where [[readLive]] keeps masking (now-absent keys anti-join to a
 *     no-op) and the next purge retries — idempotent by construction.
 *
 * Reference analogue: the uploader's own targeted removal is the
 * level-5 'D'-action reconciliation against live tables
 * (`sql/02-bde_control_functions.sql.in:2228-2262`) — rows named by
 * key leave the table while everything else stands; this is that diff
 * machinery applied to the engine's own at-rest artifacts.
 *
 * Families with NON-ROW semantics get wrappers that restore their
 * invariants: [[Relevance.retractPostings]] (corpus-stats correction
 * rows), [[Graph.retractNodes]] (edges keyed on either endpoint),
 * [[DedupIndex.retractComponentIndex]] (label re-canonicalization).
 * Sketches (HLL/CMS/KMV) are mathematically non-retractable — a sketch
 * cannot unsee a value; their ledgers rebuild from retained releases.
 */
object Retract {

  /** The tombstone side table of `table`. Distinct from the swap
    * suffixes (`__old`/`__compact`), so maintenance never touches it. */
  def tombTable(table: String): String = s"${table}__tomb"

  /** Record a retraction: every value of `keys`' single column is
    * tombstoned against `table.keyCol`. Keys are stored as strings
    * (exact for the integer/hex/url keys every family uses) so ONE
    * side-table schema serves keys of any column and type. Appends
    * blindly; duplicate keys are harmless (anti-joins are idempotent).
    * Returns the number of NEW keys (not already tombstoned) — the
    * correction hooks ([[Relevance.retractPostings]]) need exactly-once
    * arithmetic even when a takedown list is re-submitted. */
  def retract(
      spark: SparkSession, table: String, keyCol: String,
      keys: DataFrame): Long = {
    val tomb = tombTable(table)
    val rows = keys
      .select(lit(keyCol).as("col_name"),
        col(keys.columns.head).cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
    val fresh =
      if (!spark.catalog.tableExists(tomb)) rows
      else rows.join(
        spark.table(tomb).select(col("col_name"), col("key")),
        Seq("col_name", "key"), "left_anti")
    val n = fresh.cache().count()
    if (!spark.catalog.tableExists(tomb)) Bucketing.writeTable(fresh, tomb)
    else if (n > 0)
      fresh.write.mode("append").format("parquet").saveAsTable(tomb)
    fresh.unpersist()
    n
  }

  /** The tombstoned columns of `table` (driver-bounded: one row per
    * DISTINCT retracted column — a handful). */
  private def tombCols(spark: SparkSession, table: String): Seq[String] = {
    val tomb = tombTable(table)
    if (!spark.catalog.tableExists(tomb)) Nil
    else spark.table(tomb).select(col("col_name")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** Apply `table`'s tombstones to `df` (which must carry the
    * tombstoned columns): one broadcast anti-join per retracted column
    * — OR semantics, a row dies if ANY of its keyed columns is
    * retracted (the edge-index contract: either endpoint). */
  private[operators] def applyTombs(
      spark: SparkSession, table: String, df: DataFrame): DataFrame =
    tombCols(spark, table).foldLeft(df) { (acc, c) =>
      val keys = spark.table(tombTable(table))
        .where(col("col_name") === c)
        .select(col("key").as(s"__tomb_$c"))
      acc.join(broadcast(keys),
        acc(c).cast("string") === col(s"__tomb_$c"), "left_anti")
    }

  /** The LIVE view of `table`: contents minus tombstoned rows. Probes
    * read this instead of `spark.table` once a family supports
    * retraction; with no tombstones it IS the bare table scan. */
  def readLive(spark: SparkSession, table: String): DataFrame =
    applyTombs(spark, table, spark.table(table))

  /** Physically delete tombstoned rows, BUCKET-SELECTIVELY: only
    * buckets that actually contain tombstoned rows are rewritten;
    * every untouched bucket's data files carry into the new incarnation
    * by HARD LINK (a metadata op — no bytes move however large the
    * bucket), and the commit is the same crash-atomic rename-aside swap
    * as compaction. At 100 TB this is the difference between a
    * takedown costing a full-table rewrite and costing
    * |touched buckets|/n of one — a k-document takedown against a
    * 1024-bucket index rewrites ~k buckets. Tombstones clear only
    * after the swap commits (a crash leaves them masking and the
    * retry idempotent). */
  def purge(spark: SparkSession, table: String): Unit =
    purge(spark, table, None, () => ())

  private[graft] def purge(
      spark: SparkSession, table: String,
      transform: DataFrame => DataFrame,
      midSwapFault: () => Unit): Unit =
    purge(spark, table, Some(transform), midSwapFault)

  /** Test seam into the SELECTIVE path's swap (the widest crash
    * window, after untouched buckets linked and before the renames). */
  private[graft] def purgeSelective(
      spark: SparkSession, table: String, midSwapFault: () => Unit): Unit =
    purge(spark, table, None, midSwapFault)

  private[graft] def purge(
      spark: SparkSession, table: String,
      transformOpt: Option[DataFrame => DataFrame],
      midSwapFault: () => Unit): Unit = {
    Bucketing.recoverCompaction(spark, table)
    if (tombCols(spark, table).isEmpty) return
    if (transformOpt.isDefined) {
      val transform = transformOpt.get
      // a transform may MOVE rows across buckets (component
      // re-canonicalization changes the bucketing key), so it forces
      // the full rewrite
      Bucketing.replaceBucketed(spark, table,
        transform(readLive(spark, table)), midSwapFault)
      Bucketing.resetTable(spark, tombTable(table))
      return
    }
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    val spec = meta.bucketSpec
      .getOrElse(sys.error(s"$table is not a bucketed table"))
    // public takedown entry point: fail with the CONSTRAINT, not a bare
    // NoSuchElementException from .head (the whole Bucketing layer writes
    // single-column sorted buckets, so other shapes are foreign tables)
    require(spec.bucketColumnNames.size == 1 && spec.sortColumnNames.size == 1,
      s"purge($table): bucket-selective purge requires a single sorted " +
        s"bucket column (got bucketBy=${spec.bucketColumnNames.mkString(",")}" +
        s" sortBy=${spec.sortColumnNames.mkString(",")}); rewrite the table " +
        "through Bucketing.writeBucketed first")
    val n = spec.numBuckets
    val bucketCol = spec.bucketColumnNames.head
    // touched buckets: pmod(hash, n) IS Spark's bucket id expression
    // (Murmur3 seed 42 — spec-pinned against the writer's file layout);
    // one semi-join per tombstoned column, distinct ≤ n values
    val df = spark.table(table)
    val touched = tombCols(spark, table).map { c =>
        val keys = spark.table(tombTable(table))
          .where(col("col_name") === c)
          .select(col("key").as(s"__tomb_$c"))
        df.join(broadcast(keys),
          df(c).cast("string") === col(s"__tomb_$c"), "left_semi")
          .select(pmod(hash(col(bucketCol)), lit(n)).as("b"))
      }.reduce(_ unionByName _)
      .distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) { // tombstoned keys absent from the table
      Bucketing.resetTable(spark, tombTable(table))
      return
    }
    val dir = java.nio.file.Paths.get(
      new java.net.URI(meta.location.toString).getPath)
    val liveFiles = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
    def bucketOf(name: String): Option[Int] =
      BucketFileRe.findFirstMatchIn(name).map(_.group(1).toInt)
    val (touchedFiles, keptFiles) = liveFiles.partition(f =>
      bucketOf(f.getName).exists(touched.contains))
    // unparseable file names (none in practice) count as touched —
    // rewritten, never silently carried with possibly-dead rows
    val unparsed = liveFiles.filter(f => bucketOf(f.getName).isEmpty)
    val tmp = s"${table}__compact"
    Bucketing.resetTable(spark, tmp)
    val rewriteSrc = spark.read.schema(df.schema)
      .parquet((touchedFiles ++ unparsed).map(_.getPath).distinct: _*)
    applyTombs(spark, table, rewriteSrc)
      .repartition(n, col(bucketCol))
      .write.format("parquet")
      .bucketBy(n, bucketCol)
      .sortBy(spec.sortColumnNames.head)
      .saveAsTable(tmp)
    // carry the untouched buckets across by hard link into the STAGING
    // table's directory — live is not modified until the swap renames
    val tmpMeta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(tmp))
    val tmpDir = java.nio.file.Paths.get(
      new java.net.URI(tmpMeta.location.toString).getPath)
    keptFiles.filter(f => !unparsed.contains(f)).foreach { f =>
      val dest = tmpDir.resolve(f.getName)
      try java.nio.file.Files.createLink(dest, f.toPath)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(f.toPath, dest)
      }
    }
    Bucketing.swapTables(spark, table, tmp, midSwapFault)
    Bucketing.resetTable(spark, tombTable(table))
  }

  /** Spark's bucketed-file naming: `..._00007.c000.snappy.parquet` —
    * the bucket id is the digit run after the LAST underscore before
    * the extensions (the same pattern Spark's own reader parses). */
  private val BucketFileRe = """.*_(\d+)(?:\..*)?$""".r

  // =====================================================================
  // Partition-directory indexes (CDX host index, IVF cell layouts)
  // =====================================================================

  /** Tombstone parquet directory of a partitioned index `path`. */
  def tombDir(path: String): String = s"$path.tomb"

  /** Drop any tombstones recorded against a partitioned index — the
    * fixture/re-run hygiene hook (a FRESH index has no retractions). */
  def clearPartitionedTombs(path: String): Unit =
    Bucketing.deleteDir(java.nio.file.Paths.get(tombDir(path)))

  /** [[retract]] for a `partitionBy(...)` parquet DIRECTORY index. */
  def retractPartitioned(
      spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): Unit = {
    val rows = keys
      .select(lit(keyCol).as("col_name"),
        col(keys.columns.head).cast("string").as("key"))
      .where(col("key").isNotNull).distinct()
    val dir = tombDir(path)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
      rows.write.mode("overwrite").parquet(dir)
    else rows.write.mode("append").parquet(dir)
  }

  private def partTombs(
      spark: SparkSession, path: String): Option[DataFrame] = {
    val dir = tombDir(path)
    if (java.nio.file.Files.exists(java.nio.file.Paths.get(dir)))
      Some(spark.read.parquet(dir))
    else None
  }

  /** The live view of a partitioned index directory. */
  def readLivePartitioned(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    partTombs(spark, path) match {
      case None => df
      case Some(tombs) =>
        val cols = tombs.select(col("col_name")).distinct()
          .collect().map(_.getString(0)).toSeq.sorted
        cols.foldLeft(df) { (acc, c) =>
          val keys = tombs.where(col("col_name") === c)
            .select(col("key").as(s"__tomb_$c"))
          acc.join(broadcast(keys),
            acc(c).cast("string") === col(s"__tomb_$c"), "left_anti")
        }
    }
  }

  /** PARTITION-SELECTIVE physical purge for a partitioned directory
    * index: only partitions that actually CONTAIN tombstoned rows are
    * rewritten; every untouched partition directory is carried into the
    * new incarnation by a single directory RENAME (a metadata op — no
    * data movement however large the partition). The swap itself is the
    * [[Bucketing.compactPartitioned]] discipline (live→`__old`,
    * rebuilt→live, drop `__old`), with the untouched-partition moves
    * happening while the rebuilt tree is still staging — nothing live
    * is modified before the commit renames, so a death at any point
    * leaves the full pre-purge data under `path` or `path__old` and
    * [[Bucketing.recoverPartitionedCompaction]] heals it. */
  def purgePartitioned(
      spark: SparkSession, path: String, partCol: String): Unit =
    purgePartitioned(spark, path, partCol, () => ())

  private[graft] def purgePartitioned(
      spark: SparkSession, path: String, partCol: String,
      midSwapFault: () => Unit): Unit = {
    Bucketing.recoverPartitionedCompaction(spark, path)
    val tombs = partTombs(spark, path).getOrElse(return)
    val live = readLivePartitioned(spark, path)
    // touched partitions = partitions holding at least one TOMBSTONED
    // row (one broadcast semi-join per retracted column; distinct is
    // driver-bounded by the partition count)
    val df = spark.read.parquet(path)
    val cols = tombs.select(col("col_name")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val touchedRaw = cols.map { c =>
        val keys = tombs.where(col("col_name") === c)
          .select(col("key").as(s"__tomb_$c"))
        df.join(broadcast(keys),
          df(c).cast("string") === col(s"__tomb_$c"), "left_semi")
          .select(col(partCol).cast("string").as("p"))
      }.reduce(_ unionByName _)
      .distinct().collect().map(r => Option(r.getString(0)))
    // a NULL partition value cannot ride the string set: `isin` never
    // matches null and the __HIVE_DEFAULT_PARTITION__ directory name is
    // not a value — track it as its own flag so a tombstoned row in the
    // null partition is rebuilt (not carried over and then unmasked when
    // the tombstones clear)
    val nullTouched = touchedRaw.contains(None)
    val touchedParts = touchedRaw.flatten.toSet
    val tmp = java.nio.file.Paths.get(s"${path}__compact")
    val old = java.nio.file.Paths.get(s"${path}__old")
    Bucketing.deleteDir(tmp)
    // rebuild ONLY touched partitions into the staging tree (null-safe:
    // the null partition joins the rebuild iff it holds tombstoned rows)
    val touchedPred = {
      val inSet = col(partCol).cast("string").isin(touchedParts.toSeq: _*)
      if (nullTouched) inSet <=> lit(true) || col(partCol).isNull else inSet
    }
    live.where(touchedPred)
      .repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(tmp.toString)
    // carry untouched partitions across by directory rename (staging
    // side only — live is untouched until the commit renames)
    val liveDir = java.nio.file.Paths.get(path)
    val untouched = Option(liveDir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.contains("="))
      .filter { f =>
        val v = unescapePartitionValue(
          f.getName.substring(f.getName.indexOf('=') + 1))
        if (v == "__HIVE_DEFAULT_PARTITION__") !nullTouched
        else !touchedParts.contains(v)
      }
    java.nio.file.Files.createDirectories(tmp)
    // NOTE: this stages COPIES via hard links where the filesystem
    // allows, falling back to a real copy — live files must stay in
    // place until the swap commits, so a plain move is off the table
    untouched.foreach { d =>
      val dest = tmp.resolve(d.getName)
      linkOrCopyTree(d.toPath, dest)
    }
    Bucketing.deleteDir(old)
    java.nio.file.Files.move(liveDir, old)
    midSwapFault()
    java.nio.file.Files.move(tmp, liveDir)
    Bucketing.deleteDir(old)
    Bucketing.deleteDir(java.nio.file.Paths.get(tombDir(path)))
  }

  /** Invert Spark's partition-directory escaping (`%xx` for its special
    * set) — NOT URLDecoder, whose extra '+'-to-space rule would
    * misclassify a partition value containing '+' as untouched and
    * hard-link its pre-purge files alongside the rebuilt ones. */
  private[operators] def unescapePartitionValue(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append((Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Hard-link a file tree (same-filesystem, zero data movement); fall
    * back to a byte copy when the FS refuses links. */
  private def linkOrCopyTree(
      src: java.nio.file.Path, dest: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(dest)
    Option(src.toFile.listFiles()).getOrElse(Array.empty).foreach { f =>
      val d = dest.resolve(f.getName)
      if (f.isDirectory) linkOrCopyTree(f.toPath, d)
      else try java.nio.file.Files.createLink(d, f.toPath)
      catch { case _: UnsupportedOperationException | _: java.io.IOException =>
        java.nio.file.Files.copy(f.toPath, d)
      }
    }
  }
}
