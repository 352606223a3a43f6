package graft.bde

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * E1/E2/E3 — the load paths, wiring reader → cleanser → projection → diff →
 * sink → stats (SURVEY §3):
 *
 *  - [[level0Replace]]  = E1, `bde_ApplyLevel0Update` non-incremental arm
 *    (sql:1949-1973): truncate-and-replace via staged publish.
 *  - [[level5Apply]]    = E2, `bde_ApplyLevel5Update` (sql:1576-1818):
 *    change-table-driven classify → apply → tolerance gate → publish.
 *  - [[level0Incremental]] = E3 (sql:1887-1948): full-outer diff of the new
 *    snapshot vs current, applied through the same merge path (also the
 *    `l5_is_full` arm — a level-5 dataset whose files are full snapshots).
 *
 * Multi-file tables load every configured file (the reference's per-file
 * loop, lib/LINZ/BdeUpload.pm:886-890,966) and union the frames before the
 * single apply. `COLUMN` catalog overrides REPLACE the file header's
 * columns (lib/LINZ/BdeUpload.pm:185-188). The row cleanser runs inside
 * the same scan (pure column expressions).
 *
 * The row-count tolerance check is an ABORT GATE exactly as in the
 * reference (`_bde_CheckTableCount`, sql:2006-2085, called before the
 * dataset commits): a staged version that breaches the error tolerance is
 * discarded and the published version is untouched. The file-error budget
 * (`max_file_errors`, conf/linz_bde_uploader.conf:370-376) aborts the
 * table when malformed rows exceed it; within budget, malformed rows are
 * dropped and counted, as bde_copy does.
 */
object Loader {

  final case class LoadStats(
      tableName: String,
      ninsert: Long, nupdate: Long, nnullupdate: Long, ndelete: Long,
      aborted: Boolean, abortReason: String,
      /** F10 details string ("BdeUpload file end ...") built from the loaded
        * files' header END times — persisted with the watermark so the next
        * increment's continuity check has its previous end times. */
      details: String = "",
      /** Non-fatal issues (continuity warnings) surfaced to the caller. */
      warnings: Seq[String] = Nil)

  /** The details-map key for a file path: basename minus extension,
    * case-folded (the reference keys `%lastdetails` on `lc($file)`,
    * lib/LINZ/BdeUpload.pm:952-957, where files are bare names like pab1). */
  private def fileKey(path: String): String =
    path.split('/').last.replaceAll("\\.[^.]*$", "").toLowerCase

  private def tsString(t: Option[java.sql.Timestamp]): String =
    t.map(_.toString.stripSuffix(".0")).getOrElse("")

  /** Build the F10 details string for a load from its files' parsed headers. */
  private def buildDetails(files: Seq[String], headers: Seq[BdeFormat.BdeHeader]): String =
    Control.buildDetails(files.map(fileKey).zip(headers.map(h => tsString(h.endTime))))

  /**
   * L5 start-time continuity enforcement (lib/LINZ/BdeUpload.pm:944-958 +
   * CheckStartDate :1070-1100): each increment file's START must sit within
   * tolerance of the same file's END recorded by the PREVIOUS level-5 load.
   * A fail-tolerance breach throws (→ table failure, feeding error-skip);
   * a warn-tolerance breach returns a warning per file. Tolerance 0
   * disables that level, exactly as the reference's config does.
   */
  private def checkContinuity(
      files: Seq[String],
      headers: Seq[BdeFormat.BdeHeader],
      prevDetails: Map[String, String],
      warnTolHours: Double,
      failTolHours: Double): Seq[String] = {
    val warnings = Seq.newBuilder[String]
    files.zip(headers).foreach { case (f, h) =>
      val key = fileKey(f)
      prevDetails.get(key).foreach { prevEnd =>
        val start = tsString(h.startTime)
        Control.checkStartDate(start, prevEnd, warnTolHours, failTolHours) match {
          case Control.ContinuityFail(diff) =>
            throw new IllegalStateException(
              f"start time $start in $key differs from previous end time " +
                f"$prevEnd by $diff%.2f hours (fail tolerance $failTolHours)")
          case Control.ContinuityWarn(diff) =>
            warnings += f"start time $start in $key differs from previous " +
              f"end time $prevEnd by $diff%.2f hours (warn tolerance $warnTolHours)"
          case Control.ContinuityOk =>
        }
      }
    }
    warnings.result()
  }

  /** A2 — `ceil(old * tol)` thresholds; new count below the error threshold
    * aborts, below the warn threshold warns (sql:2035-2085). */
  def toleranceCheck(
      oldCount: Long, newCount: Long,
      tolError: Option[Double], tolWarning: Option[Double]): (Boolean, Boolean) = {
    def breach(tol: Option[Double]): Boolean = tol.exists { t =>
      oldCount > 0 && newCount < math.ceil(oldCount * t).toLong
    }
    (breach(tolError), breach(tolWarning))
  }

  // Observation names must be unique per query; a process-wide counter keeps
  // them unique across the many loads of a multi-table run.
  private val obsId = new java.util.concurrent.atomic.AtomicLong

  /** Read one file with header-or-override schema; when a file-error budget
    * is set, malformed rows are dropped AND counted in the same scan (the
    * returned Observation's `malformed` metric — see [[enforceBudget]]). */
  private def readCleaned(
      spark: SparkSession,
      file: String,
      columnOverrides: Seq[BdeFormat.BdeColumn],
      clean: DataFrame => DataFrame,
      maxFileErrors: Option[Long]): (BdeFormat.BdeHeader, DataFrame, Option[Observation]) = {
    val parsed = BdeFormat.parseHeader(spark, file)
    val header =
      if (columnOverrides.nonEmpty) parsed.copy(columns = columnOverrides)
      else parsed
    val obs = maxFileErrors.map(_ =>
      Observation(s"graft_malformed_${obsId.incrementAndGet()}"))
    val raw = BdeFormat.read(spark, file, header,
      dropMalformed = maxFileErrors.isDefined, malformedObs = obs)
    (header, clean(raw), obs)
  }

  /** Enforce the `max_file_errors` budget from the per-file observations.
    * MUST be called after an action that evaluated each file's scan exactly
    * once (`Observation.get` blocks until its first action completes, and a
    * plan that evaluates the subtree twice would double-count). Throws on
    * breach, exactly like the reference's bde_copy error-limit abort. */
  private def enforceBudget(
      parts: Seq[(String, Option[Observation])],
      budget: Option[Long]): Unit =
    budget.foreach { b =>
      parts.foreach { case (file, obsOpt) =>
        obsOpt.foreach { obs =>
          val bad = obs.get("malformed").asInstanceOf[Long]
          if (bad > b)
            throw new IllegalStateException(
              s"$file: $bad malformed rows exceed max_file_errors=$b")
        }
      }
    }

  /** E1: read the table's BDE files, clean, project to the target columns,
    * publish the union as a full replacement version.
    *
    * ONE distributed pass: the staged write scans each file exactly once,
    * the published row count (`ninsert`) and the per-file malformed counts
    * ride along as observed metrics of that same write — no post-publish
    * recount, no pre-scan for the error budget. A budget breach discards
    * the staged version before anything publishes. */
  def level0Replace(
      spark: SparkSession,
      sink: TableSink,
      files: Seq[String],
      version: String,
      tableColumns: Option[Seq[String]] = None,
      clean: DataFrame => DataFrame = identity,
      columnOverrides: Seq[BdeFormat.BdeColumn] = Nil,
      maxFileErrors: Option[Long] = None): LoadStats = {
    require(files.nonEmpty, "level-0 load needs at least one file")
    val parts = files.map(f =>
      readCleaned(spark, f, columnOverrides, clean, maxFileErrors))
    val projected = parts.map { case (_, df, _) =>
      tableColumns
        .map(cols => BdeFormat.selectValidColumns(df, cols))
        .getOrElse(df)
    }
    val rowsObs = Observation(s"graft_rows_${obsId.incrementAndGet()}")
    val staged = sink.stage(
      projected.reduce(_ unionByName _)
        .observe(rowsObs, count(lit(1)).as("rows")),
      version)
    try enforceBudget(files.zip(parts.map(_._3)), maxFileErrors)
    catch { case e: Throwable => sink.discard(staged); throw e }
    sink.publish(staged)
    LoadStats(sink.table, rowsObs.get("rows").asInstanceOf[Long], 0, 0, 0,
      aborted = false, "", buildDetails(files, parts.map(_._1)))
  }

  /**
   * E2: apply one level-5 increment. The change table (id, tablename,
   * tablekeyvalue, action, timestamp — `bde_CreateL5ChangeTable`,
   * sql:1420-1461) is filtered to this table (P4, sql:1695-1708), the
   * working copy (union of the table's increment files) classified against
   * the current version (J1-J3+J5), merged, tolerance-gated, and published;
   * stats mirror `_ver_apply_changes` + the null-update count
   * (sql:1757-1765).
   */
  def level5Apply(
      spark: SparkSession,
      sink: TableSink,
      files: Seq[String],
      changeTable: DataFrame,
      tableName: String,
      key: String,
      version: String,
      uniqueCols: Seq[String] = Nil,
      tolError: Option[Double] = None,
      tolWarning: Option[Double] = None,
      clean: DataFrame => DataFrame = identity,
      columnOverrides: Seq[BdeFormat.BdeColumn] = Nil,
      maxFileErrors: Option[Long] = None,
      /** Previous level-5 load's file → END-time map (parsed from the
        * watermark row's details) for the continuity check; empty = skip. */
      prevDetails: Map[String, String] = Map.empty,
      continuityWarnHours: Double = 0,
      continuityFailHours: Double = 0): LoadStats = {
    require(files.nonEmpty, "level-5 load needs at least one file")
    val cur = sink.read()
    val parts = files
      .map(f => readCleaned(spark, f, columnOverrides, clean, maxFileErrors))
    val headers = parts.map(_._1)
    val warnings = checkContinuity(files, headers, prevDetails,
      continuityWarnHours, continuityFailHours)
    val details = buildDetails(files, headers)
    // The increment is change-set-sized (a daily delta, never the big
    // table) and is consumed by both the classifier and the merge — cache
    // it so the files are scanned once for the whole load.
    val inc = parts
      .map { case (_, df, _) => BdeFormat.selectValidColumns(df, cur.columns.toSeq) }
      .reduce(_ unionByName _)
      .cache()
    // P4: this table's change keys (case-insensitive table match), cast to
    // the table's key type (int/bigint per bde_TableKeyIsValid)
    val chgKeys = changeTable
      .where(lower(col("tablename")) === tableName.toLowerCase)
      .select(col("tablekeyvalue").cast(cur.schema(key).dataType).as(key))
    // caches live exactly as long as the load: one try/finally releases
    // `inc` and the classified `actions` on EVERY exit — returns, aborts,
    // and exceptions from any stage (a failing table otherwise pins its
    // caches for the rest of a 94-table run)
    val actions =
      Diff.classifyChanges(cur, inc, chgKeys, key, uniqueCols).cache()
    try {
      if (maxFileErrors.isDefined) {
        // one materializing action = each file scanned exactly once; the
        // malformed observations fire here and the budget gates before any
        // classify/merge work runs
        inc.count()
        enforceBudget(files.zip(parts.map(_._3)), maxFileErrors)
      }

      // early exit on zero changes (sql:1713,1771-1773)
      if (chgKeys.isEmpty)
        return LoadStats(tableName, 0, 0, 0, 0, aborted = false, "",
          details, warnings)
      val counts = actions.groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def n(a: String) = counts.getOrElse(a, 0L)

      val merged = Diff.applyActions(cur, inc, actions, key)
      val staged = sink.stage(merged, version)
      val oldCount = cur.count()
      val newCount = sink.readStaged(staged).count()
      val (err, _) = toleranceCheck(oldCount, newCount, tolError, tolWarning)
      if (err) {
        sink.discard(staged)
        LoadStats(tableName, n("I"), n("U") + n("X"), n("0"), n("D"),
          aborted = true,
          s"table count $newCount below error tolerance of old count $oldCount",
          details, warnings)
      } else {
        sink.publish(staged)
        LoadStats(tableName, n("I"), n("U") + n("X"), n("0"), n("D"),
          aborted = false, "", details, warnings)
      }
    } finally {
      actions.unpersist()
      inc.unpersist()
    }
  }

  /** E3: level-0 applied as a diff (`full-incremental`, and the `l5_is_full`
    * table mode): classify via [[Diff.fullDiff]] then merge through the same
    * staged publish + tolerance gate as E2 (the reference's incremental arm
    * also tolerance-checks, sql:1944). */
  def level0Incremental(
      spark: SparkSession,
      sink: TableSink,
      files: Seq[String],
      key: String,
      version: String,
      clean: DataFrame => DataFrame = identity,
      columnOverrides: Seq[BdeFormat.BdeColumn] = Nil,
      tolError: Option[Double] = None,
      tolWarning: Option[Double] = None,
      maxFileErrors: Option[Long] = None): LoadStats = {
    require(files.nonEmpty, "level-0 incremental load needs at least one file")
    val parts = files
      .map(f => readCleaned(spark, f, columnOverrides, clean, maxFileErrors))
    // First-ever load: the reference's table always exists (possibly empty),
    // so its incremental arm degrades to all-inserts; diff against an empty
    // frame with the snapshot's schema gives the same result here.
    val cur =
      if (sink.exists) sink.read()
      else parts.map(_._2).reduce(_ unionByName _).limit(0)
    // no continuity check: the reference treats l5_is_full / full-incremental
    // as a level-0 load ($is_level0, lib/LINZ/BdeUpload.pm:926,944-947)
    val details = buildDetails(files, parts.map(_._1))
    val next = parts
      .map { case (_, df, _) => BdeFormat.selectValidColumns(df, cur.columns.toSeq) }
      .reduce(_ unionByName _)
    val actions = Diff.fullDiff(cur, next, key).cache()
    val staged = try {
      val counts = actions.groupBy("action").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // The collect above materialized the cached diff, scanning each
      // snapshot file exactly once (fullDiff references `next` once) — the
      // malformed observations are now final, and nothing is staged yet on
      // breach. The snapshot is NOT cached: at 100 TB caching it would
      // spill a full copy to executor disks.
      enforceBudget(files.zip(parts.map(_._3)), maxFileErrors)
      (sink.stage(Diff.applyActions(cur, next, actions, key), version), counts)
    } finally actions.unpersist() // the staged write was its last consumer
    val (stagedName, counts) = staged
    def n(a: String) = counts.getOrElse(a, 0L)
    val oldCount = cur.count()
    val newCount = sink.readStaged(stagedName).count()
    val (errBreach, _) = toleranceCheck(oldCount, newCount, tolError, tolWarning)
    if (errBreach) {
      sink.discard(stagedName)
      LoadStats(sink.table, n("I"), n("U"), 0, n("D"), aborted = true,
        s"table count $newCount below error tolerance of old count $oldCount",
        details)
    } else {
      sink.publish(stagedName)
      LoadStats(sink.table, n("I"), n("U"), 0, n("D"), aborted = false, "",
        details)
    }
  }
}
