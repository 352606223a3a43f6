package graft.bde

import org.apache.spark.sql.{DataFrame, SparkSession}
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
      aborted: Boolean, abortReason: String)

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

  /** Read one file with header-or-override schema, enforcing the file-error
    * budget; returns (header, cleaned frame). */
  private def readCleaned(
      spark: SparkSession,
      file: String,
      columnOverrides: Seq[BdeFormat.BdeColumn],
      clean: DataFrame => DataFrame,
      maxFileErrors: Option[Long]): (BdeFormat.BdeHeader, DataFrame) = {
    val parsed = BdeFormat.parseHeader(spark, file)
    val header =
      if (columnOverrides.nonEmpty) parsed.copy(columns = columnOverrides)
      else parsed
    maxFileErrors.foreach { budget =>
      val bad = BdeFormat.countMalformed(spark, file, header)
      if (bad > budget)
        throw new IllegalStateException(
          s"$file: $bad malformed rows exceed max_file_errors=$budget")
    }
    val raw = BdeFormat.read(spark, file, header,
      dropMalformed = maxFileErrors.isDefined)
    (header, clean(raw))
  }

  /** E1: read the table's BDE files, clean, project to the target columns,
    * publish the union as a full replacement version. Returns the parsed
    * headers in file order (their END times feed the details string). */
  def level0Replace(
      spark: SparkSession,
      sink: TableSink,
      files: Seq[String],
      version: String,
      tableColumns: Option[Seq[String]] = None,
      clean: DataFrame => DataFrame = identity,
      columnOverrides: Seq[BdeFormat.BdeColumn] = Nil,
      maxFileErrors: Option[Long] = None): Seq[BdeFormat.BdeHeader] = {
    require(files.nonEmpty, "level-0 load needs at least one file")
    val parts = files.map(f =>
      readCleaned(spark, f, columnOverrides, clean, maxFileErrors))
    val projected = parts.map { case (_, df) =>
      tableColumns
        .map(cols => BdeFormat.selectValidColumns(df, cols))
        .getOrElse(df)
    }
    sink.replace(projected.reduce(_ unionByName _), version)
    parts.map(_._1)
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
      maxFileErrors: Option[Long] = None): LoadStats = {
    require(files.nonEmpty, "level-5 load needs at least one file")
    val cur = sink.read()
    val inc = files
      .map(f => readCleaned(spark, f, columnOverrides, clean, maxFileErrors))
      .map { case (_, df) => BdeFormat.selectValidColumns(df, cur.columns.toSeq) }
      .reduce(_ unionByName _)

    // P4: this table's change keys (case-insensitive table match), cast to
    // the table's key type (int/bigint per bde_TableKeyIsValid)
    val keys = changeTable
      .where(lower(col("tablename")) === tableName.toLowerCase)
      .select(col("tablekeyvalue").cast(cur.schema(key).dataType).as(key))

    // early exit on zero changes (sql:1713,1771-1773)
    if (keys.isEmpty) return LoadStats(tableName, 0, 0, 0, 0, aborted = false, "")

    val actions =
      Diff.classifyChanges(cur, inc, keys, key, uniqueCols).cache()
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
        s"table count $newCount below error tolerance of old count $oldCount")
    } else {
      sink.publish(staged)
      LoadStats(tableName, n("I"), n("U") + n("X"), n("0"), n("D"),
        aborted = false, "")
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
    val cur = sink.read()
    val next = files
      .map(f => readCleaned(spark, f, columnOverrides, clean, maxFileErrors))
      .map { case (_, df) => BdeFormat.selectValidColumns(df, cur.columns.toSeq) }
      .reduce(_ unionByName _)
    val actions = Diff.fullDiff(cur, next, key).cache()
    val counts = actions.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def n(a: String) = counts.getOrElse(a, 0L)
    val staged = sink.stage(Diff.applyActions(cur, next, actions, key), version)
    val oldCount = cur.count()
    val newCount = sink.readStaged(staged).count()
    val (errBreach, _) = toleranceCheck(oldCount, newCount, tolError, tolWarning)
    if (errBreach) {
      sink.discard(staged)
      LoadStats(sink.table, n("I"), n("U"), 0, n("D"), aborted = true,
        s"table count $newCount below error tolerance of old count $oldCount")
    } else {
      sink.publish(staged)
      LoadStats(sink.table, n("I"), n("U"), 0, n("D"), aborted = false, "")
    }
  }
}
