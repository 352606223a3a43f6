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
 *    snapshot vs current, applied through the same merge path.
 *
 * The row-count tolerance check is an ABORT GATE exactly as in the
 * reference (`_bde_CheckTableCount`, sql:2006-2085, called before the
 * dataset commits): a staged version that breaches the error tolerance is
 * discarded and the published version is untouched.
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

  /** E1: read a BDE file, clean, project to the target columns, publish as
    * a full replacement version. Returns (header, rows written). */
  def level0Replace(
      spark: SparkSession,
      sink: ParquetTableSink,
      file: String,
      version: String,
      tableColumns: Option[Seq[String]] = None,
      clean: DataFrame => DataFrame = identity): BdeFormat.BdeHeader = {
    val header = BdeFormat.parseHeader(spark, file)
    val raw = BdeFormat.read(spark, file, header)
    val projected = tableColumns
      .map(cols => BdeFormat.selectValidColumns(raw, cols))
      .getOrElse(raw)
    sink.replace(clean(projected), version)
    header
  }

  /**
   * E2: apply one level-5 increment. The change table (id, tablename,
   * tablekeyvalue, action, timestamp — `bde_CreateL5ChangeTable`,
   * sql:1420-1461) is filtered to this table (P4, sql:1695-1708), the
   * working copy classified against the current version (J1-J3+J5), merged,
   * tolerance-gated, and published; stats mirror `_ver_apply_changes` +
   * the null-update count (sql:1757-1765).
   */
  def level5Apply(
      spark: SparkSession,
      sink: ParquetTableSink,
      incFile: String,
      changeTable: DataFrame,
      tableName: String,
      key: String,
      version: String,
      uniqueCols: Seq[String] = Nil,
      tolError: Option[Double] = None,
      tolWarning: Option[Double] = None,
      clean: DataFrame => DataFrame = identity): LoadStats = {
    val cur = sink.read()
    val header = BdeFormat.parseHeader(spark, incFile)
    val incRaw = BdeFormat.read(spark, incFile, header)
    val inc = clean(BdeFormat.selectValidColumns(incRaw, cur.columns.toSeq))

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

  /** E3: level-0 applied as a diff (`full-incremental`): classify via
    * [[Diff.fullDiff]] then merge — identical apply path to E2. */
  def level0Incremental(
      spark: SparkSession,
      sink: ParquetTableSink,
      file: String,
      key: String,
      version: String,
      clean: DataFrame => DataFrame = identity): LoadStats = {
    val cur = sink.read()
    val next = clean(BdeFormat.selectValidColumns(
      BdeFormat.readFile(spark, file), cur.columns.toSeq))
    val actions = Diff.fullDiff(cur, next, key).cache()
    val counts = actions.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def n(a: String) = counts.getOrElse(a, 0L)
    sink.replace(Diff.applyActions(cur, next, actions, key), version)
    LoadStats(sink.table, n("I"), n("U"), 0, n("D"), aborted = false, "")
  }
}
