package graft.bde

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * §2.9 + S7 — the job/metadata layer: the reference's control tables and
 * process semantics (`sql/01-bde_control_tables.sql`,
 * `sql/02-bde_control_functions.sql.in:165-762,975-1071`) as a driver-side
 * state machine over three tiny metadata tables, persisted as parquet.
 *
 * Metadata rows number in the thousands over years of loads — driver-side
 * read-modify-write with an atomic parquet overwrite per mutation is the
 * right scale posture (the DATA goes through [[ParquetTableSink]]; only
 * bookkeeping lives here), mirroring how the reference keeps control tables
 * in ordinary small PG tables next to 100 GB data tables.
 *
 * Covered operators: job lifecycle (create/finish, status U/A/C/E),
 * single-active-job gate, per-table locks with steal, heartbeat, zombie
 * expiry, old-job purge, watermark upsert + stats append
 * (`_bde_RecordDatasetLoaded`), last-upload lookup, F10 details codec, and
 * the L5 start-time continuity check.
 *
 * The clock is injected so every lifecycle decision is deterministic and
 * testable (the reference leans on `clock_timestamp()`).
 */
final class Control(
    spark: SparkSession,
    dir: String,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  import Control._

  // In-memory state, persisted to parquet after each mutation (S7 sink).
  private var uploads = Vector.empty[UploadRow]
  private var uploadTables = Vector.empty[UploadTableRow]
  private var stats = Vector.empty[UploadStatsRow]
  private var nextUploadId = 1
  private var nextTableId = 1
  private var nextStatId = 1

  // Load persisted control state back (the reference's control tables are
  // durable PG tables, sql/01-bde_control_tables.sql — without this a
  // restart would lose every watermark and replay all level-5 datasets,
  // and the single-active gate / zombie expiry would forget running jobs).
  locally {
    def tryRead(name: String): Option[Array[org.apache.spark.sql.Row]] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None // first run: nothing persisted yet
      else Some(spark.read.parquet(p.toString).collect())
    }
    tryRead("upload").foreach { rows =>
      uploads = rows.toVector.map(r => UploadRow(
        r.getAs[Int]("id"), r.getAs[String]("schema_name"),
        r.getAs[Timestamp]("start_time"), r.getAs[Timestamp]("end_time"),
        r.getAs[String]("status"))).sortBy(_.id)
    }
    tryRead("upload_table").foreach { rows =>
      def opt(i: Int): Option[Int] = if (i < 0) None else Some(i)
      def optS(s: String): Option[String] = if (s.isEmpty) None else Some(s)
      uploadTables = rows.toVector.map(r => UploadTableRow(
        r.getAs[Int]("id"), r.getAs[String]("schema_name"),
        r.getAs[String]("table_name"),
        opt(r.getAs[Int]("last_upload_id")),
        optS(r.getAs[String]("last_upload_dataset")),
        optS(r.getAs[String]("last_upload_type")),
        optS(r.getAs[String]("last_level0_dataset")),
        r.getAs[Boolean]("last_upload_incremental"),
        r.getAs[String]("last_upload_details"),
        opt(r.getAs[Int]("upl_id_lock")))).sortBy(_.id)
    }
    tryRead("upload_stats").foreach { rows =>
      stats = rows.toVector.map(r => UploadStatsRow(
        r.getAs[Int]("id"), r.getAs[Int]("upl_id"), r.getAs[Int]("tbl_id"),
        r.getAs[String]("dataset"), r.getAs[String]("type"),
        r.getAs[Boolean]("incremental"), r.getAs[Long]("ninsert"),
        r.getAs[Long]("nupdate"), r.getAs[Long]("nnullupdate"),
        r.getAs[Long]("ndelete"))).sortBy(_.id)
    }
    nextUploadId = uploads.map(_.id).maxOption.getOrElse(0) + 1
    nextTableId = uploadTables.map(_.id).maxOption.getOrElse(0) + 1
    nextStatId = stats.map(_.id).maxOption.getOrElse(0) + 1
  }

  // ---- job lifecycle (sql:270-340; status codes sql/01:49,73-78) --------

  /** `bde_CreateUpload` + the single-active-job gate
    * (lib/LINZ/BdeDatabase.pm:377-392): refuse while any job is active. */
  def createUpload(schemaName: String, allowConcurrent: Boolean = false): Either[String, Int] = {
    if (!allowConcurrent && uploads.exists(_.status == StatusActive))
      Left(s"upload already in progress (ids ${uploads.filter(_.status == StatusActive).map(_.id).mkString(",")})")
    else {
      val id = nextUploadId
      nextUploadId += 1
      uploads :+= UploadRow(id, schemaName, now(), now(), StatusActive)
      save(doUploads = true)
      Right(id)
    }
  }

  /** `bde_FinishUpload` (sql:308-340): C on success, E on error; releases
    * the job's table locks (`_bde_ReleaseLocks`, sql:372-410). */
  def finishUpload(id: Int, ok: Boolean): Unit = {
    uploads = uploads.map(u =>
      if (u.id == id) u.copy(status = if (ok) StatusComplete else StatusError,
        endTime = now())
      else u)
    uploadTables = uploadTables.map(t =>
      if (t.uplIdLock.contains(id)) t.copy(uplIdLock = None) else t)
    save(doUploads = true, doTables = true)
  }

  /** `_bde_RefreshLock` heartbeat (sql:346-366): bump end_time while alive. */
  def heartbeat(id: Int): Unit = {
    uploads = uploads.map(u => if (u.id == id) u.copy(endTime = now()) else u)
    save(doUploads = true)
  }

  def upload(id: Int): Option[UploadRow] = uploads.find(_.id == id)

  /** A3 — any-active existence aggregate (`bde_anyUploadIsActive`). */
  def anyUploadActive: Boolean = uploads.exists(_.status == StatusActive)

  // ---- per-table locks (sql:539-567,592-691) ----------------------------

  /** `_bde_LockTable`; `force` = the `-override-locks` steal path. */
  def lockTable(uplId: Int, tableName: String, force: Boolean = false): Boolean = {
    val t = tableRow(uploads.find(_.id == uplId).map(_.schemaName).getOrElse(""), tableName)
    t.uplIdLock match {
      case Some(owner) if owner != uplId && !force => false
      case _ =>
        uploadTables = uploadTables.map(r =>
          if (r.id == t.id) r.copy(uplIdLock = Some(uplId)) else r)
        save(doTables = true); true
    }
  }

  def unlockTable(uplId: Int, tableName: String): Unit = {
    uploadTables = uploadTables.map(r =>
      if (r.tableName == tableName.toLowerCase && r.uplIdLock.contains(uplId))
        r.copy(uplIdLock = None)
      else r)
    save(doTables = true)
  }

  def haveTableLock(uplId: Int, tableName: String): Boolean =
    uploadTables.exists(r =>
      r.tableName == tableName.toLowerCase && r.uplIdLock.contains(uplId))

  // ---- zombie / purge (sql:165-256, 415-435) ----------------------------

  /** `bde_ReleaseExpiredLocks`: an active job whose heartbeat is older than
    * `expiryHours` is a zombie — mark it E and free its locks. Returns the
    * expired ids. */
  def releaseExpiredLocks(expiryHours: Double): Seq[Int] = {
    val cutoff = now().getTime - (expiryHours * 3600 * 1000).toLong
    val zombies = uploads.filter(u =>
      u.status == StatusActive && u.endTime.getTime < cutoff).map(_.id)
    if (zombies.nonEmpty) {
      uploads = uploads.map(u =>
        if (zombies.contains(u.id)) u.copy(status = StatusError) else u)
      uploadTables = uploadTables.map(t =>
        if (t.uplIdLock.exists(zombies.contains)) t.copy(uplIdLock = None) else t)
      save(doUploads = true, doTables = true)
    }
    zombies
  }

  /** `bde_RemoveOldJobData` (sql:217-256): purge finished jobs older than
    * `expiryDays` that no watermark references, with their stats. */
  def removeOldJobData(expiryDays: Int): Seq[Int] = {
    val cutoff = now().getTime - expiryDays.toLong * 24 * 3600 * 1000
    val referenced = uploadTables.flatMap(_.lastUploadId).toSet
    val victims = uploads.filter(u =>
      u.status != StatusActive && u.endTime.getTime < cutoff &&
        !referenced.contains(u.id)).map(_.id).toSet
    if (victims.nonEmpty) {
      uploads = uploads.filterNot(u => victims.contains(u.id))
      stats = stats.filterNot(s => victims.contains(s.uplId))
      save(doUploads = true, doStats = true)
    }
    victims.toSeq.sorted
  }

  // ---- watermarks + stats (S7; sql:975-1071) ----------------------------

  /** Get-or-create the `upload_table` row (`bde_GetOrCreateUploadTable`). */
  def tableRow(schemaName: String, tableName: String): UploadTableRow = {
    val key = tableName.toLowerCase
    uploadTables.find(t => t.tableName == key && t.schemaName == schemaName)
      .getOrElse {
        val r = UploadTableRow(nextTableId, schemaName, key, None, None, None,
          None, incremental = false, "", None)
        nextTableId += 1
        uploadTables :+= r
        save(doTables = true)
        r
      }
  }

  /** `_bde_RecordDatasetLoaded`: upsert the watermark row and append one
    * stats row. Level 0 also advances `last_level0_dataset`. */
  def recordDatasetLoaded(
      uplId: Int,
      schemaName: String,
      tableName: String,
      dataset: String,
      level: String,
      incremental: Boolean,
      details: String,
      ninsert: Long,
      nupdate: Long,
      nnullupdate: Long,
      ndelete: Long): Unit = {
    val t = tableRow(schemaName, tableName)
    uploadTables = uploadTables.map(r =>
      if (r.id == t.id)
        r.copy(
          lastUploadId = Some(uplId),
          lastUploadDataset = Some(dataset),
          lastUploadType = Some(level),
          lastLevel0Dataset =
            if (level == "0") Some(dataset) else r.lastLevel0Dataset,
          incremental = incremental,
          lastUploadDetails = details)
      else r)
    stats :+= UploadStatsRow(nextStatId, uplId, t.id, dataset, level,
      incremental, ninsert, nupdate, nnullupdate, ndelete)
    nextStatId += 1
    save(doTables = true, doStats = true)
  }

  /** Last-upload lookup for the continuity check (lib:944-958). */
  def lastUpload(schemaName: String, tableName: String): Option[UploadTableRow] =
    uploadTables.find(t =>
      t.tableName == tableName.toLowerCase && t.schemaName == schemaName)

  // ---- DataFrame views (what the reference exposes as control tables) ---

  def uploadsDf: DataFrame = {
    import spark.implicits._
    uploads.map(u => (u.id, u.schemaName, u.status))
      .toDF("id", "schema_name", "status")
  }

  def uploadTablesDf: DataFrame = {
    import spark.implicits._
    uploadTables.map(t => (t.id, t.schemaName, t.tableName,
        t.lastUploadId.getOrElse(-1), t.lastUploadDataset.getOrElse(""),
        t.lastUploadType.getOrElse(""), t.lastLevel0Dataset.getOrElse(""),
        t.incremental, t.lastUploadDetails, t.uplIdLock.getOrElse(-1)))
      .toDF("id", "schema_name", "table_name", "last_upload_id",
        "last_upload_dataset", "last_upload_type", "last_level0_dataset",
        "last_upload_incremental", "last_upload_details", "upl_id_lock")
  }

  def statsDf: DataFrame = {
    import spark.implicits._
    stats.map(s => (s.id, s.uplId, s.tblId, s.dataset, s.level, s.incremental,
        s.ninsert, s.nupdate, s.nnullupdate, s.ndelete))
      .toDF("id", "upl_id", "tbl_id", "dataset", "type", "incremental",
        "ninsert", "nupdate", "nnullupdate", "ndelete")
  }

  def statRecords: Seq[UploadStatsRow] = stats
  def uploadTableRecords: Seq[UploadTableRow] = uploadTables

  /** Persist ONLY the mutated control tables (parquet overwrite —
    * metadata-sized, a few KB). One parquet job per mutated table instead
    * of three per mutation: at 94 tables × N datasets that is thousands of
    * Spark jobs saved per run. The persisted upload frame carries the
    * start/end timestamps the 3-column [[uploadsDf]] view omits, so a
    * restarted process recovers heartbeats for zombie expiry. */
  private def save(
      doUploads: Boolean = false,
      doTables: Boolean = false,
      doStats: Boolean = false): Unit = {
    import spark.implicits._
    if (doUploads)
      uploads.map(u => (u.id, u.schemaName, u.status, u.startTime, u.endTime))
        .toDF("id", "schema_name", "status", "start_time", "end_time")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/upload")
    if (doTables)
      uploadTablesDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/upload_table")
    if (doStats)
      statsDf.coalesce(1).write.mode("overwrite").parquet(s"$dir/upload_stats")
  }
}

object Control {

  val StatusActive = "A"
  val StatusComplete = "C"
  val StatusError = "E"

  final case class UploadRow(
      id: Int, schemaName: String, startTime: Timestamp, endTime: Timestamp,
      status: String)

  final case class UploadTableRow(
      id: Int, schemaName: String, tableName: String,
      lastUploadId: Option[Int], lastUploadDataset: Option[String],
      lastUploadType: Option[String], lastLevel0Dataset: Option[String],
      incremental: Boolean, lastUploadDetails: String, uplIdLock: Option[Int])

  final case class UploadStatsRow(
      id: Int, uplId: Int, tblId: Int, dataset: String, level: String,
      incremental: Boolean, ninsert: Long, nupdate: Long, nnullupdate: Long,
      ndelete: Long)

  // ---- F10: details-string codec (lib/LINZ/BdeUpload.pm:950-972) --------

  /** "BdeUpload file1 end1 file2 end2 ..." — ends are
    * `YYYY-MM-DD hh:mm:ss` (they contain a space; the parse regex keys on
    * the timestamp shape, as the reference's does). */
  def buildDetails(fileEnds: Seq[(String, String)]): String =
    ("BdeUpload" +: fileEnds.map { case (f, e) => s"$f $e" }).mkString(" ")

  private val DetailsRe =
    """(\S+)\s+(\d{4}-\d\d-\d\d\s+\d\d:\d\d:\d\d)""".r
  private val DetailsShape =
    """^BdeUpload(\s+\S+\s+\d{4}-\d\d-\d\d\s+\d\d:\d\d:\d\d)+\s*$""".r

  /** Parse back to file → end-time (case-folded keys like the reference). */
  def parseDetails(details: String): Map[String, String] =
    if (DetailsShape.findFirstIn(details).isEmpty) Map.empty
    else DetailsRe.findAllMatchIn(details)
      .map(m => m.group(1).toLowerCase -> m.group(2)).toMap

  // ---- L5 start-time continuity check (lib/LINZ/BdeUpload.pm:1070-1100) -

  sealed trait ContinuityResult
  case object ContinuityOk extends ContinuityResult
  final case class ContinuityWarn(diffHours: Double) extends ContinuityResult
  final case class ContinuityFail(diffHours: Double) extends ContinuityResult

  private val TsShape = """^\d{4}-\d\d-\d\d \d\d:\d\d:\d\d$""".r

  /** |start − previous end| in hours vs warn/fail tolerances; tolerance 0
    * disables that level, malformed timestamps are a warn-and-continue
    * (exactly the reference's behavior). */
  def checkStartDate(
      startTime: String,
      prevEndTime: String,
      warnTolHours: Double,
      failTolHours: Double): ContinuityResult = {
    if (startTime == prevEndTime) return ContinuityOk
    if (TsShape.findFirstIn(startTime).isEmpty ||
        TsShape.findFirstIn(prevEndTime).isEmpty) return ContinuityOk
    val s = Timestamp.valueOf(startTime).getTime
    val e = Timestamp.valueOf(prevEndTime).getTime
    val diff = math.abs(s - e) / 3600000.0
    if (failTolHours > 0 && diff > failTolHours) ContinuityFail(diff)
    else if (warnTolHours > 0 && diff > warnTolHours) ContinuityWarn(diff)
    else ContinuityOk
  }

  // ---- timeouts (lib/LINZ/BdeUpload.pm:534-557) -------------------------

  /** Deadline checked between stages; breach cancels the run. The message
    * is the reference's SetTimeout message parameter
    * (lib/LINZ/BdeUpload.pm:534-544). */
  final class JobTimeout(
      maxHours: Double,
      now: () => Timestamp,
      message: String = "job timeout exceeded") {
    private val deadline: Option[Long] =
      if (maxHours > 0) Some(now().getTime + (maxHours * 3600 * 1000).toLong)
      else None
    def expired: Boolean = deadline.exists(now().getTime > _)
    def check(): Unit =
      if (expired) throw new RuntimeException(message)
  }
}
