package graft.bde

/**
 * §2.8 — the extension points: post-upload hook registry, the conditional
 * finish-SQL mini-language, and event templates.
 */
object Hooks {

  // ---- post-upload hooks (sql:2595-2676) --------------------------------

  /**
   * Ordered registry of named callbacks, run ALPHABETICALLY by name — the
   * reference discovers every `bde_postupload_*` / `bde_postlevel0_*`
   * function in the target schema and runs them in name order
   * (`_bde_RunBdeFunctions`, sql:2595-2643).
   */
  final class HookRegistry {
    private var hooks = Map.empty[String, Int => Unit]
    def register(name: String, fn: Int => Unit): Unit =
      hooks += (name.toLowerCase -> fn)
    /** Run all hooks matching the prefix; returns names in execution order. */
    def runAll(prefix: String, uploadId: Int): Seq[String] = {
      val selected = hooks.keys.filter(_.startsWith(prefix.toLowerCase)).toSeq.sorted
      selected.foreach(n => hooks(n)(uploadId))
      selected
    }
  }

  // ---- conditional finish SQL (lib/LINZ/BdeDatabase.pm:597-636) ---------

  /** `if [any|all] [level0|level0_dataset] tbl... [loaded|affected] ? SQL` */
  final case class Condition(
      any: Boolean,              // any (default all)
      level0Only: Boolean,       // level0 / level0_dataset: only count L0 stats
      requireLevel0Dataset: Boolean, // level0_dataset: upload must contain an L0
      tables: Seq[String],
      loaded: Boolean)           // loaded (default affected = rows changed)

  final case class FinishStatement(condition: Option[Condition], sql: String)

  private val IfRe =
    """(?is)^\s*if\s+((?:any\s+|all\s+|)?(?:level0(?:_dataset)?\s+)?)(\w+(?:\s+\w+)*?)(\s+(?:loaded|affected))?\s*\?\s*(.*?)\s*$""".r

  /** Parse one finish-SQL statement (statements are ';'-separated upstream,
    * exactly as `_runFinishSql` splits them). */
  def parseFinishStatement(stmt: String): FinishStatement = stmt match {
    case IfRe(prefix, tables, suffix, sql) =>
      val opts = (prefix + Option(suffix).getOrElse(""))
        .toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
      FinishStatement(
        Some(Condition(
          any = opts.contains("any"),
          level0Only = opts.contains("level0") || opts.contains("level0_dataset"),
          requireLevel0Dataset = opts.contains("level0_dataset"),
          tables = tables.toLowerCase.split("\\s+").toSeq,
          loaded = opts.contains("loaded"))),
        sql)
    case other => FinishStatement(None, other.trim)
  }

  /**
   * Evaluate a condition against the control stats — the semantics of
   * `bde_TablesAffected` (sql:2722-2812): per table, does a stats row of
   * this upload exist (level-0 only if requested), with row changes unless
   * `loaded`; combine with ANY/ALL short-circuit.
   */
  def tablesAffected(
      cond: Condition,
      uplId: Int,
      stats: Seq[Control.UploadStatsRow],
      tableIds: Map[String, Int]): Boolean = {
    if (cond.requireLevel0Dataset &&
        !stats.exists(s => s.uplId == uplId && s.level == "0")) return false
    def tableOk(name: String): Boolean = tableIds.get(name).exists { tid =>
      stats.exists(s =>
        s.uplId == uplId && s.tblId == tid &&
          (s.level == "0" || !cond.level0Only) &&
          (cond.loaded || s.ninsert > 0 || s.nupdate > 0 || s.ndelete > 0))
    }
    if (cond.any) cond.tables.exists(tableOk) else cond.tables.forall(tableOk)
  }

  // ---- event templates (lib/LINZ/BdeUpload.pm:1102-1144) ----------------

  /** `{id}`/`{dataset}`/`{level}`/`{pid}`… substitution for shell event
    * hooks (`FireEvent`); unknown placeholders are left intact. */
  def expandTemplate(template: String, vars: Map[String, String]): String =
    vars.foldLeft(template) { case (acc, (k, v)) => acc.replace(s"{$k}", v) }

  // ---- shell event hooks (lib/LINZ/BdeUpload.pm:1102-1144) --------------

  /** The five events the reference fires (`ApplyDatasetUpdates`/`FinishJob`
    * at BdeUpload.pm:722,751,807,864; `error` from the CLI's catch,
    * bin/linz_bde_uploader.pl:254,298). */
  val EventNames: Seq[String] = Seq(
    "start", "finish", "error", "start_dataset", "finish_dataset")

  /** Run one hook command through the platform shell, capturing combined
    * stdout+stderr and the exit status — `qx($cmd 2>&1)` semantics. */
  def runShell(cmd: String): (Int, String) = {
    import scala.sys.process._
    val out = new StringBuilder
    val logger = ProcessLogger(
      l => out.append(l).append('\n'), l => out.append(l).append('\n'))
    val rv = Seq("/bin/sh", "-c", cmd).!(logger)
    (rv, out.toString)
  }

  /**
   * `FireEvent` executor: expands `{pid}/{id}/{level}/{dataset}` into each
   * registered command for the event and RUNS it. Mirrors the reference:
   * nothing fires before an upload id exists; unset dataset/level expand to
   * the literal `undef`; a non-zero exit is reported via `onResult` but is
   * NEVER fatal to the load (the reference only ERROR-logs it).
   *
   * `runner` is injectable so orchestration specs can assert fire order and
   * expanded arguments without forking processes.
   */
  final class EventFirer(
      hooks: Map[String, Seq[String]],
      runner: String => (Int, String) = runShell,
      onResult: (String, String, Int, String) => Unit = (_, _, _, _) => ()) {
    def fire(
        event: String,
        uploadId: Option[Int],
        dataset: Option[String] = None,
        level: Option[String] = None): Unit = {
      if (uploadId.isEmpty) return
      hooks.getOrElse(event, Nil).foreach { tpl =>
        val cmd = expandTemplate(tpl, Map(
          "pid" -> ProcessHandle.current.pid.toString,
          "id" -> uploadId.get.toString,
          "dataset" -> dataset.getOrElse("undef"),
          "level" -> level.getOrElse("undef")))
        val (rv, out) =
          try runner(cmd)
          catch { case e: Throwable => (-1, Option(e.getMessage).getOrElse("")) }
        onResult(event, cmd, rv, out)
      }
    }
  }

  // ---- per-connection / per-dataset SQL slots ---------------------------

  /**
   * `_runSQLBlock` (lib/LINZ/BdeDatabase.pm:571-595): split the block on
   * EVERY `;` (consuming one following newline — the reference's
   * `split(/\;\n?/, ...)`, so semicolons inside string literals split
   * there too), expand `{id}` with the upload id, run each statement; any
   * failure aborts with the offending statement named. The
   * returned closure matches the Orchestrator's dataset-slot signature, so
   * `dataset_load_start_sql`/`dataset_load_end_sql`/`db_connect_sql`/
   * `db_upload_complete_sql` blocks become real executors against any JDBC
   * database.
   */
  def sqlSlot(
      url: String,
      props: java.util.Properties = new java.util.Properties())(
      block: String): (String, Int) => Unit = (_, uploadId) =>
    runSqlBlock(url, props, block, uploadId)

  /** Run one SQL block now (connection-scoped slots, not per-dataset). */
  def runSqlBlock(
      url: String,
      props: java.util.Properties,
      block: String,
      uploadId: Int): Unit = {
    if (block.trim.isEmpty) return
    val c = java.sql.DriverManager.getConnection(url, props)
    try {
      block.split(";\\n?").iterator.map(_.trim).filter(_.nonEmpty).foreach { s =>
        val cmd = s.replace("{id}", uploadId.toString)
        try c.createStatement().executeUpdate(cmd)
        catch {
          case e: java.sql.SQLException =>
            throw new IllegalStateException(s"Cannot run SQL command: $cmd", e)
        }
      }
    } finally c.close()
  }
}
