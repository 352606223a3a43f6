package graft.bde

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * The top-level run loop — the reference's `ApplyUpdates` →
 * `ApplyDatasetUpdates` → `UploadTable` orchestration
 * (`lib/LINZ/BdeUpload.pm:559-840`) over this engine's planner, loader,
 * sinks and control layer:
 *
 *  - plan from the repository scan + per-table watermarks (E1: latest
 *    complete level-0; E2: every level-5 after the watermark, in order);
 *  - one job row per run, single-active gate, per-table locks;
 *  - per-dataset "transaction": each table's new version stages first and
 *    publishes only if its dataset succeeds (tolerance gate included);
 *  - ERROR-SKIP: a table that fails in dataset N is skipped for the rest of
 *    the run (`$tablestate`, lib:758-771,824-837) — later datasets keep
 *    loading the healthy tables;
 *  - dataset/job boundary hooks (`dataset_load_start_sql` /
 *    `dataset_load_end_sql` slots, lib/LINZ/BdeDatabase.pm:571-595) and
 *    post-level0/post-upload hook phases;
 *  - dry-run mode prints the plan and changes nothing (lib:559-609).
 */
object Orchestrator {

  final case class RunConfig(
      repoRoot: String,
      tablesDir: String,
      controlDir: String,
      schemaName: String = "bde",
      before: Option[String] = None,
      dryRun: Boolean = false,
      maxRuntimeHours: Double = 0,
      onDatasetStart: String => Unit = _ => (),
      onDatasetEnd: String => Unit = _ => (),
      hooks: Hooks.HookRegistry = new Hooks.HookRegistry)

  final case class TableOutcome(
      dataset: String, level: String, table: String, status: String, // loaded|skipped|failed|dry-run
      ninsert: Long, nupdate: Long, nnullupdate: Long, ndelete: Long,
      message: String)

  /** Run a full `-full` (level-0) + `-incremental` (level-5) pass over
    * everything the plan selects. Returns per-(dataset, table) outcomes. */
  def applyUpdates(
      spark: SparkSession,
      cfg: RunConfig,
      catalog: Seq[Catalog.TableDef],
      level0: Boolean,
      level5: Boolean,
      control: Control): Seq[TableOutcome] = {
    val tables = catalog.filterNot(_.levels == Set("C")).sortBy(_.id)
    val changeDef = Catalog.changeTable(catalog)
    val timeout = new Control.JobTimeout(cfg.maxRuntimeHours,
      () => new java.sql.Timestamp(System.currentTimeMillis()))

    // plan from per-table watermarks (min across tables, as one shared
    // dataset sequence — the reference plans per table; a shared floor is
    // equivalent when tables advance together, and per-table skips below
    // re-check each table's own watermark)
    def watermark(pick: Control.UploadTableRow => Option[String]): Option[String] = {
      val ws = tables.flatMap(t =>
        control.lastUpload(cfg.schemaName, t.name).flatMap(pick))
      if (ws.size < tables.size) None else Some(ws.min)
    }
    val l0Plan = if (level0)
      Repo.planLevel0(spark, cfg.repoRoot, catalog,
        watermark(_.lastLevel0Dataset), cfg.before).toSeq
    else Nil
    val l5Plan = if (level5)
      Repo.planLevel5(spark, cfg.repoRoot, catalog,
        watermark(_.lastUploadDataset), cfg.before)
    else Nil
    val plan = l0Plan ++ l5Plan

    if (cfg.dryRun)
      return plan.flatMap(p => tables.filter(_.appliesToLevel(p.level)).map(t =>
        TableOutcome(p.dataset, p.level, t.name, "dry-run", 0, 0, 0, 0,
          if (p.complete) "" else s"missing: ${p.missing.mkString(",")}")))

    val uplId = control.createUpload(cfg.schemaName) match {
      case Left(err) => return Seq(TableOutcome("", "", "", "failed", 0, 0, 0, 0, err))
      case Right(id) => id
    }
    val failed = scala.collection.mutable.Set[String]() // error-skip state
    val outcomes = scala.collection.mutable.ArrayBuffer[TableOutcome]()

    try {
      for (p <- plan) {
        timeout.check()
        cfg.onDatasetStart(p.dataset)
        if (!p.complete && p.level == "0")
          throw new IllegalStateException(
            s"level-0 dataset ${p.dataset} incomplete: ${p.missing.mkString(",")}")
        val changeTable: Option[DataFrame] =
          if (p.level == "5")
            changeDef.map(cd =>
              BdeFormat.readFile(spark, s"${p.path}/${cd.files.head}.crs"))
          else None
        for (t <- tables if t.appliesToLevel(p.level)) {
          timeout.check()
          val skipReason =
            if (failed.contains(t.name)) Some("skipped after earlier failure")
            else if (!p.complete) Some(s"missing: ${p.missing.mkString(",")}")
            else if (!control.lockTable(uplId, t.name)) Some("table locked")
            else None
          skipReason match {
            case Some(reason) =>
              outcomes += TableOutcome(p.dataset, p.level, t.name, "skipped",
                0, 0, 0, 0, reason)
            case None =>
              try {
                val sink = new ParquetTableSink(spark, cfg.tablesDir, t.name)
                val file = s"${p.path}/${t.files.head}.crs"
                if (p.level == "5" && !sink.exists)
                  throw new IllegalStateException(
                    s"no level-0 load of ${t.name} before level-5 increment")
                val stats =
                  if (p.level == "0") {
                    val h = Loader.level0Replace(spark, sink, file, p.dataset)
                    val n = sink.read().count()
                    control.recordDatasetLoaded(uplId, cfg.schemaName, t.name,
                      p.dataset, "0", incremental = false,
                      Control.buildDetails(Seq(t.files.head ->
                        h.endTime.map(_.toString.stripSuffix(".0")).getOrElse(""))),
                      n, 0, 0, 0)
                    Loader.LoadStats(t.name, n, 0, 0, 0, aborted = false, "")
                  } else {
                    val s = Loader.level5Apply(spark, sink, file,
                      changeTable.getOrElse(throw new IllegalStateException(
                        "missing required changetable")),
                      t.name, t.key.getOrElse("id"), p.dataset,
                      tolError = t.rowTolError, tolWarning = t.rowTolWarning)
                    if (s.aborted) throw new IllegalStateException(s.abortReason)
                    control.recordDatasetLoaded(uplId, cfg.schemaName, t.name,
                      p.dataset, "5", incremental = true, "",
                      s.ninsert, s.nupdate, s.nnullupdate, s.ndelete)
                    s
                  }
                outcomes += TableOutcome(p.dataset, p.level, t.name, "loaded",
                  stats.ninsert, stats.nupdate, stats.nnullupdate,
                  stats.ndelete, "")
              } catch {
                case e: Exception =>
                  failed += t.name
                  outcomes += TableOutcome(p.dataset, p.level, t.name,
                    "failed", 0, 0, 0, 0,
                    Option(e.getMessage).getOrElse(e.getClass.getName))
              }
          }
        }
        // one heartbeat per dataset, not per table — the reference refreshes
        // its lock per long op; per-table writes here were pure overhead
        control.heartbeat(uplId)
        cfg.onDatasetEnd(p.dataset)
        if (p.level == "0") cfg.hooks.runAll("bde_postlevel0_", uplId)
      }
      cfg.hooks.runAll("bde_postupload_", uplId)
    } finally {
      control.finishUpload(uplId, ok = failed.isEmpty)
    }
    outcomes.toSeq
  }
}
