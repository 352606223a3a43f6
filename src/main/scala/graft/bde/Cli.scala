package graft.bde

import org.apache.spark.sql.SparkSession

/**
 * Flag-compatible driver (`bin/linz_bde_uploader.pl:78-148`): the same
 * option surface, including the reference's implication rules (`-j` implies
 * `-f`; `-r` implies `-f -i`; `-j` with `-r` is rejected).
 *
 * Usage:
 * {{{
 * graft.bde.Cli -full -config-path conf/ -repository /data/bde \
 *   -tables-dir /data/tables -control-dir /data/control [tables...]
 * }}}
 */
object Cli {

  final case class Options(
      full: Boolean = false,            // -f | -full
      incremental: Boolean = false,     // -i | -incremental
      rebuild: Boolean = false,         // -r | -rebuild (implies -f -i)
      fullIfNeeded: Boolean = false,    // -j | -full-if-needed (implies -f)
      dryRun: Boolean = false,          // -d | -dry-run
      before: Option[String] = None,    // -b | -before date
      purge: Boolean = false,           // -p | -purge
      removeZombie: Boolean = false,    // -z | -remove-zombie
      overrideLocks: Boolean = false,   // -o | -override-locks
      maintain: Boolean = false,        // -m | -maintain-database
      configPath: Option[String] = None,
      repository: Option[String] = None,
      tablesDir: Option[String] = None,
      controlDir: Option[String] = None,
      selectTables: Seq[String] = Nil)

  def parseArgs(args: Seq[String]): Either[String, Options] = {
    def loop(rest: List[String], o: Options): Either[String, Options] = rest match {
      case Nil => Right(o)
      case ("-f" | "-full") :: t => loop(t, o.copy(full = true))
      case ("-i" | "-incremental") :: t => loop(t, o.copy(incremental = true))
      case ("-r" | "-rebuild") :: t => loop(t, o.copy(rebuild = true))
      case ("-j" | "-full-if-needed") :: t => loop(t, o.copy(fullIfNeeded = true))
      case ("-d" | "-dry-run") :: t => loop(t, o.copy(dryRun = true))
      case ("-p" | "-purge") :: t => loop(t, o.copy(purge = true))
      case ("-z" | "-remove-zombie") :: t => loop(t, o.copy(removeZombie = true))
      case ("-o" | "-override-locks") :: t => loop(t, o.copy(overrideLocks = true))
      case ("-m" | "-maintain-database") :: t => loop(t, o.copy(maintain = true))
      case ("-b" | "-before") :: v :: t => loop(t, o.copy(before = Some(v)))
      case ("-c" | "-config-path") :: v :: t => loop(t, o.copy(configPath = Some(v)))
      case "-repository" :: v :: t => loop(t, o.copy(repository = Some(v)))
      case "-tables-dir" :: v :: t => loop(t, o.copy(tablesDir = Some(v)))
      case "-control-dir" :: v :: t => loop(t, o.copy(controlDir = Some(v)))
      case f :: _ if f.startsWith("-") => Left(s"unknown option $f")
      case tbl :: t => loop(t, o.copy(selectTables = o.selectTables :+ tbl))
    }
    loop(args.toList, Options()).flatMap { o0 =>
      // implication rules (bin/linz_bde_uploader.pl:118-148)
      if (o0.fullIfNeeded && o0.rebuild)
        Left("Cannot use -full-if-needed with -rebuild")
      else Right(o0.copy(
        full = o0.full || o0.fullIfNeeded || o0.rebuild,
        incremental = o0.incremental || o0.rebuild))
    }
  }

  def main(args: Array[String]): Unit = {
    parseArgs(args.toIndexedSeq) match {
      case Left(err) =>
        System.err.println(s"error: $err"); sys.exit(1)
      case Right(o) =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .appName("graft-bde-uploader")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        try {
          val control = new Control(spark,
            o.controlDir.getOrElse(sys.error("missing -control-dir")))
          if (o.purge) println(s"purged: ${control.removeOldJobData(7)}")
          if (o.removeZombie)
            println(s"zombies: ${control.releaseExpiredLocks(1.0)}")
          if (o.full || o.incremental) {
            val confPath = o.configPath.getOrElse(sys.error("missing -config-path"))
            val (cat0, errs) = Catalog.parse(
              scala.io.Source.fromFile(s"$confPath/tables.conf").getLines())
            require(errs.isEmpty, s"config errors: $errs")
            val cat = Catalog.select(cat0, include = o.selectTables)
            // `-j` plans level-0 only where a table's watermark is missing;
            // plain `-f`/`-r` force it (implications already folded above)
            val forceL0 = (o.full || o.rebuild) && !(o.fullIfNeeded && !o.rebuild)
            val outcomes = Orchestrator.applyUpdates(spark,
              Orchestrator.RunConfig(
                repoRoot = o.repository.getOrElse(sys.error("missing -repository")),
                tablesDir = o.tablesDir.getOrElse(sys.error("missing -tables-dir")),
                controlDir = o.controlDir.get,
                before = o.before,
                dryRun = o.dryRun,
                overrideLocks = o.overrideLocks),
              cat, level0 = forceL0, level5 = o.incremental, control,
              level0IfNeeded = o.fullIfNeeded)
            outcomes.foreach(r => println(
              f"${r.dataset} L${r.level} ${r.table}%-30s ${r.status}%-8s " +
                f"I=${r.ninsert} U=${r.nupdate} 0=${r.nnullupdate} D=${r.ndelete} ${r.message}"))
            // `-m`: storage maintenance after a successful run — a no-op for
            // parquet versions (the reference VACUUM ANALYSEs PG tables)
            if (o.maintain) println("maintain: no-op for parquet-backed tables")
          }
        } finally spark.stop()
    }
  }
}
