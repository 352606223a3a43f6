package graft.bde

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Layered config stack: base → -x extension → .test overlay, heredoc
  * values, {key} interpolation (t/linz_bde_uploader.t:232-314,
  * bin/linz_bde_uploader.pl:385-410). */
class ConfigSpec extends AnyFunSuite {

  test("parse: key-value, empty values, comments, heredoc blocks") {
    val cfg = Config.parse(
      """# comment
        |application_name LINZ BDE Loader
        |db_user
        |db_connect_sql <<EOT
        |SET client_encoding to UTF8;
        |SET search_path to {db_schema}, public;
        |EOT
        |db_schema bde_control
        |""".stripMargin.linesIterator)
    assert(cfg("application_name") == "LINZ BDE Loader")
    assert(cfg("db_user") == "")
    assert(cfg("db_schema") == "bde_control")
    assert(cfg("db_connect_sql") ==
      "SET client_encoding to UTF8;\nSET search_path to {db_schema}, public;")
  }

  test("layering: extension overrides base, .test overrides everything") {
    val dir = Files.createTempDirectory("cfg")
    val base = dir.resolve("cfg1")
    Files.writeString(base,
      "db_connection dbname=linz_db\nbde_schema bde\n")
    Files.writeString(dir.resolve("cfg1.ext"),
      "db_connection dbname=nonexist_override\n")

    val baseOnly = Config.load(base.toString)
    assert(baseOnly("db_connection") == "dbname=linz_db")

    // -x ext overrides the base (t:240-263)
    val withExt = Config.load(base.toString, Some("ext"))
    assert(withExt("db_connection") == "dbname=nonexist_override")
    assert(withExt("bde_schema") == "bde") // non-overridden keys survive

    // .test parses LAST: overrides even the extension (t:266-314)
    Files.writeString(dir.resolve("cfg1.test"),
      "db_connection dbname=the_test_db\n")
    assert(Config.load(base.toString)("db_connection") == "dbname=the_test_db")
    assert(Config.load(base.toString, Some("ext"))("db_connection")
      == "dbname=the_test_db")

    // a requested extension must exist; the .test overlay is optional
    intercept[IllegalArgumentException](Config.load(base.toString, Some("nope")))
  }

  test("interpolation: {key} refs, {_configdir}, unknown/cyclic left intact") {
    val dir = Files.createTempDirectory("cfg")
    val base = dir.resolve("c")
    Files.writeString(base,
      """db_schema bde_control
        |search_sql SET search_path to {db_schema}, {bde_schema}, public
        |bde_tables_config {_configdir}/tables.conf
        |loop_a x{loop_b}
        |loop_b y{loop_a}
        |""".stripMargin)
    val cfg = Config.load(base.toString)
    assert(cfg("search_sql") ==
      "SET search_path to bde_control, {bde_schema}, public")
    assert(cfg("bde_tables_config") == s"${dir.toAbsolutePath}/tables.conf")
    // cycles terminate with the unresolved placeholder verbatim
    assert(cfg("loop_a") == "xy{loop_a}")
  }

  test("CLI folds config into the run config; flags win; hooks gated") {
    val dir = Files.createTempDirectory("cfg")
    val base = dir.resolve("graft.cfg")
    Files.writeString(base,
      """bde_repository /data/repo
        |tables_dir /data/tables
        |control_dir /data/ctl
        |max_level0_runtime_hours 12
        |max_level5_runtime_hours 2.5
        |max_file_errors 100
        |level5_starttime_fail_tolerance 6
        |enable_hooks 1
        |start_event_hooks <<EOT
        |  notify-send start {id}
        |  logger job-{id}
        |EOT
        |finish_event_hooks <<EOT
        |EOT
        |""".stripMargin)
    val Right(o) = Cli.parseArgs(Seq("-full", "-c", base.toString,
      "-u", "9.5", "-tables-dir", "/override/tables"))
    val conf = Cli.loadConfig(o)
    val rc = Cli.buildRunConfig(o, conf)
    assert(rc.repoRoot == "/data/repo")
    assert(rc.tablesDir == "/override/tables")       // flag wins
    assert(rc.controlDir == "/data/ctl")
    assert(rc.maxLevel0RuntimeHours == 12.0)
    assert(rc.maxLevel5RuntimeHours == 9.5)          // -u flag wins
    assert(rc.maxFileErrors.contains(100L))
    assert(rc.continuityFailHours == 6.0)
    assert(rc.eventHooks == Map(
      "start" -> Seq("notify-send start {id}", "logger job-{id}")))
    // hooks configured but not enabled → empty
    val Right(o2) = Cli.parseArgs(Seq("-full", "-c", base.toString))
    assert(o2.enableHooks == false)
    val noHooks = Files.writeString(dir.resolve("graft.cfg.test"),
      "enable_hooks 0\n")
    assert(Cli.buildRunConfig(o2, Cli.loadConfig(o2)).eventHooks.isEmpty)
    // tables.conf path defaults next to the config file
    assert(Cli.tablesConfPath(o, conf) == s"${dir.toAbsolutePath}/tables.conf")
  }

  test("-j|-full-incremental carries the reference semantics") {
    // -j implies -f (bin/linz_bde_uploader.pl:118-121)
    val Right(j) = Cli.parseArgs(Seq("-j"))
    assert(j.fullIncremental && j.full && !j.fullIfNeeded)
    val Right(jl) = Cli.parseArgs(Seq("-full-incremental"))
    assert(jl.fullIncremental && jl.full)
    // -j with -r is contradictory (linz issue #116, pl:123-128)
    assert(Cli.parseArgs(Seq("-j", "-r")).isLeft)
    // the repo's own extension keeps only its honest long name
    val Right(n) = Cli.parseArgs(Seq("-full-if-needed"))
    assert(n.fullIfNeeded && n.full && !n.fullIncremental)
  }

  test("trivia flags: -k -l -v -log-level -version (pl:93-100)") {
    val Right(o) = Cli.parseArgs(Seq("-k", "-l", "/tmp/listing.log", "-v",
      "-log-level", "DEBUG", "-version"))
    assert(o.keepFiles && o.verbose && o.printVersion)
    assert(o.listingFile.contains("/tmp/listing.log"))
    assert(o.logLevel.contains("DEBUG"))
    val Right(long) = Cli.parseArgs(Seq("-keep-files", "-listing_file", "f", "-verbose"))
    assert(long.keepFiles && long.verbose && long.listingFile.contains("f"))
    // unknown log level rejected up front, like the reference's LOG_LEVELS
    // check (pl:112-116)
    assert(Cli.parseArgs(Seq("-log-level", "CHATTY")).isLeft)
    assert(Cli.LogLevels ==
      Seq("OFF", "FATAL", "ERROR", "WARN", "INFO", "DEBUG", "TRACE", "ALL"))
  }

  test("-before: 8-digit dates normalize to midnight, garbage rejected (pl:138-143)") {
    val Right(d8) = Cli.parseArgs(Seq("-f", "-b", "20170630"))
    assert(d8.before.contains("20170630000000"))
    val Right(d14) = Cli.parseArgs(Seq("-f", "-before", "20170630120000"))
    assert(d14.before.contains("20170630120000"))
    for (bad <- Seq("2017063", "yesterday", "201706300", "2017-06-30"))
      assert(Cli.parseArgs(Seq("-f", "-b", bad)).isLeft, bad)
  }

  test("negatable flags: -no-X overrides an earlier -X (Getopt::Long '!')") {
    val Right(o) = Cli.parseArgs(Seq("-f", "-no-full", "-p", "-nopurge",
      "-d", "-no-dry-run", "-e", "-noenable-hooks"))
    assert(!o.full && !o.purge && !o.dryRun && !o.enableHooks)
    // order matters: a later positive wins back
    val Right(o2) = Cli.parseArgs(Seq("-no-full", "-f"))
    assert(o2.full)
    // negating -j must not leave the implied -f behind
    val Right(o3) = Cli.parseArgs(Seq("-j", "-no-full-incremental"))
    assert(!o3.fullIncremental && !o3.full)
  }

  test("-h|-help parses; the action rule rejects a run with no action (pl:131-136)") {
    val Right(h) = Cli.parseArgs(Seq("-h"))
    assert(h.showHelp)
    assert(Cli.UsageText.contains("-full-incremental or -j"))
    // -m or diagnostics alone are not a run
    assert(Cli.requireAction(Cli.parseArgs(Seq("-m")).toOption.get).isLeft)
    assert(Cli.requireAction(Cli.parseArgs(Seq("-k", "-v")).toOption.get).isLeft)
    for (ok <- Seq("-f", "-i", "-j", "-p", "-z", "-r"))
      assert(Cli.requireAction(Cli.parseArgs(Seq(ok)).toOption.get).isRight, ok)
  }

  test("RunLog: threshold filters; listing file appends; verbose echoes") {
    val f = java.nio.file.Files.createTempFile("graft-listing", ".log")
    val log = new Cli.RunLog(verbose = false, Some(f.toString), "INFO")
    log.info("kept")
    log.debug("filtered")
    log.close()
    val lines = scala.io.Source.fromFile(f.toFile).getLines().toList
    assert(lines == List("INFO - kept"), lines.toString)
    // DEBUG threshold lets both through
    val log2 = new Cli.RunLog(verbose = false, Some(f.toString), "DEBUG")
    log2.info("i2"); log2.debug("d2"); log2.close()
    val lines2 = scala.io.Source.fromFile(f.toFile).getLines().toList
    assert(lines2 == List("INFO - kept", "INFO - i2", "DEBUG - d2"), lines2.toString)
    java.nio.file.Files.delete(f)
    // no listing file + no verbose = silent no-op
    val log3 = new Cli.RunLog(verbose = false, None, "ALL")
    log3.info("nowhere"); log3.close()
  }
}
