package graft.bde

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class HooksSpec extends AnyFunSuite {

  test("finish-SQL DSL parses all forms") {
    import Hooks._
    val p1 = parseFinishStatement("if any t1 t2 loaded ? SELECT 1").condition.get
    assert(p1.any && !p1.level0Only && p1.loaded && p1.tables == Seq("t1", "t2"))
    val p2 = parseFinishStatement("if all level0 t1 affected ? X").condition.get
    assert(!p2.any && p2.level0Only && !p2.requireLevel0Dataset && !p2.loaded)
    val p3 = parseFinishStatement("if level0_dataset t1 ? X").condition.get
    assert(p3.requireLevel0Dataset && p3.level0Only)
    assert(parseFinishStatement("VACUUM bde").condition.isEmpty)
  }

  test("tablesAffected: any/all, loaded vs affected, level0 gates") {
    import Hooks._
    val stats = Seq(
      Control.UploadStatsRow(1, 7, 1, "ds1", "5", true, 0, 0, 0, 0),  // t1: loaded, no changes
      Control.UploadStatsRow(2, 7, 2, "ds1", "5", true, 3, 0, 0, 0))  // t2: changed
    val ids = Map("t1" -> 1, "t2" -> 2)
    def c(any: Boolean, l0: Boolean, reqL0: Boolean, tables: Seq[String], loaded: Boolean) =
      Condition(any, l0, reqL0, tables, loaded)
    assert(tablesAffected(c(false, false, false, Seq("t1"), true), 7, stats, ids))
    assert(!tablesAffected(c(false, false, false, Seq("t1"), false), 7, stats, ids))
    assert(tablesAffected(c(true, false, false, Seq("t1", "t2"), false), 7, stats, ids))
    assert(!tablesAffected(c(false, false, false, Seq("t1", "t2"), false), 7, stats, ids))
    assert(!tablesAffected(c(true, true, false, Seq("t2"), false), 7, stats, ids))   // no L0 stats
    assert(!tablesAffected(c(true, false, true, Seq("t2"), true), 7, stats, ids))    // upload has no L0 dataset
    assert(!tablesAffected(c(true, false, false, Seq("missing"), true), 7, stats, ids))
  }

  test("hook registry runs matching hooks alphabetically") {
    val reg = new Hooks.HookRegistry
    val ran = scala.collection.mutable.ArrayBuffer[String]()
    reg.register("bde_postupload_zz", _ => ran += "zz")
    reg.register("bde_postupload_aa", id => ran += s"aa$id")
    reg.register("other_hook", _ => ran += "other")
    assert(reg.runAll("bde_postupload_", 3) ==
      Seq("bde_postupload_aa", "bde_postupload_zz"))
    assert(ran.toSeq == Seq("aa3", "zz"))
  }

  test("event template expansion leaves unknown placeholders") {
    assert(Hooks.expandTemplate("a {id} b {x}", Map("id" -> "1")) == "a 1 b {x}")
  }

  test("EventFirer: expansion, undef defaults, no-id guard, non-fatal failures") {
    val ran = scala.collection.mutable.ArrayBuffer[(String, String, Int)]()
    val firer = new Hooks.EventFirer(
      Map("start" -> Seq("notify {id} {dataset} {level}"),
        "start_dataset" -> Seq("a {dataset}", "b {dataset}"),
        "error" -> Seq("boom {id}")),
      runner = cmd => if (cmd.startsWith("boom")) (7, "failed out")
        else (0, s"ok: $cmd"),
      onResult = (ev, cmd, rv, _) => ran += ((ev, cmd, rv)))
    firer.fire("start", None) // no upload id → nothing fires (lib:1107-1110)
    assert(ran.isEmpty)
    firer.fire("start", Some(42)) // unset dataset/level → literal 'undef'
    firer.fire("start_dataset", Some(42), Some("ds1"), Some("5"))
    firer.fire("error", Some(42)) // exit 7 reported, does not throw
    firer.fire("unknown_event", Some(42)) // unregistered event → no-op
    assert(ran.toSeq == Seq(
      ("start", "notify 42 undef undef", 0),
      ("start_dataset", "a ds1", 0),
      ("start_dataset", "b ds1", 0),
      ("error", "boom 42", 7)))
  }

  test("runShell executes for real: output captured, exit status surfaced") {
    val (rv, out) = Hooks.runShell("echo hook-ran-$((40+2))")
    assert(rv == 0)
    assert(out.contains("hook-ran-42"))
    val (rvBad, _) = Hooks.runShell("exit 3")
    assert(rvBad == 3)
    // stderr is folded into the captured output (qx($cmd 2>&1))
    val (_, errOut) = Hooks.runShell("echo to-stderr 1>&2")
    assert(errOut.contains("to-stderr"))
  }

  test("sqlSlot runs a ;-split SQL block with {id} expansion against JDBC") {
    val dir = Files.createTempDirectory("derby-slot")
    val url = s"jdbc:derby:$dir/db;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try c.createStatement().executeUpdate(
      "CREATE TABLE slot_log (upl INT, step VARCHAR(20))")
    finally c.close()
    val slot = Hooks.sqlSlot(url)(
      """INSERT INTO slot_log VALUES ({id}, 'first');
        |INSERT INTO slot_log VALUES ({id}, 'second')""".stripMargin)
    slot("ds-ignored", 9)
    val c2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = c2.createStatement()
        .executeQuery("SELECT upl, step FROM slot_log ORDER BY step")
      val rows = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getString(2))).toList
      assert(rows == List((9, "first"), (9, "second")))
    } finally c2.close()
    // a bad statement names itself in the failure
    val bad = Hooks.sqlSlot(url)("INSERT INTO nope VALUES (1)")
    val e = intercept[IllegalStateException](bad("ds", 1))
    assert(e.getMessage.contains("INSERT INTO nope"))
  }
}

class RepoSpec extends SparkSuite {

  private def stageTree(): String = {
    val root = Files.createTempDirectory("repo-spec")
    def mk(rel: String, files: String*): Unit = {
      val d = root.resolve(rel)
      Files.createDirectories(d)
      files.foreach(f => Files.writeString(d.resolve(f), ""))
    }
    mk("level_0/20200101000000", "a.crs")
    mk("level_0/20200201000000", "a.crs")
    mk("level_0/20200301000000")                 // incomplete (no a)
    mk("level_5/20200401000000", "a.crs", "x.crs")
    mk("level_5/20200501000000", "a.crs", "x.crs")
    mk("level_5/20200601000000", "a.crs")        // missing change file
    root.toString
  }

  private val cat = Catalog.parse(
    """TABLE l5_change_table files x
      |TABLE t key=id files a
      |""".stripMargin.linesIterator)._1

  test("level-0 plan: latest after watermark, before cutoff; incompleteness surfaces") {
    val root = stageTree()
    val latest = Repo.planLevel0(spark, root, cat).get
    assert(latest.dataset == "20200301000000" && !latest.complete
      && latest.missing == Seq("a"))
    val bounded = Repo.planLevel0(spark, root, cat,
      before = Some("20200301000000")).get
    assert(bounded.dataset == "20200201000000" && bounded.complete)
    assert(Repo.planLevel0(spark, root, cat,
      lastLevel0 = Some("20200301000000")).isEmpty)
  }

  test("level-5 plan: ordered chain after watermark; change file required") {
    val root = stageTree()
    val plans = Repo.planLevel5(spark, root, cat,
      lastUpload = Some("20200401000000"))
    assert(plans.map(_.dataset) == Seq("20200501000000", "20200601000000"))
    assert(plans.head.complete)
    assert(!plans(1).complete && plans(1).missing == Seq("x"))
  }

  test("empty repository plans nothing") {
    val root = Files.createTempDirectory("repo-empty").toString
    assert(Repo.planLevel0(spark, root, cat).isEmpty)
    assert(Repo.planLevel5(spark, root, cat).isEmpty)
  }
}

class CleanSpec extends SparkSuite {
  import spark.implicits._

  test("date sentinel repair") {
    val df = Seq("1750-06-15 00:00:00", "1995-03-01 12:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val out = df.select(Clean.repairTimestamp(col("ts")).as("c"))
      .collect().map(_.getTimestamp(0).toString)
    assert(out.head.startsWith("1800-01-01 00:00:00"))
    assert(out(1).startsWith("1995-03-01 12:00:00"))
  }

  test("string cleanse: control chars stripped, map applied") {
    val df = Seq("ab – “q”", "plain").toDF("s")
    val out = df.select(Clean.cleanString(col("s")).as("c"))
      .collect().map(_.getString(0))
    assert(out.head == "ab - \"q\"")
    assert(out(1) == "plain")
  }

  test("WKT shift: SRID prefix + longitude offset") {
    val df = Seq("POINT(-45.25 12.75)").toDF("s")
    val out = df.select(Clean.shiftPointWkt(col("s")).as("c"))
      .collect().head.getString(0)
    assert(out == "SRID=4167;POINT(114.750000 12.750000)")
  }

  test("WKT shift: ALL longitudes of ALL geometry types (conf:388-391)") {
    val cases = Seq(
      // POINT output byte-identical to the pre-generalization renderer
      "POINT(174.53 -41.25)" ->
        "SRID=4167;POINT(334.530000 -41.250000)",
      "LINESTRING(170.1 -45.5,170.2 -45.6)" ->
        "SRID=4167;LINESTRING(330.100000 -45.500000,330.200000 -45.600000)",
      "POLYGON((174.5 -41.2,175.0 -41.3,174.8 -40.9,174.5 -41.2))" ->
        ("SRID=4167;POLYGON((334.500000 -41.200000,335.000000 -41.300000," +
          "334.800000 -40.900000,334.500000 -41.200000))"),
      "MULTIPOLYGON(((1 2,3 4,5 6,1 2)),((7 8,9 10,11 12,7 8)))" ->
        ("SRID=4167;MULTIPOLYGON(((161.000000 2.000000,163.000000 " +
          "4.000000,165.000000 6.000000,161.000000 2.000000))," +
          "((167.000000 8.000000,169.000000 10.000000,171.000000 " +
          "12.000000,167.000000 8.000000)))"),
      "GEOMETRYCOLLECTION(POINT(4 6),LINESTRING(4 6,7 10))" ->
        ("SRID=4167;GEOMETRYCOLLECTION(POINT(164.000000 6.000000)," +
          "LINESTRING(164.000000 6.000000,167.000000 10.000000))"),
      // z coordinate re-rendered, never shifted
      "POINT Z (1 2 3)" ->
        "SRID=4167;POINT Z (161.000000 2.000000 3.000000)",
      // conf:387 — leading digits and spaces removed before the prefix
      "12  POLYGON((1 2,3 4,5 6,1 2))" ->
        ("SRID=4167;POLYGON((161.000000 2.000000,163.000000 4.000000," +
          "165.000000 6.000000,161.000000 2.000000))"),
      // EMPTY keyword is not a coordinate group
      "POINT EMPTY" -> "SRID=4167;POINT EMPTY",
      // non-geometry text passes through UNTOUCHED (never NULLed)
      "not a geometry at all" -> "not a geometry at all",
      "174.5 some text" -> "174.5 some text",
      // a malformed coordinate group keeps its original text
      "LINESTRING(bad x,1 2)" ->
        "SRID=4167;LINESTRING(bad x,161.000000 2.000000)")
    val out = cases.map(_._1).toDF("s")
      .select(Clean.shiftWkt(col("s")).as("c"))
      .collect().map(_.getString(0))
    cases.map(_._2).zip(out).foreach { case (want, got) =>
      assert(got == want)
    }
  }
}
