package graft.bde

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** End-to-end slice + sink atomicity (mirrors t/linz_bde_uploader.t:1176-1221). */
class LoaderSpec extends SparkSuite {
  import spark.implicits._

  test("sink: stage-then-publish is atomic; discard leaves current version") {
    val root = Files.createTempDirectory("sink-spec").toString
    val sink = new ParquetTableSink(spark, root, "t")
    assert(!sink.exists)
    sink.replace(Seq((1, "a")).toDF("id", "v"), "v1")
    assert(sink.read().count() == 1)
    val staged = sink.stage(Seq((2, "b"), (3, "c")).toDF("id", "v"), "v2")
    assert(sink.read().count() == 1)          // staged is invisible
    sink.publish(staged)
    assert(sink.read().count() == 2)
    val staged3 = sink.stage(Seq((9, "z")).toDF("id", "v"), "v3")
    sink.discard(staged3)
    assert(sink.read().count() == 2)          // abort left v2 intact
  }

  test("E2E slice: final 5 rows and stats match the reference test exactly") {
    val r = E2E.runSlice(spark)
    // level-0 content (t:656-711)
    assert(r.l0Rows.orderBy("pri_id").collect().map(_.getInt(4)).toSeq ==
      Seq(80401150, 80401149, 80401148))
    // stats (t:1198-1201)
    assert(r.stats.ninsert == 3)
    assert(r.stats.nupdate == 2)
    assert(r.stats.nnullupdate == 0)
    assert(r.stats.ndelete == 1)
    assert(!r.stats.aborted)
    // final contents (t:1204-1221)
    val rows = r.finalRows.orderBy("pri_id").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getInt(2), x.getString(3), x.getInt(4)))
    assert(rows.toSeq == Seq(
      (4457326, 3, 11960041, "Y", 100),
      (4457327, 20, 29694578, "N", 80401149),
      (4457328, 10, 29694591, "Y", 80401148),
      (4457329, 4, 10000000, "Y", 300),
      (4457330, 5, 20000000, "Y", 400)))
    // control rows: both jobs complete, watermarks advanced
    val wm = r.control.lastUpload("bde", E2E.TableName).get
    assert(wm.lastUploadDataset.contains(E2E.L5Dataset))
    assert(wm.lastLevel0Dataset.contains(E2E.L0Dataset))
    assert(r.control.uploadsDf.collect().map(_.getString(2)).toSeq == Seq("C", "C"))
  }

  test("tolerance breach aborts the publish") {
    val (stats, published) = E2E.runToleranceAbort(spark)
    assert(stats.aborted)
    assert(stats.ndelete == 1)
    assert(published.count() == 3)           // still the level-0 version
  }

  test("level-0 incremental (E3) merges via full diff") {
    val root = Files.createTempDirectory("e3-spec").toString
    val sink = new ParquetTableSink(spark, root, "t")
    sink.replace(Seq((1, "a"), (2, "b")).toDF("id", "v"), "v1")
    // stage a snapshot file: id 2 changed, 3 added, 1 dropped
    val content =
      """HEDR	 2.0.0
        |TABLE	 t
        |COLUMN	 id integer NULL
        |COLUMN	 v varchar NULL
        |{CRS-DATA}
        |2|B|
        |3|c|
        |""".stripMargin
    val f = Files.createTempFile("e3", ".crs")
    Files.writeString(f, content)
    val stats = Loader.level0Incremental(spark, sink, Seq(f.toString), "id", "v2")
    assert((stats.ninsert, stats.nupdate, stats.ndelete) == (1L, 1L, 1L))
    assert(sink.read().orderBy("id").collect().map(r =>
      (r.getInt(0), r.getString(1))).toSeq == Seq(2 -> "B", 3 -> "c"))
  }

  test("file-error budget is single-pass: one scan per file, observed count exact") {
    // Count records read by ALL tasks while the load runs: the old design
    // pre-scanned each file to count malformed rows and then scanned it
    // again to load — total input ≈ 2× the file's lines. The Observation
    // design must stay at ≈ 1×.
    val recordsRead = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        recordsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    val root = Files.createTempDirectory("budget-singlepass")
    val file = root.resolve("sp.crs")
    val dataRows = Seq("1|a|", "2|b", "3|c|", "4|d|e|", "5|f|") // 2 malformed
    Files.writeString(file, OrchestratorScenario.crs("t_sp",
      Seq("id" -> "integer", "v" -> "varchar"), dataRows))
    val fileLines = Files.readAllLines(file).size
    val sink = new ParquetTableSink(spark, root.resolve("t").toString, "t_sp")
    spark.sparkContext.addSparkListener(listener)
    try {
      val stats = Loader.level0Replace(spark, sink, Seq(file.toString), "v1",
        maxFileErrors = Some(2))
      assert(stats.ninsert == 3) // observed from the write, not a recount
    } finally {
      // listener events are posted asynchronously; poll until the scan's
      // records have been accounted, then allow a grace period for stragglers
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (recordsRead.get < fileLines && System.nanoTime < deadline)
        Thread.sleep(50)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    // One text scan of the file (header lines included by TextInputFormat);
    // a second pass would push this to ≥ 2× fileLines.
    assert(recordsRead.get >= fileLines)
    assert(recordsRead.get < 2L * fileLines,
      s"expected a single scan of $fileLines lines, saw ${recordsRead.get} records read")
  }

  test("pruneVersions keeps the published + N previous versions, drops the rest") {
    import spark.implicits._
    val root = Files.createTempDirectory("prune").toString
    val sink = new ParquetTableSink(spark, root, "t_pv")
    (1 to 4).foreach(i =>
      sink.replace(Seq((i, s"v$i")).toDF("id", "v"), s"2020010${i}000000"))
    assert(sink.currentVersion.contains("v_20200104000000"))
    val removed = sink.pruneVersions(keepPrevious = 1)
    // published + most recent previous survive; the two oldest go
    assert(removed.toSet == Set("v_20200101000000", "v_20200102000000"))
    assert(sink.read().collect().map(_.getInt(0)).toSeq == Seq(4))
    // idempotent: nothing further to prune
    assert(sink.pruneVersions(keepPrevious = 1).isEmpty)
    // keepPrevious = 0 removes everything but the published version
    assert(sink.pruneVersions(keepPrevious = 0) == Seq("v_20200103000000"))
    assert(sink.read().count() == 1)
  }

  test("keepFiles leaves a discarded staged dir on disk (-k | -keep-files)") {
    import spark.implicits._
    val root = Files.createTempDirectory("keepf").toString
    val keep = new ParquetTableSink(spark, root, "t_kf", keepFiles = true)
    val s1 = keep.stage(Seq((1, "a")).toDF("id", "v"), "20200101000000")
    keep.discard(s1)
    assert(Files.exists(java.nio.file.Paths.get(root, "t_kf", s1)),
      "keepFiles sink must leave the staged dir for inspection")
    val drop = new ParquetTableSink(spark, root, "t_kf")
    val s2 = drop.stage(Seq((2, "b")).toDF("id", "v"), "20200102000000")
    drop.discard(s2)
    assert(!Files.exists(java.nio.file.Paths.get(root, "t_kf", s2)),
      "default sink must delete the discarded staged dir")
  }

  test("level-5 early exit on zero changes for this table") {
    val root = Files.createTempDirectory("l5-empty").toString
    val st = E2E.stageRepository()
    val sink = new ParquetTableSink(spark, root, "other_table")
    Loader.level0Replace(spark, sink, Seq(st.l0File), "20160601000000")
    val chg = BdeFormat.readFile(spark, st.changeFile)
    val stats = Loader.level5Apply(spark, sink, Seq(st.l5File), chg,
      "other_table", "audit_id", "20170629000000")
    assert((stats.ninsert, stats.nupdate, stats.ndelete) == (0L, 0L, 0L))
    assert(sink.read().count() == 3)
  }
}
