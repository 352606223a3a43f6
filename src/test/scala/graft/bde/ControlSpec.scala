package graft.bde

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite

class ControlSpec extends SparkSuite {

  private def mkControl(clock: () => Timestamp) =
    new Control(spark, Files.createTempDirectory("ctl-spec").toString, clock)

  private def fixed(s: String): () => Timestamp = {
    val t = Timestamp.valueOf(s); () => t
  }

  test("job lifecycle: A -> C / E, single-active gate") {
    val ctl = mkControl(fixed("2020-01-01 00:00:00"))
    val u1 = ctl.createUpload("bde").toOption.get
    assert(ctl.upload(u1).exists(_.status == "A"))
    assert(ctl.anyUploadActive)
    assert(ctl.createUpload("bde").isLeft)
    assert(ctl.createUpload("bde", allowConcurrent = true).isRight)
    ctl.finishUpload(u1, ok = false)
    assert(ctl.upload(u1).exists(_.status == "E"))
  }

  test("locks: claim, refuse, steal, release on finish") {
    val ctl = mkControl(fixed("2020-01-01 00:00:00"))
    val u1 = ctl.createUpload("bde").toOption.get
    val u2 = ctl.createUpload("bde", allowConcurrent = true).toOption.get
    assert(ctl.lockTable(u1, "t1"))
    assert(ctl.lockTable(u1, "t1"))            // re-entrant for the owner
    assert(!ctl.lockTable(u2, "t1"))
    assert(ctl.lockTable(u2, "t1", force = true))
    assert(!ctl.haveTableLock(u1, "t1") && ctl.haveTableLock(u2, "t1"))
    ctl.finishUpload(u2, ok = true)
    assert(!ctl.haveTableLock(u2, "t1"))       // finish releases locks
  }

  test("zombie expiry frees locks and marks E") {
    var now = "2020-01-01 00:00:00"
    val ctl = mkControl(() => Timestamp.valueOf(now))
    val u1 = ctl.createUpload("bde").toOption.get
    ctl.lockTable(u1, "t1")
    now = "2020-01-01 03:00:00"
    assert(ctl.releaseExpiredLocks(2.0) == Seq(u1))
    assert(ctl.upload(u1).exists(_.status == "E"))
    assert(!ctl.haveTableLock(u1, "t1"))
    // heartbeat keeps a job alive
    val u2 = ctl.createUpload("bde").toOption.get
    now = "2020-01-01 04:30:00"
    ctl.heartbeat(u2)
    now = "2020-01-01 05:00:00"
    assert(ctl.releaseExpiredLocks(2.0).isEmpty)
  }

  test("purge keeps referenced and recent jobs") {
    var now = "2020-01-01 00:00:00"
    val ctl = mkControl(() => Timestamp.valueOf(now))
    val old1 = ctl.createUpload("bde").toOption.get
    ctl.finishUpload(old1, ok = true)
    val old2 = ctl.createUpload("bde").toOption.get
    ctl.recordDatasetLoaded(old2, "bde", "t", "20200101000000", "0",
      incremental = false, details = "", ninsert = 1, nupdate = 0,
      nnullupdate = 0, ndelete = 0)
    ctl.finishUpload(old2, ok = true)
    now = "2020-03-01 00:00:00"
    assert(ctl.removeOldJobData(30) == Seq(old1))
    assert(ctl.upload(old2).isDefined) // referenced by watermark
  }

  test("watermark upsert: L5 advances upload watermark, L0 advances both") {
    val ctl = mkControl(fixed("2020-01-01 00:00:00"))
    val u = ctl.createUpload("bde").toOption.get
    ctl.recordDatasetLoaded(u, "bde", "t", "20200101000000", "0",
      incremental = false, details = "d0", 3, 0, 0, 0)
    ctl.recordDatasetLoaded(u, "bde", "t", "20200201000000", "5",
      incremental = true, details = "d5", 1, 2, 0, 1)
    val row = ctl.lastUpload("bde", "t").get
    assert(row.lastUploadDataset.contains("20200201000000"))
    assert(row.lastLevel0Dataset.contains("20200101000000"))
    assert(row.lastUploadType.contains("5"))
    assert(row.lastUploadDetails == "d5")
    assert(ctl.statRecords.size == 2)
  }

  test("details codec round-trips; malformed strings parse empty") {
    val d = Control.buildDetails(Seq(
      "pab1" -> "2016-06-01 17:12:25", "XAUD" -> "2016-06-01 17:12:46"))
    assert(d == "BdeUpload pab1 2016-06-01 17:12:25 XAUD 2016-06-01 17:12:46")
    assert(Control.parseDetails(d) == Map(
      "pab1" -> "2016-06-01 17:12:25", "xaud" -> "2016-06-01 17:12:46"))
    assert(Control.parseDetails("garbage").isEmpty)
    assert(Control.parseDetails("BdeUpload pab1 not-a-time").isEmpty)
  }

  test("continuity check: ok / warn / fail / disabled / malformed") {
    import Control._
    assert(checkStartDate("2020-01-01 00:00:00", "2020-01-01 00:00:00", 1, 5) == ContinuityOk)
    assert(checkStartDate("2020-01-01 02:00:00", "2020-01-01 00:00:00", 1, 5)
      .isInstanceOf[ContinuityWarn])
    assert(checkStartDate("2020-01-02 00:00:00", "2020-01-01 00:00:00", 1, 5)
      .isInstanceOf[ContinuityFail])
    assert(checkStartDate("2020-01-02 00:00:00", "2020-01-01 00:00:00", 0, 0) == ContinuityOk)
    assert(checkStartDate("junk", "2020-01-01 00:00:00", 1, 5) == ContinuityOk)
  }

  test("timeout deadline") {
    var now = "2020-01-01 00:00:00"
    val t = new Control.JobTimeout(1.0, () => Timestamp.valueOf(now))
    t.check()
    now = "2020-01-01 02:00:00"
    intercept[RuntimeException](t.check())
    val unlimited = new Control.JobTimeout(0, () => Timestamp.valueOf(now))
    unlimited.check()
  }
}
