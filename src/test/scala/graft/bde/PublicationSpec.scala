package graft.bde

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSuite

/** S8 — logical-replication publish: delta computation (I/U/D), replay
  * equivalence with the live control tables, and restart re-seeding of the
  * publication snapshot. */
class PublicationSpec extends SparkSuite {

  private def newDir(): String =
    Files.createTempDirectory("graft-pub").toString

  test("changelog records I/U/D and replay reproduces the live tables") {
    val dir = newDir()
    var t = Timestamp.valueOf("2024-01-01 00:00:00")
    val control = new Control(spark, dir, () => t, publish = true)

    val id1 = control.createUpload("bde").toOption.get
    control.recordDatasetLoaded(id1, "bde", "t_a", "20240101000000", "0",
      incremental = false, "", 3, 0, 0, 0)
    control.finishUpload(id1, ok = true)
    // a second upload moves the watermark off id1, leaving it unreferenced
    val id2 = control.createUpload("bde").toOption.get
    control.recordDatasetLoaded(id2, "bde", "t_a", "20240102000000", "5",
      incremental = true, "", 1, 0, 0, 0)
    control.finishUpload(id2, ok = true)
    // 40 days later, the purge deletes upload id1 and its stats row —
    // the changelog must carry the D records
    t = Timestamp.valueOf("2024-02-15 00:00:00")
    assert(control.removeOldJobData(30) == Seq(id1))

    val upOps = Publication.changes(spark, dir, "upload")
      .orderBy("seq", "id").collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Int]("id"))).toSeq
    assert(upOps.count(_ == ("D", id1)) == 1, s"expected one D for $id1: $upOps")
    assert(upOps.head == ("I", id1))

    val statOps = Publication.changes(spark, dir, "upload_stats")
      .orderBy("seq", "id").collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Int]("id"))).toSeq
    assert(statOps.contains(("D", 1)), s"stats D missing: $statOps")

    // replay == live state, for all three published tables
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").collect().map(_.toString).toSeq
    assert(sorted(Publication.replay(spark, dir, "upload")) ==
      sorted(control.uploadsDf))
    assert(sorted(Publication.replay(spark, dir, "upload_stats")) ==
      sorted(control.statsDf))
    assert(sorted(Publication.replay(spark, dir, "upload_table")) ==
      sorted(control.uploadTablesDf))
  }

  test("a restarted publisher continues the seq chain without re-publishing") {
    val dir = newDir()
    val t = Timestamp.valueOf("2024-03-01 00:00:00")
    val c1 = new Control(spark, dir, () => t, publish = true)
    val id1 = c1.createUpload("bde").toOption.get
    c1.finishUpload(id1, ok = true)
    val seqBefore = Publication.changes(spark, dir, "upload")
      .agg(org.apache.spark.sql.functions.max("seq")).head().getLong(0)

    // "restart": a fresh Control re-seeds the publication snapshot from the
    // changelog itself, so unchanged rows are NOT re-published and new
    // commits continue the chain
    val c2 = new Control(spark, dir, () => t, publish = true)
    val id2 = c2.createUpload("bde").toOption.get
    val rows = Publication.changes(spark, dir, "upload")
      .orderBy("seq", "id").collect()
    val inserts1 = rows.count(r =>
      r.getAs[String]("op") == "I" && r.getAs[Int]("id") == id1)
    assert(inserts1 == 1, "history re-published after restart")
    val seqAfter = rows.map(_.getAs[Long]("seq")).max
    assert(seqAfter > seqBefore)
    assert(rows.exists(r =>
      r.getAs[String]("op") == "I" && r.getAs[Int]("id") == id2))
  }

  test("subscribe refuses tables outside the publication") {
    intercept[IllegalArgumentException] {
      Publication.readSchema("pg_shadow")
    }
  }
}
