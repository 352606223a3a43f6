package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Packed-sequence assembly semantics, the int32-LE byte contract, and
  * the positioned-read subset path. */
class TrainShardsSpec extends SparkSuite {
  import spark.implicits._

  // one group, seqLen 4: docs (1: [10,11,12]), (2: [20,21,22]),
  // (3: [30]), (4: [40,41]) lie end-to-end as positions 0..8 —
  // seq 0 = [10,11,12,20] (doc 2 straddles), seq 1 = [21,22,30,40],
  // the tail [41] drops
  private lazy val docs = Seq(
    (1L, "g", Seq(10, 11, 12)),
    (2L, "g", Seq(20, 21, 22)),
    (3L, "g", Seq(30)),
    (4L, "g", Seq(40, 41)))
    .toDF("id", "grp", "toks")

  private def assembled() =
    TrainShards.assembleSequences(docs, "grp", "id", "toks", seqLen = 4)
      .orderBy(col("seq_id"))
      .collect()
      .map(r => (r.getLong(1), r.getSeq[Int](2), r.getSeq[Int](3)))
      .toSeq

  test("assembly: straddlers split, tails drop, boundaries are doc STARTS") {
    assert(assembled() == Seq(
      // doc 1 starts at 0, doc 2 at 3; doc 2's continuation into seq 1
      // is NOT a boundary — docs 3 (pos 6 -> ip 2) and 4 (pos 7 -> 3) are
      (0L, Seq(10, 11, 12, 20), Seq(0, 3)),
      (1L, Seq(21, 22, 30, 40), Seq(2, 3))))
  }

  test("assembly: a doc starting exactly at a sequence start is boundary 0") {
    val d = Seq((1L, "g", Seq(1, 2, 3, 4)), (2L, "g", Seq(5, 6, 7, 8)))
      .toDF("id", "grp", "toks")
    val got = TrainShards.assembleSequences(d, "grp", "id", "toks", 4)
      .orderBy(col("seq_id")).collect()
      .map(r => (r.getLong(1), r.getSeq[Int](3))).toSeq
    assert(got == Seq((0L, Seq(0)), (1L, Seq(0))))
  }

  test("write/read roundtrip; bytes are int32-LE records; subset reads") {
    val out = java.nio.file.Files.createTempDirectory("ts_spec").toString
    val seqs = TrainShards.assembleSequences(docs, "grp", "id", "toks", 4)
    val idx = TrainShards.writeTokenShards(seqs, "grp", out, 4, numShards = 1)
    val rows = idx.orderBy(col("record_idx")).collect()
    assert(rows.length == 2)
    // byte-level contract: record 0's first token 10 = 0A 00 00 00 LE
    val file = rows(0).getString(0)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(file).getPath match {
        case "" => file.stripPrefix("file:"); case p => p
      }))
    assert(bytes.length == 2 * 4 * 4)
    assert(bytes.slice(0, 4).toSeq == Seq[Byte](10, 0, 0, 0))
    // roundtrip equality against the assembly
    val back = TrainShards.readTokenShards(spark, idx, 4)
      .orderBy(col("seq_id")).collect()
      .map(r => (r.getLong(1), r.getSeq[Int](2), r.getSeq[Int](3))).toSeq
    assert(back == assembled())
    // a SUBSET of the index reads only its records (the sampled-batch
    // path: positioned reads, never a shard scan)
    val one = TrainShards.readTokenShards(spark,
        idx.where(col("seq_id") === 1), 4)
      .collect().map(r => (r.getLong(1), r.getSeq[Int](2))).toSeq
    assert(one == Seq((1L, Seq(21, 22, 30, 40))))
    // no staging leftovers
    val left = new java.io.File(out).listFiles().map(_.getName).toSeq
    assert(left.forall(!_.contains(".inprogress")), left.toString)
  }

  test("group retraction: bytes leave the shards; untouched files stand") {
    // two groups across two shards; retract "a" and prove its TOKEN
    // BYTES are gone from disk, not just from the index
    val two = Seq(
      (1L, "a", Seq(111, 112, 113, 114)),
      (2L, "a", Seq(115, 116, 117, 118)),
      (3L, "b", Seq(211, 212, 213, 214)),
      (4L, "b", Seq(215, 216, 217, 218)))
      .toDF("id", "grp", "toks")
    val out = java.nio.file.Files.createTempDirectory("ts_retract").toString
    val seqs = TrainShards.assembleSequences(two, "grp", "id", "toks", 4)
    val idx = TrainShards.writeTokenShards(seqs, "grp", out, 4, numShards = 2)
      .localCheckpoint(true)
    val byFile = idx.select(col("shard_file"), col("group")).collect()
      .map(r => r.getString(0) -> r.getString(1))
    val aFiles = byFile.filter(_._2 == "a").map(_._1).toSet
    val bOnlyFiles = byFile.map(_._1).toSet -- aFiles
    def path(f: String) = java.nio.file.Paths.get(
      new java.net.URI(f).getPath match {
        case "" => f.stripPrefix("file:"); case p => p
      })
    val bOnlyLens = bOnlyFiles.map(f => f -> path(f).toFile.length).toMap
    val idx2 = TrainShards.retractGroups(spark, idx, Seq("a"), 4)
      .localCheckpoint(true)
    // the original affected files are DELETED
    aFiles.foreach(f => assert(!path(f).toFile.exists(), s"$f must delete"))
    // untouched files stand byte-identical
    bOnlyLens.foreach { case (f, len) =>
      assert(path(f).toFile.length == len, s"$f must not rewrite")
    }
    // no directory-wide byte scan finds group a's int32-LE tokens
    val dir = new java.io.File(out)
    val remaining = dir.listFiles()
      .filter(f => f.isFile && !f.getName.contains("inprogress"))
      .flatMap(f => java.nio.file.Files.readAllBytes(f.toPath))
    def hasLe(v: Int): Boolean = remaining.sliding(4).exists(w =>
      (w(0) & 0xff) == (v & 0xff) && (w(1) & 0xff) == ((v >> 8) & 0xff) &&
      (w(2) & 0xff) == ((v >> 16) & 0xff) && (w(3) & 0xff) == ((v >> 24) & 0xff))
    assert(!hasLe(111) && !hasLe(115), "retracted tokens must leave disk")
    assert(hasLe(211), "retained tokens must survive")
    // read-back through the new index equals packing group b alone
    val back = TrainShards.readTokenShards(spark, idx2, 4)
      .orderBy(col("group"), col("seq_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2))).toSeq
    assert(back == Seq(("b", 0L, Seq(211, 212, 213, 214)),
      ("b", 1L, Seq(215, 216, 217, 218))), back.toString)
    // retracting an absent group is the identity
    val idx3 = TrainShards.retractGroups(spark, idx2, Seq("zzz"), 4)
    assert(idx3.count() == idx2.count())
  }

  test("retractGroups preserves a non-string group column's type") {
    // the rewrite pipeline internally rides group-as-string; the
    // returned index must come back in the CALLER's group type, not
    // silently widen the whole column to string through the union
    val rows = Seq((0L, 7L, Seq(1, 2, 3, 4)), (1L, 7L, Seq(5, 6, 7, 8)),
      (2L, 9L, Seq(9, 10, 11, 12)))
      .toDF("id", "grp", "toks")
    val out = java.nio.file.Files.createTempDirectory("ts_longgrp").toString
    val seqs = TrainShards.assembleSequences(rows, "grp", "id", "toks", 4)
    // writeTokenShards emits a string group; a caller that persists the
    // index typed (e.g. parquet with a BIGINT group) hands retractGroups
    // a long column — model that shape
    val idx = TrainShards.writeTokenShards(seqs, "grp", out, 4, numShards = 1)
      .withColumn("group", col("group").cast("long"))
      .localCheckpoint(true)
    assert(idx.schema("group").dataType ==
      org.apache.spark.sql.types.LongType)
    val idx2 = TrainShards.retractGroups(spark, idx, Seq("7"), 4)
    assert(idx2.schema("group").dataType ==
      org.apache.spark.sql.types.LongType,
      s"group must stay long, got ${idx2.schema("group").dataType}")
    val back = idx2.select(col("group")).collect().map(_.getLong(0)).toSet
    assert(back == Set(9L), back.toString)
  }

  test("writer refuses a wrong-shape record loudly") {
    val bad = Seq(("g", 0L, Seq(1, 2, 3), Seq(0)))
      .toDF("grp", "seq_id", "tokens", "boundaries")
    val out = java.nio.file.Files.createTempDirectory("ts_bad").toString
    val e = intercept[org.apache.spark.SparkException] {
      TrainShards.writeTokenShards(bad, "grp", out, 4, 1).count()
    }
    assert(e.getMessage.contains("exactly 4 tokens") ||
      Option(e.getCause).exists(_.getMessage.contains("exactly 4 tokens")))
  }
}
