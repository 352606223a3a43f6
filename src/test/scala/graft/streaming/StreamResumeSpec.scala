package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSuite

/** Spec-side fault injector: arms a one-shot task failure keyed on a
  * doc id, so a spec can kill a streaming query MID-BATCH (the widest
  * crash window — offsets logged, state/sink uncommitted) and prove the
  * restart replays exactly once. Local-mode executors share the JVM, so
  * a volatile static is visible to tasks. */
object StreamFault {
  @volatile var failOnId: Long = -1L
  def check(id: Long): Long = {
    if (id == failOnId)
      throw new RuntimeException(s"injected mid-batch death at doc $id")
    id
  }
}

/**
 * Kill-and-resume durability for the stateful streaming doors: each
 * door's deployable transform runs against a caller-owned checkpoint
 * and file sink, is killed BETWEEN micro-batches (drain, stop, more
 * data arrives, resume) and MID-BATCH (injected task death after the
 * offset log is written), and the resumed run's total output must equal
 * an uninterrupted reference run over the same files in the same batch
 * decomposition — the state store must neither re-admit (duplicate
 * emissions) nor drop (lost state) across the restart. The at-rest
 * analogue is `recoverCompaction`'s crash contract; this is the same
 * standard applied to the always-on gates.
 *
 * Each staged file is one micro-batch (`maxFilesPerTrigger=1`,
 * single-file writes), so admissions are deterministic and the fault
 * lands in a KNOWN batch: run 2 commits the first new file's batch,
 * then dies inside the second's.
 */
class StreamResumeSpec extends SparkSuite {
  import spark.implicits._

  private val faultCheck = udf((id: Long) => StreamFault.check(id))

  /** Drive `transform` over the staged source with AvailableNow +
    * 1-file micro-batches into a parquet sink; returns when drained. */
  private def drain(
      transform: DataFrame => DataFrame,
      srcDir: String, ckpt: String, out: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = transform(src
        .withColumn("doc_id", faultCheck(col("doc_id"))))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Read a file-sink output through its commit log (_spark_metadata):
    * orphan files from the killed batch must not count. */
  private def sink(out: String): DataFrame = spark.read.parquet(out)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** The full lifecycle for one door: the batch-1 file drains and the
    * query stops (between-batches kill); two more single-file batches
    * arrive and the first resume commits batch 2a then DIES mid-batch
    * in 2b on the injected fault; the second resume completes. Output
    * must equal the uninterrupted reference over the same files. */
  private def lifecycle(
      name: String,
      transform: DataFrame => DataFrame,
      batch1: DataFrame, batch2a: DataFrame, batch2b: DataFrame,
      faultId: Long): (DataFrame, DataFrame) = {
    val srcDir = tmp(s"$name-src"); val ckpt = tmp(s"$name-ck")
    val out = tmp(s"$name-out")
    batch1.coalesce(1).write.mode("append").parquet(srcDir)
    drain(transform, srcDir, ckpt, out) // batch 1 commits
    // …the query is now DOWN (between-batches kill); more data arrives
    batch2a.coalesce(1).write.mode("append").parquet(srcDir)
    Thread.sleep(5) // distinct mtimes keep the file order deterministic
    batch2b.coalesce(1).write.mode("append").parquet(srcDir)
    StreamFault.failOnId = faultId
    try {
      intercept[StreamingQueryException] {
        drain(transform, srcDir, ckpt, out)
      }
    } finally StreamFault.failOnId = -1L
    drain(transform, srcDir, ckpt, out) // resume heals and finishes
    // uninterrupted reference: same files, same 1-file batching
    val refCk = tmp(s"$name-refck"); val refOut = tmp(s"$name-refout")
    drain(transform, srcDir, refCk, refOut)
    (sink(out), sink(refOut))
  }

  test("dedup door: restart neither re-admits nor drops digests") {
    val b1 = Seq((1L, "alpha text"), (2L, "beta text"), (3L, "alpha text"))
      .toDF("doc_id", "text")
    val b2a = Seq((10L, "alpha text"), (11L, "gamma text"))
      .toDF("doc_id", "text")
    val b2b = Seq((12L, "beta text"), (13L, "delta text"))
      .toDF("doc_id", "text")
    val (got, ref) = lifecycle("resume-dedup",
      Streams.dedupTransform, b1, b2a, b2b, faultId = 13L)
    val g = got.select("kept_id").collect().map(_.getLong(0)).sorted.toSeq
    val r = ref.select("kept_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(g == r, s"resumed $g vs reference $r")
    // batch-1 admissions exactly once (no replay of a committed batch);
    // the committed-then-crashed run's batch 2a exactly once; the
    // replayed batch 2b's novelty exactly once (no loss)
    assert(g == Seq(1L, 2L, 11L, 13L), g.toString)
  }

  test("LSH door: bucket-minimum state survives the restart") {
    val b1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "wholly different words making other shingles here now"))
      .toDF("doc_id", "text")
    val b2a = Seq((10L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val b2b = Seq((11L, "yet another unrelated document text arriving"))
      .toDF("doc_id", "text")
    val (got, ref) = lifecycle("resume-lsh",
      Streams.lshMembershipTransform, b1, b2a, b2b, faultId = 11L)
    def fold(df: DataFrame) = df
      .groupBy(col("band"), col("bucket"))
      .agg(min(col("doc_id")).as("gmin"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(fold(got) == fold(ref))
    // doc 10 duplicates doc 1: its arrival_min must see the PRE-restart
    // occupant, proving the bucket state reloaded
    val seen10 = got.where(col("doc_id") === 10)
      .select(min(col("arrival_min"))).collect().head.getLong(0)
    assert(seen10 == 1L, s"doc 10 must meet doc 1's buckets, saw $seen10")
  }

  test("quota door: per-source counts continue, not restart, at resume") {
    val b1 = Seq((1L, "s1"), (2L, "s1"), (3L, "s2")).toDF("doc_id", "source")
    val b2a = Seq((10L, "s1")).toDF("doc_id", "source")
    val b2b = Seq((11L, "s2"), (12L, "s2")).toDF("doc_id", "source")
    val (got, ref) = lifecycle("resume-quota",
      Streams.quotaRankTransform, b1, b2a, b2b, faultId = 12L)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows(got) == rows(ref))
    // doc 10 is s1's THIRD arrival — rank 3 proves the count resumed
    assert(rows(got).contains((10L, "s1", 3L)), rows(got).toString)
    // the replayed batch's ranks continue s2's count exactly once
    assert(rows(got).contains((11L, "s2", 2L)) &&
      rows(got).contains((12L, "s2", 3L)), rows(got).toString)
  }

  test("token-budget door: cumulative counts survive the restart") {
    val b1 = Seq((1L, "s1", 5L), (2L, "s1", 7L), (3L, "s2", 4L))
      .toDF("doc_id", "source", "n_tokens")
    val b2a = Seq((10L, "s1", 2L)).toDF("doc_id", "source", "n_tokens")
    val b2b = Seq((11L, "s2", 3L)).toDF("doc_id", "source", "n_tokens")
    val (got, ref) = lifecycle("resume-budget",
      Streams.budgetArrivalTransform, b1, b2a, b2b, faultId = 11L)
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(rows(got) == rows(ref))
    // doc 10 lands on s1's prior cumulative 12 → 14, proving state reload
    assert(rows(got).contains((10L, "s1", 2L, 14L)), rows(got).toString)
    // the replayed doc 11 continues s2's cumulative exactly once: 4 → 7
    assert(rows(got).contains((11L, "s2", 3L, 7L)), rows(got).toString)
  }
}
