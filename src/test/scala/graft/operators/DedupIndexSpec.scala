package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * The at-rest dedup-index API: each indexed probe must return EXACTLY its
 * rescan operator's result (the index stores the same digests / bands /
 * clusters the rescan computes — layout is the only degree of freedom),
 * and appending a committed batch to the index must make the next probe
 * of the same content drop everything.
 */
class DedupIndexSpec extends SparkSuite {
  import spark.implicits._

  private lazy val db: String = {
    val dir = java.nio.file.Files.createTempDirectory("dedup_idx_spec").toString
    Bucketing.scratchDb(spark, "dedup_idx_spec", dir)
    "dedup_idx_spec"
  }

  private def ids(df: DataFrame, c: String): Seq[Long] =
    df.select(col(c).cast("long")).collect().map(_.getLong(0)).sorted.toSeq

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "pack my box with five dozen liquor jugs for the long trip"),
    (3L, "sphinx of black quartz judge my vow said the old judge"),
    (4L, "the quick brown fox jumps over the lazy dog again and again"),
    (5L, "a completely different sentence about distributed query engines")
  ).toDF("doc_id", "text")

  // an exact corpus copy (+100), a near-dup mutation (+200), a novel doc,
  // and an in-batch duplicate pair (21/22)
  private lazy val batch = Seq(
    (101L, "the quick brown fox jumps over the lazy dog again and again"),
    (201L, "the quick brown fox jumps over the lazy dog again and once more"),
    (21L, "entirely new content that matches nothing in the corpus at all"),
    (22L, "entirely new content that matches nothing in the corpus at all"),
    (31L, "another novel document with its own unique words and phrases")
  ).toDF("doc_id", "text")

  test("digest index probe == Dedup.incremental (rescan)") {
    DedupIndex.writeDigestIndex(corpus, "doc_id", "text",
      s"$db.digest", buckets = 4)
    val indexed = DedupIndex.incrementalIndexed(batch, spark,
      s"$db.digest", "doc_id", "text")
    val rescan = Dedup.incremental(batch, corpus, "doc_id", "text")
    assert(ids(indexed, "doc_id") == ids(rescan, "doc_id"))
    // and the fixture exercises every arm: corpus hit drops, in-batch
    // keep-first keeps the lower id, novel rows survive
    assert(ids(indexed, "doc_id") == Seq(21L, 31L, 201L))
  }

  test("appendDigestIndex: committed survivors gate the next ingest") {
    DedupIndex.writeDigestIndex(corpus, "doc_id", "text",
      s"$db.digest_app", buckets = 4)
    val kept = DedupIndex.incrementalIndexed(batch, spark,
      s"$db.digest_app", "doc_id", "text")
    DedupIndex.appendDigestIndex(kept, "doc_id", "text", s"$db.digest_app")
    // the appended files land in the SAME bucket layout — the table stays
    // bucketed and a re-probe of identical content drops every row
    val reprobe = DedupIndex.incrementalIndexed(
      batch.select((col("doc_id") + 1000).as("doc_id"), col("text")),
      spark, s"$db.digest_app", "doc_id", "text")
    assert(reprobe.count() == 0L)
  }

  test("compactBucketed: folds append files to one per bucket, probes unchanged") {
    DedupIndex.writeDigestIndex(corpus, "doc_id", "text",
      s"$db.digest_cmp", buckets = 4)
    // three appends: file count grows past the bucket count
    for (off <- Seq(1000L, 2000L, 3000L))
      DedupIndex.appendDigestIndex(
        batch.select((col("doc_id") + off).as("doc_id"), col("text")),
        "doc_id", "text", s"$db.digest_cmp")
    def dataFiles: Seq[java.nio.file.Path] = {
      val loc = java.nio.file.Paths.get(new java.net.URI(
        spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser.parseTableIdentifier(s"$db.digest_cmp"))
          .location.toString).getPath)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(loc).iterator().asScala.toSeq
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
    }
    val before = spark.table(s"$db.digest_cmp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dataFiles.size > 4, "appends must have accumulated files")
    Bucketing.compactBucketed(spark, s"$db.digest_cmp")
    // one sorted file per bucket; contents and bucketing spec unchanged
    assert(dataFiles.size == 4, s"want 4 bucket files, got ${dataFiles.size}")
    val after = spark.table(s"$db.digest_cmp").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before)
    assert(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(s"$db.digest_cmp"))
      .bucketSpec.exists(_.numBuckets == 4))
    // and the probe still anti-joins the bucketed scan in place
    val p = DedupIndex.incrementalIndexed(batch, spark,
      s"$db.digest_cmp", "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(p.contains("Bucketed: true"), s"probe must stay bucketed:\n$p")
  }

  test("compactBucketed: mid-swap crash never loses data; recovery restores the table") {
    DedupIndex.writeDigestIndex(corpus, "doc_id", "text",
      s"$db.digest_crash", buckets = 4)
    DedupIndex.appendDigestIndex(
      batch.select((col("doc_id") + 5000).as("doc_id"), col("text")),
      "doc_id", "text", s"$db.digest_crash")
    val before = spark.table(s"$db.digest_crash").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    // kill the swap in its widest window: live renamed aside, new copy not
    // yet renamed in — the pre-fix code had already DELETED the live data
    // by this point
    val boom = intercept[RuntimeException] {
      Bucketing.compactBucketed(spark, s"$db.digest_crash",
        () => throw new RuntimeException("driver died mid-swap"))
    }
    assert(boom.getMessage == "driver died mid-swap")
    // every pre-compaction row still exists on disk (under the aside name)
    assert(spark.table(s"$db.digest_crash__old").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == before)
    // recovery is pure catalog surgery: the live name reads again, with
    // the full pre-compaction contents
    Bucketing.recoverCompaction(spark, s"$db.digest_crash")
    assert(spark.table(s"$db.digest_crash").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == before)
    assert(!spark.catalog.tableExists(s"$db.digest_crash__old"))
    // and a fresh compaction (which self-heals first) completes cleanly
    Bucketing.compactBucketed(spark, s"$db.digest_crash")
    assert(spark.table(s"$db.digest_crash").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet == before)
    assert(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(s"$db.digest_crash"))
      .bucketSpec.exists(_.numBuckets == 4))
  }

  test("compactPartitioned: folds cell files, crash mid-swap recovers, probes equal") {
    import org.apache.spark.sql.DataFrame
    val dir = java.nio.file.Files.createTempDirectory("part_cmp").toString
    val path = s"$dir/ivf"
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f))).toDF("vec_id", "embedding")
    Similarity.writeIvfIndex(emb.where(col("vec_id") <= 2),
      "vec_id", "embedding", path, nlist = 2)
    Similarity.appendIvfIndex(emb.where(col("vec_id") > 2),
      "vec_id", "embedding", path)
    def probe(): Set[(Long, Long)] =
      Similarity.ivfTopKIndexed(spark, path, emb.where(col("vec_id") === 1),
        "vec_id", "embedding", k = 2, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def cellFiles(): Int = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(path)).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    }
    val before = probe()
    assert(cellFiles() > 2, "append must have accumulated files")
    // crash in the widest window: live dir renamed aside, new copy not in
    val boom = intercept[RuntimeException] {
      Bucketing.compactPartitioned(spark, path, "cluster",
        () => throw new RuntimeException("died mid-swap"))
    }
    assert(boom.getMessage == "died mid-swap")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path)))
    Bucketing.recoverPartitionedCompaction(spark, path)
    assert(probe() == before, "recovery must restore the live index")
    // a clean compaction (self-healing on entry) folds to one file per cell
    Bucketing.compactPartitioned(spark, path, "cluster")
    assert(cellFiles() == 2, s"want one file per cell, got ${cellFiles()}")
    assert(probe() == before, "compaction must not change probe results")
  }

  test("appendBandIndex / appendClusterIndex: survivors gate the next ingest") {
    DedupIndex.writeBandIndex(corpus, "doc_id", "text", s"$db.band_app", 4)
    val kept = DedupIndex.incrementalNearDupIndexed(batch, spark,
      s"$db.band_app", "doc_id", "text", 0.5)
    DedupIndex.appendBandIndex(kept, "doc_id", "text", s"$db.band_app")
    // re-ingesting the kept docs under new ids: every one is now a
    // near-duplicate of its indexed self and drops
    val reprobe = DedupIndex.incrementalNearDupIndexed(
      kept.select((col("doc_id") + 1000).as("doc_id"), col("text")),
      spark, s"$db.band_app", "doc_id", "text", 0.5)
    assert(reprobe.count() == 0L)

    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    DedupIndex.writeClusterIndex(vecs, "vec_id", "embedding",
      s"$db.cluster_app", nlist = 2, buckets = 2)
    val vkept = Seq((10L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    DedupIndex.appendClusterIndex(vkept, "vec_id", "embedding", s"$db.cluster_app")
    val vreprobe = DedupIndex.incrementalSemDedupIndexed(
      Seq((20L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding"),
      spark, s"$db.cluster_app", "vec_id", "embedding", minCosine = 0.9)
    assert(vreprobe.count() == 0L,
      "a copy of the appended vector must drop against the grown index")
  }

  test("band index probe == Dedup.incrementalNearDup (rescan)") {
    DedupIndex.writeBandIndex(corpus, "doc_id", "text",
      s"$db.band", buckets = 4)
    val indexed = DedupIndex.incrementalNearDupIndexed(batch, spark,
      s"$db.band", "doc_id", "text", 0.5)
    val rescan = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text", 0.5)
    assert(ids(indexed, "doc_id") == ids(rescan, "doc_id"))
    // the exact copy AND the near-dup mutation both drop against the
    // index; in-batch dup keeps the lower id; novel docs survive
    assert(ids(indexed, "doc_id") == Seq(21L, 31L))
  }

  test("cluster index probe == Dedup.incrementalSemDedup (rescan)") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f)),
      (4L, Array(0.9f, 0.1f, 0.0f)),
      (5L, Array(0.1f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val vbatch = Seq(
      (101L, Array(1.0f, 0.0f, 0.0f)),   // exact copy -> drops
      (102L, Array(-1.0f, 0.0f, 0.0f)),  // negated -> survives corpus
      (103L, Array(0.95f, 0.05f, 0.0f)), // near 1/4 -> drops
      (104L, Array(-1.0f, 0.0f, 0.0f))   // in-batch dup of 102 -> drops
    ).toDF("vec_id", "embedding")
    DedupIndex.writeClusterIndex(vecs, "vec_id", "embedding",
      s"$db.cluster", nlist = 3, buckets = 4)
    val indexed = DedupIndex.incrementalSemDedupIndexed(vbatch, spark,
      s"$db.cluster", "vec_id", "embedding", minCosine = 0.8)
    val rescan = Dedup.incrementalSemDedup(vbatch, vecs,
      "vec_id", "embedding", minCosine = 0.8, nlist = 3)
    assert(ids(indexed, "vec_id") == ids(rescan, "vec_id"))
    assert(ids(indexed, "vec_id") == Seq(102L))
  }

  private def labelMap(table: String): Map[Long, Long] =
    spark.table(table).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("mergeComponentIndex equals the cold recompute; untouched components pass through") {
    // release 1: chains {1,2,3}, {10,11}, and the untouched {50,51}
    val p1 = Seq((1L, 2L), (2L, 3L), (10L, 11L), (50L, 51L))
      .toDF("id_a", "id_b")
    val m1 = Seq(1L, 2L, 3L, 10L, 11L, 50L, 51L).toDF("id")
    DedupIndex.writeComponentIndex(
      Dedup.connectedComponents(m1, "id", p1), s"$db.comp_idx",
      idCol = "id", labelCol = "component", buckets = 4)
    // release 2: a bridge (3,10), an extension (11,12), a fresh pair
    val p2 = Seq((3L, 10L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    DedupIndex.mergeComponentIndex(spark, s"$db.comp_idx", p2)
    val got = labelMap(s"$db.comp_idx")
    val all = Seq(1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 50L, 51L).toDF("id")
    val cold = Dedup.connectedComponents(all, "id", p1.unionByName(p2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == cold)
    assert(got(50L) == 50L && got(51L) == 50L) // untouched survives intact
    assert(got(12L) == 1L && got(20L) == 20L)
    // the rewrite preserved the bucket layout: a component fold over the
    // merged table plans without an index-side Exchange
    val plan = spark.table(s"$db.comp_idx")
      .groupBy(col("component")).count()
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"component fold must reuse the bucketing:\n$plan")
  }

  test("mergeComponentIndex: mid-swap crash never loses labels; recovery restores") {
    val p1 = Seq((1L, 2L), (10L, 11L)).toDF("id_a", "id_b")
    val m1 = Seq(1L, 2L, 10L, 11L).toDF("id")
    DedupIndex.writeComponentIndex(
      Dedup.connectedComponents(m1, "id", p1), s"$db.comp_crash",
      idCol = "id", labelCol = "component", buckets = 4)
    val before = labelMap(s"$db.comp_crash")
    val boom = intercept[RuntimeException] {
      DedupIndex.mergeComponentIndex(spark, s"$db.comp_crash",
        Seq((2L, 10L)).toDF("id_a", "id_b"), "id_a", "id_b",
        () => throw new RuntimeException("driver died mid-swap"))
    }
    assert(boom.getMessage == "driver died mid-swap")
    // the full pre-merge labeling survives under the aside name
    assert(labelMap(s"$db.comp_crash__old") == before)
    // re-running the merge DIRECTLY (no manual recovery) must self-heal
    // the crashed swap first — the maintenance entry point is
    // re-runnable from any crash point, the compactBucketed discipline
    DedupIndex.mergeComponentIndex(spark, s"$db.comp_crash",
      Seq((2L, 10L)).toDF("id_a", "id_b"))
    assert(labelMap(s"$db.comp_crash") ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
    assert(!spark.catalog.tableExists(s"$db.comp_crash__old"))
    // recoverCompaction alone also restores a readable table (the
    // read-path heal, exercised against a fresh crash)
    val boom2 = intercept[RuntimeException] {
      DedupIndex.mergeComponentIndex(spark, s"$db.comp_crash",
        Seq((10L, 11L)).toDF("id_a", "id_b"), "id_a", "id_b",
        () => throw new RuntimeException("died again"))
    }
    assert(boom2.getMessage == "died again")
    Bucketing.recoverCompaction(spark, s"$db.comp_crash")
    assert(labelMap(s"$db.comp_crash") ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("winnow index probe == winnowMatches (rescan); appends fold in") {
    // two releases: write docs 1-3, append 4-5; probe with an eval doc
    // sharing doc 2's long run — the indexed match must equal the
    // in-session rescan row-for-row
    val evalSet = Seq(
      (7L, "pack my box with five dozen liquor jugs for the long trip ok"))
      .toDF("doc_id", "text")
    Contamination.writeWinnowIndex(corpus.where(col("doc_id") <= 3),
      "doc_id", "text", 4, s"$db.winnow", buckets = 4)
    Contamination.appendWinnowIndex(corpus.where(col("doc_id") > 3),
      "doc_id", "text", 4, s"$db.winnow")
    val indexed = Contamination.winnowMatchesIndexed(spark, s"$db.winnow",
        evalSet, "doc_id", "text", w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val rescan = Contamination.winnowMatches(corpus, evalSet,
        "doc_id", "text", w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == rescan, s"indexed=$indexed rescan=$rescan")
    assert(indexed.map(_._1).contains(2L), indexed.toString)
  }
}
