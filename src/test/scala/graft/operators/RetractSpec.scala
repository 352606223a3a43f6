package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/**
 * The at-rest deletion lifecycle: tombstone → masked live view →
 * crash-atomic physical purge, per index family.
 */
class RetractSpec extends SparkSuite {
  import spark.implicits._

  private lazy val db = {
    val dir = java.nio.file.Files.createTempDirectory("retract_spec").toString
    Bucketing.scratchDb(spark, "retract_spec", dir)
    "retract_spec"
  }

  private def docs = Seq(
    (1L, "alpha beta gamma"),
    (2L, "delta epsilon zeta"),
    (3L, "eta theta iota"),
    (4L, "kappa lambda mu"),
    (5L, "nu xi omicron")).toDF("doc_id", "text")

  test("bucketed retract: masked immediately, purged physically, idempotent") {
    val t = s"$db.digest_lifecycle"
    DedupIndex.writeDigestIndex(docs, "doc_id", "text", t, buckets = 4)
    assert(Retract.retract(spark, t, "id", Seq(2L, 4L).toDF("id")) == 2)
    // re-submitting the same takedown list records zero NEW keys
    assert(Retract.retract(spark, t, "id", Seq(2L, 4L).toDF("id")) == 0)

    val expect = Set(1L, 3L, 5L)
    val masked = Retract.readLive(spark, t)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(masked == expect, s"masked view: $masked")
    // the raw table still holds everything — deletion is logical so far
    assert(spark.table(t).count() == 5)

    Retract.purge(spark, t)
    val purged = spark.table(t).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(purged == expect, s"purged table: $purged")
    // tombstones cleared; live view IS the bare scan again
    assert(!spark.catalog.tableExists(Retract.tombTable(t)))
    // purge with no tombstones is a no-op
    Retract.purge(spark, t)
    assert(spark.table(t).count() == 3)
  }

  test("purge equals rebuild-from-filtered-corpus (digest index)") {
    val t = s"$db.digest_rebuild"
    val tRef = s"$db.digest_rebuild_ref"
    DedupIndex.writeDigestIndex(docs, "doc_id", "text", t, buckets = 4)
    Retract.retract(spark, t, "id", Seq(3L).toDF("id"))
    Retract.purge(spark, t)
    DedupIndex.writeDigestIndex(docs.where(col("doc_id") =!= 3),
      "doc_id", "text", tRef, buckets = 4)
    val got = spark.table(t).collect().map(r => (r.getString(0), r.getLong(1)))
      .toSet
    val want = spark.table(tRef).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("selective purge: untouched buckets carry over without a rewrite") {
    val t = s"$db.digest_selective"
    DedupIndex.writeDigestIndex(docs, "doc_id", "text", t, buckets = 4)
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t))
    val dir = java.nio.file.Paths.get(
      new java.net.URI(meta.location.toString).getPath)
    def files(): Map[String, Long] =
      Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length).toMap
    // pin the bucket-id contract the selective rewrite relies on: the
    // file-name bucket suffix equals pmod(hash(key), n) of its rows
    val re = """.*_(\d+)(?:\..*)?$""".r
    for (f <- files().keys) {
      val re(b) = f: @unchecked
      val ids = spark.read.parquet(s"$dir/$f")
        .select(pmod(hash(col("kh")), lit(4))).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(ids.subsetOf(Set(b.toInt)), s"$f holds buckets $ids")
    }
    val before = files()
    // retract ONE doc: only its digest's buckets may rewrite
    Retract.retract(spark, t, "id", Seq(2L).toDF("id"))
    val touchedBuckets = spark.table(t)
      .where(col("id") === 2L)
      .select(pmod(hash(col("kh")), lit(4))).distinct()
      .collect().map(_.getInt(0)).toSet
    Retract.purge(spark, t)
    val after = files()
    val untouchedBefore = before.filter { case (name, _) =>
      val re(b) = name: @unchecked; !touchedBuckets.contains(b.toInt)
    }
    // every untouched bucket file is present BYTE-IDENTICAL (same name,
    // same length — carried by hard link, not rewritten)
    untouchedBefore.foreach { case (name, len) =>
      assert(after.get(name).contains(len),
        s"untouched $name must carry over: $after")
    }
    assert(spark.table(t).select(col("id"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L, 4L, 5L))
  }

  test("selective purge survives a mid-swap crash and resumes") {
    val t = s"$db.digest_sel_crash"
    DedupIndex.writeDigestIndex(docs, "doc_id", "text", t, buckets = 4)
    Retract.retract(spark, t, "id", Seq(4L).toDF("id"))
    intercept[RuntimeException] {
      Retract.purgeSelective(spark, t,
        () => throw new RuntimeException("death between the renames"))
    }
    Bucketing.recoverCompaction(spark, t)
    assert(spark.table(t).count() == 5, "full pre-purge data must survive")
    assert(Retract.readLive(spark, t).count() == 4)
    Retract.purge(spark, t)
    assert(spark.table(t).select(col("id"))
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 5L))
  }

  test("purge survives a mid-swap crash and resumes") {
    val t = s"$db.digest_crash"
    DedupIndex.writeDigestIndex(docs, "doc_id", "text", t, buckets = 4)
    Retract.retract(spark, t, "id", Seq(1L).toDF("id"))
    intercept[RuntimeException] {
      // the transform overload = the FULL-rewrite path's crash window
      Retract.purge(spark, t, (df: org.apache.spark.sql.DataFrame) => df,
        () => throw new RuntimeException("death between the renames"))
    }
    // live name is gone mid-swap; recovery restores the PRE-purge table
    Bucketing.recoverCompaction(spark, t)
    assert(spark.table(t).count() == 5, "full pre-purge data must survive")
    // tombstones survived the crash, so the view still masks…
    assert(Retract.readLive(spark, t).count() == 4)
    // …and the retried purge completes
    Retract.purge(spark, t)
    assert(spark.table(t).count() == 4)
    assert(!spark.catalog.tableExists(Retract.tombTable(t)))
  }

  test("probe after retraction stays a bucketed scan (no index Exchange)") {
    val t = s"$db.digest_plan"
    DedupIndex.writeDigestIndex(docs, "doc_id", "text", t, buckets = 4)
    Retract.retract(spark, t, "id", Seq(5L).toDF("id"))
    val batch = Seq((10L, "alpha beta gamma"), (11L, "wholly new text"))
      .toDF("doc_id", "text")
    val kept = DedupIndex.incrementalIndexed(batch, spark, t,
      "doc_id", "text")
    val p = kept.queryExecution.executedPlan.toString
    // the tombstone applies as a BROADCAST anti-join — the index side
    // must not gain a shuffle Exchange
    assert(p.contains("BroadcastExchange"), p)
    val shuffles = p.linesIterator
      .count(l => l.contains("Exchange") && !l.contains("Broadcast"))
    assert(shuffles <= 1, s"index side must stay shuffle-free:\n$p")
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(11L))
  }

  test("edge index: a retracted node leaves by EITHER endpoint") {
    val t = s"$db.edges"
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (4L, 5L))
      .toDF("src", "dst")
    Graph.writeEdgeIndex(edges, "src", "dst", t, buckets = 4)
    Graph.retractNodes(spark, t, Seq(2L).toDF("node"))
    val live = Retract.readLive(spark, t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == Set((3L, 1L), (4L, 5L)), live.toString)
    Retract.purge(spark, t)
    val purged = spark.table(t)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(purged == Set((3L, 1L), (4L, 5L)))
    // degree fold over the filtered graph equals a filtered rebuild
    val deg = Graph.outDegrees(spark, t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg == Map(3L -> 1L, 4L -> 1L))
  }

  test("component index: purge re-elects the canonical min label") {
    val t = s"$db.components"
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "component")
    DedupIndex.writeComponentIndex(labels, t, buckets = 4)
    // retract doc 1 — the canonical member of component 1
    DedupIndex.retractComponentIndex(spark, t, Seq(1L).toDF("doc_id"))
    DedupIndex.purgeComponentIndex(spark, t)
    val got = spark.table(t).collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    // survivors 2,3 re-label to min survivor 2; component 7 unchanged
    assert(got == Set((2L, 2L), (2L, 3L), (7L, 7L), (7L, 8L)), got.toString)
  }

  test("postings: stats correction keeps N/avgdl exact, never double") {
    val t = s"$db.postings"
    Relevance.writePostingsIndex(docs, "doc_id", "text", t, buckets = 4)
    Relevance.retractPostings(spark, t, Seq(2L, 3L).toDF("doc_id"))
    // folded stats must now describe the 3-doc corpus
    val st = spark.table(s"${t}_stats")
      .agg(sum("n_docs"), sum("n_dl"), sum("sum_dl")).collect().head
    assert(st.getLong(0) == 3L && st.getLong(1) == 3L && st.getLong(2) == 9L,
      st.toString)
    // re-submitting the list must not subtract again
    Relevance.retractPostings(spark, t, Seq(2L, 3L).toDF("doc_id"))
    val st2 = spark.table(s"${t}_stats")
      .agg(sum("n_docs")).collect().head.getLong(0)
    assert(st2 == 3L, s"double-subtraction: $st2")
    // the probe view carries no postings of the retracted docs
    assert(Retract.readLive(spark, t).select(col("id"))
      .distinct().collect().map(_.getLong(0)).toSet == Set(1L, 4L, 5L))
  }

  test("postings: purge ends the digest epoch — re-ingest + re-retract corrects again") {
    val t = s"$db.postings_epoch"
    Relevance.writePostingsIndex(docs, "doc_id", "text", t, buckets = 4)
    Relevance.retractPostings(spark, t, Seq(2L).toDF("doc_id"))
    def nDocs() = spark.table(s"${t}_stats")
      .agg(sum("n_docs")).collect().head.getLong(0)
    assert(nDocs() == 4L)
    // physical purge via the postings wrapper: tombstones clear AND the
    // batch digests fold away (the takedown epoch ends)
    Relevance.purgePostings(spark, t)
    assert(spark.table(s"${t}_stats")
      .where(col("batch_key").isNotNull).isEmpty,
      "purge must clear the digest tags")
    // doc 2 re-ingests; the SAME key set retracted again must subtract
    // again — a surviving tag from epoch 1 would silently suppress it
    Relevance.appendPostingsIndex(
      docs.where(col("doc_id") === 2L), "doc_id", "text", t)
    assert(nDocs() == 5L)
    Relevance.retractPostings(spark, t, Seq(2L).toDF("doc_id"))
    assert(nDocs() == 4L, "second-epoch correction must apply")
  }

  test("postings: a zero-token doc's retraction leaves N exact (sidecar)") {
    val t = s"$db.postings_tokenless"
    // doc 6 has text but zero tokens; doc 7 has NULL text — neither has
    // any postings rows, so the pre-sidecar postings-derived correction
    // could never see them and idf's N drifted until a stats rebuild
    val withEmpty = docs.unionByName(
      Seq((6L, ""), (7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    Relevance.writePostingsIndex(withEmpty, "doc_id", "text", t, buckets = 4)
    def stats() = spark.table(s"${t}_stats")
      .agg(sum("n_docs"), sum("n_dl"), sum("sum_dl")).collect().head
    assert(stats().getLong(0) == 7L)
    Relevance.retractPostings(spark, t, Seq(6L, 7L).toDF("doc_id"))
    val st = stats()
    // N back to the 5 surviving docs; n_dl drops only for doc 6 (its
    // dl=0 was counted at ingest; the NULL-text doc's never was)
    assert(st.getLong(0) == 5L && st.getLong(1) == 5L &&
      st.getLong(2) == 15L, st.toString)
    // re-submission must not double-subtract
    Relevance.retractPostings(spark, t, Seq(6L, 7L).toDF("doc_id"))
    assert(stats().getLong(0) == 5L)
    // purge drops sidecar rows with the postings: a post-purge
    // re-retraction of the same (now absent) keys subtracts nothing
    Relevance.purgePostings(spark, t)
    Relevance.retractPostings(spark, t, Seq(6L, 7L).toDF("doc_id"))
    assert(stats().getLong(0) == 5L, "stale sidecar row double-subtracted")
    // and a tokenless doc arriving via APPEND is recoverable too
    Relevance.purgePostings(spark, t)
    Relevance.appendPostingsIndex(
      Seq((8L, "")).toDF("doc_id", "text"), "doc_id", "text", t)
    assert(stats().getLong(0) == 6L)
    Relevance.retractPostings(spark, t, Seq(8L).toDF("doc_id"))
    assert(stats().getLong(0) == 5L)
  }

  test("retractPostings migrates a legacy 3-column _stats table in place") {
    val t = s"$db.postings_legacy"
    Relevance.writePostingsIndex(docs, "doc_id", "text", t, buckets = 4)
    // simulate an index persisted before digests existed
    val legacy = spark.table(s"${t}_stats")
      .select(col("n_docs"), col("n_dl"), col("sum_dl"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      .toDF("n_docs", "n_dl", "sum_dl")
    Bucketing.writeTable(legacy, s"${t}_stats")
    assert(!spark.table(s"${t}_stats").columns.contains("batch_key"))
    Relevance.retractPostings(spark, t, Seq(3L).toDF("doc_id"))
    val st = spark.table(s"${t}_stats")
      .agg(sum("n_docs"), sum("sum_dl")).collect().head
    assert(st.getLong(0) == 4L && st.getLong(1) == 12L, st.toString)
  }

  test("partitioned purge: touched partitions rewrite, others carry over") {
    val root = java.nio.file.Files.createTempDirectory("retract_part")
    val path = s"$root/cdx_host"
    val caps = Seq(
      ("com,example)/a", "com,example", "sha1:A"),
      ("com,example)/b", "com,example", "sha1:B"),
      ("org,keep)/x", "org,keep", "sha1:X"),
      ("org,keep)/y", "org,keep", "sha1:Y"))
      .toDF("surt", "surt_host", "digest")
    caps.write.partitionBy("surt_host").parquet(path)
    val before = partFiles(path, "surt_host=org,keep")
    Retract.retractPartitioned(spark, path, "surt",
      Seq("com,example)/a").toDF("surt"))
    // masked immediately
    assert(Retract.readLivePartitioned(spark, path).count() == 3)
    Retract.purgePartitioned(spark, path, "surt_host")
    val after = spark.read.parquet(path)
    assert(after.count() == 3)
    assert(after.where(col("surt") === "com,example)/a").count() == 0)
    // the untouched partition's data files carried over UNREWRITTEN
    val afterFiles = partFiles(path, "surt_host=org,keep")
    assert(before == afterFiles,
      s"untouched partition must not rewrite: $before vs $afterFiles")
    // tombstones cleared
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(Retract.tombDir(path))))
  }

  test("partition-name unescape follows Spark's rules, not URL rules") {
    // URLDecoder would turn '+' into a space and misclassify the
    // partition as untouched — pre-purge files would be carried over
    assert(Retract.unescapePartitionValue("c++") == "c++")
    assert(Retract.unescapePartitionValue("a%2Fb") == "a/b")
    assert(Retract.unescapePartitionValue("sp%20ace") == "sp ace")
    assert(Retract.unescapePartitionValue("100%") == "100%")
  }

  test("partitioned purge physically drops rows in a NULL-valued partition") {
    // a null partCol lands under __HIVE_DEFAULT_PARTITION__: the touched
    // set is a string set that can represent neither the null value nor
    // that directory name, so without the null-touched flag the dead row
    // would carry over by rename and RESURFACE once the tombstones clear
    val root = java.nio.file.Files.createTempDirectory("retract_nullpart")
    val path = s"$root/idx"
    Seq((Some("a"), 1L), (None, 2L), (None, 3L), (Some("b"), 4L))
      .toDF("part", "v")
      .write.partitionBy("part").parquet(path)
    Retract.retractPartitioned(spark, path, "v", Seq(2L).toDF("v"))
    Retract.purgePartitioned(spark, path, "part")
    val rows = spark.read.parquet(path)
      .select(col("v"), col("part")).collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(rows == Set((1L, Some("a")), (3L, None), (4L, Some("b"))),
      rows.toString)
    // and after the purge no tombstone mask hides anything: the live
    // view equals the physical files
    assert(Retract.readLivePartitioned(spark, path).count() == 3)
  }

  test("partitioned purge handles a '+'-valued partition end to end") {
    val root = java.nio.file.Files.createTempDirectory("retract_plus")
    val path = s"$root/idx"
    Seq(("c++", 1L), ("c++", 2L), ("go", 3L)).toDF("part", "v")
      .write.partitionBy("part").parquet(path)
    Retract.retractPartitioned(spark, path, "v", Seq(1L).toDF("v"))
    Retract.purgePartitioned(spark, path, "part")
    val rows = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((2L, "c++"), (3L, "go")), rows.toString)
  }

  test("partitioned purge survives a mid-swap crash and retries") {
    val root = java.nio.file.Files.createTempDirectory("retract_part_crash")
    val path = s"$root/idx"
    Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("part", "v")
      .write.partitionBy("part").parquet(path)
    Retract.retractPartitioned(spark, path, "v", Seq(2L).toDF("v"))
    intercept[RuntimeException] {
      Retract.purgePartitioned(spark, path, "part",
        () => throw new RuntimeException("death between the renames"))
    }
    Bucketing.recoverPartitionedCompaction(spark, path)
    assert(spark.read.parquet(path).count() == 3,
      "full pre-purge data must survive the crash")
    assert(Retract.readLivePartitioned(spark, path).count() == 2)
    Retract.purgePartitioned(spark, path, "part")
    assert(spark.read.parquet(path).count() == 2)
  }

  private def partFiles(path: String, part: String): Set[String] =
    Option(new java.io.File(s"$path/$part").listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => s"${f.getName}:${f.length}").toSet
}
