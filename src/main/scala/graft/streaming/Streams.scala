package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * §2.7 — Structured Streaming entry points. The reference is batch-only
 * (its incrementality is the dataset watermark); these replay the same
 * event data through a real streaming pipeline — file source → event-time
 * watermark → windowed/sessionized state → sink — with
 * `Trigger.AvailableNow`, which is exactly the "catch up on everything
 * available, then stop" semantics of a scheduled BDE run.
 *
 * Determinism contract for the drain: a single far-future SENTINEL file is
 * staged after the real data so the event-time watermark passes every real
 * window/session and append-mode state flushes before the query stops
 * (no-data micro-batches emit the final results). Sentinel rows are
 * filtered from the output.
 */
object Streams {

  /** Copy a parquet input — a single FILE or a normal part-file DIRECTORY
    * (the shape every Spark write produces) — into the staging dir. Hidden
    * (`.`/`_`-prefixed) entries are skipped, matching Spark's own path
    * filter, so `_SUCCESS` markers and `.crc` sidecars never reach the
    * stream source. */
  private def stageData(src: String, dir: java.nio.file.Path): Unit = {
    val p = Paths.get(src)
    if (Files.isDirectory(p)) {
      val parts = Files.list(p).iterator()
      var i = 0
      while (parts.hasNext) {
        val f = parts.next()
        val name = f.getFileName.toString
        if (Files.isRegularFile(f) &&
            !name.startsWith(".") && !name.startsWith("_")) {
          Files.copy(f, dir.resolve(f"staged-$i%05d.parquet"),
            StandardCopyOption.REPLACE_EXISTING)
          i += 1
        }
      }
      require(i > 0, s"no parquet part files under $src")
    } else {
      Files.copy(p, dir.resolve("staged-00000.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** `ts` normalized to TimestampType (µs) schema-adaptively: generated
    * data has shipped both TIMESTAMP(NANOS) (a long of raw ns under
    * `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS) without
    * UTC adjustment (TIMESTAMP_NTZ). Same wall-clock under the UTC
    * session either way. */
  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** Stage the events parquet (plus a sentinel file) into a fresh stream
    * source dir; returns (dir, sentinel event_type). The sentinel keeps
    * the SOURCE file's raw `ts` type so every staged footer agrees. */
  private def stageSource(spark: SparkSession, eventsParquet: String): (String, String) = {
    val dir = Files.createTempDirectory("graft-stream")
    stageData(eventsParquet, dir)
    val sentinel = "__sentinel__"
    val ev = spark.read.parquet(eventsParquet)
    val plusTenHours: Column => Column =
      ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          _ + lit(36000L * 1000000000L) // raw ns
        case _ => _ + expr("INTERVAL 10 HOURS")
      }
    // one sentinel event per user, far past every real session/window —
    // written with the FULL source schema (nulls elsewhere) so the staged
    // dir keeps one footer schema and consumers can read any column
    val sentinels = ev
      .groupBy(col("user_id"))
      .agg(plusTenHours(max(col("ts"))).as("ts"))
      .withColumn("event_type", lit(sentinel))
    val full = ev.schema.fields.map { f =>
      if (Set("user_id", "ts", "event_type")(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    sentinels.select(full.toIndexedSeq: _*)
      .coalesce(1)
      .write.mode("append").parquet(dir.toString)
    (dir.toString, sentinel)
  }

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    normalizeTs(spark.readStream
      .schema(schema)
      .parquet(dir))
  }

  /** Streaming state partitions, sized to the STAGED INPUT VOLUME rather
    * than the session's batch shuffle width. Stateful operators create one
    * state store per shuffle partition per micro-batch, and every store
    * pays a per-batch fixed cost (open, commit, delta write) whether or not
    * it holds data — so a drain whose whole state fits in a few stores must
    * not fan out to the batch default (measured on the interval join at
    * sf0.1: 8 partitions ≈ 2× slower than 2 for identical results). One
    * partition per 64 MB of staged input approximates "state shards of
    * worker-memory size": state volume is a bounded fraction of input
    * volume for watermarked operators. Spark pins the width into the
    * query's checkpoint at first start, so a resumed query keeps its
    * layout regardless of later session settings. */
  private[graft] def statePartitionsFor(dir: String): Int = {
    val bytes =
      try {
        val s = Files.list(Paths.get(dir))
        try s.iterator().asScala
          .filter(Files.isRegularFile(_)).map(Files.size).sum
        finally s.close()
      } catch { case _: Exception => 0L }
    math.max(1L, math.min(32L, bytes / (64L << 20) + 1L)).toInt
  }

  /** Best-effort recursive delete of a staging dir. Staged corpus copies
    * are only needed until the drain returns (the memory sink materializes
    * results driver-side); leaving them would accumulate corpus-sized
    * parquet per bench/verify run. */
  private[graft] def cleanupStaging(dir: java.nio.file.Path): Unit =
    try {
      val walk = Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      finally walk.close()
    } catch { case _: Exception => () }

  private def runToMemory(df: DataFrame, mode: String, partitions: Int): DataFrame = {
    val spark = df.sparkSession
    val name = s"stream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    // materialize off the memory sink, then DROP its temp view — a long
    // verify/bench session drains ~30 streams, and leaving each drained
    // result registered would retain every one in driver memory for the
    // session's lifetime. localCheckpoint also re-roots the rows as a
    // fresh plan, which self-joining consumers need anyway (Catalyst
    // does not deduplicate MemoryPlan attributes)
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /**
   * Watermarked tumbling-window counts per event type (the streaming
   * counterpart of A4/A5's batch aggregates). Complete output mode: every
   * closed window is in the result table when the drain finishes.
   */
  def windowedEventCounts(
      spark: SparkSession,
      eventsParquet: String,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val (dir, sentinel) = stageSource(spark, eventsParquet)
    val agg = eventStream(spark, dir)
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .count()
    val drained = runToMemory(agg, "complete", statePartitionsFor(dir))
    cleanupStaging(Paths.get(dir))
    drained
      .where(col("event_type") =!= sentinel)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"),
        col("count").as("n_events"))
  }

  /**
   * Windowed DISTRIBUTION drift monitor: per tumbling window, the
   * total-variation distance (integer ppm, [[graft.operators.Drift]]'s
   * unit) between the window's event-type distribution and the
   * corpus-wide reference — the streaming tripwire for a traffic-mix
   * shift (a bot flood, a source going dark) surfacing window-by-window
   * at ingest. The streaming side is exactly the watermarked windowed
   * count aggregate (state: windows × event types — bounded); the ppm
   * comparison is BATCH arithmetic over the drained window table joined
   * against the static reference distribution, on the full
   * (window × reference-type) grid so types absent from a window
   * contribute their full reference mass.
   */
  def windowedTypeDrift(
      spark: SparkSession,
      eventsParquet: String,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    import graft.operators.Drift
    val counts = windowedEventCounts(spark, eventsParquet,
      windowLength, watermarkDelay).localCheckpoint()
    val ref = spark.read.parquet(eventsParquet)
      .groupBy(col("event_type")).agg(count(lit(1)).as("rc"))
    val refTot = ref.agg(sum(col("rc")).as("n")).head().getLong(0)
    val wTot = counts.groupBy(col("window_start"))
      .agg(sum(col("n_events")).as("nw"))
    val grid = wTot.crossJoin(broadcast(ref))
      .join(counts, Seq("window_start", "event_type"), "left_outer")
      .select(col("window_start"), col("nw"),
        abs(Drift.ppm(coalesce(col("n_events"), lit(0L)), col("nw")) -
          Drift.ppm(col("rc"), lit(refTot))).as("d"))
    grid.groupBy(col("window_start"))
      .agg(max(col("nw")).as("n_events"), sum(col("d")).as("__s"))
      .select(col("window_start"), col("n_events"),
        Drift.halved(col("__s")).as("drift_ppm"))
  }

  /**
   * Streaming first-seen dedup over a content digest — the CUSTOM-state
   * operator (`flatMapGroupsWithState`): keyed state remembers every digest
   * already emitted, so re-arrivals of the same content are dropped across
   * micro-batches. Within a batch the LOWEST id of a new digest wins
   * (deterministic regardless of partition arrival order). GroupStateTimeout
   * is deliberately none: dedup state must outlive any watermark — at scale
   * the state store is RocksDB-backed and sized by distinct digests, which
   * is exactly the cardinality an exact-dedup hash table costs anywhere.
   */
  /**
   * The DEPLOYABLE form of [[streamingDedup]]'s stateful core: the
   * caller owns the source stream, the checkpoint location, and the
   * sink — which is what makes the door KILLABLE AND RESUMABLE (the
   * state store checkpoints per micro-batch; a restart from the same
   * checkpoint reloads the last committed state version and replays
   * the uncommitted batch exactly once — pinned by `StreamResumeSpec`
   * for between-batch kills AND mid-batch deaths). Emits one
   * (digest, kept_id) per FIRST-ever-seen digest.
   */
  private[graft] def dedupTransform(src: DataFrame): DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    src
      .select(col("doc_id").cast("long").as("doc_id"),
        sha2(col("text").cast("binary"), 256).as("digest"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (digest: String, rows: Iterator[(Long, String)],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((digest, rows.map(_._1).min))
          })
      .toDF("digest", "kept_id")
  }

  def streamingDedup(
      spark: SparkSession,
      docs: DataFrame): DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-dedup")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val drained = runToMemory(
      dedupTransform(spark.readStream.schema(schema).parquet(dir.toString)),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained.select(col("kept_id"))
  }

  /**
   * Stream-static INCREMENTAL dedup — the streaming form of
   * [[graft.operators.Dedup.incremental]]: a stream of new documents is
   * anti-joined per micro-batch against the STATIC digest index of the
   * already-ingested corpus, then first-seen-deduped within the stream
   * itself, so each batch lands only content never seen before — either
   * historically (static side, re-planned every micro-batch so an updated
   * index is picked up between batches) or earlier in the stream (keyed
   * digest state, as [[streamingDedup]]).
   *
   * The anti lookup is a left_outer join + null filter — the stream-static
   * shape supported everywhere — and the static side reduces to DISTINCT
   * digests before joining; at rest that index is a digest-bucketed table
   * ([[graft.operators.Bucketing]]), making the per-batch probe co-located.
   */
  def incrementalDedupStream(
      spark: SparkSession,
      newDocs: DataFrame,
      corpus: DataFrame,
      bloomExpectedItems: Option[Long] = None,
      bloomFpp: Double = 0.01): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft-stream-incdedup")
    newDocs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val seen = corpus
      .select(sha2(col("text").cast("binary"), 256).as("digest"))
      .dropDuplicates("digest")
      .withColumn("__seen", lit(true))
    val digested = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"),
        sha2(col("text").cast("binary"), 256).as("digest"))
    // Optional broadcast-Bloom pre-gate (the streaming door of
    // Dedup.incrementalBloom): the corpus digest index folds ONCE into a
    // digest-range-sharded filter BANK (broadcast, per-shard bounded) and
    // every arriving doc tests its shard MAP-SIDE — definite misses skip
    // the per-batch static probe entirely, so the stream-static join
    // prices at |possible hits| per batch instead of |batch|. Bloom
    // misses can't be false, and hits are exact-confirmed by the same
    // join, so the result is identical with or without the gate (the
    // spec pins that).
    // the shared bank probe (Dedup.corpusBloomProbe): None on an empty
    // corpus — the degenerate gate is no gate (an all-null bank would
    // classify every arriving doc as a miss, which happens to be right,
    // but None keeps the no-gate plan shape explicit)
    val probe = bloomExpectedItems.flatMap(items =>
      graft.operators.Dedup.corpusBloomProbe(
        sha2(col("text").cast("binary"), 256), corpus, items, bloomFpp))
    val survivors = probe match {
      case None =>
        digested.join(seen, Seq("digest"), "left_outer")
          .where(col("__seen").isNull)
          .select(col("doc_id"), col("digest"))
      case Some(mk) =>
        val mightContain = mk(col("digest"))
        val misses = digested.where(!mightContain)
          .select(col("doc_id"), col("digest"))
        val confirmed = digested.where(mightContain)
          .join(seen, Seq("digest"), "left_outer")
          .where(col("__seen").isNull)
          .select(col("doc_id"), col("digest"))
        misses.unionByName(confirmed)
    }
    val fresh = survivors
      .as[(Long, String)]
      .groupByKey(_._2)
    val deduped = fresh.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (digest: String, rows: Iterator[(Long, String)],
       state: GroupState[Boolean]) =>
        if (state.exists) Iterator.empty
        else {
          state.update(true)
          Iterator.single((digest, rows.map(_._1).min))
        })
    val drained = runToMemory(deduped.toDF("digest", "kept_id"), "append",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained.select(col("kept_id"))
  }

  /**
   * The CLOSED ingest loop over the at-rest dedup indexes: a stream of
   * document batches drains through the persisted digest + band index
   * probes, and each micro-batch's SURVIVORS are appended to BOTH indexes
   * before the next micro-batch runs — so batch N+1's probes see batch N's
   * admissions, within one streaming run. This is the composition the
   * index API exists for (`DedupIndex`'s write → probe → append cycle,
   * here driven by `foreachBatch` instead of a batch driver): signature
   * computation is paid once per document lifetime, at its own ingest, and
   * the corpus side of every probe is the bucketed index scan, never a
   * text rescan.
   *
   * Each element of `batches` stages as ONE file with strictly increasing
   * modification times, and `maxFilesPerTrigger=1` makes each staged batch
   * its own micro-batch in arrival order. The drained result (admitted
   * doc ids across all batches) is nevertheless MICRO-BATCH-INDEPENDENT
   * for id-ordered ingests (every content group's lowest id arrives in
   * the earliest batch containing it — the natural shape of monotonically
   * assigned ids): within-batch keep-first keeps the lowest id, and
   * cross-batch the index keeps the first arrival, which is then the same
   * winner however the drain splits — the oracle restates the chained
   * batches independently and pins exactly that.
   *
   * `foreachBatch` is the right tool (not a stateful operator): the
   * "state" here IS the persisted index — durable across runs, shared
   * with the batch pipeline — not per-key streaming state scoped to one
   * query's checkpoint.
   */
  /** Stage each batch frame as ONE parquet file in `dir`, named and
    * mtime-stamped so the file source's oldest-first order IS batch
    * order (even when two writes land in the same ms). An all-empty
    * batch writes no part file (Spark materializes files lazily on the
    * first row) — it stages nothing and contributes nothing, the right
    * semantics for it. Returns false when EVERY batch was empty. */
  private def stageBatchFiles(
      dir: java.nio.file.Path, batches: Seq[DataFrame],
      columns: Seq[org.apache.spark.sql.Column]): Boolean = {
    batches.zipWithIndex.foreach { case (b, i) =>
      val tmp = Files.createTempDirectory("graft-stage-batch")
      try {
        b.select(columns: _*)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = {
          val s = Files.list(tmp)
          try s.iterator().asScala.find { f =>
            val n = f.getFileName.toString
            n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
          }
          finally s.close()
        }
        part.foreach { f =>
          val dst = dir.resolve(f"batch-$i%05d.parquet")
          Files.move(f, dst, StandardCopyOption.REPLACE_EXISTING)
          Files.setLastModifiedTime(dst,
            java.nio.file.attribute.FileTime.fromMillis(1755000000000L + i * 60000L))
        }
      } finally cleanupStaging(tmp)
    }
    hasParquet(dir)
  }

  private def hasParquet(d: java.nio.file.Path): Boolean = {
    val s = Files.list(d)
    try s.iterator().asScala.exists(_.getFileName.toString.endsWith(".parquet"))
    finally s.close()
  }

  /** Drain `dir` one staged file per micro-batch through `body`
    * (AvailableNow, checkpoint at `ckpt`). */
  private def drainLoop(
      spark: SparkSession, dir: java.nio.file.Path,
      ckpt: java.nio.file.Path)(body: DataFrame => Unit): Unit = {
    val schema = spark.read.parquet(dir.toString).schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (batch: DataFrame, _: Long) => body(batch) }
      .start()
    q.awaitTermination()
  }

  /**
   * Streaming ARCHIVE-writer door — the ingest loop's at-rest OUTPUT
   * arm ([[ingestLoopStream]] persists the dedup indexes; this
   * persists the curated text itself, in the public WET
   * conversion-shard convention): each micro-batch of (uri, text) rows
   * writes its own shard set under `outDir/batch-<n>/` through
   * [[graft.sources.Warc.writeWetShards]] (rename-committed, one gzip
   * member per record, warcinfo-headed), and the drain re-reads EVERY
   * written shard through the batch reader. Batch boundaries decide
   * shard MEMBERSHIP, never record content — the returned frame (and
   * the oracle) is the per-URI text, micro-batch independent. Returns
   * (target_uri, content_type, content_length, text).
   */
  def wetExportStream(
      spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      outDir: String,
      warcDate: String = "2026-01-01T00:00:00Z"): org.apache.spark.sql.DataFrame = {
    import graft.sources.Warc
    val dir = Files.createTempDirectory("graft-stream-wet")
    val ckpt = Files.createTempDirectory("graft-stream-wet-ckpt")
    try {
      docs.select(col("uri").cast("string").as("uri"),
          col("text").cast("string").as("text"))
        .write.mode("overwrite").parquet(dir.toString)
      val shards = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val batchNo = new java.util.concurrent.atomic.AtomicLong(0L)
      drainLoop(spark, dir, ckpt) { (batch: DataFrame) =>
        val n = batchNo.getAndIncrement()
        if (!batch.isEmpty) {
          Warc.writeWetShards(batch, "uri", "text",
              s"$outDir/batch-$n", warcDate, numShards = 2)
            .foreach(shards.add)
        }
      }
      val written = shards.toArray(Array.empty[String]).toSeq.sorted
      if (written.isEmpty) {
        import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
        return spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("target_uri", StringType),
            StructField("content_type", StringType),
            StructField("content_length", LongType),
            StructField("text", StringType))))
      }
      Warc.readRecords(spark, written)
        .where(col("parse_ok") && col("rec_type") === "conversion")
        .select(col("target_uri"), col("content_type"),
          col("content_length"), col("payload").cast("string").as("text"))
        .localCheckpoint(true)
    } finally {
      cleanupStaging(dir); cleanupStaging(ckpt)
    }
  }

  def ingestLoopStream(
      spark: SparkSession,
      batches: Seq[DataFrame],
      digestTable: String,
      bandTable: String,
      minJaccard: Double): DataFrame = {
    import graft.operators.DedupIndex
    val dir = Files.createTempDirectory("graft-stream-ingest")
    val out = Files.createTempDirectory("graft-stream-ingest-out")
    val ckpt = Files.createTempDirectory("graft-stream-ingest-ckpt")
    try {
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      def emptyIds(): DataFrame = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType))))
      if (!stageBatchFiles(dir, batches, Seq(col("doc_id"), col("text"))))
        return emptyIds() // every batch was empty
      drainLoop(spark, dir, ckpt) { (batch: DataFrame) =>
          // the micro-batch frame belongs to the stream's CLONED session,
          // whose table-relation cache was populated by the previous
          // batch's probes; the appends below refresh only the session
          // that ran them — refresh BOTH so every probe sees the files
          // the previous batch appended (the bug this guards against:
          // batch N+1 silently re-admitting batch N's content through a
          // stale cached file listing)
          for {
            ss <- Seq(spark, batch.sparkSession).distinct
            t <- Seq(digestTable, s"${bandTable}_bands", s"${bandTable}_shingles")
          } ss.catalog.refreshTable(t)
          val exact = DedupIndex.incrementalIndexed(
            batch, spark, digestTable, "doc_id", "text")
          val near = DedupIndex.incrementalNearDupIndexed(
            exact, spark, bandTable, "doc_id", "text", minJaccard)
          // materialize BEFORE the appends: the survivor plan READS the
          // same tables the appends grow, and lazy evaluation would let
          // survivors probe the index they are about to join
          val survivors = near.localCheckpoint(true)
          DedupIndex.appendDigestIndex(survivors, "doc_id", "text", digestTable)
          DedupIndex.appendBandIndex(survivors, "doc_id", "text", bandTable)
          survivors.select(col("doc_id"))
            .write.mode("append").parquet(out.toString)
          ()
      }
      // the last batch's appends invalidated only the cloned session's
      // relation cache — refresh the caller's session so its next probe
      // sees the fully-grown index
      Seq(digestTable, s"${bandTable}_bands", s"${bandTable}_shingles")
        .foreach(spark.catalog.refreshTable)
      // no survivors at all → no files in the sink (same lazy-file rule)
      if (!hasParquet(out)) emptyIds()
      else spark.read.parquet(out.toString).localCheckpoint(true)
    } finally {
      cleanupStaging(dir); cleanupStaging(out); cleanupStaging(ckpt)
    }
  }

  /**
   * The CLOSED crawl-discovery loop over an at-rest SEEN-URL index —
   * the crawl-side sibling of [[ingestLoopStream]]: batches of fetched
   * pages drain through link extraction → robots gate → spider-trap
   * filter → URL canonicalization, each micro-batch's NOVEL canonical
   * URLs probe the persisted seen-URL table (bucketed on the canonical
   * string; the crawl's cumulative frontier memory, durable across
   * runs and shared with the batch pipeline) and are APPENDED before
   * the next batch runs — so batch N+1 cannot re-discover what batch N
   * already emitted. `foreachBatch`, not a stateful operator: the
   * state IS the index.
   *
   * Result = (curl, discovered_by) for every never-seen canonical URL,
   * `discovered_by` the lowest page id that produced it. For id-RANGE
   * batch ingests (the natural crawl shape) the result is micro-batch
   * independent: a URL's global-minimum discoverer sits in the
   * earliest batch containing the URL, which is exactly the batch the
   * loop emits it from — the oracle restates the whole chain
   * independently and pins that.
   */
  def crawlLoopStream(
      spark: SparkSession,
      pageBatches: Seq[DataFrame],
      rules: DataFrame,
      agent: String,
      seenTable: String): DataFrame = {
    import graft.operators.{DedupIndex, Robots}
    import graft.functions.{HtmlOps, UrlOps}
    val dir = Files.createTempDirectory("graft-stream-crawl")
    val out = Files.createTempDirectory("graft-stream-crawl-out")
    val ckpt = Files.createTempDirectory("graft-stream-crawl-ckpt")
    try {
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      def empty(): DataFrame = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("curl", StringType),
          StructField("discovered_by", LongType))))
      if (!stageBatchFiles(dir, pageBatches,
          Seq(col("doc_id").cast("long").as("doc_id"),
            col("html").cast("string").as("html"),
            col("base").cast("string").as("base"))))
        return empty()
      drainLoop(spark, dir, ckpt) { (batch: DataFrame) =>
          // same stale-relation-cache guard as ingestLoopStream: the
          // micro-batch frame lives in the stream's CLONED session
          for (ss <- Seq(spark, batch.sparkSession).distinct)
            ss.catalog.refreshTable(seenTable)
          val links = HtmlOps.extractLinks(batch, "doc_id", "html", "base")
            .select(concat(col("doc_id").cast("string"), lit("#"),
              col("link")).as("lid"), col("link"))
          val admitted = Robots.gate(links, rules, agent, "lid", "link")
            .where(col("allowed"))
          val safe = UrlOps.trapFilter(admitted, "lid", "link",
              maxDepth = 4, maxDupSegments = 2, maxParams = 6,
              maxLen = 512)
            .where(!col("is_trap"))
          val firsts = safe
            .select(UrlOps.normalizeUrl(col("link")).as("curl"),
              split(col("lid"), "#").getItem(0).cast("long").as("doc_id"))
            .groupBy(col("curl"))
            .agg(min(col("doc_id")).as("discovered_by"))
          // materialize BEFORE the append — the probe reads the table
          // the append grows
          val novel = firsts
            .join(spark.table(seenTable), Seq("curl"), "left_anti")
            .localCheckpoint(true)
          DedupIndex.appendBucketed(novel.select(col("curl")), seenTable)
          novel.write.mode("append").parquet(out.toString)
          ()
      }
      spark.catalog.refreshTable(seenTable)
      if (!hasParquet(out)) empty()
      else spark.read.parquet(out.toString).localCheckpoint(true)
    } finally {
      cleanupStaging(dir); cleanupStaging(out); cleanupStaging(ckpt)
    }
  }

  /**
   * Streaming NEAR-duplicate ingest filter — the LSH-candidate keep rule
   * run as keyed streaming state: each arriving document's MinHash band
   * buckets are computed MAP-SIDE (the same native signature expressions
   * as the batch operator), and per (band, bucket) the state is ONE LONG —
   * the minimum document id ever seen in that bucket. A document drops
   * when any of its buckets has a lower-id occupant (seen in an earlier
   * batch, via state, or earlier in this batch — deterministic: within a
   * batch the group sorts by id). This is deliberately the UNVERIFIED
   * candidate rule (the ingest-time approximation): it trades Jaccard
   * verification for state that never stores shingles or signatures —
   * 8 bytes per distinct bucket, the smallest near-dup state possible —
   * which is what an always-on ingest gate wants at corpus scale; the
   * verified batch pass ([[graft.operators.Dedup.minHashKeep]]) remains
   * the offline arbiter. Documents too short to shingle have null buckets,
   * never enter the stream, and are always kept — exactly the batch
   * operators' parity rule.
   *
   * Returns the KEPT doc ids under the GLOBAL keep rule — a doc survives
   * iff no band bucket of its holds a lower id anywhere in the corpus —
   * which is what the batch oracle states, and is INDEPENDENT of how the
   * drain happened to be split into micro-batches: the stateful operator
   * passes every (doc, band, bucket) row through (alongside the running
   * state minimum), and the global per-bucket minimum is re-folded from
   * the drained rows themselves. The emitted `arrival_min` column is the
   * FIRST-ARRIVAL signal — the lowest occupant at-or-before each doc's
   * arrival — which is the decision a live gate would act on (`arrival_min
   * < doc_id` ⇒ drop now); across batch boundaries first-arrival can keep
   * a doc whose lower-id bucket-mate arrives later, which is correct gate
   * behavior but not the batch rule, so the oracle-checked entry point
   * folds globally and the per-arrival signal stays advisory.
   *
   * `maxFilesPerTrigger` bounds files per micro-batch (None = source
   * default); the result is the same for every setting — the spec pins
   * that by draining one file per batch.
   */
  /** Deployable stateful core of [[minHashDedupStream]] (see
    * [[dedupTransform]] for the kill-and-resume contract): every
    * arriving doc emits its LSH bucket memberships with the lowest
    * bucket occupant at-or-below it — state is 8 bytes per distinct
    * bucket, checkpointed per micro-batch. */
  private[graft] def lshMembershipTransform(
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.functions.TextOps
    val sig = src
      .select(col("doc_id").cast("long").as("doc_id"),
        TextOps.minHashSignature(array_distinct(TextOps.shingleHashes(
          TextOps.tokenHashes(TextOps.tokens(col("text")))))).as("sig"))
    sig
      .select(col("doc_id"), explode(array(
        (0 until TextOps.Bands).map(b => struct(lit(b).as("band"),
          TextOps.bandHash(col("sig"), b).as("bucket"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
      .where(col("bucket").isNotNull)
      .as[(Long, Int, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), rows: Iterator[(Long, Int, Long)],
         state: GroupState[Long]) => {
          val ids = rows.map(_._1).toArray.sorted
          val prior = if (state.exists) state.get else Long.MaxValue
          state.update(math.min(prior, ids.head))
          // pass each (doc, band, bucket) through with the lowest occupant
          // at-or-below it (self included): the live-gate signal. The state
          // itself stays 8 bytes per distinct bucket.
          val out = new Array[(Long, Int, Long, Long)](ids.length)
          var running = prior
          var i = 0
          while (i < ids.length) {
            running = math.min(running, ids(i))
            out(i) = (ids(i), key._1, key._2, running)
            i += 1
          }
          out.iterator
        })
      .toDF("doc_id", "band", "bucket", "arrival_min")
  }

  def minHashDedupStream(
      spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-lsh")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val drained = runToMemory(
      lshMembershipTransform(reader.parquet(dir.toString)),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    // global fold over the drained membership rows: every doc emitted every
    // bucket it belongs to, so min(doc_id) per (band, bucket) IS the global
    // bucket minimum no matter how arrivals were batched
    val bucketMin = drained.groupBy(col("band"), col("bucket"))
      .agg(min(col("doc_id")).as("gmin"))
    val drops = drained.join(bucketMin, Seq("band", "bucket"))
      .where(col("gmin") < col("doc_id"))
      .select(col("doc_id")).distinct()
    docs.select(col("doc_id").cast("long").as("doc_id"))
      .join(drops, Seq("doc_id"), "left_anti")
  }

  /**
   * Streaming per-source admission QUOTA — the ingest-door form of the
   * batch `quota_per_source` cap: at most `quota` documents admitted per
   * source, state = ONE LONG per source (the admitted count), the
   * smallest quota state possible. Each arriving doc passes through with
   * its 1-based arrival rank within its source (batch arrivals rank by
   * id for determinism); `rank <= quota` is the LIVE admission signal.
   *
   * As with [[minHashDedupStream]], first-arrival admission is inherently
   * batch-boundary-dependent (a lower-id doc arriving in a later batch
   * finds the quota spent), so the oracle-checked RESULT re-folds the
   * batch rule from the drained membership rows — the `quota` LOWEST ids
   * per source, via the bounded top-k aggregate (≤ quota entries per
   * source per task; never a row_number window over the source partition)
   * — while the emitted rank stays the live-gate signal.
   */
  /** The drained (doc_id, source, arrival_rank) membership table of the
    * quota gate — every doc with its 1-based arrival rank within its
    * source (the LIVE admission signal: `arrival_rank <= quota` is what
    * the gate acts on; the state is the one-long admitted count). Exposed
    * so the spec can pin the STATE arithmetic itself — ranks contiguous
    * per source, ordered by batch arrival — independently of the
    * batch-rule fold [[sourceQuotaStream]] returns. */
  private[graft] def sourceQuotaRanked(
      spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      maxFilesPerTrigger: Option[Int]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft-stream-quota")
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col("source").cast("string").as("source"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val drained = runToMemory(
      quotaRankTransform(reader.parquet(dir.toString)),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /** Deployable stateful core of [[sourceQuotaStream]] (see
    * [[dedupTransform]] for the kill-and-resume contract): each doc
    * passes through with its 1-based arrival rank within its source;
    * state is the one-long admitted count per source. */
  private[graft] def quotaRankTransform(
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    src
      .select(col("doc_id").cast("long").as("doc_id"),
        col("source").cast("string").as("source"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(Long, String)],
         state: GroupState[Long]) => {
          val ids = rows.map(_._1).toArray.sorted
          val before = if (state.exists) state.get else 0L
          state.update(before + ids.length)
          ids.iterator.zipWithIndex.map { case (id, i) =>
            (id, source, before + i + 1L) // 1-based arrival rank
          }
        })
      .toDF("doc_id", "source", "arrival_rank")
  }

  /**
   * Streaming per-source TOKEN-BUDGET admission — the ingest door of the
   * token-budget selection family (`Selection.selectTokenBudget`):
   * training mixtures are specified in TOKENS, not document counts, so
   * the door each source needs is "admit while my cumulative token count
   * fits the budget". State = ONE LONG per source (cumulative tokens of
   * every ARRIVAL so far — deliberately NON-SKIPPING: an overflowing doc
   * still advances the count, so later smaller docs cannot sneak in past
   * it; prefix sums are then monotone, which is exactly what makes the
   * batch rule refoldable). Each arriving doc passes through with its
   * source-cumulative token count INCLUDING itself — `cum_tokens <=
   * budget` is the LIVE admission signal (batch arrivals order by id for
   * determinism).
   *
   * As with [[sourceQuotaStream]], first-arrival admission is inherently
   * batch-boundary-dependent, so the oracle-checked RESULT refolds the
   * batch rule (per source, the id-ordered prefix-sum prefix that fits
   * `budget`) from the drained membership rows — micro-batch-independent
   * because the refold recomputes the sums from the rows themselves. The
   * refold avoids a corpus-wide per-source ordered cumsum (a window over
   * a hot source is one unsplittable task): `Selection.selectTokenBudget`'s
   * histogram-boundary shape, per source — id-RANGE buckets (width from
   * the observed id span), one bounded (source × bucket) aggregate, a
   * driver budget walk per source, and an ordered window over ONLY each
   * source's single boundary bucket (~1/buckets of its rows).
   */
  private[graft] def tokenBudgetArrivals(
      spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      maxFilesPerTrigger: Option[Int]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft-stream-tokbudget")
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col("source").cast("string").as("source"),
        coalesce(size(graft.functions.TextOps.tokens(col("text"))), lit(0))
          .cast("long").as("n_tokens"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val drained = runToMemory(
      budgetArrivalTransform(reader.parquet(dir.toString)),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /** Deployable stateful core of [[tokenBudgetStream]] (see
    * [[dedupTransform]] for the kill-and-resume contract): each doc
    * passes through with its source-cumulative token count including
    * itself; state is the one-long cumulative count per source.
    * Expects (doc_id, source, n_tokens) input rows. */
  private[graft] def budgetArrivalTransform(
      src: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val spark = src.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    src
      .select(col("doc_id").cast("long").as("doc_id"),
        col("source").cast("string").as("source"),
        col("n_tokens").cast("long").as("n_tokens"))
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[(Long, String, Long)],
         state: GroupState[Long]) => {
          val arr = rows.map(r => (r._1, r._3)).toArray.sortBy(_._1)
          var cum = if (state.exists) state.get else 0L
          val out = arr.map { case (id, tk) =>
            cum += tk
            (id, source, tk, cum) // cumulative INCLUDING self
          }
          state.update(cum)
          out.iterator
        })
      .toDF("doc_id", "source", "n_tokens", "cum_tokens")
  }

  def tokenBudgetStream(
      spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      budget: Long,
      maxFilesPerTrigger: Option[Int] = None,
      idBuckets: Int = 1024): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val drained = tokenBudgetArrivals(spark, docs, maxFilesPerTrigger)
    val t = drained.select(col("doc_id"), col("source"), col("n_tokens"))
    val maxId = t.agg(coalesce(max(col("doc_id")), lit(0L))).first().getLong(0)
    val width = math.max(1L, (maxId + 1L) / idBuckets)
    val tagged = t.withColumn("__idb", (col("doc_id") / width).cast("long"))
      .cache()
    // bounded (source × id-bucket) histogram + per-source driver walk —
    // the Selection.selectTokenBudget shape with id-order standing in for
    // score-order
    val hist = tagged.groupBy(col("source"), col("__idb"))
      .agg(sum(col("n_tokens")).as("btoks"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val bounds = hist.toSeq.map { case (source, rows) =>
      var cum = 0L
      var boundary = Long.MinValue
      var remaining = 0L
      rows.sortBy(_._2).foreach { case (_, idb, btoks) =>
        if (boundary == Long.MinValue) {
          if (cum + btoks <= budget) cum += btoks
          else { boundary = idb; remaining = budget - cum }
        }
      }
      // no boundary: every bucket fits — admit the whole source
      (source, if (boundary == Long.MinValue) Long.MaxValue else boundary,
        remaining)
    }.toDF("source", "__bidb", "__rem")
    // null-safe join: a NULL source is a real group (the arrival gate and
    // the per-source window both admit it) — an equi-join would silently
    // drop it from the refold
    val joined = tagged.join(broadcast(bounds),
        tagged("source") <=> bounds("source"))
      .drop(bounds("source"))
    val full = joined.where(col("__idb") < col("__bidb"))
    val partial = joined.where(col("__idb") === col("__bidb"))
      .withColumn("__cum", sum(col("n_tokens")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("doc_id"))))
      .where(col("__cum") <= col("__rem"))
    val result = full.unionByName(partial.drop("__cum"))
      .select(col("doc_id"), col("source"), col("n_tokens"))
    graft.operators.CacheScope.unpersistAfterAction(result, Seq(tagged))
  }

  /**
   * Streaming LINK-DISCOVERY door — the frontier producer of the crawl
   * loop: pages arrive as markup, their outgoing hyperlinks extract and
   * resolve map-side (`HtmlOps.extractLinks` — the same regex/resolve
   * projection as the batch operator, plus the explode; stateless, no
   * watermark, no state store), and the emitted (page id, link) rows
   * are the frontier candidates the robots/trap/politeness doors then
   * gate. Micro-batch independent by construction.
   */
  def linkDiscoveryStream(
      spark: SparkSession,
      pages: org.apache.spark.sql.DataFrame,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-links")
    pages.select(col("doc_id").cast("long").as("doc_id"),
        col("html").cast("string").as("html"),
        col("base").cast("string").as("base"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val links = graft.functions.HtmlOps.extractLinks(
      reader.parquet(dir.toString), "doc_id", "html", "base")
    val drained = runToMemory(links, "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /**
   * Streaming per-host POLITENESS door — the ingest form of
   * [[graft.operators.Frontier.schedule]]: per-host state = ONE LONG
   * (the next free fetch slot); each arriving URL takes the next slot
   * and is scheduled at `slot × delay(host)`; `sched_s < horizonS` is
   * the LIVE admission signal. The resolved per-host delays ride into
   * the state function as a tiny driver map (hosts-with-rules-sized —
   * the same small side the batch scheduler broadcasts).
   *
   * As with [[sourceQuotaStream]], first-arrival slotting is inherently
   * batch-boundary-dependent, so the drained membership table carries
   * the live arrival slots (spec-pinned: contiguous per host, id-ordered
   * within a batch, delay arithmetic exact) and the oracle-checked
   * RESULT refolds the batch rule — id-ordered slots per host — by
   * handing the drained arrivals to the batch scheduler itself with
   * priority = −id.
   */
  private[graft] def politenessArrivals(
      spark: SparkSession,
      urls: org.apache.spark.sql.DataFrame,
      delays: Map[String, Double],
      defaultDelayS: Double,
      maxFilesPerTrigger: Option[Int]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft-stream-polite")
    urls.select(col("doc_id").cast("long").as("doc_id"),
        col("url").cast("string").as("url"),
        graft.operators.Robots.urlHost(col("url")).as("host"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val keyed = reader.parquet(dir.toString)
      .as[(Long, String, String)]
      .groupByKey(_._3)
    val slotted = keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (host: String, rows: Iterator[(Long, String, String)],
       state: GroupState[Long]) => {
        val delay = delays.getOrElse(host, defaultDelayS)
        val arr = rows.toArray.sortBy(_._1) // id order within a batch
        var next = if (state.exists) state.get else 0L
        val out = arr.map { case (id, url, h) =>
          val slot = next; next += 1
          (id, url, h, slot, slot * delay)
        }
        state.update(next)
        out.iterator
      })
    val drained = runToMemory(
      slotted.toDF("doc_id", "url", "host", "arrival_slot", "arrival_sched_s"),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  def politenessStream(
      spark: SparkSession,
      urls: org.apache.spark.sql.DataFrame,
      delays: Map[String, Double],
      defaultDelayS: Double,
      horizonS: Double,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val drained =
      politenessArrivals(spark, urls, delays, defaultDelayS, maxFilesPerTrigger)
    val delayDf = delays.toSeq.toDF("host", "delay_s")
    graft.operators.Frontier.schedule(
        drained.select(col("doc_id"), col("url"),
          (-col("doc_id")).cast("double").as("__prio")),
        delayDf, "doc_id", "url", "__prio", defaultDelayS, horizonS)
      .select(col("doc_id"), col("url"), col("host"), col("slot"),
        col("delay_s"), col("sched_s"))
  }

  /**
   * Streaming conditional-fetch door — the live form of
   * [[graft.operators.Frontier.conditionalFetchPlan]]: due URLs arrive
   * as a stream and every micro-batch left-joins the fetch-state side's
   * latest validators. The stream-static equi-join is STATELESS on the
   * stream side (no watermark, no state-store rows — each URL is
   * planned and forgotten), and Spark re-plans the static relation per
   * micro-batch, so a state table appended between batches is seen by
   * the next one (the ingest-loop posture). A pure projection door:
   * batch-boundary-independent, the drain equals the batch plan
   * row-for-row — which is exactly the oracle's formulation.
   */
  /** [[conditionalFetchStream]] with the state side the PERSISTED
    * url-bucketed fetch-state index ([[graft.operators.FetchState]]):
    * each micro-batch's due URLs join the table relation — re-planned
    * per batch, so state appended by a concurrent cycle is visible to
    * the next trigger — and the latest-wins fold aggregates the
    * bucketed scan, exactly the batch door's plan. The durable-state
    * door a live crawl actually runs. */
  def conditionalFetchStreamIndexed(
      spark: SparkSession,
      frontier: org.apache.spark.sql.DataFrame,
      stateTable: String,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.DataFrame =
    conditionalFetchStream(spark, frontier, spark.table(stateTable),
      maxFilesPerTrigger)

  def conditionalFetchStream(
      spark: SparkSession,
      frontier: org.apache.spark.sql.DataFrame,
      state: org.apache.spark.sql.DataFrame,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-condfetch")
    frontier.select(col("url").cast("string").as("url"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val plans = graft.operators.Frontier.conditionalFetchPlan(
      reader.parquet(dir.toString), state)
    val drained = runToMemory(plans, "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  def sourceQuotaStream(
      spark: SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      quota: Int,
      maxFilesPerTrigger: Option[Int] = None): org.apache.spark.sql.DataFrame = {
    val drained = sourceQuotaRanked(spark, docs, maxFilesPerTrigger)
    // batch-rule fold: the quota LOWEST ids per source, order-independent.
    // The top-k score rides a Double, so the id-order contract holds for
    // ids < 2^53 (the same integral-id range the portable hash16 family
    // documents); content-hash ids beyond that need a long-scored variant
    val topk = graft.operators.Similarity.topKUdaf(quota)
    drained.groupBy(col("source"))
      .agg(topk(-col("doc_id").cast("double"), col("doc_id")).as("tk"))
      .select(col("source"), explode(col("tk.items._2")).as("doc_id"))
      .select(col("doc_id"), col("source"))
  }

  /**
   * Per-window quantile monitoring as a STREAMING aggregate with its
   * accuracy gauge — the value-distribution tripwire next to
   * [[windowedDrift]]'s categorical one: each tumbling window aggregates
   * `percentile_approx` (a MERGEABLE sketch — bounded state per window,
   * exactly what the state store needs; an exact percentile would buffer
   * every value per window), and the oracle-facing result reports the
   * EXACT batch-side percentile plus an approx-within-tolerance flag —
   * the HLL/CMS gauge pattern: at scale the exact arm drops and the
   * gauge licenses the sketch. At the spec's cardinalities the sketch
   * buffers fewer values than `accuracy` and is provably exact, so the
   * flag is deterministic.
   *
   * The complete-mode drain here mirrors the offline audit (every window
   * in the result table at drain end); an always-on deployment runs the
   * SAME aggregate in append mode, where the watermark evicts each
   * window's sketch state once the window closes — state is then bounded
   * by open windows, not stream history.
   */
  def windowQuantileGauge(
      spark: SparkSession,
      eventsParquet: String,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours",
      quantile: Double = 0.5,
      accuracy: Int = 10000,
      rankTol: Double = 0.01): DataFrame = {
    val (dir, sentinel) = stageSource(spark, eventsParquet)
    val agg = eventStream(spark, dir)
      .withWatermark("ts", watermarkDelay)
      .where(col("event_type") =!= sentinel)
      .groupBy(window(col("ts"), windowLength))
      .agg(expr(s"percentile_approx(value, CAST($quantile AS DOUBLE), " +
        s"$accuracy)").as("__p_approx"))
    val drained = runToMemory(agg, "complete", statePartitionsFor(dir))
    // The gauge checks the sketch's ACTUAL contract — rank error, not
    // value error (at 10 events/window the uninterpolated element the
    // sketch returns can sit far from the interpolated exact quantile in
    // VALUE space while being rank-perfect): the returned element must
    // bracket the target rank within rankTol·n — strictly-below mass
    // ≤ (q + tol)·n and at-or-below mass ≥ (q − tol)·n.
    val batch = normalizeTs(spark.read.parquet(dir))
      .where(col("event_type") =!= sentinel)
      .withColumn("window", window(col("ts"), windowLength))
    val gauged = batch
      .join(broadcast(drained), Seq("window"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("n_events"),
        expr(s"percentile(value, CAST($quantile AS DOUBLE))").as("__p_exact"),
        sum(when(col("value") < col("__p_approx"), 1L).otherwise(0L))
          .as("__lo"),
        sum(when(col("value") <= col("__p_approx"), 1L).otherwise(0L))
          .as("__hi"))
    val q = lit(quantile)
    val tol = lit(rankTol)
    val out = gauged.select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("window_start"),
        col("n_events"),
        round(col("__p_exact"), 6).as("p_exact"),
        (col("__lo").cast("double") <= (q + tol) * col("n_events") &&
          col("__hi").cast("double") >= (q - tol) * col("n_events"))
          .as("approx_ok"))
      .localCheckpoint()
    cleanupStaging(Paths.get(dir))
    out
  }

  /**
   * Streaming URL-keyed dedup gate — the crawl-frontier door: each
   * arriving page keys on its CANONICAL URL
   * ([[graft.functions.UrlOps.normalizeUrl]], a map-side regex chain) and
   * the keyed state holds ONE LONG per distinct canonical URL (the lowest
   * id seen so far — 8 B/URL, the minimal frontier-dedup state; at scale
   * the store is RocksDB-backed and sized by distinct URLs, the
   * cardinality any frontier costs anywhere). Each arrival emits its
   * membership row with the running minimum at arrival (the LIVE
   * admission signal: admitted iff it IS the new minimum); the
   * oracle-facing result re-folds the GLOBAL per-URL minimum from the
   * drained rows, so it is micro-batch-partitioning independent —
   * [[graft.functions.UrlOps.urlDedup]] is the verified offline arbiter
   * of the same rule.
   */
  def urlDedupStream(
      spark: SparkSession,
      pages: DataFrame,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = Files.createTempDirectory("graft-stream-urldedup")
    pages.select(col("doc_id").cast("long").as("doc_id"),
        col("url").cast("string").as("url"))
      .write.mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val keyed = reader.parquet(dir.toString)
      .select(col("doc_id"),
        graft.functions.UrlOps.normalizeUrl(col("url")).as("canon"))
      .as[(Long, String)]
      .groupByKey(_._2)
    val membership = keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (canon: String, rows: Iterator[(Long, String)],
       state: GroupState[Long]) => {
        val ids = rows.map(_._1).toArray
        val prior = state.getOption.getOrElse(Long.MaxValue)
        val mn = math.min(prior, ids.min)
        state.update(mn)
        // (canon, id, running min at this batch — the live gate signal)
        ids.iterator.map(id => (canon, id, mn))
      })
    val drained = runToMemory(
      membership.toDF("canonical_url", "doc_id", "running_min"),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained.groupBy(col("canonical_url"))
      .agg(min(col("doc_id")).as("kept_id"))
  }

  /**
   * Streaming decontamination gate: each arriving document is scored
   * against the STATIC eval-benchmark shingle set at ingest, and passes
   * only while its eval-overlapping shingle fraction stays at or below
   * `maxContamFrac` — the always-on counterpart of
   * [[graft.operators.Contamination.check]] (which remains the offline
   * batch view with per-doc attribution).
   *
   * Shape: shingles compute MAP-SIDE with the same native expressions as
   * the batch operator; the eval set is a STATIC side (benchmarks change
   * rarely) joined stream-static and broadcast — it ships per executor,
   * never per batch, and holds distinct shingle hashes only. The only
   * streaming state is the per-document count aggregate of the drain in
   * flight. Documents too short to shingle score 0 and always pass — the
   * batch operator's parity rule.
   *
   * Returns the KEPT doc ids.
   */
  def contaminationGateStream(
      spark: SparkSession,
      docs: DataFrame,
      evalDocs: DataFrame,
      maxContamFrac: Double): DataFrame = {
    import graft.functions.TextOps
    val dir = Files.createTempDirectory("graft-stream-contam")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    def shingles = array_distinct(TextOps.shingleHashes(
      TextOps.tokenHashes(TextOps.tokens(col("text")))))
    val evalShingles = broadcast(
      evalDocs.select(explode(shingles).as("sh")).distinct()
        .withColumn("__hit", lit(true)))
    val scored = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"), shingles.as("shs"))
      .select(col("doc_id"),
        size(col("shs")).cast("bigint").as("n_shingles"),
        explode_outer(col("shs")).as("sh"))
      .join(evalShingles, Seq("sh"), "left_outer")
      .groupBy(col("doc_id"), col("n_shingles"))
      .agg(sum(when(col("__hit"), lit(1L)).otherwise(lit(0L))).as("n_shared"))
    val drained = runToMemory(scored, "complete",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
      // shingle-free docs divide 0/0 — ANSI mode makes that an error, so
      // gate the division itself (they pass with score 0 by definition)
      .where(when(col("n_shingles") === 0L, lit(0.0))
        .otherwise(col("n_shared").cast("double") /
          col("n_shingles").cast("double")) <= maxContamFrac)
      .select(col("doc_id"))
  }

  /**
   * Streaming decontamination against the PERSISTED winnow-fingerprint
   * index ([[graft.operators.Contamination.writeWinnowIndex]] holds the
   * benchmark suites' fingerprints — inherently the small side): each
   * ingested document reduces map-side to its winnow-SELECTED fingerprint
   * set, joins the broadcast index, and drops when it shares at least
   * `minShared` DISTINCT fingerprints with the benchmark UNION (the
   * substring guarantee: a pasted ≥ w+k−1-token benchmark run always
   * shares a fingerprint — whole-document Jaccard gates can dilute it
   * away). The benchmark side is at rest: re-deploying the door never
   * re-fingerprints the suites.
   */
  def winnowGateStream(
      spark: SparkSession,
      docs: DataFrame,
      table: String,
      w: Int = 4,
      minShared: Int = 2): DataFrame = {
    import graft.functions.TextOps
    val dir = Files.createTempDirectory("graft-stream-winnowgate")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val fps = array_distinct(transform(
      TextOps.winnow(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens(col("text")))), w),
      s => s.getField("fp")))
    val idx = broadcast(spark.table(table).select(col("fp")).distinct()
      .withColumn("__hit", lit(true)))
    val scored = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"),
        explode_outer(fps).as("fp"))
      .join(idx, Seq("fp"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("__hit"), lit(1L)).otherwise(lit(0L))).as("n_shared"))
    val drained = runToMemory(scored, "complete",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained.where(col("n_shared") < minShared).select(col("doc_id"))
  }

  /**
   * Streaming heavy hitters — the Misra–Gries summary as a STREAMING
   * aggregate: its mergeability (Agarwal et al. 2013) is exactly what a
   * streaming state store needs, so the always-on "what's trending in the
   * ingest stream" query carries ≤ `capacity` counters of state TOTAL
   * however many tokens flow past — vs an exact streaming top-k whose
   * state is the full vocabulary. Same guarantee as the batch operator:
   * every token with frequency > N/(capacity+1) is present, undercounted
   * by at most N/(capacity+1); EXACT (= the batch oracle) while nothing
   * evicts. Complete-mode drain; ranking runs on the drained summary.
   */
  def topTokensStream(
      spark: SparkSession,
      docs: DataFrame,
      capacity: Int,
      n: Int): DataFrame = {
    import graft.functions.TextOps
    import graft.operators.HeavyHitters
    val dir = Files.createTempDirectory("graft-stream-hh")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val summary = HeavyHitters.summary(stream,
      explode(TextOps.tokens(col("text"))), capacity)
    val drained = runToMemory(summary, "complete",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained.orderBy(col("cnt").desc, col("token")).limit(n)
  }

  /**
   * Streaming perplexity gate — CCNet-style quality filtering at ingest:
   * each arriving document scores under a STATIC reference language model
   * (calibrated offline, like [[graft.operators.Perplexity]]'s batch
   * terciles) and passes only at `minMeanLogProb` or above. The always-on
   * counterpart of offline perplexity bucketing: the threshold is a FIXED
   * calibration constant — an ingest gate cannot see corpus-global
   * statistics, which is exactly why the batch operator owns the tercile
   * split and this one owns the door.
   *
   * Shape: token hashes compute map-side (same native expressions); the
   * model is vocabulary-sized and BROADCASTS (ships per executor, never
   * per batch); unseen tokens take the Laplace floor `1/(T + V_ref)` over
   * the REFERENCE vocabulary (the gate has no corpus-wide vocab — the
   * documented difference from the batch scorer). The only streaming
   * state is the per-doc aggregate of the drain in flight. Token-free
   * docs score the floor and pass only if the floor clears the threshold.
   *
   * Returns the KEPT doc ids.
   */
  def perplexityGateStream(
      spark: SparkSession,
      docs: DataFrame,
      refDocs: DataFrame,
      minMeanLogProb: Double): DataFrame = {
    import graft.functions.TextOps
    val dir = Files.createTempDirectory("graft-stream-ppl")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    def th = TextOps.tokenHashes(TextOps.tokens(col("text")))
    val ref = refDocs.select(explode(th).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val total = ref.agg(coalesce(sum(col("cu")), lit(0L))).first().getLong(0)
    val vocab = ref.count()
    val denom = (total + vocab).toDouble
    val floorLp = math.log10(1.0 / denom)
    val scored = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"), th.as("th"))
      .select(col("doc_id"), size(col("th")).cast("bigint").as("n_toks"),
        explode_outer(col("th")).as("u"))
      .join(broadcast(ref), Seq("u"), "left_outer")
      .groupBy(col("doc_id"), col("n_toks"))
      .agg(sum(when(col("u").isNotNull,
        log10((coalesce(col("cu"), lit(0L)).cast("double") + lit(1.0))
          / lit(denom)))).as("lp_sum"))
    val drained = runToMemory(scored, "complete",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
      .select(col("doc_id"),
        round(when(col("n_toks") === 0L, lit(floorLp))
          .otherwise(col("lp_sum") / col("n_toks").cast("double")), 6)
          .as("mean_logprob"))
      .where(col("mean_logprob") >= minMeanLogProb)
      .select(col("doc_id"))
  }

  /**
   * TRAINED-model quality gate at the ingest door: each arriving document
   * scores map-side under the hashed-linear model's weight literals
   * ([[graft.operators.Classifier.score]] — exact integer cell sum inside
   * whole-stage codegen, no join, no state) and passes iff its margin is
   * non-negative. The model-based sibling of the heuristic
   * [[contaminationGateStream]] / [[perplexityGateStream]] doors: train
   * offline on labeled documents ([[graft.operators.Classifier.train]]),
   * gate the crawl live. Stateless projection — append mode, no
   * watermark, per-batch cost is scan + hash.
   */
  def classifierGateStream(
      spark: SparkSession,
      docs: DataFrame,
      model: graft.operators.Classifier.Model): DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-clsgate")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val scored = graft.operators.Classifier
      .score(stream, "doc_id", "text", model)
    val drained = runToMemory(
      scored.where(col("keep")).select(col("doc_id")),
      "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /**
   * BLOCKLIST gate at the ingest door: each arriving document runs one
   * Aho–Corasick automaton pass ([[graft.operators.DictMatch.stats]] —
   * dictionary as plan literals, whole-stage codegen) and passes iff NO
   * blocked phrase occurs. The dictionary-scan sibling of
   * [[classifierGateStream]]: same stateless-projection door shape
   * (append mode, no watermark, per-batch cost is scan + automaton), but
   * the policy is an explicit phrase list — the shape a licensed-span or
   * toxic-phrase blocklist takes at 10⁵ entries, where a regex
   * alternation cannot compile.
   */
  def dictGateStream(
      spark: SparkSession,
      docs: DataFrame,
      blocked: Seq[String]): DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-dictgate")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.operators.DictMatch.stats(col("text"), blocked).as("__m"))
      .where(col("__m.total_matches") === 0L)
      .select(col("doc_id"))
    val drained = runToMemory(stream, "append",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /**
   * HTML extraction at the ingest door: raw markup rows stream through
   * the SAME map-side [[graft.functions.HtmlOps.mainText]] projection the
   * batch operator uses (boilerplate pruned by link density), then a
   * minimum-token keep gate — the first transform of a crawl-ingest
   * pipeline, stateless by construction (no watermark, no state store;
   * the extraction is per-row, so the stream form is exactly the batch
   * form under `AvailableNow`). Emits (doc_id, n_tokens) per kept doc.
   */
  /** The robots-META door — the page-level directive gate at ingest
    * ([[graft.functions.HtmlOps.extractMetaRobots]] behind a stream
    * reader): arriving markup parses its directives map-side and only
    * indexable pages pass, each carrying its `nofollow` verdict for
    * the edge producer downstream. Stateless, micro-batch independent
    * by construction. */
  def metaRobotsGateStream(
      spark: SparkSession,
      docs: DataFrame,
      htmlCol: String): DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-metarobots")
    docs.select(col("doc_id"), col(htmlCol).as("html")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = graft.functions.HtmlOps.extractMetaRobots(
        spark.readStream.schema(schema).parquet(dir.toString)
          .select(col("doc_id").cast("long").as("doc_id"), col("html")),
        "doc_id", "html")
      .where(!col("noindex"))
      .select(col("doc_id"), col("nofollow"))
    val drained = runToMemory(stream, "append",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /**
   * The text-hygiene ingest door — three batch rules composed as ONE
   * stateless streaming projection (no watermark, no state store,
   * micro-batch independent by construction): mojibake repairs first
   * (PII patterns must see the true characters; SEGMENT-scoped so a
   * multilingual document with one artifact line still repairs), rows
   * carrying a Luhn-VALID payment card drop whole (a card number is not
   * redactable noise — the row is a liability; the window-scanning
   * [[QualityOps.containsLuhnCard]] net, not the bounded reporting
   * regex, so a card merged with a separator-joined expiry cannot slip
   * the length filter), and survivors emit with email/IP/phone
   * redacted. Emits (doc_id, text).
   */
  def hygieneGateStream(
      spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import graft.functions.QualityOps
    val dir = Files.createTempDirectory("graft-stream-hygiene")
    docs.select(col("doc_id"), col("text")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val repaired = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"),
        QualityOps.mojibakeRepairLines(col("text")).as("text"))
    val gated = repaired
      .where(!QualityOps.containsLuhnCard(col("text")))
      .select(col("doc_id"), QualityOps.redactPii(col("text")).as("text"))
    val drained = runToMemory(gated, "append",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  def htmlGateStream(
      spark: SparkSession,
      docs: DataFrame,
      htmlCol: String,
      minTokens: Int): DataFrame = {
    val dir = Files.createTempDirectory("graft-stream-htmlgate")
    docs.select(col("doc_id"), col(htmlCol).as("html")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.HtmlOps.mainText(col("html"), 0.5).as("text"))
      .select(col("doc_id"),
        // extracted text separates blocks with '\n' — fold to spaces so
        // the token count sees block boundaries as separators
        size(graft.functions.TextOps.tokens(
          regexp_replace(col("text"), "\n", " "))).cast("long")
          .as("n_tokens"))
      .where(col("n_tokens") >= minTokens)
    val drained = runToMemory(stream, "append",
      statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /**
   * robots.txt admission at the ingest door: each discovered URL on the
   * stream gates MAP-SIDE against the broadcast host→rule-array frame —
   * the batch gate's groupBy argmax re-expressed as a per-row array fold
   * ([[graft.operators.Robots.verdict]]), so the door is STATELESS (no
   * watermark, no state store — a stream-static broadcast join plus row
   * expressions) and micro-batch independent by construction. Emits
   * (doc_id, url, allowed, rule_prefix) per URL.
   */
  def robotsGateStream(
      spark: SparkSession,
      urls: DataFrame,
      rules: DataFrame,
      agent: String): DataFrame = {
    import graft.operators.Robots
    val dir = Files.createTempDirectory("graft-stream-robots")
    urls.select(col("doc_id"), col("url")).write
      .mode("overwrite").parquet(dir.toString)
    val schema = spark.read.parquet(dir.toString).schema
    val hostRules = Robots.hostRuleSets(rules, agent)
    val joined = spark.readStream.schema(schema).parquet(dir.toString)
      .withColumn("__host", Robots.urlHost(col("url")))
      .withColumn("__path", Robots.urlPath(col("url")))
      .join(broadcast(hostRules), col("__host") === col("__rh"), "left")
    val (allowed, rulePrefix) = Robots.verdict(col("__path"), col("__rules"))
    val out = joined.select(col("doc_id"), col("url"),
      allowed.as("allowed"), rulePrefix.as("rule_prefix"))
    val drained = runToMemory(out, "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
  }

  /**
   * The crawl-ARCHIVE ingest door: WARC shards arriving in a drop
   * directory (the unit a crawler actually delivers — one `binaryFile`
   * row per shard, `maxFilesPerTrigger` paces shards per micro-batch)
   * parse, strip HTTP heads, extract main text, and gate on token count
   * in ONE stateless pass — record parse is a per-shard `flatMap`
   * (`Warc.parseShard`, the same framing the batch reader distributes)
   * and everything downstream is the [[htmlGateStream]] projection, so
   * the door is micro-batch independent by construction. Corrupt shards
   * contribute their parseable prefix and a flagged tail row the gate
   * drops — one bad shard never stalls the stream.
   */
  def warcGateStream(
      spark: SparkSession,
      warcDir: String,
      minTokens: Int,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val schema = spark.read.format("binaryFile").load(warcDir).schema
    val reader = spark.readStream.format("binaryFile").schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val gated = reader.load(warcDir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => graft.sources.Warc.parseShard(p, bytes) }
      .toDF()
      .where(col("parse_ok") && col("rec_type") === "response")
      .select(col("target_uri"),
        graft.functions.HtmlOps.mainText(
          graft.sources.Warc.httpBodyText(col("payload")), 0.5).as("text"))
      .select(col("target_uri"),
        size(graft.functions.TextOps.tokens(
          regexp_replace(col("text"), "\n", " "))).cast("long")
          .as("n_tokens"))
      .where(col("n_tokens") >= minTokens)
    runToMemory(gated, "append", statePartitionsFor(warcDir))
  }

  /**
   * Stream-stream INTERVAL JOIN: each click joined to the same user's
   * purchases in the `within` interval after it — streaming attribution,
   * the two-sided stateful operator (both sides buffer state, the
   * time-range condition + watermarks bound how long).
   *
   * No sentinel staging: an inner stream-stream join emits a pair as soon
   * as both rows have arrived (state, not output, is what the watermark
   * gates), so `AvailableNow` over the staged file drains completely. The
   * watermark + interval bound is still what makes this run forever at
   * scale: click state older than `within` + delay is dropped, so state is
   * O(events in the join window), not O(stream history).
   */
  def clickAttribution(
      spark: SparkSession,
      eventsParquet: String,
      within: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    // own staging (no sentinel): schema inference must see the FULL event
    // schema — stageSource's sentinel file carries a 3-column subset and
    // could win the single-file schema pick
    val dir = Files.createTempDirectory("graft-stream-join")
    stageData(eventsParquet, dir)
    val ev = eventStream(spark, dir.toString)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("buy_ts"),
        col("event_id").as("buy_id"), col("value"))
      .withWatermark("buy_ts", watermarkDelay)
    val joined = clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("buy_ts") >= col("click_ts") &&
        col("buy_ts") <= col("click_ts") + expr(s"INTERVAL $within"))
    val drained = runToMemory(joined, "append", statePartitionsFor(dir.toString))
    cleanupStaging(dir)
    drained
      .select(col("c_user").as("user_id"), col("click_id"), col("buy_id"),
        col("value"))
  }

  /**
   * Session windows per user (30-minute inactivity gap) — the stateful
   * operator the reference has no analogue for; append mode + watermark,
   * flushed by the sentinel drain.
   */
  def userSessions(
      spark: SparkSession,
      eventsParquet: String,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 minute"): DataFrame = {
    val (dir, sentinel) = stageSource(spark, eventsParquet)
    val agg = eventStream(spark, dir)
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === sentinel, 1).otherwise(0)).as("n_sentinel"))
    val drained = runToMemory(agg, "append", statePartitionsFor(dir))
    cleanupStaging(Paths.get(dir))
    drained
      .where(col("n_sentinel") === 0)
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"))
  }
}
