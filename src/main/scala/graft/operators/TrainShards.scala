package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-shard materialization — the TERMINAL artifact of the whole
 * pipeline: curated, tokenized, PACKED sequences laid out as
 * fixed-record binary shards a training dataloader memory-maps (the
 * flat `.bin`+index convention of Megatron/GPT-NeoX-style preprocessed
 * datasets, reimplemented from the public layout idea: `seqLen` int32
 * little-endian tokens per record, records concatenated, a sidecar
 * index addressing each record by (file, record slot)).
 *
 * [[Sampling.packSequences]] decides the layout (which sequence each
 * document's tokens start in); [[assembleSequences]] makes it PHYSICAL
 * (the actual fixed-length token rows, straddling documents split
 * across consecutive sequences); [[writeTokenShards]] writes the
 * records and returns the index; [[readTokenShards]] reads any subset
 * back by positioned reads of exactly the addressed records — the
 * CDX/fetchSpans posture applied to the training side.
 *
 * Reference analogue: the final-table publish step
 * (`sql/bde_control_functions` upload completion) — the moment staged
 * work becomes the artifact consumers read; here the consumer is a
 * training job, and the contract is byte layout instead of a schema.
 */
object TrainShards {

  /**
   * Assemble packed fixed-length sequences from per-document token
   * arrays: within each `groupCol` shard, documents lie end-to-end in
   * `orderCol` order (the [[Sampling.packSequences]] assignment);
   * sequence k of a group holds the group's global token positions
   * [k·seqLen, (k+1)·seqLen). Returns (groupCol, seq_id, tokens —
   * exactly seqLen ints, boundaries — the in-sequence positions where
   * a NEW document starts, ascending). Boundary semantics are the
   * loss/attention-mask metadata packed pretraining needs: a document
   * CONTINUING from the previous sequence is not a boundary (its mask
   * break happened where it started). Each group's trailing PARTIAL
   * sequence drops — the fixed-shape convention; the dropped token
   * count is the stated packing waste, bounded by seqLen per group.
   *
   * Shape: one window cumsum per group (the packSequences shuffle),
   * one token explode, one (group, seq) aggregate holding ≤ seqLen
   * entries of state per sequence — never a global sort.
   */
  def assembleSequences(
      df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "assembleSequences: seqLen must be positive")
    assemblePacked(
      Sampling.packSequences(
        df.withColumn("__n", size(col(tokensCol))).where(col("__n") > 0),
        groupCol, orderCol, "__n", seqLen.toLong)
        .withColumn("__start",
          col("seq_id") * seqLen + col("tok_offset")),
      groupCol, tokensCol, seqLen)
  }

  /** The assembly half over an ALREADY-PACKED layout (rows carrying
    * `__start` = each doc's global token position) — callers that need
    * the layout for their own addressing (multimodal slot references)
    * compute `packSequences` once and share it instead of paying the
    * pack window twice. */
  private[operators] def assemblePacked(
      packed: DataFrame, groupCol: String, tokensCol: String,
      seqLen: Int): DataFrame = {
    val tokRows = packed
      .select(col(groupCol), col("__start"),
        posexplode(col(tokensCol)).as(Seq("__i", "__tok")))
      .select(col(groupCol),
        expr(s"(__start + __i) div ${seqLen}L").as("seq_id"),
        expr(s"(__start + __i) % ${seqLen}L").cast("int").as("__ip"),
        col("__tok").cast("int").as("__tok"))
    val filled = tokRows
      .groupBy(col(groupCol), col("seq_id"))
      .agg(count(lit(1)).as("__c"),
        array_sort(collect_list(struct(col("__ip"), col("__tok"))))
          .as("__st"))
      .where(col("__c") === seqLen) // the partial tail drops
      .select(col(groupCol), col("seq_id"),
        transform(col("__st"), e => e.getField("__tok")).as("tokens"))
    val bounds = packed
      .select(col(groupCol),
        expr(s"__start div ${seqLen}L").as("seq_id"),
        expr(s"__start % ${seqLen}L").cast("int").as("__b"))
      .groupBy(col(groupCol), col("seq_id"))
      .agg(array_sort(collect_list(col("__b"))).as("boundaries"))
    filled.join(bounds, Seq(groupCol, "seq_id"), "left")
      .select(col(groupCol), col("seq_id"), col("tokens"),
        coalesce(col("boundaries"),
          array().cast("array<int>")).as("boundaries"))
  }

  /**
   * Write assembled sequences as binary shards + index: each record is
   * `seqLen` int32-LE tokens; a shard holds its hash partition's
   * records in (group, seq_id) order; each attempt stages to an
   * attempt-unique `.inprogress-<id>` file then renames (the
   * writeWetShards commit discipline — retried/speculated attempts
   * never share a write handle). Returns the INDEX as an eager
   * DataFrame (shard_file, record_idx, group, seq_id, boundaries) —
   * the sidecar that makes any sequence one positioned read of
   * `seqLen·4` bytes. Persist it next to the shards; it is the
   * artifact's catalog.
   */
  def writeTokenShards(
      seqs: DataFrame, groupCol: String, outDir: String,
      seqLen: Int, numShards: Int): DataFrame = {
    val spark = seqs.sparkSession
    import spark.implicits._
    require(numShards > 0, "writeTokenShards: numShards must be positive")
    val conf = spark.sparkContext.broadcast(
      new graft.sources.Warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    seqs
      .select(col(groupCol).cast("string").as("g"), col("seq_id"),
        col("tokens"), col("boundaries"))
      .as[(String, Long, Seq[Int], Seq[Int])]
      .repartition(numShards, col("g"), col("seq_id"))
      .sortWithinPartitions(col("g"), col("seq_id"))
      .mapPartitions { iter =>
        if (iter.isEmpty) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val name = f"tokens-${tc.partitionId()}%05d.bin"
          val dest = new org.apache.hadoop.fs.Path(outDir, name)
          val tmp = new org.apache.hadoop.fs.Path(outDir,
            s"$name.inprogress-${tc.taskAttemptId()}")
          val fs = dest.getFileSystem(conf.value.value)
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(tmp, true)))
          val rows = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, String, Long, Seq[Int])]
          var idx = 0L
          try {
            iter.foreach { case (g, seq, toks, bnd) =>
              require(toks.length == seqLen,
                s"writeTokenShards: record must hold exactly $seqLen " +
                  s"tokens, got ${toks.length} for ($g, $seq)")
              val bb = java.nio.ByteBuffer.allocate(seqLen * 4)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
              toks.foreach(bb.putInt)
              out.write(bb.array())
              rows += ((dest.toString, idx, g, seq, bnd))
              idx += 1
            }
          } finally out.close()
          if (fs.exists(dest)) fs.delete(dest, false)
          fs.rename(tmp, dest)
          rows.iterator
        }
      }
      .toDF("shard_file", "record_idx", "group", "seq_id", "boundaries")
      .localCheckpoint(true) // eager: shards exist when this returns
  }

  /**
   * Read indexed records back: one open stream per shard per task,
   * records fetched by POSITIONED reads of their `seqLen·4`-byte slots
   * in ascending offset order (the fetchSpans shape) — reading a
   * 10-sequence sample from a million-record shard touches 10 slots,
   * never the shard. Returns (group, seq_id, tokens, boundaries).
   */
  /**
   * Takedown for the terminal artifact: every record of the retracted
   * GROUPS leaves the binary shards PHYSICALLY — shard files containing
   * any retracted record are rewritten without them (survivors keep
   * their relative order, record_idx reassigned contiguously; the
   * rewrite is the writer's own atomic `.inprogress` → rename
   * discipline), untouched shard files are not even opened, and the
   * original affected files are DELETED only after the new index rows
   * have materialized (a crash before the delete leaves both versions
   * readable and the retry idempotent). Returns the new index; persist
   * it as the artifact's catalog exactly like [[writeTokenShards]]'s.
   *
   * Group granularity is the honest unit here: packing lays documents
   * end-to-end per group, so removing one DOCUMENT means re-packing its
   * group anyway — callers needing that run [[assembleSequences]] over
   * the retained corpus for the affected groups and retract the group's
   * old records with this.
   */
  def retractGroups(
      spark: SparkSession, index: DataFrame, groups: Seq[String],
      seqLen: Int): DataFrame = {
    import spark.implicits._
    val gset = groups.toSet
    val affectedFiles = index
      .where(col("group").cast("string").isin(groups: _*))
      .select(col("shard_file")).distinct()
      .as[String].collect().toSet
    if (affectedFiles.isEmpty) return index
    val conf = spark.sparkContext.broadcast(
      new graft.sources.Warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    val gsetB = spark.sparkContext.broadcast(gset)
    val rewritten = index
      .where(col("shard_file").isin(affectedFiles.toSeq: _*))
      .select(col("shard_file"), col("record_idx"),
        col("group").cast("string"), col("seq_id"), col("boundaries"))
      .as[(String, Long, String, Long, Seq[Int])]
      .repartition(col("shard_file"))
      .sortWithinPartitions(col("shard_file"), col("record_idx"))
      .mapPartitions { iter =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, String, Long, Seq[Int])]
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        var os: java.io.DataOutputStream = null
        var tmpPath: org.apache.hadoop.fs.Path = null
        var destPath: org.apache.hadoop.fs.Path = null
        var idx = 0L
        // a mid-partition death (truncated shard, task kill, speculation
        // cancel) must not leak handles or an .inprogress orphan — the
        // readTokenShards completion-listener discipline, both handles
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            if (os != null) { try os.close() catch { case _: Exception => () } }
            if (in != null) { try in.close() catch { case _: Exception => () } }
            if (curFile != null && tmpPath != null)
              try tmpPath.getFileSystem(conf.value.value)
                .delete(tmpPath, false)
              catch { case _: Exception => () }
          })
        def finishFile(): Unit = if (curFile != null) {
          os.close(); os = null
          in.close(); in = null
          val fs = destPath.getFileSystem(conf.value.value)
          if (idx == 0L) fs.delete(tmpPath, false) // fully-retracted shard
          else {
            if (fs.exists(destPath)) fs.delete(destPath, false)
            // Hadoop rename signals failure by RETURNING false; the
            // originals are deleted after this task, so a silent false
            // here would lose the surviving records — fail the task
            require(fs.rename(tmpPath, destPath),
              s"retractGroups: rename $tmpPath -> $destPath failed")
          }
          curFile = null
        }
        def startFile(file: String): Unit = {
          val src = new org.apache.hadoop.fs.Path(file)
          val fs = src.getFileSystem(conf.value.value)
          in = fs.open(src)
          destPath = new org.apache.hadoop.fs.Path(file + ".purged")
          val tc = org.apache.spark.TaskContext.get()
          tmpPath = new org.apache.hadoop.fs.Path(
            file + s".purged.inprogress-${tc.taskAttemptId()}")
          os = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(fs.create(tmpPath, true)))
          curFile = file
          idx = 0L
        }
        iter.foreach { case (file, rec, g, seq, bnd) =>
          if (file != curFile) { finishFile(); startFile(file) }
          if (!gsetB.value.contains(g)) {
            val buf = new Array[Byte](seqLen * 4)
            in.readFully(rec * seqLen * 4L, buf)
            os.write(buf)
            out += ((destPath.toString, idx, g, seq, bnd))
            idx += 1
          }
        }
        finishFile()
        out.iterator
      }
      .toDF("shard_file", "record_idx", "group", "seq_id", "boundaries")
      // eager: the new files and index rows must exist BEFORE the
      // originals are deleted below
      .localCheckpoint(true)
    val hconf = spark.sessionState.newHadoopConf()
    affectedFiles.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(hconf)
      if (fs.exists(p)) fs.delete(p, false)
    }
    index.where(!col("shard_file").isin(affectedFiles.toSeq: _*))
      .select(col("shard_file"), col("record_idx"), col("group"),
        col("seq_id"), col("boundaries"))
      // the rewrite pipeline rides a typed Dataset with group AS STRING;
      // cast it back to the caller's group type so the union does not
      // silently widen the untouched rows' schema
      .unionByName(rewritten.withColumn("group",
        col("group").cast(index.schema("group").dataType)))
  }

  def readTokenShards(
      spark: SparkSession, index: DataFrame, seqLen: Int): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.broadcast(
      new graft.sources.Warc.SerializableHadoopConf(
        spark.sessionState.newHadoopConf()))
    index
      .select(col("shard_file"), col("record_idx"),
        col("group").cast("string"), col("seq_id"), col("boundaries"))
      .as[(String, Long, String, Long, Seq[Int])]
      .repartition(col("shard_file"))
      .sortWithinPartitions(col("shard_file"), col("record_idx"))
      .mapPartitions { iter =>
        var curFile: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def close(): Unit = if (in != null) { in.close(); in = null }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close()))
        iter.map { case (file, rec, g, seq, bnd) =>
          if (file != curFile) {
            close()
            val p = new org.apache.hadoop.fs.Path(file)
            in = p.getFileSystem(conf.value.value).open(p)
            curFile = file
          }
          val buf = new Array[Byte](seqLen * 4)
          in.readFully(rec * seqLen * 4L, buf)
          val bb = java.nio.ByteBuffer.wrap(buf)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val toks = Array.fill(seqLen)(bb.getInt()).toSeq
          (g, seq, toks, bnd)
        }
      }
      .toDF("group", "seq_id", "tokens", "boundaries")
  }
}
