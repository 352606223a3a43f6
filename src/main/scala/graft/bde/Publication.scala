package graft.bde

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.schema.{MessageType, MessageTypeParser}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * S8 — logical-replication publish of the control tables, Spark-first.
 *
 * The reference registers every `bde_control` table in a PostgreSQL logical
 * publication (`CREATE PUBLICATION all_bde_control` + add-missing-tables
 * loop, `bin/linz-bde-uploader-schema-publish.pl:57-94`) so downstream
 * subscribers replicate upload metadata as it commits. The Spark-native
 * equivalent of a replication slot is an APPEND-ONLY CHANGELOG that a
 * Structured Streaming file source can tail:
 *
 *  - every [[Control]] mutation (when publishing is enabled) appends one
 *    immutable parquet file per mutated table under
 *    `<controlDir>/publication/<table>/`, holding the I/U/D delta vs the
 *    previously published state, stamped with a monotonically increasing
 *    `seq`;
 *  - [[subscribe]] returns the live subscription: `spark.readStream` over
 *    that directory — new commit files become new micro-batch rows, the
 *    moral equivalent of a logical-replication subscriber;
 *  - [[changes]] is the batch view of the same log, and [[replay]] folds it
 *    back into current table state (last write per key wins, 'D' drops the
 *    key), which must equal — and in the verify suite is checked against —
 *    the live control table.
 *
 * Scale: control tables hold thousands of rows over years of loads
 * (SURVEY §2.1 S7), so each delta is a driver-side ~KB parquet write (the
 * same posture as [[ControlStore]]); subscribers read only new files, and
 * replay is one window aggregation over the log.
 */
object Publication {

  /** The reference's publication name, kept for parity. */
  val Name = "all_bde_control"

  /** Every control table is published — the add-missing-tables loop. */
  val Tables: Seq[String] = Seq("upload", "upload_table", "upload_stats")

  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  def publicationDir(controlDir: String): String = s"$controlDir/publication"
  def tableDir(controlDir: String, table: String): String =
    s"${publicationDir(controlDir)}/$table"

  // ---- changelog schemas: control schema + (seq, op) --------------------

  private def changeSchema(body: String): MessageType =
    MessageTypeParser.parseMessageType(
      s"message change {\n  required int64 seq;\n  required binary op (STRING);\n$body}")

  private[bde] val UploadChangeSchema = changeSchema(
    """  required int32 id;
      |  required binary schema_name (STRING);
      |  required binary status (STRING);
      |""".stripMargin)

  private[bde] val TableChangeSchema = changeSchema(
    """  required int32 id;
      |  required binary schema_name (STRING);
      |  required binary table_name (STRING);
      |  required int32 last_upload_id;
      |  required binary last_upload_dataset (STRING);
      |  required binary last_upload_type (STRING);
      |  required binary last_level0_dataset (STRING);
      |  required boolean last_upload_incremental;
      |  required binary last_upload_details (STRING);
      |  required int32 upl_id_lock;
      |""".stripMargin)

  private[bde] val StatsChangeSchema = changeSchema(
    """  required int32 id;
      |  required int32 upl_id;
      |  required int32 tbl_id;
      |  required binary dataset (STRING);
      |  required binary type (STRING);
      |  required boolean incremental;
      |  required int64 ninsert;
      |  required int64 nupdate;
      |  required int64 nnullupdate;
      |  required int64 ndelete;
      |""".stripMargin)

  /** Spark-side read schemas (what [[subscribe]]/[[changes]] expose). */
  def readSchema(table: String): StructType = table match {
    case "upload" => StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("schema_name", StringType, nullable = false),
      StructField("status", StringType, nullable = false)))
    case "upload_table" => StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("schema_name", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("last_upload_id", IntegerType, nullable = false),
      StructField("last_upload_dataset", StringType, nullable = false),
      StructField("last_upload_type", StringType, nullable = false),
      StructField("last_level0_dataset", StringType, nullable = false),
      StructField("last_upload_incremental", BooleanType, nullable = false),
      StructField("last_upload_details", StringType, nullable = false),
      StructField("upl_id_lock", IntegerType, nullable = false)))
    case "upload_stats" => StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("id", IntegerType, nullable = false),
      StructField("upl_id", IntegerType, nullable = false),
      StructField("tbl_id", IntegerType, nullable = false),
      StructField("dataset", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("incremental", BooleanType, nullable = false),
      StructField("ninsert", LongType, nullable = false),
      StructField("nupdate", LongType, nullable = false),
      StructField("nnullupdate", LongType, nullable = false),
      StructField("ndelete", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"table '$other' is not in publication $Name (tables: ${Tables.mkString(", ")})")
  }

  // ---- batch + streaming subscribers ------------------------------------

  /** Batch view of one table's changelog (empty frame when nothing has been
    * published yet — a subscriber created before the first commit). */
  def changes(spark: SparkSession, controlDir: String, table: String): DataFrame = {
    val schema = readSchema(table)
    val dir = new Path(tableDir(controlDir, table))
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir))
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dir.toString)
  }

  /** The live subscription: a streaming frame over the changelog directory.
    * Commit files are written once and never modified, so the file source's
    * new-file listing is exactly the replication stream. Run with
    * `Trigger.AvailableNow` to drain the backlog, or continuously to tail. */
  def subscribe(spark: SparkSession, controlDir: String, table: String): DataFrame =
    spark.readStream
      .schema(readSchema(table))
      .option("maxFilesPerTrigger", "64")
      .parquet(tableDir(controlDir, table))

  /** Fold the changelog into current table state: last change per key wins
    * (seq is the commit order), a trailing 'D' drops the key. Replaying a
    * subscription must reproduce the live control table. */
  def replay(spark: SparkSession, controlDir: String, table: String): DataFrame = {
    val w = Window.partitionBy(col("id")).orderBy(col("seq").desc)
    changes(spark, controlDir, table)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= OpDelete)
      .drop("__rn", "seq", "op")
  }
}

/**
 * The writer half: owned by a [[Control]] with publishing enabled. Computes
 * per-table I/U/D deltas against the last published snapshot and appends one
 * immutable commit file per mutation. Restart-safe: the snapshot re-seeds
 * from the existing changelog (its own [[Publication.replay]] fold), so a
 * resumed process continues the seq chain instead of re-publishing history.
 */
private[bde] final class PublicationWriter(conf: Configuration, controlDir: String) {

  import Control._
  import Publication._

  private var seq: Long = 0L
  private var lastUploads = Map.empty[Int, UploadRow]
  private var lastTables = Map.empty[Int, UploadTableRow]
  private var lastStats = Map.empty[Int, UploadStatsRow]

  // Re-seed snapshot + seq from any existing changelog (driver-side read of
  // KB-scale files; same posture as Control's own state reload).
  locally {
    def files(table: String): Seq[Path] = {
      val dir = new Path(tableDir(controlDir, table))
      val fs = dir.getFileSystem(conf)
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    }
    def fold[T](table: String)(mk: Group => (Long, String, Int, T)): Map[Int, T] = {
      var state = Map.empty[Int, T]
      files(table).foreach { p =>
        ControlStore.read(conf, p.toString).getOrElse(Seq.empty).foreach { g =>
          val (s, op, id, row) = mk(g)
          seq = math.max(seq, s)
          state = if (op == OpDelete) state - id else state + (id -> row)
        }
      }
      state
    }
    def str(g: Group, f: String): String = g.getString(f, 0)
    lastUploads = fold("upload") { g =>
      (g.getLong("seq", 0), str(g, "op"), g.getInteger("id", 0),
        UploadRow(g.getInteger("id", 0), str(g, "schema_name"),
          new java.sql.Timestamp(0), new java.sql.Timestamp(0), str(g, "status")))
    }
    def opt(i: Int): Option[Int] = if (i < 0) None else Some(i)
    def optS(s: String): Option[String] = if (s.isEmpty) None else Some(s)
    lastTables = fold("upload_table") { g =>
      (g.getLong("seq", 0), str(g, "op"), g.getInteger("id", 0),
        UploadTableRow(g.getInteger("id", 0), str(g, "schema_name"),
          str(g, "table_name"), opt(g.getInteger("last_upload_id", 0)),
          optS(str(g, "last_upload_dataset")), optS(str(g, "last_upload_type")),
          optS(str(g, "last_level0_dataset")),
          g.getBoolean("last_upload_incremental", 0),
          str(g, "last_upload_details"), opt(g.getInteger("upl_id_lock", 0))))
    }
    lastStats = fold("upload_stats") { g =>
      (g.getLong("seq", 0), str(g, "op"), g.getInteger("id", 0),
        UploadStatsRow(g.getInteger("id", 0), g.getInteger("upl_id", 0),
          g.getInteger("tbl_id", 0), str(g, "dataset"), str(g, "type"),
          g.getBoolean("incremental", 0), g.getLong("ninsert", 0),
          g.getLong("nupdate", 0), g.getLong("nnullupdate", 0),
          g.getLong("ndelete", 0)))
    }
  }

  /** Publish the delta of one mutated table. `rows` is the table's full
    * post-mutation state; the diff vs the published snapshot yields the
    * change records. Timestamps are intentionally NOT part of the upload
    * delta identity (heartbeats bump end_time every few seconds; publishing
    * each would flood the log — the reference's subscriber-visible signal is
    * the status transitions, sql/01-bde_control_tables.sql:43-50). */
  def publishUploads(rows: Seq[UploadRow]): Unit = {
    val delta = diff(lastUploads, rows.map(r => r.id -> r).toMap)(
      (a, b) => a.schemaName == b.schemaName && a.status == b.status)
    if (delta.nonEmpty) {
      append("upload", UploadChangeSchema, delta) { case (g, op, u) =>
        g.add("op", op); g.add("id", u.id)
        g.add("schema_name", u.schemaName); g.add("status", u.status)
      }
      lastUploads = rows.map(r => r.id -> r).toMap
    }
  }

  def publishTables(rows: Seq[UploadTableRow]): Unit = {
    val next = rows.map(r => r.id -> r).toMap
    val delta = diff(lastTables, next)((a, b) => a == b)
    if (delta.nonEmpty) {
      append("upload_table", TableChangeSchema, delta) { case (g, op, t) =>
        g.add("op", op); g.add("id", t.id)
        g.add("schema_name", t.schemaName); g.add("table_name", t.tableName)
        g.add("last_upload_id", t.lastUploadId.getOrElse(-1))
        g.add("last_upload_dataset", t.lastUploadDataset.getOrElse(""))
        g.add("last_upload_type", t.lastUploadType.getOrElse(""))
        g.add("last_level0_dataset", t.lastLevel0Dataset.getOrElse(""))
        g.add("last_upload_incremental", t.incremental)
        g.add("last_upload_details", t.lastUploadDetails)
        g.add("upl_id_lock", t.uplIdLock.getOrElse(-1))
      }
      lastTables = next
    }
  }

  def publishStats(rows: Seq[UploadStatsRow]): Unit = {
    val next = rows.map(r => r.id -> r).toMap
    val delta = diff(lastStats, next)((a, b) => a == b)
    if (delta.nonEmpty) {
      append("upload_stats", StatsChangeSchema, delta) { case (g, op, s) =>
        g.add("op", op); g.add("id", s.id)
        g.add("upl_id", s.uplId); g.add("tbl_id", s.tblId)
        g.add("dataset", s.dataset); g.add("type", s.level)
        g.add("incremental", s.incremental)
        g.add("ninsert", s.ninsert); g.add("nupdate", s.nupdate)
        g.add("nnullupdate", s.nnullupdate); g.add("ndelete", s.ndelete)
      }
      lastStats = next
    }
  }

  /** I for new keys, U for changed rows (under `same`), D for vanished. */
  private def diff[T](last: Map[Int, T], next: Map[Int, T])(
      same: (T, T) => Boolean): Seq[(String, T)] = {
    val ins = (next.keySet -- last.keySet).toSeq.sorted
      .map(id => (Publication.OpInsert, next(id)))
    val upd = next.keysIterator.filter(id =>
        last.get(id).exists(prev => !same(prev, next(id))))
      .toSeq.sorted.map(id => (Publication.OpUpdate, next(id)))
    val del = (last.keySet -- next.keySet).toSeq.sorted
      .map(id => (Publication.OpDelete, last(id)))
    ins ++ upd ++ del
  }

  /** One immutable commit file per mutation: write to a hidden
    * `.chg-….tmp`, rename into place — neither the streaming file source
    * nor a concurrent batch read ever lists a partial commit (Spark's path
    * filter hides dot-prefixed files, so the staged tmp is invisible even
    * while being written). */
  private def append[T](table: String, schema: MessageType,
      delta: Seq[(String, T)])(fill: (Group, String, T) => Unit): Unit = {
    seq += 1
    val commitSeq = seq
    ControlStore.write(conf,
      s"${tableDir(controlDir, table)}/chg-${"%012d".format(commitSeq)}.parquet",
      schema, delta) { case (s, (op, row)) =>
        val g = new SimpleGroup(s)
        g.add("seq", commitSeq)
        fill(g, op, row)
        g
      }
  }
}
