package graft.bde

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * S5/S6 — table sinks with "dataset transaction" atomicity (SURVEY §7.4b):
 * every write stages a complete new table version to its own directory,
 * then publishes it by atomically re-pointing a tiny `_CURRENT` manifest
 * (write-temp + rename, atomic on POSIX and HDFS). Readers resolve the
 * manifest first, so they always see a complete version — a failed or
 * aborted load leaves the previous version untouched, which is the Spark
 * equivalent of the reference's per-dataset transaction + rollback
 * (`beginDataset`/`endDataset`, lib/LINZ/BdeDatabase.pm:455-510) and of the
 * truncate-and-replace swap (`bde_ApplyLevel0Update`, sql:1949-1973).
 *
 * At 100 TB the staged write is a normal distributed parquet write (all
 * executors), and publish cost is one metadata rename — no data is ever
 * rewritten to swap versions.
 */
final class ParquetTableSink(
    spark: SparkSession,
    rootDir: String,
    val table: String) {

  private val tableDir = new Path(s"$rootDir/$table")
  private val currentPtr = new Path(tableDir, "_CURRENT")
  private def fs = tableDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The currently-published version directory name, if any. */
  def currentVersion: Option[String] = {
    val f = fs
    if (!f.exists(currentPtr)) None
    else {
      val in = f.open(currentPtr)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (s.isEmpty) None else Some(s)
      } finally in.close()
    }
  }

  def exists: Boolean = currentVersion.isDefined

  /** Read the published table version. */
  def read(): DataFrame = {
    val v = currentVersion.getOrElse(
      throw new IllegalStateException(s"table $table has no published version"))
    spark.read.parquet(new Path(tableDir, v).toString)
  }

  /** Stage a complete new version; returns its name (NOT yet published). */
  def stage(df: DataFrame, version: String): String = {
    val name = s"v_$version"
    df.write.mode("overwrite").parquet(new Path(tableDir, name).toString)
    name
  }

  /** Read a staged (not yet published) version — e.g. for the pre-publish
    * tolerance gate. */
  def readStaged(stagedName: String): DataFrame =
    spark.read.parquet(new Path(tableDir, stagedName).toString)

  /** Atomically publish a staged version: temp manifest + OVERWRITE rename.
    * A single `FileContext.rename(..., Rename.OVERWRITE)` replaces the
    * pointer in one atomic metadata op — there is never an instant with no
    * published version (a delete-then-rename window would make a concurrent
    * reader see the table vanish and a crash strand it pointerless). */
  def publish(stagedName: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val qTableDir = fs.makeQualified(tableDir)
    val fc = FileContext.getFileContext(qTableDir.toUri, conf)
    val tmp = new Path(qTableDir, s"_CURRENT.tmp.$stagedName")
    val out = fc.create(tmp,
      java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try out.write(stagedName.getBytes("UTF-8")) finally out.close()
    fc.rename(tmp, new Path(qTableDir, "_CURRENT"), Options.Rename.OVERWRITE)
  }

  /** Stage + publish in one step (truncate-and-replace semantics). */
  def replace(df: DataFrame, version: String): Unit =
    publish(stage(df, version))

  /** Drop an unpublished staged version (abort path). */
  def discard(stagedName: String): Unit = {
    fs.delete(new Path(tableDir, stagedName), true)
    ()
  }
}
