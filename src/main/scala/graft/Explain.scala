package graft
import org.apache.spark.sql.SparkSession

/** Plan-capture aid for the optimization rounds: dumps
  * `.explain("formatted")` for the named queries (or all) to
  * `<outDir>/<query>.txt`. Never part of the bench or the gate — the
  * explain runs analysis/optimization only, no jobs execute beyond what
  * an operator's builder itself materializes (index builds memoize, so
  * the dumped plan is the PROBE plan, same as the bench's timed shape). */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/out")
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      .config("spark.hadoop.fs.file.impl",
        "graft.fs.NoChmodLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (names.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(names.toSet).toMap
    selected.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Path.of(s"$outDir/$name.txt"), plan)
        println(s"[explain] $name ok (${plan.linesIterator.size} lines)")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
