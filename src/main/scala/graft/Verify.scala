package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS), which the vectorized parquet
      // reader rejects; read it as long nanos and convert where used.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // every bucketed table in this engine is an at-rest index whose scans
      // are probes: keep bucketed reading (and with it bucket PRUNING) even
      // when no downstream operator needs the hash distribution —
      // DisableUnnecessaryBucketedScan would otherwise forfeit the prune
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // see Bench.scala: the FileContext-based default forks a process per
      // checkpoint temp-file create/rename on local filesystems
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "org.apache.spark.sql.execution.streaming.checkpointing." +
          "FileSystemBasedCheckpointFileManager")
      .config("spark.hadoop.fs.file.impl",
        "graft.fs.NoChmodLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration aid: SPARK_GRAFT_ONLY=q1,q2 restricts the dump to the
    // named queries (the driver never sets it, so the gate still runs all)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter(kv => names(kv._1))
      case None        => SparkEntry.queries
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL or a multi-line Spark error
    // message would otherwise make the driver's json.load fail and
    // silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // self-describing run record: per-query ok/failed status, written to
    // the out dir BEFORE the process can die on a later query and rewritten
    // after every query — if the driver-side compare ever fails to produce
    // its artifact (an empty CORRECTNESS file), this manifest plus the
    // parquet dumps still adjudicate what ran. Messages truncate BEFORE
    // escaping so a cut can never split an escape pair.
    val status = scala.collection.mutable.LinkedHashMap[String, String]()
    def writeManifest(): Unit = {
      val body = status.map { case (k, v) => q(k) + ":" + q(v.take(120)) }
        .mkString("{", ",", "}")
      try Files.writeString(Paths.get(s"$outDir/manifest.json"),
        s"""{"n_total":${selected.size},"n_done":${status.size},"status":$body}\n""")
      catch { case _: Throwable => () }
    }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        status(name) = "ok"
      }
      catch { case e: Throwable =>
        status(name) = s"failed: ${e.getMessage}"
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operator builders cache multi-consumed intermediates (LSH
      // signatures, classified actions); release them between queries so an
      // 80-query run never accumulates executor storage
      finally { spark.catalog.clearCache(); writeManifest() }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
