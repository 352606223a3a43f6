package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one forked test JVM). */
object SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // match the runtime posture: bucketed index scans keep bucket pruning
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    // match Bench.scala: the FileContext-based default forks a process per
    // checkpoint temp-file create/rename on local filesystems
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing." +
        "FileSystemBasedCheckpointFileManager")
    // match Bench.scala: local file creates without fork/exec chmod
    .config("spark.hadoop.fs.file.impl",
      "graft.fs.NoChmodLocalFileSystem")
    .getOrCreate()
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.spark
}
