package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness (never part of the bench contract or the gate):
  * how much of a stateful streaming query's wall is the STATE-STORE
  * PARTITION COUNT — 31 bench queries pay `spark.sql.shuffle.partitions`
  * state files per operator per micro-batch, pinned at first checkpoint.
  * Runs the same two stateful shapes (session window, stream-stream
  * interval join) over the same slice at several shuffle-partition
  * settings, each in a FRESH session at the same core count, and prints
  * one line per (partitions, rep). The bench itself must not vary this
  * knob (contract: partitions = cpus); this harness supplies the
  * measurement VERDICT r17 item 7 asked for before any decision. */
object StreamStateRehearsal {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val settings = Seq(32, 8, 2)
    val reps = 3
    for (p <- settings; rep <- 1 to reps) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", p)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.streaming.checkpointFileManagerClass",
          "org.apache.spark.sql.execution.streaming.checkpointing." +
            "FileSystemBasedCheckpointFileManager")
        .config("spark.hadoop.fs.file.impl",
          "graft.fs.NoChmodLocalFileSystem")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        val t0 = System.nanoTime()
        val n1 = graft.streaming.Streams
          .userSessions(spark, s"$sfDir/events.parquet").count()
        val t1 = System.nanoTime()
        val n2 = graft.streaming.Streams
          .clickAttribution(spark, s"$sfDir/events.parquet").count()
        val t2 = System.nanoTime()
        println(f"[state-rehearsal] partitions=$p%2d rep=$rep " +
          f"sessions=${(t1 - t0) / 1e9}%.2fs (rows=$n1) " +
          f"interval_join=${(t2 - t1) / 1e9}%.2fs (rows=$n2)")
      } finally spark.stop()
    }
  }
}
