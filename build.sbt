ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "linzbdeuploaderspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The harness that drives `sbt "runMain graft.Bench"` parses the bench's
// one-line JSON from stdout; the default LoggedOutput strategy prefixes
// every forked line with `[info] `, which broke that parse (round-17
// PERF: prev/now_bench_ok both false with the JSON present only as an
// sbt log line). StdoutOutput inherits the child's stdout unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ---- parallel test JVMs ------------------------------------------------
// One forked JVM ran all ~80 suites sequentially at local[4]: ~26 min of
// the driver's budget on a 32-core host (round 17's gates were cut off by
// exactly that budget). Suites are split across N forked JVMs run
// concurrently; each group gets its OWN spark warehouse dir (bucketed
// index tables are the only cross-suite shared location — everything
// else is per-test temp dirs), so groups are fully isolated.
val testGroups = 8
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = (Test / forkOptions).value
  val base = (Test / target).value
  // spread the long-running suites first, one per group, then deal the
  // rest round-robin by name — keeps group walls within ~2x of even
  val heavy = Seq(
    "graft.PlanAuditSpec", "graft.streaming.StreamResumeSpec",
    "graft.operators.OperatorsSpec", "graft.operators.PipelineOpsSpec",
    "graft.bde.OrchestratorSpec", "graft.operators.SuffixArraySpec",
    "graft.operators.GraphSpec", "graft.operators.DedupIndexSpec",
    "graft.operators.RetractSpec", "graft.sources.WarcSpec",
    "graft.operators.GeoIndexSpec", "graft.bde.LoaderSpec")
  val (hd, rest) = tests.partition(t => heavy.contains(t.name))
  val ordered = hd.sortBy(t => heavy.indexOf(t.name)) ++ rest.sortBy(_.name)
  ordered.zipWithIndex.groupBy(_._2 % testGroups).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      val opts = forkOpts.withRunJVMOptions(forkOpts.runJVMOptions ++
        Vector(s"-Dspark.sql.warehouse.dir=$base/test-warehouse-$i",
          s"-Dspark.local.dir=$base/test-spark-local-$i"))
      Tests.Group(s"group$i", ts.map(_._1), Tests.SubProcess(opts))
    }
}
// sbt caps concurrently running forked test groups at 1 by default;
// raise it to the group count (each group's session is local[4], so
// 6 groups use ~24 of the 32 cores at full fan-out)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(16),
  Tags.limit(Tags.ForkedTestGroup, testGroups))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A many-query session compiles hundreds of unique generated classes
  // (whole-stage codegen); the JDK default 240 MB code cache fills
  // mid-run, and the flush→re-profile→recompile churn was measured at
  // 21% of the whole bench's process CPU (407 of 1951 CPU-s in the
  // per-query jit_secs column) with compile threads competing with task
  // threads — the round-17 "randomly shifting victims" signature. Plain
  // JVM sizing for this workload, not a data-path change.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
// measurement hook (profiling runs set e.g. -Dspark.eventLog.enabled=true);
// empty in normal and driver runs
javaOptions ++= sys.env.get("GRAFT_EXTRA_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
