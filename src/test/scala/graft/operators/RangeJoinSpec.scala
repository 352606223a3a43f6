package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class RangeJoinSpec extends SparkSuite {

  import spark.implicits._

  test("point-in-interval: half-open bounds, overlaps surface exactly once") {
    val iv = Seq(
      (1L, 0.0, 10.0),    // [0, 10)
      (2L, 5.0, 64.0),    // spans several grid-8 cells
      (3L, 64.0, 66.0)    // exactly on a cell boundary
    ).toDF("band_id", "lo", "hi")
    val pts = Seq((100L, 0.0), (101L, 5.0), (102L, 9.99), (103L, 10.0),
      (104L, 63.999), (105L, 64.0), (106L, 66.0)).toDF("pid", "v")
    val got = RangeJoin.pointInInterval(pts, "v", iv, "lo", "hi", grid = 8L)
      .select("pid", "band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set(
      (100L, 1L), (101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 2L),             // hi is EXCLUSIVE: 10.0 leaves band 1
      (104L, 2L), (105L, 3L)  // 64.0 leaves band 2, enters band 3
    ), got.toString)           // 106: 66.0 exclusive -> no match
    // a multi-cell overlap appears exactly once per (point, interval)
    val dup = RangeJoin.pointInInterval(pts, "v", iv, "lo", "hi", grid = 8L)
      .groupBy("pid", "band_id").count().where(col("count") > 1).count()
    assert(dup == 0L)
  }

  test("the plan is an equi-join on the grid cell, never a nested loop") {
    val iv = Seq((1L, 0.0, 10.0)).toDF("band_id", "lo", "hi")
    val pts = Seq((100L, 1.0)).toDF("pid", "v")
    val p = RangeJoin.pointInInterval(pts, "v", iv, "lo", "hi", grid = 8L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"the grid decomposition must hash-join:\n$p")
  }

  test("NULL bounds drop; an over-wide interval raises a named error") {
    val iv = Seq(
      (1L, Some(0.0), Some(10.0)),
      (2L, None, Some(5.0)),        // null lo -> dropped
      (3L, Some(1.0), None)         // null hi -> dropped
    ).toDF("band_id", "lo", "hi")
    val pts = Seq((100L, 1.0)).toDF("pid", "v")
    val got = RangeJoin.pointInInterval(pts, "v", iv, "lo", "hi", grid = 8L)
      .select("band_id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L), "null-bounded intervals must match nothing")
    // fan-out tripwire: a 10^9-wide interval at grid=1 must raise the
    // NAMED rangeJoin error, not an opaque sequence-length failure
    val wide = Seq((9L, 0.0, 1.0e9)).toDF("band_id", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "v", wide, "lo", "hi", grid = 1L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("rangeJoin")), msgs(e).mkString("; "))
  }
}
