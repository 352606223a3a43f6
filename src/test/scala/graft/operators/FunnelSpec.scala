package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class FunnelSpec extends SparkSuite {

  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("funnel requires a strictly increasing chain through all stages") {
    val ev = Seq(
      // user 1: full ordered chain
      (1L, "signup", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE click — reaches stage 2 only
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "click", ts(3)),
      // user 3: click before signup doesn't count; the later one does
      (3L, "click", ts(1)), (3L, "signup", ts(2)), (3L, "click", ts(4)),
      // user 4: no signup — never enters the funnel
      (4L, "click", ts(1)), (4L, "purchase", ts(2)),
      // user 5: click at the SAME instant as signup — strict order fails
      (5L, "signup", ts(1)), (5L, "click", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val got = Funnel.funnelCounts(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "signup", 4L),    // users 1, 2, 3, 5
      (2L, "click", 3L),     // users 1, 2 (late click), 3 — not 5
      (3L, "purchase", 1L))) // user 1 only: 2's purchase precedes the click
  }

  test("cohort retention counts each user from their first period") {
    def t(period: Int, off: Int) = new Timestamp(period * 1000_000L + off)
    val ev = Seq(
      // user 1: first in period 0, active again in 1 and 3
      (1L, t(0, 5)), (1L, t(1, 0)), (1L, t(3, 7)), (1L, t(3, 9)),
      // user 2: first in period 1 only
      (2L, t(1, 1)),
      // user 3: first in period 1, active in 2
      (3L, t(1, 2)), (3L, t(2, 2))
    ).toDF("user_id", "ts")
    val got = Retention.cohortRetention(ev, "user_id", "ts",
        periodSeconds = 1000L, maxOffset = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 2L), (1L, 1L, 1L)))
  }

  test("funnelTimes picks the earliest valid completion per stage") {
    val ev = Seq(
      (1L, "signup", ts(5)), (1L, "signup", ts(1)),
      (1L, "click", ts(3)), (1L, "click", ts(8)),
      (1L, "purchase", ts(2)), (1L, "purchase", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val row = Funnel.funnelTimes(ev, "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase")).collect()(0)
    // signup at 1 (earliest), click at 3 (first after 1), purchase at 9
    // (the minute-2 purchase precedes the click and cannot count)
    assert((row.getTimestamp(1), row.getTimestamp(2), row.getTimestamp(3)) ==
      ((ts(1), ts(3), ts(9))))
  }
}
