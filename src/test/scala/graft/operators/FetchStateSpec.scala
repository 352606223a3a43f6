package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The durable crawl-cycle stores: per-cycle state transition semantics
  * that the loop oracle exercises end-to-end, pinned here piecewise. */
class FetchStateSpec extends SparkSuite {
  import spark.implicits._

  private def freshDb(): String = {
    val db = s"fs_spec_${System.nanoTime()}"
    Bucketing.scratchDb(spark, db,
      java.nio.file.Files.createTempDirectory(db).toString)
    db
  }

  private def stateRows(rows: Seq[(String, String, String, Long, String)]) =
    rows.toDF("url", "etag", "last_modified", "fetch_time", "digest")

  test("state index: append accumulates releases, probe sees the latest") {
    val db = freshDb()
    val tbl = s"$db.state"
    FetchState.writeStateIndex(
      stateRows(Seq(("u1", "e1", "lm1", 1L, "d1"),
        ("u2", "e2", null, 1L, "d2"))), tbl, buckets = 2)
    FetchState.appendState(
      stateRows(Seq(("u1", "e1b", null, 2L, "d1b"))), tbl)
    val out = FetchState.conditionalFetchPlanIndexed(
        Seq("u1", "u2", "u3").toDF("url"), spark, tbl)
      .select("url", "if_none_match", "if_modified_since", "conditional")
      .orderBy("url").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getString(2),
      r.getBoolean(3))).toSeq === Seq(
      ("u1", "e1b", null, true), // release 2 supersedes release 1
      ("u2", "e2", null, true),
      ("u3", null, null, false))) // never fetched: unconditional
  }

  test("commitCycle: tail merge, discovery dedup, no resurrection") {
    val db = freshDb()
    val fTbl = s"$db.frontier"
    val stTbl = s"$db.state"
    FetchState.writeFrontierStore(
      Seq((1L, "u1", 5.0), (2L, "u2", 4.0), (3L, "u3", 3.0))
        .toDF("id", "url", "priority"), fTbl, buckets = 2)
    FetchState.writeStateIndex(
      stateRows(Seq(("u0", "e0", null, 0L, "d0"))), stTbl, buckets = 2)
    // cycle fetches u1 and u2; discoveries: u3 again (already deferred,
    // higher priority claimed), u4 (novel), u0 (fetched in a PRIOR
    // cycle — must not resurrect), u1 (fetched THIS cycle — ditto)
    val scheduled = Seq((1L, "u1"), (2L, "u2")).toDF("id", "url")
    val fetched = stateRows(Seq(("u1", "e1", null, 10L, "d1"),
      ("u2", "e2", null, 10L, "d2")))
    val discovered = Seq(
      (3L, "u3", 9.0), (4L, "u4", 1.0), (7L, "u0", 8.0), (8L, "u1", 8.0))
      .toDF("id", "url", "priority")
    FetchState.commitCycle(spark, fTbl, stTbl, scheduled, fetched, discovered)
    val tail = spark.table(fTbl).orderBy("url").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // u3 keeps its id (min(3, 3)) with the max claimed priority; u4 is
    // novel; u0/u1/u2 stay out
    assert(tail === Seq((3L, "u3", 9.0), (4L, "u4", 1.0)))
    // the cycle's fetches landed in the state index
    val st = spark.table(stTbl).where(col("fetch_time") === 10L)
      .select("url").orderBy("url").collect().map(_.getString(0)).toSeq
    assert(st === Seq("u1", "u2"))
  }

  test("multi-cycle evolution equals a sequential simulation on random inputs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.Prop.propBoolean
    val urls = (0 until 10).map(i => s"u$i")
    val genEntry = for {
      u <- Gen.oneOf(urls)
      id <- Gen.choose(0L, 99L)
      p <- Gen.choose(0, 9).map(_.toDouble)
    } yield (id, u, p)
    val genCase = for {
      seed <- Gen.nonEmptyListOf(genEntry)
      cycles <- Gen.listOfN(3, for {
        cand <- Gen.someOf(urls) // scheduled = cand ∩ current frontier
        disc <- Gen.listOf(genEntry)
      } yield (cand.toSet, disc))
    } yield (seed, cycles)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAllNoShrink(genCase) { case (seed, cycles) =>
        val db = freshDb()
        val fTbl = s"$db.frontier"
        val stTbl = s"$db.state"
        // sequential model: frontier url → (min id, max priority), seen set
        var model = seed.groupBy(_._2).map { case (u, rows) =>
          u -> (rows.map(_._1).min, rows.map(_._3).max)
        }
        var seen = Set.empty[String]
        FetchState.writeFrontierStore(
          model.toSeq.map { case (u, (id, p)) => (id, u, p) }
            .toDF("id", "url", "priority"), fTbl, buckets = 2)
        FetchState.writeStateIndex(stateRows(Nil), stTbl, buckets = 2)
        var ok = true
        var t = 0L
        cycles.foreach { case (cand, disc) =>
          t += 1
          val sched = model.keySet.intersect(cand).toSeq.sorted
          val schedDf = sched.map(u => (model(u)._1, u)).toDF("id", "url")
          val fetched = stateRows(sched.map(u => (u, s"e$u", null, t, s"d$u")))
          val discDf = disc.toDF("id", "url", "priority")
          FetchState.commitCycle(spark, fTbl, stTbl, schedDf, fetched, discDf)
          // model transition
          seen ++= sched
          val tail = model -- sched
          val novel = disc.filterNot(d => seen(d._2))
          model = (tail.toSeq.map { case (u, (id, p)) => (id, u, p) } ++ novel)
            .groupBy(_._2).map { case (u, rows) =>
              u -> (rows.map(_._1).min, rows.map(_._3).max)
            }
          val got = spark.table(fTbl).collect()
            .map(r => r.getString(1) -> (r.getLong(0), r.getDouble(2))).toMap
          ok = ok && got == model
        }
        ok :| s"frontier diverged from the sequential model"
      })
    assert(res.passed, res.status.toString)
  }

  test("commitCycle: rerunnable after a crashed frontier swap") {
    val db = freshDb()
    val fTbl = s"$db.frontier"
    val stTbl = s"$db.state"
    FetchState.writeFrontierStore(
      Seq((1L, "u1", 5.0), (2L, "u2", 4.0)).toDF("id", "url", "priority"),
      fTbl, buckets = 2)
    FetchState.writeStateIndex(
      stateRows(Nil), stTbl, buckets = 2)
    // simulate the widest crash window: live renamed aside, new copy not
    // yet in place (exactly what replaceBucketed's midSwapFault covers)
    spark.sql(s"ALTER TABLE $fTbl RENAME TO ${fTbl}__old")
    // the next cycle's entry self-heals before reading
    Bucketing.recoverCompaction(spark, fTbl)
    val scheduled = Seq((1L, "u1")).toDF("id", "url")
    FetchState.commitCycle(spark, fTbl, stTbl, scheduled,
      stateRows(Seq(("u1", "e1", null, 1L, "d1"))),
      Seq.empty[(Long, String, Double)].toDF("id", "url", "priority"))
    assert(spark.table(fTbl).collect().map(_.getString(1)).toSeq === Seq("u2"))
  }
}
