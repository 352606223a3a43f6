package graft.bde

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/**
 * The property SURVEY §5 calls the diff engine's strongest check:
 * `apply(diff(a, b), a) == b` — for ARBITRARY table pairs, applying the
 * classified difference of two snapshots to the first must reproduce the
 * second exactly, and the difference must mention only keys that really
 * changed. Randomized tables exercise the null-safe compare (null vs
 * value, null vs null), inserts, deletes, updates, and no-ops in every
 * combination a generator finds — the hand-written fixtures cannot
 * enumerate those.
 */
class DiffPropertySpec extends SparkSuite {
  import spark.implicits._

  private type Tbl = Map[Long, (Option[Int], String)]

  private val genTable: Gen[Tbl] = for {
    keys <- Gen.someOf(1L to 24L)
    rows <- Gen.sequence[List[(Long, (Option[Int], String))], (Long, (Option[Int], String))](
      keys.toList.map { k =>
        for {
          a <- Gen.option(Gen.choose(0, 3))
          b <- Gen.oneOf("x", "y", "z")
        } yield k -> (a, b)
      })
  } yield rows.toMap

  /** Mutate `base` into a related snapshot: drop / keep / modify / add. */
  private val genPair: Gen[(Tbl, Tbl)] = for {
    base <- genTable
    kept <- Gen.someOf(base.keys.toList)
    mods <- Gen.sequence[List[(Long, (Option[Int], String))], (Long, (Option[Int], String))](
      kept.toList.map { k =>
        for {
          modify <- Gen.prob(0.5)
          a <- Gen.option(Gen.choose(0, 3))
          b <- Gen.oneOf("x", "y", "z")
        } yield k -> (if (modify) (a, b) else base(k))
      })
    added <- genTable.map(_.view.filterKeys(k => !base.contains(k)).toMap)
  } yield (base, mods.toMap ++ added)

  private def df(t: Tbl): DataFrame =
    t.toSeq.map { case (k, (a, b)) => (k, a.map(Integer.valueOf).orNull, b) }
      .toDF("k", "a", "b")

  private def materialize(d: DataFrame): Tbl =
    d.collect().map { r =>
      r.getLong(0) -> (
        (if (r.isNullAt(1)) None else Some(r.getInt(1))), r.getString(2))
    }.toMap

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("fullDiff round-trip: apply(diff(a, b), a) == b, minimally") {
    run(Prop.forAllNoShrink(genPair) { case (cur, next) =>
      val (curDf, nextDf) = (df(cur), df(next))
      val actions = Diff.fullDiff(curDf, nextDf, "k")
      val acts = actions.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val applied = materialize(Diff.applyActions(curDf, nextDf, actions, "k"))
      val unchanged = cur.keySet.intersect(next.keySet)
        .filter(k => cur(k) == next(k))
      (applied == next) :| s"apply mismatch: $applied vs $next" &&
        (acts.keySet.intersect(unchanged).isEmpty) :|
          s"diff mentioned unchanged keys: $acts" &&
        (acts.filter(_._2 == "I").keySet == next.keySet.diff(cur.keySet)) :|
          "inserts are exactly the right-only keys" &&
        (acts.filter(_._2 == "D").keySet == cur.keySet.diff(next.keySet)) :|
          "deletes are exactly the left-only keys"
    })
  }

  test("classifyChanges: full change set reproduces b; empty set is a no-op") {
    run(Prop.forAllNoShrink(genPair) { case (cur, next) =>
      val (curDf, nextDf) = (df(cur), df(next))
      val allKeys = (cur.keySet ++ next.keySet).toSeq.toDF("k")
      val full = Diff.classifyChanges(curDf, nextDf, allKeys, "k")
      val appliedFull = materialize(Diff.applyActions(curDf, nextDf, full, "k"))
      val none = Diff.classifyChanges(curDf, nextDf,
        Seq.empty[Long].toDF("k"), "k")
      val appliedNone = materialize(Diff.applyActions(curDf, nextDf, none, "k"))
      (appliedFull == next) :| s"full change set must land on b: $appliedFull" &&
        (appliedNone == cur) :| s"empty change set must be a no-op: $appliedNone"
    })
  }
}
