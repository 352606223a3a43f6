package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/**
 * Property check for the union+window as-of join: against a brute-force
 * in-memory reference ("the latest right value with rts <= lts per key"),
 * for arbitrary event sets — same-timestamp matches (inclusive bound),
 * keys with no history (null), multiple probes between two build rows,
 * and build-only keys, in whatever combinations the generator finds.
 */
class AsOfPropertySpec extends SparkSuite {
  import spark.implicits._

  private val genCase: Gen[(List[(Long, Long, Long)], Map[(Long, Long), Long])] =
    for {
      nl <- Gen.choose(0, 20)
      left <- Gen.listOfN(nl, for {
        k <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 30L)
      } yield (k, ts))
      rightKeys <- Gen.someOf(for { k <- 1L to 4L; ts <- 0L to 30L by 3L }
        yield (k, ts))
      vals <- Gen.listOfN(rightKeys.size, Gen.choose(100L, 999L))
    } yield (
      left.zipWithIndex.map { case ((k, ts), i) => (i.toLong, k, ts) },
      rightKeys.zip(vals).toMap)

  test("asofJoin equals the brute-force latest-at-or-before reference") {
    val prop = Prop.forAllNoShrink(genCase) { case (leftRows, rightMap) =>
      val left = leftRows.toDF("id", "k", "ts")
      val right = rightMap.toSeq.map { case ((k, ts), v) => (k, ts, v) }
        .toDF("k", "ts", "v")
      val got = AsOf.asofJoin(left, right, "k", "ts", "ts", "v")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(3)) None else Some(r.getLong(3))))
        .toMap
      val want = leftRows.map { case (id, k, lts) =>
        val cand = rightMap.keys.filter { case (rk, rts) =>
          rk == k && rts <= lts }
        id -> (if (cand.isEmpty) None
               else Some(rightMap(cand.maxBy(_._2))))
      }.toMap
      (got == want) :| s"asof mismatch: got $got want $want"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
