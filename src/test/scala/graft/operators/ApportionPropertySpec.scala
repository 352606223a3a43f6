package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/**
 * Property check for the Hamilton apportionment's distributed cutoff
 * formulation: for ARBITRARY host/score tables and budgets, the result
 * must equal a 20-line driver-side reference implementation of the
 * largest-remainder method exactly — per key, not just in total. The
 * hand-written fixtures cover two shapes; the generator finds remainder
 * ties, zero scores, single hosts, and budgets far above and below the
 * host count, each of which stresses the cutoff-row selection the
 * two-pass ranking performs.
 */
class ApportionPropertySpec extends SparkSuite {
  import spark.implicits._

  /** Driver-side reference: floor shares + leftover to the largest
    * remainders, ties by key ascending — the textbook method. */
  private def reference(scores: Seq[(String, Long)],
      budget: Long): Map[String, Long] = {
    val tot = scores.map(_._2).sum
    val base = scores.map { case (k, s) => k -> (s * budget) / tot }
    val rem = scores.map { case (k, s) => k -> (s * budget) % tot }
    val leftover = budget - base.map(_._2).sum
    val plusOne = rem.sortBy { case (k, r) => (-r, k) }
      .take(leftover.toInt).map(_._1).toSet
    base.map { case (k, b) =>
      k -> (b + (if (plusOne(k)) 1L else 0L))
    }.toMap
  }

  private val genCase: Gen[(List[(String, Long)], Long)] = for {
    n <- Gen.choose(1, 60)
    keys = (0 until n).map(i => f"h$i%03d")
    scores <- Gen.sequence[List[Long], Long](
      keys.map(_ => Gen.choose(0L, 50L)).toList)
    // at least one positive score (an all-zero total is the loud-error arm)
    fixed = if (scores.sum == 0) scores.updated(0, 1L) else scores
    budget <- Gen.choose(1L, 500L)
  } yield (keys.zip(fixed).toList, budget)

  test("apportionBudget equals the reference largest-remainder method") {
    val prop = Prop.forAll(genCase) { case (scores, budget) =>
      val got = Frontier.apportionBudget(
          scores.toDF("host", "mass"), "host", "mass", budget)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
      val want = reference(scores, budget)
      (got == want) :| s"got=$got want=$want budget=$budget" &&
        (got.values.sum == budget) :| "sum must equal the budget"
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(result.passed, result.status.toString)
  }

  test("cutoff inside a massive remainder tie (adversarial range skew)") {
    // every host has the SAME score, so every remainder is identical and
    // repartitionByRange((__rem desc, key)) has a single range value to
    // split on — the worst skew the two-pass cutoff can see. The +1 set
    // must still be exactly the first `leftover` keys in key order.
    val n = 500
    val scores = (0 until n).map(i => (f"h$i%04d", 7L)).toList
    val budget = 1234L // base 2 each, leftover 234 inside the tie run
    val got = Frontier.apportionBudget(
        scores.toDF("host", "mass"), "host", "mass", budget)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val want = reference(scores, budget)
    assert(got == want)
    assert(got.values.sum == budget)
  }
}
