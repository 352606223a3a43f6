package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/**
 * Property check for the split (histogram + driver walk + boundary
 * window) token-budget selection: for ARBITRARY score/token tables and
 * budgets it must equal the one-line reference — a single ordered cumsum
 * over (bucket desc, id) admitting while `cum <= budget` — exactly the
 * independent formulation the DuckDB oracle states. Random inputs
 * exercise what the hand fixtures cannot: bucket collisions (equal
 * scores), zero-token docs, budgets landing exactly on bucket edges, and
 * empty inputs.
 */
class SelectionPropertySpec extends SparkSuite {
  import spark.implicits._

  private val genRows: Gen[List[(Long, Double, Long)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      // coarse score grid on purpose: forces many same-bucket collisions
      s <- Gen.choose(0, 10).map(_ / 10.0)
      t <- Gen.choose(0L, 30L)
    } yield (s, t))
  } yield rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }

  private def bucketOf(s: Double): Long =
    math.min(math.floor(BigDecimal(s).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble * 65536).toLong, 65535L)

  private def reference(
      rows: List[(Long, Double, Long)], budget: Long): Set[Long] =
    rows.sortBy { case (id, s, _) => (-bucketOf(s), id) }
      .scanLeft((0L, 0L)) { case ((_, cum), (id, _, t)) => (id, cum + t) }
      .tail.takeWhile(_._2 <= budget).map(_._1).toSet

  test("selectTokenBudget equals the ordered-cumsum reference on random data") {
    val prop = Prop.forAllNoShrink(
      genRows, Gen.choose(0L, 600L)) { (rows, budget) =>
      val got = Selection.selectTokenBudget(
          rows.toDF("id", "score", "ntok"), "id", col("score"), col("ntok"),
          budget)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = reference(rows, budget)
      (got == want) :| s"budget=$budget got=$got want=$want rows=$rows"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }
}
