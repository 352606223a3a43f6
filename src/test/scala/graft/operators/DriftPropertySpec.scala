package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/**
 * Property check for the integer-ppm drift arithmetic: for ARBITRARY
 * token corpora the Spark plan must equal a plain-Scala reference that
 * recomputes tokenization, joint counts, integer-division ppm, and the
 * TVD fold from first principles — plus the metric's own laws (symmetry,
 * zero on identical slices, the ppm-resolution bound of 10⁶).
 */
class DriftPropertySpec extends SparkSuite {
  import spark.implicits._

  private val genDocs: Gen[List[String]] = for {
    n <- Gen.choose(1, 15)
    docs <- Gen.listOfN(n, for {
      m <- Gen.choose(0, 12)
      toks <- Gen.listOfN(m, Gen.oneOf("a", "b", "cc", "ddd", "e1", "f"))
    } yield toks.mkString(" "))
  } yield docs

  private def refSummary(a: List[String], b: List[String]): (Long, Long, Long, Long) = {
    def counts(docs: List[String]): Map[String, Long] =
      docs.flatMap(_.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (ca, cb) = (counts(a), counts(b))
    val vocab = (ca.keySet ++ cb.keySet).toList
    val (na, nb) = (ca.values.sum, cb.values.sum)
    val s = vocab.map { t =>
      val pa = if (na == 0) 0L else ca.getOrElse(t, 0L) * 1000000L / na
      val pb = if (nb == 0) 0L else cb.getOrElse(t, 0L) * 1000000L / nb
      math.abs(pa - pb)
    }.sum
    (na, nb, vocab.size.toLong, s / 2)
  }

  private def df(docs: List[String]) =
    docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("summary equals a first-principles reference; symmetric; bounded") {
    val prop = Prop.forAllNoShrink(genDocs, genDocs) { (a, b) =>
      // the operator needs at least one token per side (n_a/n_b > 0)
      (a.exists(_.trim.nonEmpty) && b.exists(_.trim.nonEmpty)) ==> {
        val row = Drift.summary(df(a), df(b), "text").collect().head
        val got = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"),
          row.getAs[Long]("vocab"), row.getAs[Long]("tvd_ppm"))
        val want = refSummary(a, b)
        val sym = Drift.summary(df(b), df(a), "text").collect().head
          .getAs[Long]("tvd_ppm")
        (got == want) :| s"got $got want $want" &&
          (sym == got._4) :| s"asymmetric: $sym vs ${got._4}" &&
          (got._4 >= 0L && got._4 <= 1000000L) :| s"out of range: ${got._4}"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
