package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class PerplexitySpec extends SparkSuite {
  import spark.implicits._

  test("pplBuckets: reference-slice scores rank docs, terciles assigned") {
    // reference = docs 1..2 ("good" words); doc 3 repeats reference words,
    // doc 4 is wholly out-of-reference (every token takes the Laplace
    // floor), doc 5 is empty (floor score by definition)
    val docs = Seq(
      (1L, "aa bb aa cc", "ref"),
      (2L, "aa bb dd dd", "ref"),
      (3L, "aa aa bb bb", "web"),
      (4L, "zz yy xx ww", "web"),
      (5L, "", "web")
    ).toDF("doc_id", "text", "src")
    val out = Perplexity.pplBuckets(docs, "doc_id", "text", col("src") === "ref")
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) ->
      (r.getDouble(1), r.getLong(2), r.getString(3))).toMap
    // hand check doc 4: every token unseen -> log10(1/(T+V));
    // T = 8 reference tokens, V = 8 distinct corpus tokens
    val floor = math.log10(1.0 / 16.0)
    assert(math.abs(byId(4L)._1 - floor) < 1e-6, byId(4L).toString)
    assert(byId(4L)._2 == 4L)
    // doc 5 has no tokens: floor score, n_toks 0
    assert(math.abs(byId(5L)._1 - floor) < 1e-6)
    assert(byId(5L)._2 == 0L)
    // doc 3 (all high-count reference tokens) outranks docs 4/5
    assert(byId(3L)._1 > byId(4L)._1)
    // tercile labels: the two floor-score docs are the tail third
    assert(byId(4L)._3 == "tail" && byId(5L)._3 == "tail", byId.toString)
    assert(byId(3L)._3 == "head", byId.toString)
    // every doc gets exactly one row and a bucket
    assert(out.length == 5)
    assert(out.forall(r => Set("head", "middle", "tail")(r.getString(3))))
  }

  test("pplBuckets: empty reference slice still scores (all-floor)") {
    val docs = Seq((1L, "aa bb", "web"), (2L, "cc", "web"))
      .toDF("doc_id", "text", "src")
    val out = Perplexity.pplBuckets(docs, "doc_id", "text", col("src") === "ref")
      .orderBy("doc_id").collect()
    // T = 0, V = 3 -> every token scores log10(1/3)
    val floor = BigDecimal(math.log10(1.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.forall(r => math.abs(r.getDouble(1) - floor) < 1e-9),
      out.mkString(","))
  }
}
