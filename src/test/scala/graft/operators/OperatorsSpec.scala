package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.{TextOps, VectorOps}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  test("exact dedup groups by content digest, keeps smallest id") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("id", "text")
    val out = Dedup.exact(df, "id", "text")
      .select("kept_id", "n_dups")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L))
  }

  test("keepFirst keeps one full row per duplicate group") {
    val df = Seq((3L, "x", "d1"), (1L, "x", "d2"), (2L, "y", "d3"))
      .toDF("id", "text", "extra")
    val out = Dedup.keepFirst(df, "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(out == Set((1L, "d2"), (2L, "d3")))
  }

  test("minhash LSH finds near-duplicate pairs, exact copies score 1.0") {
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val near = (3 to 30).map(i => s"w$i").mkString(" ")  // 2 tokens dropped
    val far = (1 to 30).map(i => s"z$i").mkString(" ")
    val df = Seq((1L, doc), (2L, doc), (3L, near), (4L, far)).toDF("id", "text")
    val pairs = Dedup.minHashLshPairs(df, "id", "text", minJaccard = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(byPair((1L, 2L)) == 1.0)
    assert(byPair.contains(1L -> 3L) && byPair((1L, 3L)) > 0.8)
    assert(!byPair.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash hamming pairs: identical docs at distance 0, near docs small") {
    val doc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 39).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, doc), (2L, doc), (3L, near)).toDF("id", "text")
    val pairs = Dedup.simHashHammingPairs(df, "id", "text", maxHamming = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Number]("hamming").longValue)
      .toMap
    assert(pairs((1L, 2L)) == 0L)
  }

  test("blocked ngram jaccard: candidates never cross blocks") {
    val doc = (1 to 30).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc, "en"), (2L, doc, "en"), (3L, doc, "de"))
      .toDF("id", "text", "lang")
    val pairs = Dedup.ngramJaccardPairs(df, "id", "text", "lang", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set(1L -> 2L)) // 3 is identical but in another block
  }
}

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)),
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(-1f, 0f, 0f, 0f)),
    (4L, Array(0.95f, 0.05f, 0f, 0f))).toDF("vec_id", "embedding")

  test("bruteForceTopK: exact ranks, deterministic tie-break, k respected") {
    val out = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
      "vec_id", "embedding", 2)
      .orderBy(desc("cosine")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 2)
    assert(out.map(_._2).toSeq == Seq(4L, 1L)) // 0.95-vec closer than 0.9-vec
    assert(out.forall(_._1 == 0L))
    assert(out.head._3 > out(1)._3)
  }

  test("bruteForceTopK matches a window-based reference on random data") {
    val rnd = new scala.util.Random(7)
    val data = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "embedding")
    val queries = data.where(col("vec_id") < 5)
    val got = Similarity.bruteForceTopK(data, queries, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: full scored set + window
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val scored = data.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorOps.cosine(col("qv"), col("embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(desc("cos"), col("vec_id"))
    val want = scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("SRP-LSH pairs: identical vectors always collide; verified by cosine") {
    val out = Similarity.lshNeighborPairs(vecs, "vec_id", "embedding",
      bits = 8, minCosine = 0.9, numTables = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ids = out.map(p => (p._1, p._2)).toSet
    assert(ids.contains(0L -> 4L))          // near-identical direction
    assert(out.forall(_._3 >= 0.9))
    assert(!ids.exists { case (a, b) => a == 3L || b == 3L }) // opposite vec
  }
}

class TextOpsSpec extends SparkSuite {
  import spark.implicits._

  test("polyHash is deterministic and bounded; empty string hashes to 0") {
    val out = Seq("", "abc", "abc", "abd").toDF("s")
      .select(TextOps.polyHash(col("s")).as("h")).collect().map(_.getLong(0))
    assert(out(0) == 0L)
    assert(out(1) == out(2))
    assert(out(1) != out(3))
    assert(out.forall(h => h >= 0 && h < TextOps.TokenMod))
  }

  test("simhash: identical token sets identical prints; prints non-negative") {
    val df = Seq("a b c d e f", "a b c d e f", "q r s t u v").toDF("s")
      .select(TextOps.simHash(
        TextOps.tokenHashesWide(TextOps.tokens(col("s")))).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
    // 63-bit prints use the full positive int64 range (bit 63 never set)
    assert(TextOps.SimHashBits <= 63)
    assert(hs.forall(_ >= 0))
  }

  test("shingles: short docs yield empty arrays; jaccard of disjoint sets is 0") {
    val df = Seq("one two", "one two three four").toDF("s")
      .select(size(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens(col("s"))))).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 2))
  }
}
