package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.TextOps

/** Sliding-window chunking and the prefix-filtered exact Jaccard join. */
class ChunkPrefixSpec extends SparkSuite {

  import spark.implicits._

  test("slidingChunks: boundaries, tail chunk, empty doc, digest") {
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")), // starts 0,16,32
      (2L, "a b c d e"),                              // one short chunk
      (3L, "")                                        // no rows
    ).toDF("doc_id", "text")
    val got = Chunking.slidingChunks(docs, "doc_id", "text", 32, 16)
      .orderBy("doc_id", "chunk_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 32L), (1L, 1L, 16L, 24L), (1L, 2L, 32L, 8L),
      (2L, 0L, 0L, 5L)))

    // digest = sequential fold of the chunk's token hashes
    val th = docs.where($"doc_id" === 2L)
      .select(TextOps.tokenHashes(TextOps.tokens($"text")))
      .collect()(0).getSeq[Long](0)
    val want = th.foldLeft(0L)((a, h) => (a * 131L + h) % TextOps.HashMod)
    val gotHash = Chunking.slidingChunks(docs, "doc_id", "text", 32, 16)
      .where($"doc_id" === 2L).select($"chunk_hash").collect()(0).getLong(0)
    assert(gotHash == want)
  }

  test("slidingChunks: overlap — stride tokens apart, shared middle") {
    val docs = Seq((1L, (1 to 20).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = Chunking.slidingChunks(docs, "doc_id", "text", 8, 4)
      .orderBy("chunk_id").collect()
    // starts 0,4,8,12,16; all but the last full-length
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 4L, 8L, 12L, 16L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(8L, 8L, 8L, 8L, 4L))
  }

  test("jaccardPrefixPairs: complete vs brute-force all-pairs") {
    // small corpus with planted near-dups: base docs + copies with the
    // first two tokens dropped (high shingle overlap), plus unrelated docs
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").limit(40)
    val toks = TextOps.tokens($"text")
    val mutated = base.select(($"doc_id" + 1000).as("doc_id"),
      when(size(toks) > 2, array_join(slice(toks, lit(3), size(toks) - 2), " "))
        .otherwise($"text").as("text"))
    val corpus = base.unionByName(mutated)
    val t = 0.6

    val got = Dedup.jaccardPrefixPairs(corpus, "doc_id", "text", t)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

    // brute force: exact Jaccard over ALL pairs, no filtering at all
    val sets = corpus.select($"doc_id",
      array_sort(array_distinct(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens($"text"))))).as("ss"))
      .where(size($"ss") > 0)
    val inter = size(array_intersect($"a.ss", $"b.ss"))
    val want = sets.as("a").crossJoin(sets.as("b"))
      .where($"a.doc_id" < $"b.doc_id")
      .where(inter.cast("double") /
        (size($"a.ss") + size($"b.ss") - inter).cast("double") >= lit(t))
      .select($"a.doc_id", $"b.doc_id").as[(Long, Long)].collect().toSet

    assert(want.nonEmpty, "fixture must plant at least one near-dup pair")
    assert(got == want, "prefix filtering must be exact: no false " +
      s"negatives or positives (missing=${(want -- got).take(5)}, " +
      s"extra=${(got -- want).take(5)})")
  }

  test("quota_per_source: caps each source at N with contiguous ranks") {
    val out = graft.SparkEntry.queries("quota_per_source")(
      spark, "/root/testdata/sf0.001")
      .select($"source", $"rank").as[(String, Long)].collect()
    out.groupBy(_._1).foreach { case (_, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks.size <= 20)
      assert(ranks == (1L to ranks.size).toSeq, "ranks contiguous from 1")
    }
  }
}
