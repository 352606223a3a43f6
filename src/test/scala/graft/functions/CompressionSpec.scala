package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-14 (cont.): compression-ratio quality signal — the JVM Deflater
  * under test must land on the canonical zlib's byte counts (literals from
  * the independent CPython reference, tools/zlib_reference.py). */
class CompressionSpec extends SparkSuite {

  import spark.implicits._

  test("deflate_len matches the independent CPython zlib byte-for-byte") {
    val corpus = Seq(
      (1, "a" * 200, 200L, 12L),
      (2, "the quick brown fox jumps over the lazy dog. " * 10, 450L, 57L),
      (3, "k9G2mX7qLpZ4wN8vB1cR5tY0uJ6hD3fS", 32L, 40L),
      (4, "", 0L, 8L),
      (5, "héllo wörld — 你好世界 " * 8, 248L, 44L),
      (6, "x", 1L, 9L),
      (7, "{\"id\": 1, \"tags\": [\"a\", \"b\"], \"ok\": true}\n" * 25,
        1050L, 55L))
    val got = corpus.map(c => (c._1, c._2)).toDF("case_id", "text")
      .select(col("case_id"), octet_length(col("text")).cast("long"),
        QualityOps.deflateLen(col("text")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.sortBy(_._1) == corpus.map(c => (c._1, c._3, c._4)))
  }

  test("ratio: repetition compresses, noise doesn't; empty is null; null propagates") {
    val df = Seq((1, "spark " * 500), (2, "k9G2mX7qLpZ4wN8vB1cR5tY0uJ6hD3fS"),
        (3, "")).toDF("id", "text")
      .select(col("id"), QualityOps.compressionRatio(col("text")).as("r"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(df(1).get < 0.02, s"repetitive must crush: ${df(1)}")
    assert(df(2).get > 1.0, s"incompressible must exceed 1: ${df(2)}")
    assert(df(3).isEmpty)
    val n = Seq((1, Option.empty[String])).toDF("id", "text")
      .select(QualityOps.deflateLen(col("text"))).collect().head
    assert(n.isNullAt(0))
  }

  test("level parameter: stored (0) never beats default (6)") {
    val row = Seq(Tuple1("the quick brown fox " * 50)).toDF("text")
      .select(QualityOps.deflateLen(col("text"), level = 0),
        QualityOps.deflateLen(col("text"), level = 6))
      .collect().head
    assert(row.getLong(0) > row.getLong(1))
  }
}
