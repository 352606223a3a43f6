package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Two-stage LSH→edit-distance near-dup confirmation + host-scoped
  * template-line detection. */
class EditConfirmSpec extends SparkSuite {
  import spark.implicits._

  test("editConfirmPairs verifies LSH candidates with exact edit similarity") {
    // 1↔2: one word swapped in a 12-word text -> high edit sim, shares
    // 11/13 shingles -> LSH candidate. 1↔3: unrelated -> no pair at all.
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"
    val c = "one two three four five six seven eight nine ten eleven twelve"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.editConfirmPairs(df, "doc_id", "text", minSim = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, 1L)), out.mkString(","))
  }

  test("editConfirmPairs edit_sim is normalized by the LONGER text") {
    // identical except a 6-char suffix appended: lev = 6, max len = len(b)
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = a + " omega"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val row = Dedup.editConfirmPairs(df, "doc_id", "text", minSim = 0.5)
      .select(col("lev"), col("edit_sim")).collect().head
    assert(row.getLong(0) == 6L)
    val expect = BigDecimal(1.0 - 6.0 / b.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(1) == expect, row.toString)
  }

  test("editConfirmPairs threshold drops low-similarity candidates") {
    // same shingle overlap as the passing pair above, but the swapped word
    // is long -> many edits; with minSim very high the pair is rejected
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda supercalifragilistic"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val out = Dedup.editConfirmPairs(df, "doc_id", "text", minSim = 0.95)
    assert(out.count() == 0L)
  }

  test("editConfirmPairs counts CHARACTERS, not bytes (the Spark contract)") {
    // é is 2 UTF-8 bytes but one character: swapping e->é is ONE edit.
    // A byte-counting engine (DuckDB) would report 2 — the Scaladoc's
    // ASCII-only oracle caveat, pinned here instead.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = Seq((1L, base + " e"), (2L, base + " é")).toDF("doc_id", "text")
    val row = Dedup.editConfirmPairs(df, "doc_id", "text", minSim = 0.5)
      .select(col("lev")).collect().head
    assert(row.getLong(0) == 1L, row.toString)
  }

  test("hostTemplateLines flags per-host repeats, not cross-host singles") {
    val df = Seq(
      (1L, "h1", "nav one\nbody a\nquote q"),
      (2L, "h1", "nav one\nbody b"),
      (3L, "h1", "nav one\nbody c"),
      (4L, "h2", "nav two\nbody d\nquote q"),
      (5L, "h2", "nav two\nbody e"),
      (6L, "h2", "nav two\nbody f"),
      (7L, "h3", "quote q\nbody g")
    ).toDF("doc_id", "host", "text")
    val out = Dedup.hostTemplateLines(df, "doc_id", "text", "host", minDocs = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // "quote q" occurs in 3 docs GLOBALLY but once per host -> not template
    assert(out == Set(("h1", "nav one", 3L), ("h2", "nav two", 3L)), out.toString)
  }

  test("hostTemplateLines counts DISTINCT docs (within-doc repeats are one)") {
    val df = Seq(
      (1L, "h", "x\nx\nx"),
      (2L, "h", "x\ny")
    ).toDF("doc_id", "host", "text")
    val out = Dedup.hostTemplateLines(df, "doc_id", "text", "host", minDocs = 3)
    assert(out.count() == 0L)
  }

  test("hostTemplateStrip removes template lines per host, reassembles") {
    val df = Seq(
      (1L, "h1", "nav\nbody a"),
      (2L, "h1", "nav\nbody b"),
      (3L, "h1", "nav\nbody c"),
      (4L, "h2", "nav\nbody d")   // "nav" on h2: 1 doc -> kept there
    ).toDF("doc_id", "host", "text")
    val out = Dedup.hostTemplateStrip(df, "doc_id", "text", "host", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "body a", 2L -> "body b", 3L -> "body c",
      4L -> "nav\nbody d"), out.toString)
  }

  test("hostTemplateStrip drops documents reduced to nothing") {
    val df = Seq(
      (1L, "h", "nav"), (2L, "h", "nav"), (3L, "h", "nav\nkeep")
    ).toDF("doc_id", "host", "text")
    val out = Dedup.hostTemplateStrip(df, "doc_id", "text", "host", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(3L -> "keep"), out.toString)
  }
}
