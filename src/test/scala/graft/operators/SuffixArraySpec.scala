package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/** Prefix-doubling suffix ranks vs a naive sort-all-suffixes reference
  * (UTF-8 byte order, code-point windows — nothing shared with the
  * distributed dense-rank machinery). */
class SuffixArraySpec extends SparkSuite {
  import spark.implicits._

  /** Dense 0-based ranks of EVERY (id, pos), each suffix compared by its
    * first `window` code points, as UTF-8 bytes (Spark string order and
    * DuckDB binary collation; Java String.compareTo is UTF-16 order,
    * which differs for astral vs some BMP characters). */
  private def naive(
      docs: Seq[(Long, String)], window: Int): Set[(Long, Long, Long)] = {
    val ord = new Ordering[String] {
      def compare(a: String, b: String): Int = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
    }
    val sufs = docs.flatMap { case (id, text) =>
      val cps = text.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      cps.indices.map(p =>
        (id, p.toLong, cps.slice(p, p + window).mkString))
    }
    val ranks = sufs.map(_._3).distinct.sorted(ord).zipWithIndex.toMap
    sufs.map { case (id, p, s) => (id, p, ranks(s).toLong) }.toSet
  }

  private def run(df: Seq[(Long, String)], window: Int): Set[(Long, Long, Long)] =
    SuffixArray.suffixRanks(df.toDF("id", "text"), "id", "text", window)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("ranks equal the naive reference; ties across docs share a rank") {
    val docs = Seq((1L, "banana"), (2L, "ananas"), (3L, ""), (4L, "b"))
    assert(run(docs, 16) == naive(docs, 16))
    // "ana(na)" ties: suffix "ana" of doc1 pos 3 vs... window-bounded
    // equal strings must share a dense rank
    val tied = Seq((1L, "xyz"), (2L, "xyz"))
    val got = run(tied, 16)
    assert(got == naive(tied, 16))
    val pos0 = got.toSeq.filter(_._2 == 0L)
    assert(pos0.size == 2 && pos0.map(_._3).distinct.size == 1)
  }

  test("window bound truncates comparisons (shorter window merges ranks)") {
    val docs = Seq((1L, "abcX"), (2L, "abcY"))
    // window 3: both pos-0 suffixes compare as "abc" — same rank
    val w3 = run(docs, 3).toSeq.filter(_._2 == 0L)
    assert(w3.size == 2 && w3.map(_._3).distinct.size == 1)
    assert(run(docs, 3) == naive(docs, 3))
    // window 4 separates them
    val w4 = run(docs, 4).toSeq.filter(_._2 == 0L)
    assert(w4.map(_._3).distinct.size == 2)
    assert(run(docs, 4) == naive(docs, 4))
    // every position gets a suffix — the window bounds COMPARISONS, it
    // does not truncate the document
    val deep = run(Seq((1L, "abcdef")), 3)
    assert(deep.map(_._2) == (0L to 5L).toSet)
    assert(deep == naive(Seq((1L, "abcdef")), 3))
  }

  test("astral code points: one position per code point, UTF-8 order") {
    val x = new String(Character.toChars(0x1D54F)) // 4 UTF-8 bytes, F0…
    val docs = Seq((1L, s"a${x}b"))
    val got = run(docs, 8)
    assert(got == naive(docs, 8))
    // UTF-8 byte order: "a𝕏b" < "b" < "𝕏b" (0x61 < 0x62 < 0xF0)
    assert(got == Set((1L, 0L, 0L), (1L, 2L, 1L), (1L, 1L, 2L)))
  }

  test("rankChecksums folds every rank; topSuffixes returns the array head") {
    val docs = Seq((1L, "abab"), (2L, "ba")).toDF("id", "text")
    val ranks = SuffixArray.suffixRanks(docs, "id", "text", 8)
    val cks = SuffixArray.rankChecksums(ranks, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // suffixes: abab(0) ab(2) b(3) bab(1) / ba(0) a(1) →
    // sorted: a=0 ab=1 abab=2 b=3 ba=4 bab=5
    // doc1: 2*1 + 5*2 + 1*3 + 3*4 = 27; doc2: 4*1 + 0*2 = 4
    assert(cks == Seq((1L, 4L, 27L), (2L, 2L, 4L)))
    val top = SuffixArray.topSuffixes(ranks, docs, "id", "text", 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    assert(top == Seq((0L, 2L, 1L, "a"), (1L, 1L, 2L, "ab"),
      (2L, 1L, 0L, "abab")))
  }

  test("repeatedWindows finds exactly the multiply-occurring substrings") {
    // 3-cp windows: "aba" at (1,0),(1,2),(2,0) — 3 occurrences, 2 docs;
    // "bab" at (1,1),(2,1) — 2 occurrences, 2 docs; everything else once
    val docs = Seq((1L, "ababa"), (2L, "abab"), (3L, "zzz")).toDF("id", "text")
    val got = SuffixArray.repeatedWindows(
        SuffixArray.suffixRanks(docs, "id", "text", 3), docs, "id", "text", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("aba", 3L, 2L), ("bab", 2L, 2L)))
  }

  test("repeatedPositions: exactly the cross-document repeated-window positions") {
    // 3-cp windows: "aba" at (1,0),(1,2),(2,0) and "bab" at (1,1),(2,1)
    // cross documents; "zzz" repeats only WITHIN doc 3 — excluded (the
    // cross-doc rule: a window must occur in MORE THAN ONE document)
    val docs = Seq((1L, "ababa"), (2L, "abab"), (3L, "zzzz")).toDF("id", "text")
    val got = SuffixArray.repeatedPositions(
        SuffixArray.suffixRanks(docs, "id", "text", 3), docs, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 0L), (1L, 1L), (1L, 2L), (2L, 0L), (2L, 1L)))
  }

  test("exciseRepeated: cuts exactly the covered spans; clean docs untouched") {
    val docs = Seq((1L, "ababa"), (2L, "abab"), (3L, "zzzz"), (4L, "xxabay"))
      .toDF("id", "text")
    val got = SuffixArray.exciseRepeated(
        SuffixArray.suffixRanks(docs, "id", "text", 3), docs, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // doc1/doc2: every position sits in a cross-doc-repeated 3-cp window
    // -> fully excised (empty string, not a dropped row); doc3 repeats
    // only WITHIN itself -> untouched; doc4: "aba" covers chars 2..4,
    // "xx" and "y" survive
    assert(got == Set(
      (1L, "", 5L), (2L, "", 4L), (3L, "zzzz", 0L), (4L, "xxy", 3L)))
  }

  test("writeRankIndex: the persisted artifact equals the in-session ranks") {
    val wh = java.nio.file.Files.createTempDirectory("suffix_idx_spec").toString
    Bucketing.scratchDb(spark, "suffix_idx_spec", wh)
    val docs = Seq((1L, "ababa"), (2L, "abab"), (3L, "zzz")).toDF("id", "text")
    SuffixArray.writeRankIndex(docs, "id", "text", 3,
      "suffix_idx_spec.ranks", buckets = 4)
    val at = spark.table("suffix_idx_spec.ranks")
    assert(at.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet == run(Seq((1L, "ababa"), (2L, "abab"), (3L, "zzz")), 3))
    // bucketed (and sorted) on rank — the heavy consumer's groupBy key
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("suffix_idx_spec.ranks"))
      .bucketSpec.getOrElse(fail("rank index must be bucketed"))
    assert(spec.numBuckets == 4 && spec.bucketColumnNames == Seq("rank"))
    // probes through the artifact return exactly the in-session results
    val got = SuffixArray.repeatedWindows(at, docs, "id", "text", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("aba", 3L, 2L), ("bab", 2L, 2L)))
    // rebuild-per-release: a second write over a grown corpus replaces the
    // artifact (ranks are corpus-global — no per-document append exists)
    val grown = docs.unionByName(Seq((4L, "abz")).toDF("id", "text"))
    SuffixArray.writeRankIndex(grown, "id", "text", 3,
      "suffix_idx_spec.ranks", buckets = 4)
    assert(spark.table("suffix_idx_spec.ranks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      run(Seq((1L, "ababa"), (2L, "abab"), (3L, "zzz"), (4L, "abz")), 3))
  }

  test("sharded consumers equal the monolithic rebuild on arbitrary corpora") {
    // tiny alphabet forces repeats; random 2-way shard split — the
    // corpus-level answers must be invariant to how releases cut it
    val genDoc = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genCase = for {
      nDocs <- Gen.choose(2, 10)
      docs <- Gen.listOfN(nDocs, genDoc)
      window <- Gen.choose(2, 5)
      split <- Gen.listOfN(nDocs, Gen.oneOf(0L, 1L))
    } yield (docs.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      window, split)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10),
      Prop.forAllNoShrink(genCase) { case (docs, window, split) =>
        val db = s"sfx_prop_${System.nanoTime()}"
        Bucketing.scratchDb(spark, db,
          java.nio.file.Files.createTempDirectory(db).toString)
        val tbl = s"$db.sharded"
        val df = docs.toDF("id", "text")
        val byShard = docs.zip(split).groupBy(_._2)
          .view.mapValues(_.map(_._1)).toMap
        val r0 = byShard.getOrElse(0L, Nil).toDF("id", "text")
        val r1 = byShard.getOrElse(1L, Nil).toDF("id", "text")
        SuffixArray.writeShardedRankIndex(
          r0, "id", "text", window, tbl, buckets = 2, shard = 0L)
        SuffixArray.appendRankShard(r1, "id", "text", window, tbl, 1L)
        val ranks = SuffixArray.suffixRanks(df, "id", "text", window)

        val wSh = SuffixArray.repeatedWindowsSharded(spark, tbl, 1000)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        val wMono = SuffixArray.repeatedWindows(
            ranks, df, "id", "text", window, 1000)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .toSet
        val pSh = SuffixArray.repeatedPositionsSharded(
            spark, tbl, df, "id", "text", window)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val pMono = SuffixArray.repeatedPositions(
            ranks, df, "id", "text", window)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val eSh = SuffixArray.exciseRepeatedSharded(
            spark, tbl, df, "id", "text", window)
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
          .toMap
        val eMono = SuffixArray.exciseRepeated(
            ranks, df, "id", "text", window)
          .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
          .toMap
        ((wSh == wMono) :| s"windows sh=$wSh mono=$wMono") &&
          ((pSh == pMono) :| s"positions sh=$pSh mono=$pMono") &&
          ((eSh == eMono) :| s"excise sh=$eSh mono=$eMono")
      })
    assert(res.passed, res.status.toString)
  }

  test("fixed point: duplicate documents converge under a huge window") {
    // identical docs keep distinct < total forever; the pure-doubling
    // stability exit must stop refining without mis-ranking anything
    val docs = Seq((1L, "abcab"), (2L, "abcab"), (3L, "ab"))
    assert(run(docs, 65536) == naive(docs, 65536))
  }

  test("property: any corpus, any window — ranks equal the naive reference") {
    val word = Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val genDocs = Gen.nonEmptyListOf(word)
      .map(_.zipWithIndex.map { case (w, i) => (i.toLong, w) })
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12),
      Prop.forAllNoShrink(genDocs, Gen.choose(1, 8)) { (docs, w) =>
        (run(docs, w) == naive(docs, w)) :| s"docs=$docs w=$w"
      })
    assert(res.passed, res.status.toString)
  }
}
