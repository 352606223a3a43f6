package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.plans.WordPieceEncodeExpr

/**
 * WordPiece tokenizer (Schuster & Nakajima 2012, "Japanese and Korean
 * Voice Search"; the BERT subword scheme): greedy pair merges like
 * [[Bpe]], but the pair to merge maximizes the LIKELIHOOD score
 * `count(a,b) / (count(a) · count(b))` instead of the raw pair count, and
 * word-internal continuation symbols carry the `##` prefix. Completes the
 * tokenizer trio next to [[Bpe]] (count-greedy merges) and [[Unigram]]
 * (lattice EM) — the three vocabularies a pretraining pipeline chooses
 * between.
 *
 * Distributed formulation — identical to [[Bpe]]'s: ONE corpus aggregate
 * builds the (word, freq) vocabulary (bounded by `minFreq`/`topM`, the
 * same web-tail guard), training then runs DRIVER-SIDE on the
 * vocabulary-sized table — 100 TB and 100 MB of text train at identical
 * cost once the word counts exist.
 *
 * Cross-engine exactness: a score is the ONE IEEE division
 * `cnt / (lc · rc)` of exact integer counts (int→double conversion is
 * exact below 2⁵³; ·, / are correctly rounded in the JVM, CPython, and
 * DuckDB — no libm), so per-round argmax by (score desc, pair UTF-8 asc)
 * picks the identical pair in all three engines; two pairs whose TRUE
 * rationals differ beyond double precision compare equal in every engine
 * alike and fall through to the same pair tie-break. The merge sequence
 * is therefore bit-identical to the unrolled DuckDB CTE oracle
 * ([[WordPieceSql]]) and the independent Python reference
 * (`tools/wordpiece_reference.py`).
 *
 * Symbol strings: a word's symbols use [[Bpe]]'s exact separator
 * invariant — one string, symbols separated by two spaces, single
 * leading/trailing space — with the first code point plain and every
 * later one `##`-prefixed (" l  ##o  ##w "); a merge is the same
 * non-overlapping left-to-right `replace` of `" a  b "` with
 * `" a·strip##(b) "`. Words that themselves contain `##` are subject to
 * the standard WordPiece marker ambiguity (a raw `##` is
 * indistinguishable from the continuation prefix) — inherent to the
 * scheme, not this implementation.
 *
 * Encoding is BERT's greedy longest-match-first over the trained piece
 * set as a map-side native expression ([[WordPieceEncodeExpr]]): pieces
 * ride the plan as literals, no join, no shuffle; a word with an
 * unmatchable position collapses to ONE `[UNK]` piece (the BERT rule).
 */
object WordPiece {

  /** Learned merge: 1-based rank, the pair as "left␣␣right", its weighted
    * count at selection time, and the selection score
    * `cnt / (count(left) · count(right))`. */
  final case class Merge(rank: Int, pair: String, cnt: Long, score: Double) {
    def left: String = pair.split("  ")(0)
    def right: String = pair.split("  ")(1)
    /** The merged symbol keeps the left's form; the right drops its
      * continuation prefix ("l" + "##o" → "lo", "##s" + "##t" → "##st"). */
    def merged: String = left + right.stripPrefix("##")
  }

  /** The whole-word UNK piece emitted for unmatchable words. */
  val UnkPiece: String = "[UNK]"

  /** Corpus word-frequency vocabulary — the one corpus-wide aggregate
    * (identical to [[Bpe.vocabulary]]; whitespace tokens). */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /**
   * Train `k` merges on a (word, freq) vocabulary DataFrame with the SAME
   * bounded driver collect as [[Bpe.train]] / [[Unigram.train]]:
   * `minFreq` filters the unbounded crawl tail, at most `topM` words
   * (freq desc, word asc) reach the driver via a per-partition-bounded
   * `TakeOrderedAndProject`. Returns fewer than `k` merges if the
   * vocabulary runs out of adjacent pairs.
   */
  def train(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      k: Int,
      minFreq: Long = 1L,
      topM: Int = Bpe.DefaultMaxVocab): Seq[Merge] =
    trainLocal(Bpe.boundedVocabCollect(vocab, wordCol, freqCol, minFreq, topM), k)

  /** [[train]] plus the trained piece set, from ONE bounded collect of
    * the vocabulary (the encoder needs the initial alphabet as well as
    * the merge products). */
  def trainPieces(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      k: Int,
      minFreq: Long = 1L,
      topM: Int = Bpe.DefaultMaxVocab): (Seq[Merge], Seq[String]) = {
    val v = Bpe.boundedVocabCollect(vocab, wordCol, freqCol, minFreq, topM)
    val ms = trainLocal(v, k)
    (ms, pieces(v, ms))
  }

  /** Local ' l  ##o  ##w ' form of a word (code-point granularity —
    * `(?s).` would differ; Java's `(.)` already matches a full code
    * point, matching the Column/RE2 forms). */
  private[operators] def symStringLocal(w: String): String =
    " " + w.replaceAll("(.)", "##$1  ").replaceFirst("^##", "")

  private def pairsOf(s: String): Array[String] = {
    val sy = s.trim.split("  ")
    if (sy.length < 2) Array.empty
    else Array.tabulate(sy.length - 1)(i => sy(i) + "  " + sy(i + 1))
  }

  /** UTF-8 byte order — Spark's string `asc` and DuckDB's BINARY
    * collation (duplicated from [[Bpe]]'s private; same contract). */
  private def ltUtf8(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /**
   * Driver-side sequential WordPiece trainer with INCREMENTAL pair AND
   * symbol counts: one initial pass builds (pair → weighted count),
   * (symbol → weighted count) and (pair → word indices); each round
   * scans the live pair table once for the argmax of
   * `score = cnt / (count(left) · count(right))` — score desc, pair
   * UTF-8 asc on ties — then re-counts ONLY the words containing the
   * merged pair (subtract the word's old pairs and symbols, apply the
   * non-overlapping left-to-right replace, re-add). The per-round argmax
   * is a LINEAR scan (O(live pairs)): unlike [[Bpe.trainLocal]]'s
   * count-keyed lazy heap, a WordPiece score changes whenever EITHER
   * endpoint symbol's count moves — pairs far from the merge site
   * reprice without being touched, so a stale-entry heap would silently
   * return non-argmax pairs. O(k · P) total is the price of the
   * likelihood rule (the reference HuggingFace trainer pays the same);
   * P is bounded by the bounded vocabulary's total symbol length, never
   * by the corpus.
   */
  def trainLocal(vocab: Seq[(String, Long)], k: Int): Seq[Merge] = {
    require(k >= 1 && k <= 100000, "merge count 1..100000 supported")
    val ss = mutable.ArrayBuffer.empty[String]
    val fs = mutable.ArrayBuffer.empty[Long]
    vocab.foreach { case (w, f) => ss += symStringLocal(w); fs += f }
    val pairCnt = mutable.HashMap.empty[String, Long]
    val symCnt = mutable.HashMap.empty[String, Long]
    val occ = mutable.HashMap.empty[String, mutable.BitSet]
    for (i <- ss.indices) {
      val f = fs(i)
      ss(i).trim.split("  ").foreach { s =>
        symCnt.update(s, symCnt.getOrElse(s, 0L) + f)
      }
      pairsOf(ss(i)).foreach { p =>
        pairCnt.update(p, pairCnt.getOrElse(p, 0L) + f)
        occ.getOrElseUpdate(p, mutable.BitSet.empty) += i
      }
    }
    def scoreOf(p: String, c: Long): Double = {
      val i = p.indexOf("  ")
      val lc = symCnt(p.substring(0, i))
      val rc = symCnt(p.substring(i + 2))
      c.toDouble / (lc.toDouble * rc.toDouble)
    }
    val merges = mutable.ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= k && pairCnt.nonEmpty) {
      var bp: String = null
      var bc = 0L
      var bs = 0.0
      pairCnt.foreach { case (p, c) =>
        val s = scoreOf(p, c)
        if (bp == null || s > bs || (s == bs && ltUtf8(p, bp))) {
          bp = p; bc = c; bs = s
        }
      }
      val m = Merge(rank, bp, bc, bs)
      merges += m
      val pat = " " + bp + " "
      val rep = " " + m.merged + " "
      occ.remove(bp).foreach(_.foreach { i =>
        val s = ss(i)
        if (s.contains(pat)) { // stale-index guard
          val f = fs(i)
          pairsOf(s).foreach { q =>
            val nv = pairCnt.getOrElse(q, 0L) - f
            if (nv <= 0) pairCnt.remove(q) else pairCnt.update(q, nv)
          }
          s.trim.split("  ").foreach { y =>
            val nv = symCnt.getOrElse(y, 0L) - f
            if (nv <= 0) symCnt.remove(y) else symCnt.update(y, nv)
          }
          val ns = s.replace(pat, rep)
          ss(i) = ns
          ns.trim.split("  ").foreach { y =>
            symCnt.update(y, symCnt.getOrElse(y, 0L) + f)
          }
          pairsOf(ns).foreach { q =>
            pairCnt.update(q, pairCnt.getOrElse(q, 0L) + f)
            occ.getOrElseUpdate(q, mutable.BitSet.empty) += i
          }
        }
      })
      rank += 1
    }
    merges.toSeq
  }

  /** The trained piece set: every initial symbol of the vocabulary
    * (plain first-code-point + `##` continuations) plus each merge's
    * product, deduplicated and sorted — the encoder consumes it as a
    * set, so the order is presentational only. */
  def pieces(vocab: Seq[(String, Long)], merges: Seq[Merge]): Seq[String] = {
    val base = mutable.LinkedHashSet.empty[String]
    vocab.foreach { case (w, _) =>
      symStringLocal(w).trim.split("  ").foreach(base += _)
    }
    merges.foreach(base += _.merged)
    base.toSeq.sorted
  }

  /** Greedy longest-match-first encoding of one word column under the
    * trained piece set — a map-side native expression; unmatchable words
    * collapse to `[[UnkPiece]]`. */
  def encode(word: Column, pieceSet: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      WordPieceEncodeExpr(ColumnBridge.expression(word), pieceSet, UnkPiece))
  }

  /** Per-document encoding statistics — [[Bpe.encodeStats]]'s shape with
    * the greedy matcher in place of the merge chain. Pure projection;
    * documents with no tokens are dropped. */
  def encodeStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      pieceSet: Seq[String]): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        aggregate(
          transform(col("w"), w => size(encode(w, pieceSet)).cast("long")),
          lit(0L), (a, x) => a + x).as("n_pieces"))
      .withColumn("ratio",
        round(col("n_pieces").cast("double") / col("n_words").cast("double"), 6))
}

/** DuckDB renderings of [[WordPiece]] for the correctness oracle: the
  * training loop unrolls to `k` CTE levels (pair counts + symbol counts →
  * score argmax → merged vocab), an independent SQL formulation of the
  * same likelihood rule. */
object WordPieceSql {

  /** ' l  ##o  ##w ' symbol string (DuckDB needs the explicit 'g' flag;
    * the leading `##` strip has no flag — first match only). */
  def symString(w: String): String =
    s"(' ' || regexp_replace(regexp_replace($w, '(.)', '##\\1  ', 'g'), '^##', ''))"

  private def pairsOf(s: String): String = {
    val sy = s"string_split(trim($s), '  ')"
    s"(CASE WHEN len($sy) >= 2 THEN " +
      s"list_transform(range(1, len($sy)), i -> $sy[i] || '  ' || $sy[i+1]) " +
      s"ELSE [] END)"
  }

  private def stripHH(e: String): String =
    s"(CASE WHEN $e LIKE '##%' THEN substr($e, 3) ELSE $e END)"

  private def applyMerge(s: String, level: Int): String = {
    val p = s"(SELECT p FROM m$level)"
    val merged = s"(SELECT string_split(p, '  ')[1] || " +
      s"${stripHH("string_split(p, '  ')[2]")} FROM m$level)"
    s"replace($s, ' ' || $p || ' ', ' ' || $merged || ' ')"
  }

  /**
   * CTE levels `v0, p1, c1, m1, v1, …, mk, vk` over an existing
   * `wp_vocab` CTE with columns (word, freq). `c<i>` holds the symbol
   * counts, `m<i>` rank-i's (p, cnt, score) — argmax by
   * `CAST(cnt AS DOUBLE)/(lc·rc)` desc then pair asc, the identical IEEE
   * division the Scala trainer compares — and `v<i>` the vocabulary
   * after merges 1..i. Every level is MATERIALIZED ([[BpeSql.trainCtes]]'s
   * 2^k-expansion guard).
   */
  def trainCtes(k: Int): String = {
    val v0 = s"v0 AS MATERIALIZED (SELECT ${symString("word")} AS s, freq AS f FROM wp_vocab)"
    val levels = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pr AS p, CAST(sum(f) AS BIGINT) AS cnt
         |        FROM (SELECT unnest(${pairsOf("s")}) AS pr, f FROM v${i - 1})
         |        GROUP BY pr),
         |c$i AS MATERIALIZED (SELECT sym, CAST(sum(f) AS BIGINT) AS cnt
         |        FROM (SELECT unnest(string_split(trim(s), '  ')) AS sym, f FROM v${i - 1})
         |        GROUP BY sym),
         |m$i AS MATERIALIZED (SELECT p, cnt, score FROM (
         |        SELECT pp.p AS p, pp.cnt AS cnt,
         |               CAST(pp.cnt AS DOUBLE) /
         |                 (CAST(lc.cnt AS DOUBLE) * CAST(rc.cnt AS DOUBLE)) AS score
         |        FROM p$i pp
         |        JOIN c$i lc ON lc.sym = string_split(pp.p, '  ')[1]
         |        JOIN c$i rc ON rc.sym = string_split(pp.p, '  ')[2])
         |        ORDER BY score DESC, p LIMIT 1),
         |v$i AS MATERIALIZED (SELECT ${applyMerge("s", i)} AS s, f FROM v${i - 1})""".stripMargin
    }
    (v0 +: levels).mkString(",\n")
  }

  /** UNION ALL of the k merge rows as
    * (rank, left_sym, right_sym, pair_freq, score). */
  def mergeRows(k: Int): String =
    (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS rank, " +
        s"string_split(p, '  ')[1] AS left_sym, " +
        s"string_split(p, '  ')[2] AS right_sym, cnt AS pair_freq, " +
        s"round(score, 9) AS score FROM m$i"
    }.mkString("\nUNION ALL\n")

  /**
   * CTE levels rendering greedy longest-match-first encoding of every
   * word in a `wp_words(word)` CTE under the k-merge trained piece set
   * (appended after [[trainCtes]]): `wp_pieces` = initial alphabet ∪
   * merge products; `wp_enc` walks each word RECURSIVELY, each step
   * advancing by the LONGEST piece body matching at the position (a
   * grouped max over a prefix-match join — an independent statement of
   * the scan [[graft.plans.WordPieceEncodeExpr]] runs imperatively; a
   * correlated-subquery form silently yields NULL inside DuckDB's
   * recursive term over this CTE chain, hence the join);
   * `wp_npieces` = (word, npieces) with any unmatchable position
   * collapsing to 1 (the whole-word `[UNK]` rule). The surrounding WITH
   * must be RECURSIVE.
   */
  def encodeCtes(k: Int): String = {
    val products = (1 to k).map { i =>
      s"SELECT string_split(p, '  ')[1] || " +
        s"${stripHH("string_split(p, '  ')[2]")} AS piece FROM m$i"
    }.mkString("\n  UNION\n")
    s"""wp_pieces AS MATERIALIZED (
       |  SELECT DISTINCT sym AS piece
       |  FROM (SELECT unnest(string_split(trim(s), '  ')) AS sym FROM v0)
       |  UNION
       |$products),
       |wp_pv AS MATERIALIZED (
       |  SELECT piece, (piece LIKE '##%') AS cont,
       |         ${stripHH("piece")} AS body
       |  FROM wp_pieces),
       |wp_enc(word, pos, np, dead) AS (
       |  SELECT word, 0, 0, FALSE FROM wp_words
       |  UNION ALL
       |  SELECT word, pos + l, np + 1, l = 0
       |  FROM (SELECT e.word, e.pos, e.np,
       |               COALESCE(max(length(p.body)), 0) AS l
       |        FROM wp_enc e
       |        LEFT JOIN wp_pv p
       |          ON p.cont = (e.pos > 0)
       |         AND p.body = substr(e.word, e.pos + 1, length(p.body))
       |        WHERE e.pos < length(e.word) AND NOT e.dead
       |        GROUP BY e.word, e.pos, e.np)),
       |wp_npieces AS (
       |  SELECT word,
       |         CASE WHEN max(CASE WHEN dead THEN 1 ELSE 0 END) = 1 THEN 1
       |              ELSE max(CASE WHEN pos = length(word) THEN np END)
       |         END AS npieces
       |  FROM wp_enc GROUP BY word)""".stripMargin
  }
}
