package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Byte-pair-encoding tokenizer: corpus-scale TRAINER plus map-side ENCODER —
 * the subword-vocabulary step of a pretraining pipeline (Sennrich et al.
 * 2016, "Neural Machine Translation of Rare Words with Subword Units").
 *
 * Distributed formulation: the corpus is scanned ONCE for the word-frequency
 * vocabulary (one aggregate whose key is the word — the same shuffle an
 * exact dedup pays); training then runs DRIVER-SIDE on the collected
 * (word, freq) table, which is vocabulary-sized, not corpus-sized — 100 TB
 * of text and 100 MB of text train at identical cost once the word counts
 * exist. The earlier formulation ran one vocab-sized Spark aggregate plus a
 * 1-row argmax collect PER MERGE; at a real 32k-merge vocab that is 32k
 * sequential Spark jobs — a driver-side scheduling latency wall, not a
 * data-path cost. The local trainer keeps incremental pair counts (only
 * words containing the merged pair are touched per round), so the whole
 * 32k-merge train is one Spark job (the vocabulary aggregate) + pure local
 * CPU. Tie-breaks compare pair strings in UTF-8 byte order — exactly
 * Spark's `orderBy(col asc)` on strings and DuckDB's binary collation, so
 * the merge sequence is bit-identical to the unrolled SQL oracle.
 *
 * Symbol strings: a word's symbols are kept as ONE string — symbols
 * separated by exactly two spaces, a single leading/trailing space — and a
 * merge is a plain non-overlapping left-to-right `replace` of
 * `" a  b "` with `" ab "`. The pattern consumes one space from each
 * neighbouring separator and the replacement restores it, so the invariant
 * is stable and adjacent occurrences each still match ("a a a" merges to
 * ["aa", "a"], the standard BPE scan). `replace` has identical
 * left-to-right non-overlapping semantics in Spark, DuckDB (the oracle
 * rendering), and the list-based Python reference (`tools/bpe_reference.py`
 * — the intent pin), which is what makes the cross-engine check exact.
 *
 * Encoding is pure projection: the learned merges are literals folded into
 * a chain of `replace` calls applied per word inside a `transform` — no
 * join, no shuffle, no state; scales with scan bandwidth.
 */
object Bpe {

  /** Learned merge: 1-based rank, the pair as "left␣␣right", weighted count. */
  final case class Merge(rank: Int, pair: String, cnt: Long) {
    def left: String = pair.split("  ")(0)
    def right: String = pair.split("  ")(1)
    def merged: String = pair.replace("  ", "")
  }

  /** ' a  b  c ' symbol string of a word (single-char symbols to start). */
  private def symString(w: Column): Column =
    concat(lit(" "), regexp_replace(w, "(.)", "$1  "))

  private def applyMerge(s: Column, m: Merge): Column =
    replace(s, lit(" " + m.pair + " "), lit(" " + m.merged + " "))

  /** Corpus word-frequency vocabulary — the one corpus-wide aggregate. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** [[vocabulary]] over GPT-2 pre-tokenizer pieces — the production
    * trainer input (train on what you will encode): pieces keep their
    * leading space as part of the unit, but the symbol framing's trim
    * drops it from the symbol string, so a piece trains by its visible
    * characters (identically in the local trainer and the SQL oracle —
    * the shared trim rule). Same one corpus-wide aggregate. */
  def vocabularyPretokenized(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.pretokenizeGpt2(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Default cap on the collected vocabulary rows (~4M words ≈ a few
    * hundred MB of driver strings — bounded however large the corpus). */
  val DefaultMaxVocab: Int = 4000000

  /**
   * Train `k` merges on a (word, freq) vocabulary. Returns fewer than `k`
   * merges if the vocabulary runs out of adjacent pairs. ONE collect of the
   * vocabulary table, then [[trainLocal]]; ties break on the
   * lexicographically smallest pair string in UTF-8 byte order, which for
   * space-separated symbols orders exactly like the (left, right) tuple.
   *
   * The collect is BOUNDED: rows below `minFreq` are filtered out and at
   * most `topM` words (by freq desc, word asc — deterministic) reach the
   * driver, via a `TakeOrderedAndProject` whose per-partition state is
   * top-M-bounded. A web corpus's "word" set is unbounded (URLs, typos,
   * hex blobs), so an uncapped collect is a driver OOM at 100 TB; the
   * truncation is the standard approximation — singleton and tail words
   * cannot influence early merges (a pair's count is bounded by the sum of
   * freqs of the words containing it, so dropping words of total weight W
   * perturbs any pair count by at most W — rank inversions only among
   * pairs closer than W), and `minFreq = 2` alone removes the unbounded
   * crawl tail. Defaults keep every word of a ≤[[DefaultMaxVocab]]-word
   * vocabulary: small-corpus training is exact, and the cross-engine
   * oracle pins that path bit-for-bit.
   */
  def train(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      k: Int,
      minFreq: Long = 1L,
      topM: Int = DefaultMaxVocab): Seq[Merge] =
    trainLocal(boundedVocabCollect(vocab, wordCol, freqCol, minFreq, topM), k)

  /** THE bounded driver collect both tokenizer trainers share ([[train]]
    * and [[Unigram.train]]): filter below `minFreq`, keep at most `topM`
    * words by (freq desc, word asc — deterministic) via a
    * `TakeOrderedAndProject` whose per-partition state is top-M-bounded.
    * One definition so the truncation contract cannot silently diverge
    * between the trainers. */
  private[operators] def boundedVocabCollect(
      vocab: DataFrame,
      wordCol: String,
      freqCol: String,
      minFreq: Long,
      topM: Int): Seq[(String, Long)] =
    vocab.select(
        col(wordCol).cast("string").as("__w"), col(freqCol).cast("long").as("__f"))
      .where(col("__f") >= minFreq)
      .orderBy(col("__f").desc, col("__w").asc)
      .limit(topM)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  /** UTF-8 byte order — Spark's string `asc` and DuckDB's BINARY collation. */
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
   * Driver-side sequential BPE with INCREMENTAL pair counts: one initial
   * pass builds (pair → weighted count) and (pair → word indices); each
   * round takes the argmax (count desc, pair string asc in UTF-8 order)
   * and re-counts ONLY the words containing the merged pair — subtract the
   * word's old pairs, apply the non-overlapping left-to-right `replace`
   * (the same `" a  b "`→`" ab "` string rewrite Spark and DuckDB apply,
   * so the sequence is bit-identical to the unrolled oracle), re-add its
   * new pairs. Occurrence sets may hold stale indices after unrelated
   * merges; they are verified by a `contains` check before use. The argmax
   * is a lazy-deletion HEAP: every count update pushes its (count, pair),
   * and pops discard entries whose recorded count no longer matches the
   * live table — a stale entry can only match the live count by being
   * value-identical to a fresh one, so the top valid entry IS the exact
   * (count desc, pair UTF-8 asc) argmax. Per round that is O(log P)
   * amortized instead of the previous O(P) linear scan, which is what
   * makes 32k-merge vocabularies train in seconds (spec-pinned).
   */
  def trainLocal(vocab: Seq[(String, Long)], k: Int): Seq[Merge] = {
    require(k >= 1 && k <= 100000, "merge count 1..100000 supported")
    import scala.collection.mutable
    val ss = mutable.ArrayBuffer.empty[String] // per-word ' a  b ' symbol string
    val fs = mutable.ArrayBuffer.empty[Long]
    vocab.foreach { case (w, f) =>
      ss += (" " + w.replaceAll("(.)", "$1  ")) // = symString(Column), locally
      fs += f
    }
    def pairsOf(s: String): Array[String] = {
      val sy = s.trim.split("  ")
      if (sy.length < 2) Array.empty
      else Array.tabulate(sy.length - 1)(i => sy(i) + "  " + sy(i + 1))
    }
    val counts = mutable.HashMap.empty[String, Long]
    val occ = mutable.HashMap.empty[String, mutable.BitSet]
    for (i <- ss.indices; p <- pairsOf(ss(i))) {
      counts.update(p, counts.getOrElse(p, 0L) + fs(i))
      occ.getOrElseUpdate(p, mutable.BitSet.empty) += i
    }
    // (count desc, pair utf8 asc) max-heap with lazy deletion: greater
    // ordering value = higher priority
    val heapOrd = new Ordering[(Long, String)] {
      def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else if (a._2 == b._2) 0
        else if (ltUtf8(a._2, b._2)) 1
        else -1
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String)](heapOrd)
    counts.foreach { case (p, c) => heap.enqueue((c, p)) }
    def bump(p: String, c: Long): Unit = heap.enqueue((c, p))
    val merges = ArrayBuffer.empty[Merge]
    var rank = 1
    while (rank <= k && counts.nonEmpty) {
      // pop stale entries; the top entry matching its live count is the
      // exact global argmax (heap top is max over all entries, and every
      // live pair's latest count was pushed)
      while (counts.getOrElse(heap.head._2, -1L) != heap.head._1) heap.dequeue()
      val (bc, bp) = heap.head
      merges += Merge(rank, bp, bc)
      val pat = " " + bp + " "
      val rep = " " + bp.replace("  ", "") + " "
      // merging (a,b) only creates pairs involving the new "ab" symbol, so
      // bp itself can never reappear — removing its occurrence set first is
      // safe, and exact subtraction below drives counts(bp) to zero
      occ.remove(bp).foreach(_.foreach { i =>
        val s = ss(i)
        if (s.contains(pat)) { // stale-index guard
          val f = fs(i)
          pairsOf(s).foreach { q =>
            val nv = counts.getOrElse(q, 0L) - f
            if (nv <= 0) counts.remove(q) else { counts.update(q, nv); bump(q, nv) }
          }
          val ns = s.replace(pat, rep)
          ss(i) = ns
          pairsOf(ns).foreach { q =>
            val nv = counts.getOrElse(q, 0L) + f
            counts.update(q, nv)
            bump(q, nv)
            occ.getOrElseUpdate(q, mutable.BitSet.empty) += i
          }
        }
      })
      rank += 1
    }
    merges.toSeq
  }

  /** Piece count of one word under the learned merges (map-side fold). */
  private def pieceCount(word: Column, merges: Seq[Merge]): Column = {
    val merged = merges.foldLeft(symString(word))(applyMerge)
    size(split(trim(merged), "  ")).cast("long")
  }

  /**
   * Per-document encoding statistics: word count, total piece count after
   * applying `merges`, and pieces-per-word ratio. Pure projection — the
   * merge chain is literal `replace` calls inside a `transform`; documents
   * with no tokens are dropped.
   */
  def encodeStats(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.select(col(idCol), TextOps.tokens(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        aggregate(transform(col("w"), w => pieceCount(w, merges)),
          lit(0L), (a, x) => a + x).as("n_pieces"))
      .withColumn("ratio",
        round(col("n_pieces").cast("double") / col("n_words").cast("double"), 6))

  /**
   * [[encodeStats]] over GPT-2 pre-tokenizer pieces instead of
   * whitespace words — the production tokenizer shape: the
   * pre-tokenizer's lossless pieces are the units merges may not cross,
   * so corpus encoding is per-piece map-side work with no cross-row
   * state however the corpus partitions. Merge tables trained on
   * whitespace words apply unchanged (a piece's leading space drops out
   * of the symbol framing — the trim that bounds symbol strings strips
   * it — so pieces encode by their visible characters). Same pure
   * projection; documents yielding no pieces drop.
   */
  def encodeStatsPretokenized(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame =
    df.select(col(idCol), TextOps.pretokenizeGpt2(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col(idCol),
        size(col("w")).cast("long").as("n_pre_pieces"),
        aggregate(transform(col("w"), w => pieceCount(w, merges)),
          lit(0L), (a, x) => a + x).as("n_bpe_pieces"))
      .withColumn("ratio",
        round(col("n_bpe_pieces").cast("double") /
          col("n_pre_pieces").cast("double"), 6))
}

/** DuckDB renderings of [[Bpe]] for the correctness oracle: the training
  * loop unrolls to `k` nested CTE levels (pair counts → argmax → merged
  * vocab), an independent SQL formulation of the same algorithm. */
object BpeSql {

  /** ' a  b  c ' symbol string (DuckDB needs the explicit 'g' flag). */
  def symString(w: String): String =
    s"(' ' || regexp_replace($w, '(.)', '\\1  ', 'g'))"

  private def pairsOf(s: String): String = {
    val sy = s"string_split(trim($s), '  ')"
    s"(CASE WHEN len($sy) >= 2 THEN " +
      s"list_transform(range(1, len($sy)), i -> $sy[i] || '  ' || $sy[i+1]) " +
      s"ELSE [] END)"
  }

  private def scalarP(level: Int): String = s"(SELECT p FROM m$level)"

  private def applyMerge(s: String, level: Int): String =
    s"replace($s, ' ' || ${scalarP(level)} || ' ', " +
      s"' ' || replace(${scalarP(level)}, '  ', '') || ' ')"

  /**
   * CTE levels `v0, p1, m1, v1, …, mk, vk` over an existing `bpe_vocab`
   * CTE with columns (word, freq). `m<i>` holds rank-i's (p, cnt);
   * `v<i>` the vocabulary after applying merges 1..i. Every level is
   * MATERIALIZED: each `v(i-1)` is referenced twice (pair counts + merged
   * vocab), so inlined CTEs would expand 2^k references to the base scan.
   */
  def trainCtes(k: Int): String = {
    val v0 = s"v0 AS MATERIALIZED (SELECT ${symString("word")} AS s, freq AS f FROM bpe_vocab)"
    val levels = (1 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT pr AS p, CAST(sum(f) AS BIGINT) AS cnt
         |        FROM (SELECT unnest(${pairsOf("s")}) AS pr, f FROM v${i - 1})
         |        GROUP BY pr),
         |m$i AS MATERIALIZED (SELECT p, cnt FROM p$i ORDER BY cnt DESC, p LIMIT 1),
         |v$i AS MATERIALIZED (SELECT ${applyMerge("s", i)} AS s, f FROM v${i - 1})""".stripMargin
    }
    (v0 +: levels).mkString(",\n")
  }

  /** UNION ALL of the k merge rows as (rank, left, right, pair_freq). */
  def mergeRows(k: Int): String =
    (1 to k).map { i =>
      s"SELECT CAST($i AS BIGINT) AS rank, " +
        s"string_split(p, '  ')[1] AS left_sym, " +
        s"string_split(p, '  ')[2] AS right_sym, cnt AS pair_freq FROM m$i"
    }.mkString("\nUNION ALL\n")

  /** The merge chain applied to one word expression, as nested replaces. */
  def encodeWord(word: String, k: Int): String =
    (1 to k).foldLeft(symString(word))(applyMerge)
}
