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
 * exact dedup pays); every training round then runs on the VOCABULARY table
 * only, so 100 TB of text costs the same per round as 100 MB once the word
 * counts exist. A round is: explode each word's adjacent symbol pairs,
 * weighted-count them (one vocab-sized aggregate), collect the single most
 * frequent pair (1 driver row — deterministic tie-break on the
 * lexicographically smallest pair), and apply the merge map-side. The vocab
 * is `localCheckpoint`ed every round so round k's plan does not replay
 * rounds 1..k-1.
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

  /** Adjacent symbol pairs of a symbol string, each as "left␣␣right". */
  private def pairsOf(s: Column): Column = {
    val sy = split(trim(s), "  ")
    when(size(sy) >= 2,
      transform(sequence(lit(1), size(sy) - 1),
        i => concat(element_at(sy, i), lit("  "), element_at(sy, i + 1))))
      .otherwise(array().cast("array<string>"))
  }

  private def applyMerge(s: Column, m: Merge): Column =
    replace(s, lit(" " + m.pair + " "), lit(" " + m.merged + " "))

  /** Corpus word-frequency vocabulary — the one corpus-wide aggregate. */
  def vocabulary(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /**
   * Train `k` merges on a (word, freq) vocabulary. Returns fewer than `k`
   * merges if the vocabulary runs out of adjacent pairs. Each round's
   * driver traffic is ONE row (the argmax pair); ties break on the
   * lexicographically smallest pair string, which for space-separated
   * ASCII symbols orders exactly like the (left, right) tuple.
   */
  def train(vocab: DataFrame, wordCol: String, freqCol: String, k: Int): Seq[Merge] = {
    require(k >= 1 && k <= 10000, "merge count 1..10000 supported")
    var v = vocab
      .select(symString(col(wordCol)).as("s"), col(freqCol).cast("long").as("f"))
      .localCheckpoint()
    val merges = ArrayBuffer.empty[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= k && !exhausted) {
      val top = v.select(explode(pairsOf(col("s"))).as("p"), col("f"))
        .groupBy(col("p")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("p").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(rank, top(0).getString(0), top(0).getLong(1))
        merges += m
        v = v.select(applyMerge(col("s"), m).as("s"), col("f")).localCheckpoint()
        rank += 1
      }
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
