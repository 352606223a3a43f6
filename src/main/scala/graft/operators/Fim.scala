package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Fill-in-the-middle (FIM) training-sequence transformation (Bavarian et
 * al. 2022, "Efficient Training of Language Models to Fill in the Middle",
 * arXiv:2207.14255): rewrite a fraction of documents from left-to-right
 * order into (prefix, suffix, middle) order with sentinel markers, so an
 * autoregressive model learns to infill. Applied at the CHARACTER level
 * BEFORE tokenization — the paper's recommended placement (§B: character-
 * level document splitting, then tokenize) — so it composes upstream of
 * the BPE/WordPiece/unigram encoders and [[TrainShards]] packing.
 *
 * Determinism, engine-portable: the two split points and the apply/skip
 * gate derive from LCG hashes of the document id (plain integer arithmetic
 * mod 2^31−1, the [[graft.functions.TextOps]] hash family — NOT
 * Math.random, NOT Spark's murmur3), so the same corpus release transforms
 * identically on any engine and the DuckDB oracle restates every split.
 * Both cut points are uniform over 0..len (inclusive — empty prefix,
 * middle, or suffix are all legal, as in the reference implementation).
 *
 * Layouts (sentinels spelled in full, never tokenized here):
 *  - PSM: `<|fim_pre|>` prefix `<|fim_suf|>` suffix `<|fim_mid|>` middle
 *  - SPM: `<|fim_suf|>` suffix `<|fim_pre|>` prefix `<|fim_mid|>` middle
 *    (the paper's suffix-first variant — better prefix KV-cache reuse at
 *    inference)
 * Documents outside the rate gate pass through UNCHANGED (plain
 * autoregressive rows) — joint FIM+AR training at `ratePct`%.
 *
 * Scale shape: one map-side projection — no shuffle, no join, no state;
 * at 100 TB this is a free rider on whatever scan feeds tokenization.
 */
object Fim {

  val PreTag = "<|fim_pre|>"
  val MidTag = "<|fim_mid|>"
  val SufTag = "<|fim_suf|>"

  private val M = graft.functions.TextOps.HashMod // 2^31 - 1, prime
  // distinct LCG streams for the gate and the two cuts (classic
  // Numerical-Recipes / glibc constants, same family as TextOps.hashA/B)
  private def lcg(id: Column, a: Long, b: Long): Column =
    pmod(lit(a) * id.cast("long") + lit(b), lit(M))

  /**
   * (id, fim_applied, cut_lo, cut_hi, sequence) per document. `ratePct`
   * of documents (gated by id hash) emit the FIM layout; the rest emit
   * `text` unchanged with null cuts. Cuts count CODE POINTS (substr
   * semantics shared by Spark and the oracle engine).
   */
  def transform(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ratePct: Int,
      spm: Boolean = false): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100,
      "Fim.transform: ratePct must be in 0..100")
    val id = col(idCol)
    val text = col(textCol)
    val n = length(text).cast("long")
    val applied = pmod(lcg(id, 1103515245L, 12345L), lit(100L)) < ratePct
    val s1 = pmod(lcg(id, 1013904223L, 12345L), n + 1L)
    val s2 = pmod(lcg(id, 1664525L, 1013904223L), n + 1L)
    val lo = least(s1, s2)
    val hi = greatest(s1, s2)
    val prefix = text.substr(lit(1), lo.cast("int"))
    val middle = text.substr((lo + 1L).cast("int"), (hi - lo).cast("int"))
    val suffix = text.substr((hi + 1L).cast("int"), n.cast("int"))
    val fim =
      if (spm) concat(lit(SufTag), suffix, lit(PreTag), prefix, lit(MidTag), middle)
      else concat(lit(PreTag), prefix, lit(SufTag), suffix, lit(MidTag), middle)
    df.select(id.as("id"),
      applied.as("fim_applied"),
      when(applied, lo).as("cut_lo"),
      when(applied, hi).as("cut_hi"),
      when(applied, fim).otherwise(text).as("sequence"))
  }

}

/** DuckDB rendering of [[Fim.transform]] — same LCG streams, same cut
  * arithmetic, same sentinel order. */
object FimSql {

  def transform(
      table: String,
      idCol: String,
      textCol: String,
      ratePct: Int,
      spm: Boolean = false): String = {
    val m = graft.functions.TextOps.HashMod
    def lcgS(a: Long, b: Long) =
      s"(($a * CAST($idCol AS BIGINT) + $b) % $m + $m) % $m"
    val applied = s"(${lcgS(1103515245L, 12345L)} % 100) < $ratePct"
    val n = s"CAST(length($textCol) AS BIGINT)"
    def cut(a: Long, b: Long) =
      s"((${lcgS(a, b)} % ($n + 1)) + ($n + 1)) % ($n + 1)"
    val s1 = cut(1013904223L, 12345L)
    val s2 = cut(1664525L, 1013904223L)
    val pre = s"substring($textCol, 1, CAST(lo AS INT))"
    val mid = s"substring($textCol, CAST(lo AS INT) + 1, CAST(hi - lo AS INT))"
    val suf = s"substring($textCol, CAST(hi AS INT) + 1)"
    val fim =
      if (spm) s"'${Fim.SufTag}' || $suf || '${Fim.PreTag}' || $pre || '${Fim.MidTag}' || $mid"
      else s"'${Fim.PreTag}' || $pre || '${Fim.SufTag}' || $suf || '${Fim.MidTag}' || $mid"
    s"""SELECT $idCol AS id, applied AS fim_applied,
       |       CASE WHEN applied THEN lo END AS cut_lo,
       |       CASE WHEN applied THEN hi END AS cut_hi,
       |       CASE WHEN applied THEN $fim ELSE $textCol END AS sequence
       |FROM (SELECT $idCol, $textCol, $applied AS applied,
       |             least($s1, $s2) AS lo, greatest($s1, $s2) AS hi
       |      FROM $table)""".stripMargin
  }
}
