package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Post-training data preparation: preference pairs (DPO / reward-model
 * training, Rafailov et al. 2023, arXiv:2305.18290) and chat-template
 * assembly (SFT).
 *
 * Scale posture: both operators are single map-side-combinable aggregates
 * or pure projections — no window over the prompt group (a prompt with
 * millions of sampled responses would funnel one task; `max_by`/`min_by`
 * ship one candidate per group per mapper), no self-join, no collect.
 */
object Preference {

  /**
   * Preference pairs: within each prompt group, `chosen` = the response
   * with the highest score, `rejected` = the lowest, and the pair is kept
   * only when the score margin is at least `minMargin` (low-margin pairs
   * teach a DPO objective nothing and add label noise — margin filtering
   * is the standard prep rule).
   *
   * Selection orders by (score, tie) lexicographically — `tieCol` makes
   * the argmax/argmin deterministic when scores tie (without it the
   * winner would be engine- and partition-order-dependent); the margin is
   * measured on the score alone. One `groupBy(group).agg(max_by, min_by,
   * max, min)` — group-cardinality rows out, map-side partials in.
   */
  def pairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      tieCol: String,
      minMargin: Double): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        max_by(col(idCol), struct(col(scoreCol), col(tieCol)))
          .as("chosen_id"),
        min_by(col(idCol), struct(col(scoreCol), col(tieCol)))
          .as("rejected_id"),
        round((max(col(scoreCol)) - min(col(scoreCol))).cast("double"), 6)
          .as("margin"))
      .where(col("margin") >= minMargin &&
        // structural guard for minMargin <= 0 callers: a single-response
        // (or all-tied) group must never emit chosen == rejected — a DPO
        // pair preferring a completion over itself is pure label noise
        col("chosen_id") =!= col("rejected_id"))

  /**
   * Chat-template assembly (SFT): render a (system, user, assistant)
   * triple into one training string with role sentinels, count its
   * whitespace tokens, and keep rows within the token budget — the
   * document→sample transform at the mouth of an instruction-tuning
   * pipeline. Pure per-row projection: no shuffle at all.
   *
   * Template (a ChatML-style layout, public convention):
   * {{{
   * <|system|>\n{system}\n<|user|>\n{user}\n<|assistant|>\n{assistant}<|end|>
   * }}}
   */
  def chatFormat(
      df: DataFrame,
      idCol: String,
      systemCol: Column,
      userCol: Column,
      assistantCol: Column,
      maxTokens: Int): DataFrame =
    df
      // special-token hygiene: a field that already contains the sentinel
      // lead-in would forge turn boundaries (and corrupt any downstream
      // loss-mask offset located by first-occurrence search) — such rows
      // drop, the standard prep rule for crawled text entering a chat
      // template
      .where(!systemCol.contains("<|") && !userCol.contains("<|") &&
        !assistantCol.contains("<|"))
      .select(col(idCol),
        concat(
          lit("<|system|>\n"), systemCol,
          lit("\n<|user|>\n"), userCol,
          lit("\n<|assistant|>\n"), assistantCol,
          lit("<|end|>")).as("sample"))
      .withColumn("n_tokens", size(TextOps.tokens(col("sample"))).cast("long"))
      .where(col("n_tokens") <= maxTokens)
}
