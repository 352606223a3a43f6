package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.DictMatchExpr

/**
 * Multi-phrase dictionary scanning over a corpus — the blocklist /
 * licensed-span / PII-dictionary primitive: one Aho–Corasick pass per
 * document ([[DictMatchExpr]]) finds every occurrence of every phrase,
 * overlapping included, in O(len + matches) regardless of dictionary
 * size. Pure projection: the automaton is built once on the driver and
 * rides the plan as literals — no join, no shuffle, no regex
 * alternation (which is O(len · phrases) at best and un-compilable at
 * blocklist scale).
 */
object DictMatch {

  /** struct(total_matches, distinct_phrases) for one text column. */
  def stats(text: Column, phrases: Seq[String]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DictMatchExpr(ColumnBridge.expression(text), phrases))
  }

  /** Per-document match accounting, documents with ≥ 1 match only:
    * (idCol, total_matches, distinct_phrases). */
  def matchStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrases: Seq[String]): DataFrame =
    df.select(col(idCol), stats(col(textCol), phrases).as("__m"))
      .select(col(idCol),
        col("__m.total_matches").as("total_matches"),
        col("__m.distinct_phrases").as("distinct_phrases"))
      .where(col("total_matches") > 0)
      .orderBy(col(idCol))
}
