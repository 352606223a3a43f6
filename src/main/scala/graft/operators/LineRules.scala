package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * C4-style line-rule filtering (Raffel et al. 2020, "Exploring the Limits
 * of Transfer Learning with a Unified Text-to-Text Transformer",
 * arXiv:1910.10683 §2.2 — the cleaning rules applied to Common Crawl
 * before the three-sentence dedup): lines are kept only if they end in
 * terminal punctuation, carry at least `minWords` words, and contain no
 * blocklisted word; documents are reassembled from surviving lines in
 * their original order and dropped entirely when fewer than `minLines`
 * lines survive.
 *
 * Spark geometry: every rule is a MAP-SIDE predicate on the exploded line
 * stream (regexp + codegen'd token ops — no UDF, no shuffle), the
 * blocklist is a literal array (`arrays_overlap` — the list is a rule
 * set, a few dozen words, never a table), and the only shuffle is the
 * doc-keyed reassembly aggregate shared with [[Dedup.paragraphDedup]].
 * Line text travels once, from its original row to its reassembly group.
 */
object LineRules {

  /** Terminal punctuation accepted by the keep rule. */
  private val TerminalRe = "[.!?\"']$"

  /** (idCol, textCol, n_lines) — filtered and reassembled corpus. */
  def c4LineFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int,
      minLines: Int,
      blocklist: Seq[String],
      sep: String = "\n"): DataFrame = {
    val lines = Dedup.paragraphs(df, idCol, textCol, sep)
    val toks = TextOps.tokens(regexp_replace(col("__line"), "[.!?\"']+$", ""))
    val kept = lines
      .where(col("__line").rlike(TerminalRe) &&
        size(toks) >= minWords &&
        !arrays_overlap(toks, typedLit(blocklist)))
      .select(col("__id"), col("__pos"), col("__line"))
    // ONE doc-keyed aggregate: reassembly, line count, and the min-lines
    // gate ride the same shuffle (a reassemble + count-join would pay the
    // doc-key exchange twice)
    kept.groupBy(col("__id"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__line")))),
            x => x.getField("__line")),
          sep).as(textCol),
        count(lit(1)).as("n_lines"))
      .where(col("n_lines") >= minLines)
      .select(col("__id").as(idCol), col(textCol), col("n_lines"))
  }
}

/** DuckDB rendering of [[LineRules.c4LineFilter]] — same split, same
  * regexes, same token rule, independent list mechanics. Expects a CTE
  * `lines(doc_id, pos, line)` in scope (the paragraph-corpus fixture
  * shape). */
object LineRulesSql {
  import graft.functions.TextOpsSql

  def keptLines(minWords: Int, blocklist: Seq[String]): String = {
    val toks = TextOpsSql.tokens(
      "regexp_replace(line, '[.!?\"'']+$', '')")
    val bl = blocklist.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""kept AS (
       |  SELECT doc_id, pos, line FROM lines
       |  WHERE regexp_matches(line, '[.!?"'']$$')
       |    AND len($toks) >= $minWords
       |    AND NOT EXISTS (SELECT 1 FROM unnest($bl) b(w)
       |                    WHERE list_contains($toks, b.w)))""".stripMargin
  }

  def reassembled(minLines: Int): String =
    s"""SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
       |       count(*) AS n_lines
       |FROM kept GROUP BY doc_id HAVING count(*) >= $minLines
       |ORDER BY doc_id""".stripMargin
}
