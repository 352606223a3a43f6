package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unicode-script profiling for multilingual corpus triage: per-document
 * counts of letters per script family, the script mix as fractions of
 * all letters, and the dominant script — the coarse pre-filter a
 * 100 TB multilingual crawl applies BEFORE any model-based language ID
 * (a document that is 90% Han never reaches an English n-gram LID;
 * mixed-script spam — Cyrillic homoglyphs inside Latin text — shows up
 * as a suspicious mix). Complements [[TextOps.langId]], which separates
 * LANGUAGES within one script (en/es/de) and is blind across scripts.
 *
 * Counting is `length(text) - length(regexp_replace(text, cls, ''))`
 * over Unicode script character classes — pure codegen'd string
 * expressions, one pass per script, no UDF. Counts are UTF-16 units,
 * exact for every BMP script listed here (supplementary-plane letters
 * are not in any listed class). The DuckDB rendering uses RE2's
 * `\p{Script}` spelling of the same Unicode property, so the oracle
 * replays the same classification.
 */
object ScriptOps {

  /** (name, java.util.regex class, RE2 class) — fixed order; the
    * dominant-script fold breaks count ties toward the EARLIER entry. */
  val Scripts: Seq[(String, String, String)] = Seq(
    ("latin", "\\p{IsLatin}", "\\p{Latin}"),
    ("cyrillic", "\\p{IsCyrillic}", "\\p{Cyrillic}"),
    ("greek", "\\p{IsGreek}", "\\p{Greek}"),
    ("arabic", "\\p{IsArabic}", "\\p{Arabic}"),
    ("hebrew", "\\p{IsHebrew}", "\\p{Hebrew}"),
    ("devanagari", "\\p{IsDevanagari}", "\\p{Devanagari}"),
    ("han", "\\p{IsHan}", "\\p{Han}"),
    ("hiragana", "\\p{IsHiragana}", "\\p{Hiragana}"),
    ("katakana", "\\p{IsKatakana}", "\\p{Katakana}"),
    ("hangul", "\\p{IsHangul}", "\\p{Hangul}"))

  /** Count of characters of `text` matching the (java-syntax) class. */
  def classCount(text: Column, cls: String): Column =
    (length(text) - length(regexp_replace(text, s"[$cls]", "")))
      .cast("long")

  /** All Unicode letters — the mix denominator. */
  def letterCount(text: Column): Column = classCount(text, "\\p{L}")

  /**
   * Per-document script profile of `textCol`: `n_letters`, one count
   * column per script (named as in [[Scripts]]), `dominant` (the
   * highest-count script, ties to the earlier list entry, 'none' for a
   * letterless document) and `dominant_frac` (its share of all letters,
   * 6dp). Counts are computed ONCE into columns and the fold reads
   * them, so each script class is one regexp pass per row.
   */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counted = df.select(
      (col(idCol) +: letterCount(col(textCol)).as("n_letters") +:
        Scripts.map { case (n, j, _) =>
          classCount(col(textCol), j).as(n)
        }): _*)
    val (domName, domCnt) = Scripts
      .foldLeft((lit("none"), lit(0L))) { case ((dn, dc), (n, _, _)) =>
        (when(col(n) > dc, lit(n)).otherwise(dn),
          when(col(n) > dc, col(n)).otherwise(dc))
      }
    counted.select(
      (col(idCol) +: col("n_letters") +: Scripts.map(s => col(s._1))) :+
        domName.as("dominant") :+
        round(when(col("n_letters") > 0,
            domCnt.cast("double") / col("n_letters").cast("double"))
          .otherwise(lit(0.0)), 6).as("dominant_frac"): _*)
  }
}

/** DuckDB rendering of [[ScriptOps]] — RE2 script classes, same
  * arithmetic, same tie-break order. */
object ScriptOpsSql {

  def classCount(text: String, re2Cls: String): String =
    s"CAST(length($text) - length(regexp_replace($text, '[$re2Cls]', '', 'g')) AS BIGINT)"

  def letterCount(text: String): String = classCount(text, "\\p{L}")

  /** SELECT-list fragments mirroring [[ScriptOps.scriptProfile]] given a
    * relation already carrying the count columns. */
  def dominantCase(): String = {
    val (expr, _) = ScriptOps.Scripts
      .foldLeft(("'none'", "CAST(0 AS BIGINT)")) {
        case ((dn, dc), (n, _, _)) =>
          (s"(CASE WHEN $n > $dc THEN '$n' ELSE $dn END)",
            s"(CASE WHEN $n > $dc THEN $n ELSE $dc END)")
      }
    expr
  }

  def dominantCount(): String =
    ScriptOps.Scripts.foldLeft("CAST(0 AS BIGINT)") {
      case (dc, (n, _, _)) => s"(CASE WHEN $n > $dc THEN $n ELSE $dc END)"
    }
}
