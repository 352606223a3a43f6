package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Corpus-quality filters for training-data pipelines beyond the basic
 * length/punctuation stats in [[TextOps]]:
 *
 *  - repetition metrics (Gopher-style "repetitious document" signals:
 *    duplicate-token fraction, most-common-n-gram mass) that gate
 *    boilerplate / template spam out of a pretraining corpus;
 *  - PII detection & redaction (email / IPv4 / phone) as pure
 *    `regexp_count`/`regexp_replace` column expressions.
 *
 * Everything is engine-portable arithmetic/regex: the regex subset used
 * (character classes, bounded quantifiers, alternation-free) means Java's
 * regex and DuckDB's RE2 match identical spans, so the DuckDB oracle
 * reproduces counts and redacted text byte-for-byte. All expressions are
 * map-side projections — no shuffle, no UDFs, whole-stage codegen'd — so
 * they stream over 100 TB at scan speed; only the most-common-n-gram
 * metric aggregates (per-document keys, map-side partial combine).
 */
object QualityOps {

  /** Fraction of tokens that are repeats of an earlier token: 1 − |distinct|
    * / |tokens| (0.0 for empty docs). The cheapest repetition gate — pure
    * per-row array arithmetic. */
  def dupTokenFrac(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      lit(1.0) -
        size(array_distinct(toks)).cast("double") / size(toks).cast("double"))

  /** Mass of the most common element of an n-gram hash array: maxFreq /
    * size (0.0 for empty arrays) — the Gopher "most common n-gram" gate as
    * a per-row projection (native one-pass [[graft.plans.ArrayMaxFreqExpr]];
    * the explode→double-groupBy formulation shuffles every n-gram of the
    * corpus twice for what is a per-document statistic). */
  def topElemFrac(ngrams: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val freq = ColumnBridge.column(
      graft.plans.ArrayMaxFreqExpr(ColumnBridge.expression(ngrams)))
    when(size(ngrams) === 0, lit(0.0))
      .otherwise(freq.cast("double") / size(ngrams).cast("double"))
  }

  // ---- PII ---------------------------------------------------------------
  // Pinned regex subset: `[...]` classes, `{m,n}` bounds, optional groups
  // `(...)?`, no backrefs or lookaround — the intersection of
  // java.util.regex and RE2 semantics (groups are never referenced in the
  // replacement, so capture-group numbering differences can't matter).
  // `[0-9]` (not `\d`) avoids escape-dialect drift between Scala string
  // literals and SQL string literals.

  /** Email addresses (practical form, not full RFC 5322). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: octet range not enforced). */
  val Ipv4Re = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  /** NANP-style phone numbers: optional +1/1 prefix, 3-3-4 groups separated
    * by `-`, `.` or space. The separator is REQUIRED, so plain integers and
    * the dotted-quad IPs never match. The prefix separator is GROUPED with
    * the `1` (`([+]?1[- .]?)?`) so a bare number can never consume the
    * character before it — ungrouped, `[- .]?` alone matched the preceding
    * space and redaction ate it (`"phone 555-123-4567"` → `"phone<PHONE>"`). */
  val PhoneRe =
    "([+]?1[- .]?)?[(]?[0-9]{3}[)]?[- .][0-9]{3}[- .][0-9]{4}"

  /** Redaction placeholders (redaction order is pinned: email, then IP,
    * then phone — earlier passes must not manufacture later matches, and
    * the placeholders contain no digits or `@`, so they can't). */
  val EmailTag = "<EMAIL>"
  val IpTag = "<IP>"
  val PhoneTag = "<PHONE>"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Redact all three PII classes, in the pinned order. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailTag),
        Ipv4Re, IpTag),
      PhoneRe, PhoneTag)
}

/** DuckDB renderings of [[QualityOps]] — same regexes, same order. */
object QualityOpsSql {
  import QualityOps._

  def dupTokenFrac(toks: String): String =
    s"(case when len($toks) = 0 then 0.0 else " +
      s"1.0 - len(list_distinct($toks))::DOUBLE / len($toks)::DOUBLE end)"

  private def q(re: String): String = "'" + re + "'" // regexes contain no quotes

  def emailCount(text: String): String =
    s"len(regexp_extract_all($text, ${q(EmailRe)}))"
  def ipv4Count(text: String): String =
    s"len(regexp_extract_all($text, ${q(Ipv4Re)}))"
  def phoneCount(text: String): String =
    s"len(regexp_extract_all($text, ${q(PhoneRe)}))"

  def redactPii(text: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($text, " +
      s"${q(EmailRe)}, '$EmailTag', 'g'), " +
      s"${q(Ipv4Re)}, '$IpTag', 'g'), " +
      s"${q(PhoneRe)}, '$PhoneTag', 'g')"
}
