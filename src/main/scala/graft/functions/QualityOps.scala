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

  // ---- Composite quality score ------------------------------------------
  // Weighted linear penalty over the per-document signals (C4/Gopher-style
  // gates folded into ONE map-side double): each violated gate subtracts its
  // weight from 1.0, floor at 0. Weights and thresholds are pinned
  // constants; the DuckDB rendering keeps the identical operation ORDER so
  // the score (and any comparison against it) is bit-identical.

  /** (threshold-condition weight) pairs; the subtraction order is pinned. */
  val TokMinQ = 20L; val TokMaxQ = 1000L // token-count window
  val MeanLenMin = 3.0; val MeanLenMax = 10.0 // mean token length window
  val PunctMax = 0.1 // punctuation ratio cap
  val StopMin = 0.05 // minimum stopword mass
  val DupMax = 0.3 // duplicate-token fraction cap
  val WTok = 0.35; val WLen = 0.15; val WPunct = 0.15
  val WStop = 0.15; val WDup = 0.2

  /**
   * Composite document quality in [0, 1]: 1.0 minus a fixed penalty per
   * violated gate (token-count window, mean-token-length window,
   * punctuation ratio, stopword mass, duplicate-token fraction). A pure
   * per-row projection over one tokenize — no shuffle, no UDF — so the
   * gate streams over 100 TB at scan speed; `score >= τ` is the keep rule.
   */
  def qualityScore(text: Column, toks: Column): Column = {
    val nTok = size(toks).cast("long")
    val meanLen = TextOps.meanTokenLen(toks)
    val punctRatio = TextOps.punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val pTok = when(nTok < TokMinQ || nTok > TokMaxQ, lit(WTok)).otherwise(lit(0.0))
    val pLen = when(meanLen < MeanLenMin || meanLen > MeanLenMax, lit(WLen))
      .otherwise(lit(0.0))
    val pPunct = when(punctRatio > PunctMax, lit(WPunct)).otherwise(lit(0.0))
    val pStop = when(TextOps.stopwordFrac(toks) < StopMin, lit(WStop))
      .otherwise(lit(0.0))
    val pDup = when(dupTokenFrac(toks) > DupMax, lit(WDup)).otherwise(lit(0.0))
    greatest(lit(1.0) - pTok - pLen - pPunct - pStop - pDup, lit(0.0))
  }

  // ---- Hashed linear classifier -----------------------------------------
  // The model-based quality filter of CCNet/LLaMA-style pipelines (a
  // fastText/logistic scorer over hashed token features) reduced to its
  // Spark plumbing: tokens hash into weight cells, cell weights sum per
  // document, the mean is the score and `score >= 0` the keep rule. Real
  // weights are a trained artifact (broadcast, or map-side literals when
  // they fit); here the cell weight is DERIVED from the cell index —
  // w(h) = ((h·MULT) mod B)/B − 0.5, uniform in [−0.5, 0.5) — which keeps
  // the operator deterministic and the oracle independently computable
  // while exercising the exact plan a trained model runs: one map-side
  // projection, no shuffle, no UDF.

  /** Feature-cell count (2^20) and Knuth's multiplicative constant. */
  val ClassifierBuckets = 1048576L
  val ClassifierMult = 2654435761L

  /** Exact integer weight-cell sum Σ ((h·MULT) mod B) — native one-pass
    * [[graft.plans.HashWeightSumExpr]]. */
  private def weightCellSum(thash: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.HashWeightSumExpr(
      ColumnBridge.expression(thash), ClassifierMult, ClassifierBuckets))
  }

  /** Higher-order-fold reference for [[classifierScore]]'s cell sum, pinned
    * by the spec (interpreted lambda — the executable definition). */
  private[graft] def weightCellSumHof(thash: Column): Column =
    aggregate(thash, lit(0L), (acc, h) =>
      acc + pmod(h * lit(ClassifierMult), lit(ClassifierBuckets)))

  /**
   * Mean hashed-cell weight of a document's tokens, in [−0.5, 0.5): the
   * integer cell sum converts to a double ONCE (sum/B/n − 0.5, operation
   * order pinned), so the score is bit-identical across engines instead of
   * depending on a float summation order. Empty documents score 0.0.
   */
  def classifierScore(thash: Column): Column =
    when(size(thash) === 0, lit(0.0)).otherwise(
      weightCellSum(thash).cast("double") / lit(ClassifierBuckets.toDouble) /
        size(thash).cast("double") - lit(0.5))

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

  /** zlib-compressed byte length of the text's UTF-8 bytes (native
    * codegen'd [[graft.plans.DeflateLenExpr]] — one reused Deflater per
    * executor thread; only the length leaves the expression). */
  def deflateLen(text: Column, level: Int = 6): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.DeflateLenExpr(
      ColumnBridge.expression(text), level))
  }

  /** Compression-ratio quality signal (Dolma-lineage): deflated bytes /
    * raw UTF-8 bytes, 6-decimal rounded. LOW = near-pure repetition
    * (boilerplate loops, keyboard mash); NEAR/ABOVE 1 = incompressible
    * noise. Empty text has no ratio → null (gates treat it as its own
    * degenerate class, not as repetitive). The division is two exact
    * integer-valued doubles, so the rounded value is engine-portable. */
  def compressionRatio(text: Column, level: Int = 6): Column =
    when(octet_length(text) > 0,
      round(deflateLen(text, level).cast("double") /
        octet_length(text).cast("double"), 6))

  // ---- Gopher document-shape rules (Rae et al. 2021, Table A1) --------

  /** The stop-word presence list Gopher's rule 6 names. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** `#`/ellipsis symbols per word (rule: ≤ 0.1). */
  def symbolWordRatio(text: Column, toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      (regexp_count(text, lit("#")) +
        regexp_count(text, lit("\\.\\.\\.|…"))).cast("double") /
        size(toks).cast("double"))

  /** Fraction of lines starting with a bullet glyph (rule: ≤ 0.9). */
  def bulletLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    size(filter(lines, l => trim(l).startsWith("-") ||
      trim(l).startsWith("*") || trim(l).startsWith("•"))).cast("double") /
      size(lines).cast("double")
  }

  /** Fraction of lines ending with an ellipsis (rule: ≤ 0.3). */
  def ellipsisLineFrac(text: Column): Column = {
    val lines = split(text, "\n")
    size(filter(lines, l => trim(l).endsWith("...") ||
      trim(l).endsWith("…"))).cast("double") / size(lines).cast("double")
  }

  /** Fraction of words containing at least one alphabetic char
    * (rule: ≥ 0.8). */
  def alphaWordFrac(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") /
        size(toks).cast("double"))

  /** Count of DISTINCT Gopher stop words present (rule: ≥ 2). */
  def gopherStopHits(toks: Column): Column =
    size(array_intersect(array_distinct(transform(toks, lower(_))),
      typedLit(GopherStops))).cast("long")

  /** Heuristic syllable count: vowel GROUPS per lowercased token, floored
    * at one per token — the standard cheap approximation under Flesch
    * scoring (exact syllabification needs a dictionary; readability
    * formulas were calibrated on approximations like this one). */
  def syllableCount(toks: Column): Column =
    aggregate(toks, lit(0L), (a, w) => a +
      greatest(lit(1L), regexp_count(lower(w), lit("[aeiouy]+")).cast("long")))

  /** Sentence count: terminal-punctuation runs, floored at one (a
    * fragment is one sentence, not a division by zero). */
  def sentenceCount(text: Column): Column =
    greatest(lit(1L), regexp_count(text, lit("[.!?]+")).cast("long"))

  /** Flesch Reading Ease (Flesch 1948; the readability gate of
    * textbook-style quality filters): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/words). Fixed subtraction order, integer-exact
    * counts in, one double formula out — engine-portable. A wordless
    * document has no reading ease: NULL, not an ANSI divide-by-zero that
    * kills the whole pass (every sibling ratio guards its denominator). */
  def fleschScore(nWords: Column, nSentences: Column,
      nSyllables: Column): Column =
    when(nWords > 0,
      round(lit(206.835)
        - lit(1.015) * nWords.cast("double") / nSentences.cast("double")
        - lit(84.6) * nSyllables.cast("double") / nWords.cast("double"), 6))

  /** Mojibake artifact density: occurrences of the cp1252-glyph lead-ins
    * every UTF-8-as-cp1252 double-decode produces (Ã for U+00C0-range
    * leads, â€ for the punctuation block, Â for NBSP-family) — the cheap
    * detector that decides which documents pay the repair round-trip. */
  def mojibakeScore(text: Column): Column =
    regexp_count(text, lit("Ã|â€|Â")).cast("long")

  /** ftfy-style mojibake repair: re-encode as cp1252, strictly re-decode
    * as UTF-8, keep the result only when the whole string round-trips and
    * shrinks (native codegen'd [[graft.plans.MojibakeRepairExpr]] — see
    * its contract for why single-encoded text is safe). */
  def mojibakeRepair(text: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.plans.MojibakeRepairExpr(
      ColumnBridge.expression(text)))
  }

  /** Segment-scoped mojibake repair (what ftfy actually does on mixed
    * documents): the conservative whole-string round-trip of
    * [[mojibakeRepair]] bails on any string mixing genuine non-cp1252
    * text (CJK, one real 'é') with artifacts — so a multilingual document
    * with one mojibake line would never repair. Applying the SAME three
    * rules per NEWLINE-SEGMENT scopes the bail-out to the segment: clean
    * lines pass through byte-identical, artifact-bearing lines repair
    * independently. `split(_, "\n", -1)` keeps trailing empty segments,
    * so join-by-"\n" reconstructs the exact original line structure. The
    * whole-string expression stays the cross-engine-pinned primitive;
    * this is a pure composition over it (still map-side, still inside
    * whole-stage codegen). */
  def mojibakeRepairLines(text: Column): Column =
    array_join(
      transform(split(text, "\n", -1), l => mojibakeRepair(l)), "\n")

  /** Payment-card candidate runs, two forms: 13–19 CONTIGUOUS digits, or
    * separator-grouped runs whose groups are ≤ 6 digits (real card
    * grouping — 4-4-4-4, 4-6-5, …). The group bound is what stops a card
    * followed by an unrelated digit run ("4111… 2026") from merging into
    * one over-long candidate that the length filter would silently
    * discard, leaking the card past the gate. Two cards TOUCHING with a
    * single separator still merge (documented limitation — no RE2-safe
    * pattern splits them; lookarounds are off the table because the
    * oracle runs the IDENTICAL pattern). Both engines agree on the
    * alternation: at any start either only one form matches or the
    * contiguous form is the longer, so Java's first-match and RE2's
    * leftmost-longest pick the same spans. */
  val CardRe = "[0-9]{13,19}|[0-9]{1,6}(?:[ -][0-9]{1,6}){1,5}"

  def creditCardCandidates(text: Column): Column =
    filter(
      transform(regexp_extract_all(text, lit(CardRe), lit(0)),
        m => regexp_replace(m, "[ -]", "")),
      c => length(c) >= 13 && length(c) <= 19)

  /** Luhn checksum (ISO/IEC 7812-1 Annex B) over a bare digit string —
    * the standard false-positive filter for payment-card PII (a random
    * 16-digit run passes 1-in-10; a Luhn-validated one is worth
    * redacting). Right-to-left fold, every second digit doubled with
    * digit-sum correction; exact integer arithmetic, engine-portable. */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val sum = aggregate(sequence(lit(1), length(rev)), lit(0L), (acc, i) => {
      val d = (ascii(rev.substr(i, lit(1))) - lit(48)).cast("long")
      acc + when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    length(digits) > 0 && sum % 10 === 0
  }

  /** Unbounded variant of [[CardRe]]: contiguous digit runs of 13+ and
    * separator-grouped runs of ANY total length. The safety-net scanner
    * below needs the MERGED runs the bounded candidate regex discards —
    * a card followed by a separator-joined expiry ("4111 1111 1111 1111
    * 12 26") merges into one 20-digit run that the 13–19 length filter
    * would silently keep past the gate. */
  val CardMergedRe = "[0-9]{13,}|[0-9]{1,6}(?:[ -][0-9]{1,6})+"

  /** Defense-in-depth card detector for the HYGIENE GATE (not the
    * reporting row). In-bounds runs (13–19 digits after separator
    * stripping) keep the existing whole-run Luhn rule — window-scanning
    * them would false-drop on the ~7·starts/10 chance that some
    * SUB-window of an innocent run passes Luhn. OVER-LONG runs (20–64
    * digits — where the bounded [[CardRe]]'s length filter silently
    * discards and LEAKS) are swept for any Luhn-valid 13–19 digit
    * window: that catches a card merged with a separator-joined expiry
    * and two touching grouped cards fused past the 5-group cap. Sweep
    * cost is bounded by construction: ≤ 7 window lengths × ≤ 52 starts
    * ≈ 360 Luhn folds per run, one codegen'd projection. A >64-digit
    * run is a digit wall (minified data, dumps), not a card context —
    * out of scope by the same argument the 6-digit group bound makes.
    * False-positive direction is the SAFE one for a PII gate (a dropped
    * innocent row costs a document; a leaked card costs a liability).
    * Mirrored exactly in [[QualityOpsSql.containsLuhnCard]]. */
  def containsLuhnCard(text: Column): Column = {
    val runs = transform(
      regexp_extract_all(text, lit(CardMergedRe), lit(0)),
      m => regexp_replace(m, "[ -]", ""))
    val inBounds = exists(runs,
      r => length(r) >= 13 && length(r) <= 19 && luhnValid(r))
    val overLong = exists(filter(runs,
        r => length(r) >= 20 && length(r) <= 64),
      r => exists(sequence(lit(13), lit(19)), w =>
        exists(sequence(lit(1), length(r) - w + 1), i =>
          luhnValid(r.substr(i, w)))))
    inBounds || overLong
  }
}

/** DuckDB renderings of [[QualityOps]] — same regexes, same order. */
object QualityOpsSql {
  import QualityOps._

  def dupTokenFrac(toks: String): String =
    s"(case when len($toks) = 0 then 0.0 else " +
      s"1.0 - len(list_distinct($toks))::DOUBLE / len($toks)::DOUBLE end)"

  /** Mirror of [[QualityOps.qualityScore]] — identical gate order and
    * subtraction order, so the double is bit-identical. */
  def qualityScore(text: String, toks: String): String = {
    val nTok = s"len($toks)"
    val meanLen = graft.functions.TextOpsSql.meanTokenLen(toks)
    val punctRatio = s"(${graft.functions.TextOpsSql.punctCount(text)}::DOUBLE" +
      s" / greatest(length($text)::DOUBLE, 1.0))"
    // every constant is cast to DOUBLE: DuckDB parses bare decimal literals
    // as DECIMAL, whose exact arithmetic would diverge from Spark's doubles
    def d(v: Double) = s"CAST($v AS DOUBLE)"
    val pTok = s"(case when $nTok < $TokMinQ or $nTok > $TokMaxQ " +
      s"then ${d(WTok)} else ${d(0.0)} end)"
    val pLen = s"(case when $meanLen < ${d(MeanLenMin)} or " +
      s"$meanLen > ${d(MeanLenMax)} then ${d(WLen)} else ${d(0.0)} end)"
    val pPunct =
      s"(case when $punctRatio > ${d(PunctMax)} then ${d(WPunct)} else ${d(0.0)} end)"
    val pStop = s"(case when ${graft.functions.TextOpsSql.stopwordFrac(toks)} " +
      s"< ${d(StopMin)} then ${d(WStop)} else ${d(0.0)} end)"
    val pDup = s"(case when ${dupTokenFrac(toks)} > ${d(DupMax)} " +
      s"then ${d(WDup)} else ${d(0.0)} end)"
    s"greatest(${d(1.0)} - $pTok - $pLen - $pPunct - $pStop - $pDup, ${d(0.0)})"
  }

  /** Mirror of [[QualityOps.classifierScore]]: exact integer cell sum, one
    * double conversion in the pinned order (sum/B/n − 0.5). `h*MULT` stays
    * below 2^52, inside DuckDB's overflow-checked BIGINT. */
  def classifierScore(thash: String): String =
    s"(case when len($thash) = 0 then CAST(0.0 AS DOUBLE) else " +
      s"list_sum(list_transform($thash, " +
      s"h -> (h * $ClassifierMult) % $ClassifierBuckets))::DOUBLE " +
      s"/ CAST($ClassifierBuckets AS DOUBLE) / len($thash)::DOUBLE " +
      s"- CAST(0.5 AS DOUBLE) end)"

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

  // ---- Gopher document-shape mirrors ----------------------------------

  def symbolWordRatio(text: String, toks: String): String =
    s"(case when len($toks) = 0 then 0.0 else " +
      s"(len(regexp_extract_all($text, '#')) + " +
      s"len(regexp_extract_all($text, '\\.\\.\\.|…')))::DOUBLE " +
      s"/ len($toks)::DOUBLE end)"

  private def lineFrac(text: String, pred: String): String =
    s"(len(list_filter(string_split($text, chr(10)), l -> $pred))::DOUBLE " +
      s"/ len(string_split($text, chr(10)))::DOUBLE)"

  def bulletLineFrac(text: String): String =
    lineFrac(text, "starts_with(trim(l), '-') or " +
      "starts_with(trim(l), '*') or starts_with(trim(l), '•')")

  def ellipsisLineFrac(text: String): String =
    lineFrac(text, "ends_with(trim(l), '...') or ends_with(trim(l), '…')")

  def alphaWordFrac(toks: String): String =
    s"(case when len($toks) = 0 then 0.0 else " +
      s"len(list_filter($toks, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE " +
      s"/ len($toks)::DOUBLE end)"

  def gopherStopHits(toks: String): String = {
    val stops = GopherStops.map(w => s"'$w'").mkString("[", ", ", "]")
    s"CAST(len(list_intersect(list_distinct(list_transform($toks, " +
      s"w -> lower(w))), $stops)) AS BIGINT)"
  }

  def syllableCount(toks: String): String =
    s"coalesce(list_sum(list_transform($toks, w -> greatest(1, " +
      s"len(regexp_extract_all(lower(w), '[aeiouy]+'))))), 0)::BIGINT"

  def sentenceCount(text: String): String =
    s"greatest(1, len(regexp_extract_all($text, '[.!?]+')))::BIGINT"

  /** Mirror of [[QualityOps.fleschScore]] — same subtraction order, same
    * wordless → NULL guard. */
  def fleschScore(nWords: String, nSentences: String,
      nSyllables: String): String =
    s"(case when $nWords > 0 then " +
      s"round(206.835 - 1.015 * $nWords::DOUBLE / $nSentences::DOUBLE " +
      s"- 84.6 * $nSyllables::DOUBLE / $nWords::DOUBLE, 6) end)"

  def mojibakeScore(text: String): String =
    s"CAST(len(regexp_extract_all($text, 'Ã|â€|Â')) AS BIGINT)"

  def creditCardCandidates(text: String): String =
    s"list_filter(list_transform(regexp_extract_all($text, ${q(CardRe)}), " +
      s"m -> regexp_replace(m, '[ -]', '', 'g')), " +
      s"c -> length(c) >= 13 and length(c) <= 19)"

  /** Mirror of [[QualityOps.luhnValid]] — same right-to-left fold. */
  def luhnValid(d: String): String = {
    val dig = s"(ascii(substr(reverse($d), i, 1)) - 48)"
    s"(length($d) > 0 and list_sum(list_transform(range(1, length($d)+1), " +
      s"i -> case when i % 2 = 0 then " +
      s"case when $dig * 2 > 9 then $dig * 2 - 9 else $dig * 2 end " +
      s"else $dig end)) % 10 = 0)"
  }

  /** Mirror of [[QualityOps.containsLuhnCard]] — same merged-run regex,
    * same whole-run rule for 13–19, same 20–64 window sweep (DuckDB
    * `range` is half-open where Spark `sequence` is inclusive, hence the
    * `+ 1`/`+ 2` upper bounds), same Luhn fold. Lambda variables r/w/j/i
    * nest without capture. */
  def containsLuhnCard(text: String): String = {
    val runs = s"list_transform(" +
      s"regexp_extract_all($text, ${q(CardMergedRe)}), " +
      s"m -> regexp_replace(m, '[ -]', '', 'g'))"
    val inB = s"len(list_filter($runs, " +
      s"r -> length(r) >= 13 and length(r) <= 19 and " +
      s"${luhnValid("r")})) > 0"
    val win = luhnValid("substr(r, j, w)")
    val overL = s"len(list_filter(" +
      s"list_filter($runs, r -> length(r) >= 20 and length(r) <= 64), " +
      s"r -> len(list_filter(range(13, 20), " +
      s"w -> len(list_filter(range(1, length(r) - w + 2), " +
      s"j -> $win)) > 0)) > 0)) > 0"
    s"($inB or $overL)"
  }
}
