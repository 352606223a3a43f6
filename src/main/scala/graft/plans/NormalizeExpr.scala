package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native codegen'd expression — the
 * canonicalization step a dedup pipeline runs BEFORE content hashing
 * (CCNet/Gopher-style): the same text crawled as precomposed `é` (U+00E9)
 * and as `e` + combining acute (U+0065 U+0301) must hash identically, or
 * exact dedup silently misses byte-level variants of identical pages.
 *
 * Sits in the hot path of every digest (one pass over ALL corpus text),
 * so the implementation leans on two facts:
 *  - `Normalizer.isNormalized` is a cheap quick-check scan, and real
 *    crawl text is overwhelmingly already-NFC — the common row costs one
 *    scan and ZERO allocation (the input UTF8String passes through);
 *  - only rows that genuinely carry decomposed sequences pay the
 *    normalize + re-encode.
 */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeEval.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NormalizeEval.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/**
 * Accent folding for match/dedup keys: lowercase, then strip every
 * combining mark after canonical (NFD) decomposition — `É`, `é`, and
 * `e`+U+0301 all fold to `e`. The fold order (lowercase FIRST, then
 * decompose-and-strip) matches the common SQL idiom
 * `strip_accents(lower(x))`, which the oracle states.
 *
 * ASCII fast path: a row with no byte ≥ 0x80 folds with UTF8String's
 * own ASCII lowercase — no decomposition, no String round-trip.
 */
case class AccentFoldExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"accent_fold requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "accent_fold"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeEval.accentFold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.NormalizeEval.accentFold($s)")

  override protected def withNewChildInternal(newChild: Expression): AccentFoldExpr =
    copy(child = newChild)
}

object NormalizeEval {
  import java.text.Normalizer

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    val bytes = s.getBytes
    while (i < n) {
      if ((bytes(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  def nfc(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s // ASCII is NFC by construction — zero alloc
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Lowercase, canonical-decompose, drop combining marks (general
    * category M) — one pass over the decomposed CODE POINTS, so
    * supplementary-plane marks (e.g. the U+1D165..1D169 musical
    * combiners, surrogate pairs in UTF-16) strip like BMP ones instead
    * of classifying as SURROGATE and surviving. */
  def accentFold(s: UTF8String): UTF8String = {
    if (isAscii(s)) return s.toLowerCase
    val lowered = s.toString.toLowerCase(java.util.Locale.ROOT)
    val d = Normalizer.normalize(lowered, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if ((Character.getType(cp) match {
            case Character.NON_SPACING_MARK |
                Character.COMBINING_SPACING_MARK |
                Character.ENCLOSING_MARK => false
            case _ => true
          })) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
