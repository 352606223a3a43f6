package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mojibake repair (the ftfy primitive — Speer 2019, "ftfy: fixes text for
 * you", the public library every large text pipeline runs at ingest): text
 * whose UTF-8 bytes were once DECODED as Windows-1252 shows artifact runs
 * ("Ã©" for é, "â€™" for ', "â€œ" for "); the repair is the inverse
 * round-trip — re-ENCODE the string as cp1252 and strictly re-DECODE the
 * bytes as UTF-8. The contract is ftfy's conservative whole-string rule:
 * repair only when
 *
 *  1. every char maps back to a cp1252 byte (else some char was never a
 *     cp1252 rendering — leave the string alone),
 *  2. the byte sequence is STRICTLY valid UTF-8 (any malformed run →
 *     original returned), and
 *  3. the decode actually shortens the string (a multi-byte UTF-8 char
 *     renders as ≥ 2 cp1252 glyphs, so genuine mojibake always shrinks;
 *     pure ASCII round-trips to itself and passes through unchanged).
 *
 * Legitimate single-encoded text is safe by construction: "café"'s é
 * encodes to the lone byte 0xE9, which is malformed UTF-8 → rule 2 keeps
 * the original. Never-cp1252 chars (U+2028, CJK, …) stop at rule 1.
 *
 * Hot-path shape: per-thread encoder/decoder + geometrically grown reused
 * buffers; fast pre-scan bails at the first char > 0xFF before touching
 * the codec machinery (ASCII corpora pay one scan, no allocation); stays
 * inside whole-stage codegen via `defineCodeGen`.
 */
case class MojibakeRepairExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mojibake_repair requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "mojibake_repair"

  override protected def nullSafeEval(input: Any): Any =
    MojibakeEval.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.MojibakeEval.repair($s)")

  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepairExpr = copy(child = newChild)
}

object MojibakeEval {
  import java.nio.ByteBuffer
  import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction}

  private val Utf8 = Charset.forName("UTF-8")

  /** The published Windows-1252 high half (bytes 0x80–0x9F → code point).
    * The five positions the standard leaves undefined (0x81 0x8D 0x8F
    * 0x90 0x9D) map to their C1 controls — ftfy's "sloppy-windows-1252":
    * a strict encoder would reject U+009D and make the extremely common
    * `â€` (mojibake of the right double quote ”) irreparable. */
  private val Cp1252High: Array[Int] = Array(
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)

  /** char → cp1252 byte for the 0x80–0x9F glyph block; −1 = unmappable. */
  private val HighInv: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte]()
    var b = 0
    while (b < 32) {
      m.put(Cp1252High(b).toChar, (0x80 + b).toByte)
      b += 1
    }
    m
  }

  private final class State {
    val dec: CharsetDecoder = Utf8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    var buf: Array[Byte] = new Array[Byte](256)
  }
  private val local = ThreadLocal.withInitial[State](() => new State)

  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast bail: a pure-ASCII string cannot be mojibake and must not pay
    // the encode pass
    var i = 0
    var hasHigh = false
    while (i < str.length && !hasHigh) {
      if (str.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val st = local.get()
    if (st.buf.length < str.length) st.buf = new Array[Byte](str.length)
    val bytes = st.buf
    // manual sloppy-cp1252 encode: identity below 0x80 and in A0–FF
    // (cp1252 == latin-1 there), the table block for 80–9F glyphs,
    // anything else unmappable → rule 1, keep the original
    i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c < 0x80 || (c >= 0xA0 && c <= 0xFF)) bytes(i) = c.toByte
      else {
        val b = HighInv.get(c)
        if (b == null) return s
        bytes(i) = b.byteValue()
      }
      i += 1
    }
    st.dec.reset()
    val decoded =
      try st.dec.decode(ByteBuffer.wrap(bytes, 0, str.length))
      catch { case _: java.nio.charset.CharacterCodingException => return s }
    val out = decoded.toString
    if (out.length < str.length) UTF8String.fromString(out) else s
  }
}
