package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native WKT longitude-shift (the reference's bde_copy spatial fixup,
 * conf/linz_bde_uploader.conf:386-391: leading digits/spaces removed, the
 * SRID prefix prepended, and the offset "added to all longitudes") — the
 * compiled twin of `Clean.shiftWktColumns`, which stays as the
 * executable reference and the DuckDB-oracle shape. The declarative form
 * is a chain of two regexp_replace passes, a split, and nested
 * higher-order `transform`s whose per-token body is rlike + trim + split
 * + casts + format_string: higher-order functions are CodegenFallback,
 * so every spatial value pays interpreted lambda steps and several
 * intermediate arrays — and the cleanser runs on EVERY row of every
 * production file with a spatial column (the same hot-path argument as
 * [[WinnowExpr]]). This expression performs the identical
 * mark-split-rewrite-join in one compiled pass per row:
 *
 *  - strip `^[0-9 ]+`, then if the remainder does not open with a WKT
 *    type keyword return the ORIGINAL value untouched (never NULL);
 *  - walk the segments between structural delimiters `( ) ,`; a segment
 *    matching the coordinate-group grammar rewrites — first number
 *    + offset, every number re-rendered `%.6f` (Locale.US, matching
 *    Spark's `format_string`) — others pass through verbatim;
 *  - an unparsable FIRST number keeps the whole group's original text
 *    (the declarative chain's coalesce); an unparsable TAIL number is
 *    skipped (array_join's null-skipping) — `ShiftWktExprSpec` pins the
 *    two forms equal over the full fixture matrix including these arms.
 */
case class ShiftWktExpr(child: Expression, offset: Double, prefix: String)
    extends UnaryExpression {

  require(java.lang.Double.isFinite(offset),
    s"shift_wkt offset must be finite, got $offset")

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shift_wkt requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "shift_wkt"

  override protected def nullSafeEval(input: Any): Any =
    ShiftWktEval.shiftU(input.asInstanceOf[UTF8String], offset, prefix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("wktPrefix", prefix, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.ShiftWktEval.shiftU($c, ${offset}D, $prefixRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShiftWktExpr =
    copy(child = newChild)
}

object ShiftWktEval {

  // the Column-chain's regexes, verbatim (java.util.regex is also what
  // Spark's regexp_replace / rlike execute)
  private val Leading = Pattern.compile("^[0-9 ]+")
  private val Guard = Pattern.compile(
    "^\\s*(POINT|LINESTRING|POLYGON|MULTIPOINT|MULTILINESTRING|" +
      "MULTIPOLYGON|GEOMETRYCOLLECTION)")
  private val Group = Pattern.compile("^\\s*[-+.0-9][-+.0-9eE ]*$")
  private val Ws = Pattern.compile("\\s+")

  def shiftU(s: UTF8String, offset: Double, prefix: String): UTF8String =
    UTF8String.fromString(shift(s.toString, offset, prefix))

  def shift(s: String, offset: Double, prefix: String): String = {
    val stripped = Leading.matcher(s).replaceFirst("")
    if (!Guard.matcher(stripped).find()) return s
    val sb = new java.lang.StringBuilder(stripped.length + prefix.length + 32)
    sb.append(prefix)
    var start = 0
    var i = 0
    val n = stripped.length
    while (i <= n) {
      val delim = i == n || {
        val c = stripped.charAt(i)
        c == '(' || c == ')' || c == ','
      }
      if (delim) {
        if (i > start) appendToken(sb, stripped.substring(start, i), offset)
        if (i < n) sb.append(stripped.charAt(i))
        start = i + 1
      }
      i += 1
    }
    sb.toString
  }

  private def appendToken(
      sb: java.lang.StringBuilder, t: String, offset: Double): Unit = {
    if (!Group.matcher(t).find()) { sb.append(t); return }
    // Spark `trim` strips the space character only; \s+ split may then
    // yield a leading "" for exotic whitespace — parse fails → fallback,
    // exactly like the declarative chain's cast-to-null
    var a = 0
    var b = t.length
    while (a < b && t.charAt(a) == ' ') a += 1
    while (b > a && t.charAt(b - 1) == ' ') b -= 1
    val nums = Ws.split(t.substring(a, b), -1)
    val first = parse(nums(0))
    if (first.isNaN) { sb.append(t); return }
    sb.append(fmt(first + offset))
    var k = 1
    while (k < nums.length) {
      val v = parse(nums(k))
      if (!v.isNaN) { sb.append(' '); sb.append(fmt(v)) }
      k += 1
    }
  }

  /** Spark's non-ANSI string→double cast over the coordinate alphabet
    * ([-+.0-9eE]): plain parse, failure → NaN sentinel (the alphabet
    * excludes every literal Double.parseDouble would accept that
    * Spark's cast would not, and NaN itself — "NaN" has no digits). */
  private def parse(s: String): Double =
    try java.lang.Double.parseDouble(s)
    catch { case _: NumberFormatException => Double.NaN }

  private def fmt(v: Double): String =
    String.format(java.util.Locale.US, "%.6f", Double.box(v))
}
