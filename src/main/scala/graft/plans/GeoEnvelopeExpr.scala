package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * One-pass vertex-envelope scan over a WKT/EWKT string — the compiled
 * twin of the declarative accessor chain in [[graft.functions.GeoOps]]
 * (`array_min(transform(regexp_extract_all(e, PairRe, 1), cast))` ×4 +
 * `aggregate(...)` ×2 + `size(...)`): higher-order functions are
 * CodegenFallback, each accessor re-ran the full regexp pair scan and
 * built intermediate arrays, so a filter+project like `geo_envelope`
 * paid the scan up to ~9× per row and the spatial-index ingest
 * ([[graft.operators.GeoIndex]]) 4× per geometry — the same
 * interpreted-lambda hot path [[ShiftWktExpr]] and [[WinnowExpr]]
 * replaced (a 100 TB ingest cannot afford it). This expression walks
 * the coordinate pairs ONCE and returns every aggregate the accessors
 * derive:
 *
 *   struct(xmin, xmax, ymin, ymax: double, n: int, sumx, sumy: double)
 *
 * Exact-equivalence contract (GeoEnvelopeExprSpec pins all arms against
 * the declarative chain, which stays in [[graft.functions.GeoOps]] as
 * the executable reference and the DuckDB-oracle shape):
 *  - matches come from the identical `PairRe` via java.util.regex —
 *    the engine `regexp_extract_all` itself runs;
 *  - each captured group parses with `try_cast(... as double)`
 *    semantics — the chain's element cast and the DuckDB twin's
 *    TRY_CAST (the coordinate alphabet excludes every special literal,
 *    so plain parseDouble with failure→null is exact — the
 *    [[ShiftWktEval.parse]] argument);
 *  - xmin/xmax/ymin/ymax skip unparsable (null) elements like
 *    `array_min`/`array_max`, null when no element parses;
 *  - n counts ALL matches (parsable or not) like `size(...)`, 0 when
 *    none (callers re-apply the `when(n > 0, n)` null convention);
 *  - sumx/sumy fold in text order from 0.0 and null-poison on the
 *    first unparsable element, exactly like `aggregate(xs, 0.0, +)`
 *    (double addition is order-sensitive; same order ⇒ same bits).
 */
case class GeoEnvelopeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GeoEnvelopeEval.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"geo_envelope requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "geo_envelope_scan"

  override protected def nullSafeEval(input: Any): Any =
    GeoEnvelopeEval.envU(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GeoEnvelopeEval.envU($c)")

  override protected def withNewChildInternal(newChild: Expression): GeoEnvelopeExpr =
    copy(child = newChild)
}

object GeoEnvelopeEval {

  val schema: StructType = StructType(Seq(
    StructField("xmin", DoubleType), StructField("xmax", DoubleType),
    StructField("ymin", DoubleType), StructField("ymax", DoubleType),
    StructField("n", IntegerType),
    StructField("sumx", DoubleType), StructField("sumy", DoubleType)))

  // GeoOps.PairRe, verbatim (java.util.regex is what regexp_extract_all
  // executes)
  private val PairRe = Pattern.compile(
    "([-+]?[.0-9][0-9.eE+-]*) ([-+]?[.0-9][0-9.eE+-]*)")

  def envU(s: UTF8String): InternalRow = env(s.toString)

  def env(s: String): InternalRow = {
    val m = PairRe.matcher(s)
    var n = 0
    var xmin, ymin = Double.PositiveInfinity
    var xmax, ymax = Double.NegativeInfinity
    var sumx, sumy = 0.0
    var anyX, anyY = false    // at least one PARSABLE x / y seen
    var nullX, nullY = false  // at least one UNPARSABLE x / y seen
    while (m.find()) {
      n += 1
      val x = parse(m.group(1))
      if (x.isNaN) nullX = true
      else {
        anyX = true
        if (x < xmin) xmin = x
        if (x > xmax) xmax = x
        sumx += x
      }
      val y = parse(m.group(2))
      if (y.isNaN) nullY = true
      else {
        anyY = true
        if (y < ymin) ymin = y
        if (y > ymax) ymax = y
        sumy += y
      }
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    if (anyX) { row.update(0, xmin); row.update(1, xmax) }
    else { row.setNullAt(0); row.setNullAt(1) }
    if (anyY) { row.update(2, ymin); row.update(3, ymax) }
    else { row.setNullAt(2); row.setNullAt(3) }
    row.setInt(4, n)
    // aggregate(xs, 0.0, +) null-poisons on the first null element and
    // stays poisoned; an all-parsable (or empty) list folds to the sum
    if (nullX) row.setNullAt(5) else row.update(5, sumx)
    if (nullY) row.setNullAt(6) else row.update(6, sumy)
    row
  }

  /** Spark's non-ANSI string→double cast over the coordinate alphabet —
    * see [[ShiftWktEval.parse]]: the alphabet ([-+.0-9eE]) admits no
    * special literal and "NaN" has no digits, so NaN is a safe failure
    * sentinel. */
  private def parse(s: String): Double =
    try java.lang.Double.parseDouble(s)
    catch { case _: NumberFormatException => Double.NaN }

  /** The declarative chain's element lists, for the equivalence spec:
    * (xs, ys) with unparsable elements null — what
    * `transform(regexp_extract_all(e, PairRe, i), cast)` yields. */
  private[graft] def pairLists(s: String): (GenericArrayData, GenericArrayData) = {
    val m = PairRe.matcher(s)
    val xs = scala.collection.mutable.ArrayBuffer.empty[Any]
    val ys = scala.collection.mutable.ArrayBuffer.empty[Any]
    while (m.find()) {
      val x = parse(m.group(1)); xs += (if (x.isNaN) null else x)
      val y = parse(m.group(2)); ys += (if (y.isNaN) null else y)
    }
    (new GenericArrayData(xs.toArray), new GenericArrayData(ys.toArray))
  }
}
