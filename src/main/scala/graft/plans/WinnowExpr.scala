package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/**
 * Native winnowing fingerprint selection (Schleimer, Wilkerson & Aiken
 * 2003) over an `array<bigint>` shingle-hash stream — the codegen'd twin
 * of `TextOps.winnowHof` (kept as the executable reference; the spec pins
 * them element-for-element). The HOF formulation is a `transform` whose
 * body is an `aggregate` over a fresh `sequence` per window: higher-order
 * functions are CodegenFallback, so every window pays w interpreted
 * lambda steps plus two allocations — and winnow extraction is the hot
 * stage of the whole fingerprint family (the at-rest index build, the
 * in-session contamination match, and the streaming gate's per-batch
 * projection all start with it). This expression runs the identical
 * selection as one compiled pass per row.
 *
 * Semantics mirrored exactly from the HOF
 * (`when(size >= w, array_sort(array_distinct(transform(...))))`):
 *  - null or shorter-than-w input → EMPTY array;
 *  - per window [j, j+w): the minimum hash with ties to the RIGHTMOST
 *    position (the paper's robust winnowing — `<=` keeps the later
 *    element);
 *  - a null element never wins a window (`null <= acc` falls to the
 *    accumulator), so an all-null window yields the seed
 *    `(pos = -1, fp = Long.MaxValue)` — preserved bit-for-bit;
 *  - output = the DISTINCT selections sorted by (pos, fp), as
 *    `array<struct<pos:int, fp:bigint>>`.
 */
case class WinnowExpr(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 1 && w <= 64, s"winnow window 1..64 supported, got $w")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "winnow"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) WinnowEval.Empty
    else WinnowEval.winnow(v.asInstanceOf[ArrayData], w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${childGen.isNull}
         |    ? graft.plans.WinnowEval.Empty()
         |    : graft.plans.WinnowEval.winnow(${childGen.value}, $w);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

object WinnowEval {
  /** Shared empty result; method-style accessor for generated Java. */
  val Empty: GenericArrayData = new GenericArrayData(Array.empty[Any])

  /** One compiled pass: slide the w-window, select min-with-rightmost-tie
    * per window (a null element never wins), then dedupe and sort by
    * (pos, fp). Adjacent duplicates (the common case — the same selection
    * re-chosen by overlapping windows) are skipped inline; the final
    * sort + linear dedupe also covers the non-adjacent repeat an all-null
    * window's `(-1, MaxValue)` seed can produce between real selections,
    * matching the HOF's global `array_sort(array_distinct(...))`. */
  def winnow(shingles: ArrayData, w: Int): ArrayData = {
    val n = shingles.numElements()
    if (n < w) return Empty
    var posBuf = new Array[Int](math.min(n, 64))
    var fpBuf = new Array[Long](posBuf.length)
    var m = 0
    var lastPos = Int.MinValue
    var lastFp = 0L
    var j = 0
    while (j <= n - w) {
      var pos = -1
      var fp = Long.MaxValue
      var i = j
      val end = j + w
      while (i < end) {
        if (!shingles.isNullAt(i)) {
          val h = shingles.getLong(i)
          if (h <= fp) { pos = i; fp = h }
        }
        i += 1
      }
      if (pos != lastPos || fp != lastFp) {
        if (m == posBuf.length) {
          posBuf = java.util.Arrays.copyOf(posBuf, m * 2)
          fpBuf = java.util.Arrays.copyOf(fpBuf, m * 2)
        }
        posBuf(m) = pos
        fpBuf(m) = fp
        m += 1
        lastPos = pos
        lastFp = fp
      }
      j += 1
    }
    // global (pos, fp) order + dedupe — pack into one long-sortable key:
    // pos is an int (and ≥ -1), so (pos + 1).toLong << 42 | fp-rank is
    // unsafe for arbitrary fp; sort index pairs instead
    val idx = Array.range(0, m).map(Integer.valueOf).sortWith { (a, b) =>
      val (pa, pb) = (posBuf(a), posBuf(b))
      if (pa != pb) pa < pb
      else fpBuf(a) < fpBuf(b)
    }
    val out = new scala.collection.mutable.ArrayBuffer[Any](m)
    var prev = -1
    idx.foreach { boxed =>
      val k = boxed.intValue()
      if (prev < 0 || posBuf(k) != posBuf(prev) || fpBuf(k) != fpBuf(prev))
        out += new GenericInternalRow(Array[Any](posBuf(k), fpBuf(k)))
      prev = k
    }
    new GenericArrayData(out.toArray)
  }
}
