package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Max element multiplicity of an `array<bigint>` in ONE per-row pass — the
 * map-side replacement for `explode → groupBy(id, elem) → count → groupBy
 * (id) → max`, which shuffles every array element twice to compute what is
 * a PER-ROW statistic. The repetition quality gate (most-common-n-gram
 * mass, Gopher-style) runs over the entire corpus at 100 TB; with this
 * expression its plan is a pure projection: no exchange at all.
 *
 * Semantics mirror the explode/groupBy pipeline exactly:
 *  - empty array → 0 (no groups, `max` over nothing never happens — the
 *    callers guard emptiness; 0 keeps the expression total);
 *  - null ELEMENTS form their own group (explode emits null rows and
 *    groupBy counts the null key), so they count toward the max;
 *  - null array → null (the default null-intolerant contract).
 */
case class ArrayMaxFreqExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"array_max_freq requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "array_max_freq"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      ArrayFreqEval.maxFreq(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, arr => s"graft.plans.ArrayFreqEval.maxFreq($arr)")

  override protected def withNewChildInternal(newChild: Expression): ArrayMaxFreqExpr =
    copy(child = newChild)
}

object ArrayFreqEval {
  /** Highest multiplicity over the array's elements (nulls are one group —
    * counted aside, HashMap.merge rejects null keys). */
  def maxFreq(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[java.lang.Long, java.lang.Long](
      Math.min(n * 2, 64))
    var nullCount = 0L
    var best = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        nullCount += 1
        if (nullCount > best) best = nullCount
      } else {
        val key = java.lang.Long.valueOf(arr.getLong(i))
        val prev = counts.get(key)
        val c: Long = (if (prev == null) 0L else prev.longValue()) + 1L
        counts.put(key, java.lang.Long.valueOf(c))
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}
