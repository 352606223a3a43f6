package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Σ weights[(h · mult) mod B] over an `array<bigint>` of token hashes, in
 * ONE per-row pass — [[HashWeightSumExpr]] generalized from derived cell
 * values to an ARBITRARY learned weight table: the margin evaluation of
 * the trained hashed linear classifier
 * ([[graft.operators.Classifier]]).
 *
 * Weights are LONG micro-units (the trainer's fixed-point representation)
 * so the per-document sum is an exact integer — combine-order independent
 * and bit-identical cross-engine; the caller divides by the scale once.
 * The weight table rides the expression (B longs — driver-bounded by the
 * trainer; broadcast territory only beyond ~10⁶ cells).
 *
 * Semantics: empty array → 0; null array → null; a null ELEMENT → null
 * (token-hash arrays carry no nulls — a null marks corrupt upstream data
 * and poisons the row rather than skewing its margin silently).
 */
case class HashCellSumExpr(
    child: Expression,
    weights: Array[Long],
    mult: Long)
    extends UnaryExpression {

  require(weights.nonEmpty, "weights must be non-empty")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_cell_sum requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "hash_cell_sum"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashCellSumEval.cellSum(input.asInstanceOf[ArrayData], weights, mult)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("cellWeights", weights, "long[]")
    val sum = ctx.freshName("csum")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |java.lang.Long $sum =
         |  graft.plans.HashCellSumEval.cellSum($arr, $wRef, ${mult}L);
         |if ($sum == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $sum.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashCellSumExpr =
    copy(child = newChild)
}

object HashCellSumEval {
  /** Null on any null element; otherwise the exact weight-unit sum. */
  def cellSum(arr: ArrayData, weights: Array[Long], mult: Long): java.lang.Long = {
    val b = weights.length.toLong
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i) * mult % b
      acc += weights((if (v < 0) v + b else v).toInt)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
