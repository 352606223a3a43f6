package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Σ ((h · mult) mod buckets) over an `array<bigint>` of token hashes, in ONE
 * per-row pass — the feature-side of the hashed linear classifier
 * ([[graft.functions.QualityOps.classifierScore]]): each token hashes into
 * one of `buckets` weight cells and the cell weights sum per document. The
 * sum stays in exact integer arithmetic (hash < 2^20, mult < 2^32, bucket
 * values < 2^20, so even 2^30-token documents cannot overflow a long);
 * the caller converts to a double score once, so the cross-engine value is
 * bit-identical rather than summation-order-dependent.
 *
 * Semantics: empty array → 0; null array → null; a null ELEMENT → null
 * (token-hash arrays carry no nulls — a null marks corrupt upstream data
 * and poisons the row rather than skewing its score silently).
 */
case class HashWeightSumExpr(child: Expression, mult: Long, buckets: Long)
    extends UnaryExpression {

  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hash_weight_sum requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "hash_weight_sum"

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HashWeightEval.weightSum(input.asInstanceOf[ArrayData], mult, buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sum = ctx.freshName("wsum")
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |java.lang.Long $sum =
         |  graft.plans.HashWeightEval.weightSum($arr, ${mult}L, ${buckets}L);
         |if ($sum == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $sum.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashWeightSumExpr =
    copy(child = newChild)
}

object HashWeightEval {
  /** Null on any null element; otherwise the exact bucket-value sum. */
  def weightSum(arr: ArrayData, mult: Long, buckets: Long): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = arr.getLong(i) * mult % buckets
      acc += (if (v < 0) v + buckets else v)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
