package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native word-k-shingle hashes over an `array<bigint>` of token hashes —
 * the codegen'd twin of the `TextOps.shingleHashes` higher-order `transform`
 * (kept as the executable reference; the spec pins them element-for-element).
 *
 * The lambda version is the single worst constant in the repo: its body
 * references the OUTER token-hash column (`get(thash, i+d)`), so when a
 * caller passes the full `tokenHashes(tokens(text))` subtree — as the
 * contamination and repetition operators do — `CollapseProject` re-inlines
 * that whole subtree into every element access: k re-tokenizations per
 * shingle, ~150 per document, and the lambda drops the projection out of
 * whole-stage codegen on top. Measured at sf0.1: 21 s for 260k shingles vs
 * 1.5 s for the identical arithmetic consumed natively by `MinHashExpr`.
 * This expression evaluates the child ONCE and emits all shingles in one
 * flat JIT'd loop.
 *
 * Semantics mirrored from `when(size(th) >= k, transform(...))
 * .otherwise(array())` exactly:
 *  - null array → EMPTY array (the `when` guard's null condition falls to
 *    the otherwise branch), hence `nullable = false` and a hand-rolled
 *    `eval`/`doGenCode` rather than the null-intolerant default;
 *  - fewer than k elements → empty array;
 *  - element i = (h[i]·w(0) + … + h[i+k−1]·w(k−1)) % mod in long
 *    arithmetic, identical overflow behavior to the fold (token hashes are
 *    < TokenMod ≈ 2^20 and weights < mod < 2^31, so products stay < 2^51);
 *  - any null token hash in a window → that shingle is null (null poisons
 *    the lambda's `+` chain).
 */
case class ShingleHashesExpr(child: Expression, weights: Seq[Long], mod: Long)
    extends UnaryExpression {

  require(weights.nonEmpty && weights.size <= 256,
    s"shingle width 1..256 supported, got ${weights.size}")

  private def k: Int = weights.size

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "shingle_hashes"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleHashEval.Empty
    else ShingleHashEval.shingles(v.asInstanceOf[ArrayData],
      weights.toArray, mod)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val w = ctx.addReferenceObj("weights", weights.toArray, "long[]")
    val code =
      code"""
         |${childGen.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  ${childGen.isNull}
         |    ? graft.plans.ShingleHashEval.Empty()
         |    : graft.plans.ShingleHashEval.shingles(${childGen.value}, $w, ${mod}L);
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashEval {
  /** Shared empty result (immutable, zero-length). Method-style accessor so
    * generated Java can call it uniformly. */
  val Empty: GenericArrayData = new GenericArrayData(Array.empty[Any])

  /** One pass over the token-hash array: out[i] = Σ h[i+d]·w[d] % mod, null
    * window element → null shingle; n < k → empty. */
  def shingles(arr: ArrayData, weights: Array[Long], mod: Long): ArrayData = {
    val k = weights.length
    val n = arr.numElements()
    if (n < k) return Empty
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i <= n - k) {
      var acc = 0L
      var ok = true
      var d = 0
      while (d < k) {
        if (arr.isNullAt(i + d)) ok = false
        else acc += arr.getLong(i + d) * weights(d)
        d += 1
      }
      if (ok) out(i) = java.lang.Long.valueOf(acc % mod)
      i += 1
    }
    new GenericArrayData(out)
  }
}
