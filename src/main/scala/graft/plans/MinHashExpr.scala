package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native MinHash signature over an `array<bigint>` of shingle hashes — the
 * codegen'd twin of `TextOps.minHashSignatureHof` (kept as the executable
 * reference; the spec pins the two). The fold runs `numHashes` interpreted
 * `array_min(transform(...))` passes per document; this emits one flat
 * JIT'd loop computing all permutation minima in a single traversal with
 * identical `(a_j * s + b_j) % mod` long arithmetic.
 *
 * Semantics mirrored from the column expression exactly:
 *  - the output array is NEVER null — a null input yields an array of
 *    null minima (`array(...)` of null `array_min`s), as does an empty
 *    shingle set;
 *  - null shingle elements are skipped (array_min ignores nulls); if no
 *    non-null shingle exists, that minimum is null.
 */
case class MinHashExpr(child: Expression, as: Seq[Long], bs: Seq[Long], mod: Long)
    extends UnaryExpression {

  require(as.size == bs.size && as.nonEmpty, "coefficient arrays must match")

  private def n = as.size

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "minhash"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val mins = new Array[Any](n)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      val best = new Array[Long](n)
      val seen = new Array[Boolean](n)
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          val s = arr.getLong(i)
          var j = 0
          while (j < n) {
            val h = (as(j) * s + bs(j)) % mod
            if (!seen(j) || h < best(j)) { best(j) = h; seen(j) = true }
            j += 1
          }
        }
        i += 1
      }
      var j = 0
      while (j < n) {
        if (seen(j)) mins(j) = java.lang.Long.valueOf(best(j))
        j += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    val arr = childGen.value
    val aArr = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bArr = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    val m = ctx.freshName("m")
    val best = ctx.freshName("best")
    val seen = ctx.freshName("seen")
    val mins = ctx.freshName("mins")
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val s = ctx.freshName("s")
    val h = ctx.freshName("h")
    val code =
      code"""
         |${childGen.code}
         |final Object[] $mins = new Object[$n];
         |if (!${childGen.isNull}) {
         |  final int $m = $arr.numElements();
         |  final long[] $best = new long[$n];
         |  final boolean[] $seen = new boolean[$n];
         |  for (int $i = 0; $i < $m; $i++) {
         |    if (!$arr.isNullAt($i)) {
         |      final long $s = $arr.getLong($i);
         |      for (int $j = 0; $j < $n; $j++) {
         |        final long $h = ($aArr[$j] * $s + $bArr[$j]) % ${mod}L;
         |        if (!$seen[$j] || $h < $best[$j]) { $best[$j] = $h; $seen[$j] = true; }
         |      }
         |    }
         |  }
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($seen[$j]) $mins[$j] = java.lang.Long.valueOf($best[$j]);
         |  }
         |}
         |final org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashExpr =
    copy(child = newChild)
}
