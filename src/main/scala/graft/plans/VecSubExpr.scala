package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native element-wise vector subtraction — `a - b` as `array<double>`, the
 * residual step of IVF-PQ encoding (`r = v - centroid[cell]`): one flat
 * JIT'd loop instead of an interpreted-per-element `zip_with` lambda,
 * evaluated once per corpus row at encode time and once per training row
 * per Lloyd round.
 *
 * Either side may be `array<float>` (embeddings; exact widen to double) or
 * `array<double>` (literal centroids). Null semantics mirror
 * [[SqDistExpr]]: null array, length mismatch, or null element → null.
 */
case class VecSubExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sub requires array<float|double> on both sides, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def prettyName: String = "vec_sub"

  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v1 = left.eval(input)
    if (v1 == null) return null
    val v2 = right.eval(input)
    if (v2 == null) return null
    val a = v1.asInstanceOf[ArrayData]
    val b = v2.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val af = isFloat(left); val bf = isFloat(right)
    val out = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      val x = if (af) a.getFloat(j).toDouble else a.getDouble(j)
      val y = if (bf) b.getFloat(j).toDouble else b.getDouble(j)
      out(j) = x - y
      j += 1
    }
    new GenericArrayData(out)
  }

  private def elemJava(arr: String, idx: String, float: Boolean): String =
    if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double[] $out = $bad ? null : new double[$n];
         |if (!$bad) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; break; }
         |    $out[$j] = ${elemJava(a, j, isFloat(left))} -
         |      ${elemJava(b, j, isFloat(right))};
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSubExpr =
    copy(left = newLeft, right = newRight)
}
