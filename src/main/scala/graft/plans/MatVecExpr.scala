package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native literal matrix–vector product — `R·x` as `array<double>` against
 * a DRIVER-CONSTANT matrix (the OPQ rotation, [[graft.operators.Opq]]):
 * one flat JIT'd d×d loop per row instead of d interpreted
 * `aggregate(zip_with(...))` lambdas (higher-order functions are
 * CodegenFallback, and the rotation is evaluated once per corpus row at
 * encode time PLUS once per training pass — the hot path of the OPQ
 * pipeline). Per output dimension the sum is a fixed-order ascending-j
 * fold, the same order as the HOF formulation it replaces.
 *
 * Input may be `array<float>` (embeddings; exact widen) or
 * `array<double>`. Null array, length ≠ matrix width, or null element →
 * null (the [[VecSubExpr]] semantics).
 */
case class MatVecExpr(child: Expression, mat: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec requires array<float|double>, got ${other.catalogString}")
  }

  override def prettyName: String = "mat_vec"

  override def nullable: Boolean = true

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != mat(0).length) return null
    val f = isFloat
    val x = new Array[Double](n)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) return null
      x(j) = if (f) a.getFloat(j).toDouble else a.getDouble(j)
      j += 1
    }
    val out = new Array[Double](mat.length)
    var i = 0
    while (i < mat.length) {
      val row = mat(i)
      var acc = 0.0
      j = 0
      while (j < n) { acc += row(j) * x(j); j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matVecMat", mat, "double[][]")
    val elem = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bad = ctx.freshName("bad")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $matRef[0].length;
         |double[] $x = $bad ? null : new double[$n];
         |if (!$bad) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j)) { $bad = true; break; }
         |    $x[$j] = (double) $a.$elem($j);
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$matRef.length];
         |  for (int $i = 0; $i < $matRef.length; $i++) {
         |    final double[] $row = $matRef[$i];
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $n; $j++) $acc += $row[$j] * $x[$j];
         |    $out[$i] = $acc;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecExpr =
    copy(child = newChild)
}
