package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native squared-L2 distance over two numeric array columns — the codegen'd
 * twin of the `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0d, _+_)`
 * fold in `KMeans` (which stays as the executable reference;
 * `VectorOps.sqDistHof` pins the two together). Catalyst interprets lambda
 * functions per element, and the k-means hot path evaluates k of these
 * folds PER ROW (one per centroid) in assignment, training, probing, and
 * SemDeDup cell assignment; this emits one flat JIT'd loop with the SAME
 * sequential fold order and double arithmetic, so results are
 * bit-identical.
 *
 * Either side may be `array<float>` (embedding columns; elements widen
 * exactly to double, as `cast("double")` does) or `array<double>` (literal
 * centroids). Fold semantics mirrored exactly:
 *  - either array null → null;
 *  - length mismatch → null (zip_with pads the short side with null, and a
 *    null element nulls the running sum);
 *  - a null ELEMENT → null;
 *  - both empty → 0.0 (the fold seed);
 *  - NaN elements propagate.
 */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist requires array<float|double> on both sides, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def prettyName: String = "sq_dist"

  // result may be null for non-null inputs (null element / length
  // mismatch), so eval handles nullability itself
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
    var acc = 0d
    var j = 0
    while (j < n) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      val x = if (af) a.getFloat(j).toDouble else a.getDouble(j)
      val y = if (bf) b.getFloat(j).toDouble else b.getDouble(j)
      val d = x - y
      acc += d * d
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  private def elemJava(arr: String, idx: String, float: Boolean): String =
    if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |double $acc = 0.0d;
         |if (!$bad) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($a.isNullAt($j) || $b.isNullAt($j)) { $bad = true; break; }
         |    final double $d = ${elemJava(a, j, isFloat(left))} -
         |      ${elemJava(b, j, isFloat(right))};
         |    $acc += $d * $d;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}
