package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native cosine similarity over two `array<float>` columns — the codegen'd
 * twin of `VectorOps.cosineHof` (which stays as the executable reference;
 * the spec pins the two together). Catalyst interprets lambda functions per
 * element, so the three higher-order folds (dot + two norms) cost ~40 µs
 * per pair; this emits flat JIT'd loops with the SAME sequential fold order
 * and double arithmetic, so results are bit-identical.
 *
 * Semantics mirrored from the fold exactly (`when(den === 0, 0.0)
 * .otherwise(dot / den)` over null-propagating aggregates):
 *  - either vector null → null;
 *  - den == 0 (both zero-norm, incl. both empty) → 0.0, even when the
 *    lengths mismatch;
 *  - otherwise, a null element in either vector, or a length mismatch
 *    (zip_with pads with null), nulls the result;
 *  - NaN elements propagate (NaN den fails the == 0 test, NaN/NaN = NaN).
 */
case class CosineExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine requires (array<float>, array<float>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def prettyName: String = "cosine"

  // result may be null even for non-null inputs (null element / length
  // mismatch with nonzero norms), so eval handles nullability itself
  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v1 = left.eval(input)
    if (v1 == null) return null
    val v2 = right.eval(input)
    if (v2 == null) return null
    val a = v1.asInstanceOf[ArrayData]
    val b = v2.asInstanceOf[ArrayData]
    val n1 = a.numElements()
    val n2 = b.numElements()
    var naNull = false; var nbNull = false; var dotNull = n1 != n2
    var na = 0d; var nb = 0d; var dot = 0d
    var j = 0
    while (j < n1 && !naNull) {
      if (a.isNullAt(j)) naNull = true
      else { val x = a.getFloat(j).toDouble; na += x * x }
      j += 1
    }
    j = 0
    while (j < n2 && !nbNull) {
      if (b.isNullAt(j)) nbNull = true
      else { val y = b.getFloat(j).toDouble; nb += y * y }
      j += 1
    }
    j = 0
    while (j < n1 && !dotNull) {
      if (a.isNullAt(j) || b.isNullAt(j)) dotNull = true
      else dot += a.getFloat(j).toDouble * b.getFloat(j).toDouble
      j += 1
    }
    val denNull = naNull || nbNull
    if (!denNull && math.sqrt(na) * math.sqrt(nb) == 0d) java.lang.Double.valueOf(0d)
    else if (denNull || dotNull) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val dot = ctx.freshName("dot")
      val naNull = ctx.freshName("naNull"); val nbNull = ctx.freshName("nbNull")
      val dotNull = ctx.freshName("dotNull"); val denNull = ctx.freshName("denNull")
      val den = ctx.freshName("den")
      val j = ctx.freshName("j"); val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |final int $n1 = $a.numElements();
         |final int $n2 = $b.numElements();
         |boolean $naNull = false; boolean $nbNull = false;
         |boolean $dotNull = $n1 != $n2;
         |double $na = 0.0d; double $nb = 0.0d; double $dot = 0.0d;
         |for (int $j = 0; $j < $n1; $j++) {
         |  if ($a.isNullAt($j)) { $naNull = true; break; }
         |  final double $x = (double) $a.getFloat($j);
         |  $na += $x * $x;
         |}
         |for (int $j = 0; $j < $n2; $j++) {
         |  if ($b.isNullAt($j)) { $nbNull = true; break; }
         |  final double $y = (double) $b.getFloat($j);
         |  $nb += $y * $y;
         |}
         |if (!$dotNull) {
         |  for (int $j = 0; $j < $n1; $j++) {
         |    if ($a.isNullAt($j) || $b.isNullAt($j)) { $dotNull = true; break; }
         |    $dot += (double) $a.getFloat($j) * (double) $b.getFloat($j);
         |  }
         |}
         |final boolean $denNull = $naNull || $nbNull;
         |final double $den = $denNull ? 0.0d : Math.sqrt($na) * Math.sqrt($nb);
         |if (!$denNull && $den == 0.0d) {
         |  ${ev.value} = 0.0d;
         |} else if ($denNull || $dotNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / $den;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineExpr =
    copy(left = newLeft, right = newRight)
}
