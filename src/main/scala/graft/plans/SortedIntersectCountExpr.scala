package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Count of DISTINCT common elements of two SORTED `array<bigint>` columns —
 * the numerator of an exact set Jaccard, computed as a single merge walk:
 * O(n+m), zero allocation, no hash table. `size(array_intersect(a, b))`
 * computes the same number but builds a hash set AND materializes the
 * intersection array per pair; on a similarity join's verify stage that
 * per-candidate-pair cost is the hot path at corpus scale (candidate pairs
 * grow with the data, and each pays the full intersect).
 *
 * Contract: both arrays sorted ascending (the producer sorts once per
 * ROW — e.g. `array_sort` in the shingle-set projection — amortized over
 * every pair the row joins into). Duplicate runs count ONCE (matching
 * array_intersect's distinct semantics). Either array null → null; a null
 * ELEMENT → null (shingle-hash arrays never carry one).
 */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires (array<bigint>, array<bigint>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }

  override def prettyName: String = "sorted_intersect_count"

  override def nullable: Boolean = true

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v1 = left.eval(input)
    if (v1 == null) return null
    val v2 = right.eval(input)
    if (v2 == null) return null
    val a = v1.asInstanceOf[ArrayData]
    val b = v2.asInstanceOf[ArrayData]
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var cnt = 0L
    while (i < n && j < m) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        cnt += 1
        // skip the equal run on both sides: duplicates count once
        while (i < n && !a.isNullAt(i) && a.getLong(i) == x) i += 1
        while (j < m && !b.isNullAt(j) && b.getLong(j) == y) j += 1
      }
    }
    java.lang.Long.valueOf(cnt)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val cnt = ctx.freshName("cnt"); val bad = ctx.freshName("bad")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; long $cnt = 0L; boolean $bad = false;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { $bad = true; break; }
         |  final long $x = $a.getLong($i);
         |  final long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else {
         |    $cnt++;
         |    while ($i < $n && !$a.isNullAt($i) && $a.getLong($i) == $x) $i++;
         |    while ($j < $m && !$b.isNullAt($j) && $b.getLong($j) == $y) $j++;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $cnt;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}
