package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Native SimHash over an `array<bigint>` of token hashes — the codegen'd
 * twin of `TextOps.simHashHof` (the executable reference; the spec pins the
 * two together). Catalyst interprets lambda functions per element, so the
 * vote-vector fold costs ~bits×tokens interpreted expression nodes per
 * document — the dominant cost of every simhash dedup query. This emits a
 * flat JIT'd loop with the same arithmetic in the same order.
 *
 * Semantics mirrored from the fold exactly:
 *  - null array → null;
 *  - empty array → 0 (zero votes, `0 > 0` is false for every bit);
 *  - any null token hash → 0 (null poisons every vote, `null > 0` is false);
 *  - vote(t, b) = ((t >> b) % 2) * 2 - 1 in long arithmetic (Java `>>`/`%`
 *    match Catalyst's ShiftRight/Remainder, including for negative t);
 *  - bit b of the print is set when its vote sum is strictly positive.
 */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash requires array<bigint>, got ${other.catalogString}")
  }

  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    var anyNull = false
    var j = 0
    while (j < n && !anyNull) {
      if (arr.isNullAt(j)) anyNull = true
      else {
        val t = arr.getLong(j)
        var b = 0
        while (b < bits) {
          votes(b) += ((t >> b) % 2L) * 2L - 1L
          b += 1
        }
      }
      j += 1
    }
    var print = 0L
    if (!anyNull) {
      var b = 0
      while (b < bits) {
        if (votes(b) > 0L) print |= (1L << b)
        b += 1
      }
    }
    java.lang.Long.valueOf(print)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val anyNull = ctx.freshName("anyNull")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      val print = ctx.freshName("print")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $votes = new long[$bits];
         |boolean $anyNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($arr.isNullAt($j)) { $anyNull = true; break; }
         |  final long $t = $arr.getLong($j);
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += (($t >> $b) % 2L) * 2L - 1L;
         |  }
         |}
         |long $print = 0L;
         |if (!$anyNull) {
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ($votes[$b] > 0L) $print |= (1L << $b);
         |  }
         |}
         |${ev.value} = $print;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
