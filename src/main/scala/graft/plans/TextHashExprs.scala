package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native polynomial rolling hashes — codegen'd twins of the `TextOps`
 * higher-order folds (`polyHash`/`polyHashWide`/`tokenHashes`/
 * `tokenHashesWide`, kept as executable references; the spec pins them).
 * The folds iterate `ascii(substr(s, i, 1))` per CHARACTER through
 * interpreted lambda trees — the per-char cost dominates every tokenize→
 * hash pipeline. These iterate code points in a flat JIT'd loop with the
 * same `(acc * mult + codepoint) % mod` arithmetic in the same order.
 *
 * Code-point note: Spark's `substr` indexes characters and `ascii` returns
 * the first code point, so the loop steps by `Character.charCount` — the
 * pin spec includes non-ASCII tokens to hold this equivalence.
 */
object TextHashEval {
  /** (acc * mult + codepoint) % mod over the string's code points; 0 for
    * the empty string (the folds guard `length(s) === 0` explicitly). */
  def polyHash(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Scalar native polynomial hash of a string column. */
case class PolyHashExpr(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires string, got ${other.catalogString}")
  }

  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(
      TextHashEval.polyHash(input.asInstanceOf[UTF8String], mult, mod))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.plans.TextHashEval.polyHash($s, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
}

/**
 * Native per-token hashes over an `array<string>`: element t →
 * `polyHash(t, mult1, mod)`, or with `mult2` set the wide combination
 * `polyHash(t, mult1, mod) * mod + polyHash(t, mult2, mod)` (the ~62-bit
 * token prints of `tokenHashesWide`). Null tokens map to null elements,
 * exactly as the `transform` lambda nulls them.
 */
case class TokenHashesExpr(
    child: Expression, mult1: Long, mod: Long, mult2: Option[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_hashes requires array<string>, got ${other.catalogString}")
  }

  override def prettyName: String = "token_hashes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val t = arr.getUTF8String(j)
        val h1 = TextHashEval.polyHash(t, mult1, mod)
        out(j) = java.lang.Long.valueOf(mult2 match {
          case Some(m2) => h1 * mod + TextHashEval.polyHash(t, m2, mod)
          case None     => h1
        })
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val h = ctx.freshName("h")
      val hashExpr = mult2 match {
        case Some(m2) =>
          s"graft.plans.TextHashEval.polyHash($t, ${mult1}L, ${mod}L) * ${mod}L" +
            s" + graft.plans.TextHashEval.polyHash($t, ${m2}L, ${mod}L)"
        case None =>
          s"graft.plans.TextHashEval.polyHash($t, ${mult1}L, ${mod}L)"
      }
      s"""
         |final int $n = $arr.numElements();
         |final Object[] $out = new Object[$n];
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    final org.apache.spark.unsafe.types.UTF8String $t = $arr.getUTF8String($j);
         |    final long $h = $hashExpr;
         |    $out[$j] = java.lang.Long.valueOf($h);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}
