package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/**
 * Native SRP-LSH bucket expression: all `tables` random-hyperplane buckets
 * of a float vector in one pass, as `array<bigint>` (one bucket per table).
 *
 * This is the codegen'd twin of the `VectorOps.rpBucketsHof` higher-order
 * fold (which stays as the executable reference — the spec pins the two
 * together on random vectors). Catalyst never compiles lambda functions:
 * `aggregate`/`zip_with` run as per-element interpreted expression trees,
 * which made the bucket computation ~5 ms/row at 64 dims × 48 planes.
 * Here `doGenCode` emits a flat Java loop (one multiply-add per
 * (plane, element)) that the JIT vectorizes — same arithmetic, same
 * sequential fold order per plane, bit-identical projections.
 *
 * Semantics mirrored from the fold exactly:
 *  - null vector → null;
 *  - empty vector → every bit set (a 0.0 projection is non-negative);
 *  - any null element → all buckets 0 (null poisons every plane's
 *    accumulator, and `null >= 0` is false for every bit);
 *  - weight(plane, j) = ±1 from the LCG parity
 *    `((1103515245*(j + plane*1000033) + 12345) % 1000003) % 2 * 2 - 1`,
 *    all in long arithmetic (Java `%` matches Catalyst's Remainder);
 *  - bit i of table t set when plane t*64+i projects ≥ 0.
 */
case class RpBucketsExpr(child: Expression, bits: Int, tables: Seq[Int])
    extends UnaryExpression {

  require(bits >= 1 && bits <= 62, s"bits must be in [1, 62], got $bits")
  require(tables.nonEmpty, "at least one hash table required")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rp_buckets requires array<float>, got ${other.catalogString}")
  }

  override def prettyName: String = "rp_buckets"

  private def emptyBucket: Long = (1L << bits) - 1L

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val nt = tables.size
    val buckets = new Array[Long](nt)
    if (n == 0) {
      java.util.Arrays.fill(buckets, emptyBucket)
    } else {
      val acc = new Array[Double](nt * bits)
      var anyNull = false
      var j = 0
      while (j < n && !anyNull) {
        if (arr.isNullAt(j)) anyNull = true
        else {
          val x = arr.getFloat(j).toDouble
          var k = 0
          var t = 0
          while (t < nt) {
            val base = tables(t).toLong * 64L
            var i = 0
            while (i < bits) {
              val w = ((1103515245L * (j + (base + i) * 1000033L) + 12345L)
                % 1000003L) % 2L * 2L - 1L
              acc(k) += x * w.toDouble
              k += 1; i += 1
            }
            t += 1
          }
        }
        j += 1
      }
      if (!anyNull) {
        var t = 0
        while (t < nt) {
          var b = 0L
          var i = 0
          while (i < bits) {
            if (acc(t * bits + i) >= 0d) b |= (1L << i)
            i += 1
          }
          buckets(t) = b
          t += 1
        }
      }
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val buckets = ctx.freshName("buckets")
      val bases = ctx.freshName("bases")
      val anyNull = ctx.freshName("anyNull")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val x = ctx.freshName("x")
      val w = ctx.freshName("w")
      val b = ctx.freshName("b")
      val nt = tables.size
      val basesLit = tables.map(_.toLong * 64L).mkString("{", "L, ", "L}")
      s"""
         |final int $n = $arr.numElements();
         |final long[] $buckets = new long[$nt];
         |if ($n == 0) {
         |  java.util.Arrays.fill($buckets, ${emptyBucket}L);
         |} else {
         |  final long[] $bases = new long[]$basesLit;
         |  final double[] $acc = new double[${nt * bits}];
         |  boolean $anyNull = false;
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($arr.isNullAt($j)) { $anyNull = true; break; }
         |    final double $x = (double) $arr.getFloat($j);
         |    int $k = 0;
         |    for (int $t = 0; $t < $nt; $t++) {
         |      for (int $i = 0; $i < $bits; $i++, $k++) {
         |        final long $w =
         |          ((1103515245L * ($j + ($bases[$t] + $i) * 1000033L) + 12345L)
         |            % 1000003L) % 2L * 2L - 1L;
         |        $acc[$k] += $x * (double) $w;
         |      }
         |    }
         |  }
         |  if (!$anyNull) {
         |    for (int $t = 0; $t < $nt; $t++) {
         |      long $b = 0L;
         |      for (int $i = 0; $i < $bits; $i++) {
         |        if ($acc[$t * $bits + $i] >= 0.0d) $b |= (1L << $i);
         |      }
         |      $buckets[$t] = $b;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($buckets);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RpBucketsExpr =
    copy(child = newChild)
}
