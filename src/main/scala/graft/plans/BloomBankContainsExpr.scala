package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Membership probe against a digest-range-SHARDED Bloom filter bank: the
 * item hash picks its shard (`floorMod(hash, shards)`) and tests that
 * shard's filter only — the map-side gate of
 * [[graft.operators.Dedup.corpusBloomProbe]].
 *
 * The bank travels as a torrent BROADCAST, not as a literal: the task
 * binary carries a handle, executors fetch the (possibly GB-scale at
 * extreme corpus cardinality) bit array once each and share it across
 * tasks — the single-bitmap-literal design shipped the whole bitmap
 * inside every task's serialized binary. A missing (null) shard means no
 * corpus item hashes there: a definite miss, `false`.
 *
 * Codegen'd via a static helper so the probe stays inside whole-stage
 * codegen; `Broadcast.value()` resolves to the executor-local cached
 * array after the first call.
 */
case class BloomBankContainsExpr(
    child: Expression,
    bank: Broadcast[Array[BloomFilter]],
    shards: Int)
    extends UnaryExpression {

  require(shards >= 1, "shards must be >= 1")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bank_contains requires bigint, got ${other.catalogString}")
  }

  override def prettyName: String = "bloom_bank_contains"

  override protected def nullSafeEval(input: Any): Any =
    BloomBankEval.contains(bank, input.asInstanceOf[Long], shards)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bankRef = ctx.addReferenceObj("bloomBank", bank,
      classOf[Broadcast[Array[BloomFilter]]].getName)
    nullSafeCodeGen(ctx, ev, hash => {
      s"${ev.value} = graft.plans.BloomBankEval.contains($bankRef, $hash, $shards);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BloomBankContainsExpr =
    copy(child = newChild)
}

object BloomBankEval {
  def contains(
      bank: Broadcast[Array[BloomFilter]], hash: Long, shards: Int): Boolean = {
    val f = bank.value(java.lang.Math.floorMod(hash, shards.toLong).toInt)
    f != null && f.mightContainLong(hash)
  }
}
