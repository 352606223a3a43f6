package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's `private[sql]` Column↔Expression converters so graft's
 * custom Catalyst expressions (e.g. [[graft.plans.RpBucketsExpr]]) can be
 * used as plain `Column`s. Spark 4 routes Columns through ColumnNode, and
 * `classic.ExpressionUtils` is the supported classic-backend conversion —
 * it is merely package-private, hence this shim living under
 * `org.apache.spark.sql`.
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an RDD of CATALYST rows — `SparkSession.
    * internalCreateDataFrame`, the converter `Dataset.rdd`-based
    * round-trips pay twice (internal→external `Row` out,
    * `RowEncoder` back in). Used by the per-partition passes that
    * stream a cached frame imperatively (SuffixArray.denseRank). */
  def internalCreateDataFrame(
      spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
