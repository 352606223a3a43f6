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
}
