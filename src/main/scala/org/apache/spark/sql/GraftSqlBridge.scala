package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column↔Expression
  * converters so graft's custom Catalyst expressions can be exposed as
  * ordinary `Column`s without routing every call through the function
  * registry + SQL strings. Standard extension-library pattern (the
  * spark-package namespace exists exactly for this kind of shim).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
