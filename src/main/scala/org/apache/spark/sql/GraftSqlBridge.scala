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

  /** Wrap a (resolved) logical plan as a DataFrame — how graft's custom
    * logical operators (e.g. `graft.plans.AsOfJoinPlan`) re-enter the
    * public Dataset API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Raise a proper `AnalysisException` (the constructors are
    * `private[sql]`) for invalid arguments to graft's injected SQL
    * functions — function-builder validation errors should surface at
    * analysis time with a readable message, not as ClassCastException
    * at build time. */
  def analysisError(message: String): Nothing =
    throw new AnalysisException("USER_RAISED_EXCEPTION",
      Map("errorMessage" -> message))

  /** Standard "parameter must be a foldable literal" analysis error. */
  def nonFoldableArgumentError(funcName: String, paramName: String,
      paramType: org.apache.spark.sql.types.DataType): Nothing =
    throw org.apache.spark.sql.errors.QueryCompilationErrors
      .nonFoldableArgumentError(funcName, paramName, paramType)
}
