package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the supported pattern for libraries adding native Catalyst
  * expressions (Spark 4 moved Column internals behind ColumnNode;
  * `classic.ExpressionUtils` is the conversion point).
  */
object shims {

  def columnOf(e: Expression): Column = ExpressionUtils.column(e)

  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — the entry point for library-defined operators
    * planned by an injected SparkStrategy.
    */
  def dataFrameOf(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset
      .ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a function into an EXISTING session's registry (the
    * extensions path only applies at session build time).
    */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: FunctionBuilder
  ): Unit =
    spark.sessionState.functionRegistry.registerFunction(FunctionIdentifier(name), info, builder)
}
