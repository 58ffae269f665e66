package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * the supported pattern for libraries adding native Catalyst
  * expressions (Spark 4 moved Column internals behind ColumnNode;
  * `classic.ExpressionUtils` is the conversion point).
  */
object shims {

  def columnOf(e: Expression): Column = ExpressionUtils.column(e)

  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)
}
