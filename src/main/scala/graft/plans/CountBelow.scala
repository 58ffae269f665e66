package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: how many elements of a double array the
  * probe value strictly exceeds (round 15, b9's bucket id).
  *
  * The declarative spelling — `aggregate(edges, 0L, (acc, e) =>
  * acc + when(v > e, 1L).otherwise(0L))` — is a CodegenFallback
  * higher-order function: a ~100-element interpreted lambda fold with
  * per-element boxing on EVERY row of the ranked table, evaluated on
  * both consumers of the bucketed frame. This expression runs the
  * identical count as one static primitive loop inside whole-stage
  * codegen.
  *
  * Exact semantic mirror of the fold it replaces:
  *  - comparison is Spark's own double `>`
  *    ([[org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles]]
  *    — the codegen GreaterThan uses the same call, so NaN/-0.0 order
  *    identically);
  *  - a NULL probe contributes 0 per element (the `when` fell through
  *    to `otherwise(0)`), so the result is 0, NOT null;
  *  - a NULL array element contributes 0 the same way;
  *  - a NULL array yields NULL (aggregate over null input).
  */
case class CountBelowExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "count_below"

  // null only when the ARRAY is null — a null probe yields 0 (see above)
  override def nullable: Boolean = left.nullable

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = DataType.equalsStructurally(left.dataType, ArrayType(DoubleType), ignoreNullability = true) &&
      DataType.equalsStructurally(right.dataType, DoubleType, ignoreNullability = true)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, double), got ${left.dataType.sql} and ${right.dataType.sql}"
    )
  }

  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) null
    else {
      val v = right.eval(input)
      if (v == null) 0L
      else CountBelowExpr.count(arr.asInstanceOf[ArrayData], v.asInstanceOf[Double])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = ${leftGen.isNull};
        long ${ev.value} = 0L;
        if (!${ev.isNull}) {
          ${rightGen.code}
          if (!${rightGen.isNull}) {
            ${ev.value} = graft.plans.CountBelowExpr.count(${leftGen.value}, ${rightGen.value});
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountBelowExpr =
    copy(left = l, right = r)
}

object CountBelowExpr {

  /** #elements e with v > e under Spark's double comparison; null
    * elements contribute 0 (the `when`'s null condition fell through).
    */
  def count(arr: ArrayData, v: Double): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) &&
        org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareDoubles(v, arr.getDouble(i)) > 0) {
        c += 1L
      }
      i += 1
    }
    c
  }

  /** Column-level entry point. */
  def countBelow(arr: Column, v: Column): Column =
    shims.columnOf(CountBelowExpr(shims.expressionOf(arr), shims.expressionOf(v)))
}
