package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: dot product of two double arrays.
  *
  * The built-in way to express this — `aggregate(zip_with(a, b, _*_),
  * 0d, _+_)` — is evaluated by interpreted higher-order lambdas with a
  * per-row array allocation, which made the pairwise-cosine operators
  * the bench hotspot. This expression stays inside whole-stage codegen
  * (doGenCode emits a call to a static primitive loop), runs ~10x
  * faster, and computes the same strict left-to-right IEEE sum, so
  * results remain bit-identical to the DuckDB oracle's
  * `list_dot_product`.
  */
case class ArrayDotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "array_dot"

  // the SQL-registered form accepts arbitrary expressions, so reject
  // non-double arrays at analysis time instead of mis-reading them
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = DataType.equalsStructurally(left.dataType, ArrayType(DoubleType), ignoreNullability = true) &&
      DataType.equalsStructurally(right.dataType, ArrayType(DoubleType), ignoreNullability = true)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got ${left.dataType.sql} and ${right.dataType.sql}"
    )
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.ArrayDotProduct.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): ArrayDotProduct = copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {

  /** Strict sequential fold — the summation order every engine's naive
    * loop uses, so cross-engine results are bit-equal. Length mismatch
    * fails loudly (DuckDB's list_dot_product errors too — silently
    * truncating to the shorter array would produce a plausible wrong
    * cosine exactly when the data is malformed). Null ELEMENTS are
    * rejected upstream by [[ArrayNormalize]], once per vector, keeping
    * this per-pair hot loop check-free.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n) {
      throw new IllegalArgumentException(
        s"array_dot: length mismatch ($n vs ${b.numElements()})"
      )
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Column-level entry point. */
  def arrayDot(a: Column, b: Column): Column =
    shims.columnOf(ArrayDotProduct(shims.expressionOf(a), shims.expressionOf(b)))
}
