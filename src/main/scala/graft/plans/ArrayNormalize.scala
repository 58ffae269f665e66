package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: L2-normalize a double array in one pass.
  *
  * Declaring this as `transform(v, x => x / norm)` invites Catalyst's
  * CollapseProject to inline the norm into the lambda, recomputing the
  * full dot product once per ELEMENT (O(d²) per row — observed in the
  * physical plan). A single opaque expression computes the norm once
  * and divides once (O(d)), with the same IEEE operations, so the value
  * is bit-identical to the oracle's
  * `list_transform(v, x -> x / sqrt(list_dot_product(v, v)))`.
  */
case class ArrayNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def prettyName: String = "array_l2_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(DoubleType), ignoreNullability = true)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${child.dataType.sql}"
      )
    }

  override protected def nullSafeEval(a: Any): Any =
    ArrayNormalize.normalize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.ArrayNormalize.normalize($a)")

  override protected def withNewChildInternal(newChild: Expression): ArrayNormalize =
    copy(child = newChild)
}

object ArrayNormalize {

  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      // strict at ingestion: normalize runs ONCE per vector (the pair
      // loops downstream run millions of times and stay check-free), so
      // this is where a null element gets rejected loudly instead of
      // silently reading as 0.0 and fabricating a plausible cosine —
      // and it is what makes the declared containsNull=false true
      if (a.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"array_l2_normalize: null element at index $i — embeddings must be dense"
        )
      }
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) {
      out(i) = a.getDouble(i) / norm
      i += 1
    }
    // PRIMITIVE-backed result, not GenericArrayData(Array[Double]) —
    // that constructor boxes every element, and when whole-stage
    // codegen fuses this projection into a join stage (no UnsafeRow
    // materialization boundary in between) the boxed array is what the
    // per-PAIR dot loops downstream read: round 15 measured c78 going
    // 1.3 → 2.6 s when the vecs() cast removed the CodegenFallback
    // stage break that used to force materialization. fromPrimitiveArray
    // keeps element access primitive no matter how stages fuse.
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-level entry point. */
  def arrayNormalize(c: Column): Column =
    shims.columnOf(ArrayNormalize(shims.expressionOf(c)))
}
