package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: sign bits of a vector's projection onto
  * up to 64 fixed ±1 hyperplanes, packed into one long (bit j = 1 iff
  * dot(v, plane_j) ≥ 0).
  *
  * This is the LSH banding front end. Expressed with one
  * [[ArrayDotProduct]] per plane, the 64-element vector is re-read from
  * Tungsten row memory once PER PLANE — 32-48 passes per row for the
  * c17/c7 band counts. This expression makes a single pass: each
  * element is loaded once and accumulated into every plane's running
  * sum (the sign matrix lives in a cache-resident byte array). Per-plane
  * accumulation order over the dimensions is identical to the
  * sequential dot product, so the sign bits — and therefore every
  * bucket — are bit-for-bit the ones the per-plane expression produced.
  */
case class HyperplaneSignBits(child: Expression, signs: Array[Byte], numPlanes: Int, dim: Int)
    extends UnaryExpression
    with ArrayFieldEquality {

  require(numPlanes >= 1 && numPlanes <= 64, s"numPlanes must be in [1, 64], got $numPlanes")
  require(dim >= 1 && signs.length == numPlanes * dim, "sign matrix must be numPlanes x dim")

  override def dataType: DataType = LongType

  override def prettyName: String = "hyperplane_sign_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(DoubleType), ignoreNullability = true))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${child.dataType.sql}"
      )

  override protected def nullSafeEval(v: Any): Any =
    HyperplaneSignBits.bits(v.asInstanceOf[ArrayData], signs, numPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("planeSigns", signs, "byte[]")
    nullSafeCodeGen(
      ctx,
      ev,
      v => s"${ev.value} = graft.plans.HyperplaneSignBits.bits($v, $signsRef, $numPlanes, $dim);"
    )
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignBits =
    copy(child = newChild)
}

object HyperplaneSignBits {

  /** One pass over the vector; per-plane sums accumulate in dimension
    * order, matching the sequential [[ArrayDotProduct.dot]] exactly
    * (±1.0 multiplication is IEEE-exact, so sign-flip == multiply).
    * The sign matrix stride is the BUILD-time `dim` — a vector of any
    * other length would silently read the wrong planes' signs, so it is
    * rejected loudly instead.
    */
  def bits(v: ArrayData, signs: Array[Byte], numPlanes: Int, dim: Int): Long = {
    if (v.numElements() != dim) {
      throw new IllegalArgumentException(
        s"hyperplane_sign_bits: expected a $dim-element vector, got ${v.numElements()}"
      )
    }
    val acc = new Array[Double](numPlanes)
    var d = 0
    while (d < dim) {
      val x = v.getDouble(d)
      var j = 0
      while (j < numPlanes) {
        if (signs(j * dim + d) > 0) acc(j) += x else acc(j) -= x
        j += 1
      }
      d += 1
    }
    var out = 0L
    var j = 0
    while (j < numPlanes) {
      if (acc(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column-level entry point: pack the ±1 `planes` matrix (plane-major)
    * into the sign byte array the kernel reads.
    */
  def hyperplaneBits(v: Column, planes: Array[Array[Double]]): Column = {
    val numPlanes = planes.length
    val dim = planes(0).length
    val signs = new Array[Byte](numPlanes * dim)
    var j = 0
    while (j < numPlanes) {
      var d = 0
      while (d < dim) {
        signs(j * dim + d) = if (planes(j)(d) > 0) 1 else -1
        d += 1
      }
      j += 1
    }
    shims.columnOf(HyperplaneSignBits(shims.expressionOf(v), signs, numPlanes, dim))
  }
}
