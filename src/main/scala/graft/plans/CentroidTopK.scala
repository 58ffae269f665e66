package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression: rank driver-held centroids by cosine
  * against a vector column and return the top-k centroid ids.
  *
  * This is the IVF assignment + probe-selection kernel (assignment ≡
  * top-1), shared by the scaled-list ANN family. The declarative
  * spelling — `slice(sort_array(array(struct(-dot, cid)*lists)), 1, k)`
  * — is CodegenFallback: every row interprets a `lists`-element
  * struct-array build plus a comparator sort with per-element boxing,
  * which measured 2.4× slower than the crossJoin formulation it was
  * meant to replace and produced enough garbage to GC-thrash the bench
  * heap. This expression runs the identical math as one static
  * primitive loop inside whole-stage codegen: `lists` strict
  * left-to-right dots (ArrayDotProduct's fold, bit-identical) and a
  * k-pass selection with the (cos desc, id asc) tie rule —
  * `java.lang.Double.compare` total order, the same order Spark's
  * struct comparison gives `max(struct(cos, -cid))`, so results are
  * bit-equal to both the old formulation and the DuckDB oracle's
  * `row_number() OVER (ORDER BY cos DESC, cid)` mirror.
  *
  * Centroids ride the plan as a reference object (k×dim doubles —
  * bounded by the lists ∝ √n sizing; 16 MB at 1e9 vectors), not as
  * literal expression nodes, so the generated code stays one call.
  */
case class CentroidTopK(
    child: Expression,
    cents: Array[Array[Double]],
    ids: Array[Int],
    k: Int
) extends UnaryExpression
    with ArrayFieldEquality {

  require(cents.length == ids.length, "cents/ids length mismatch")
  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "centroid_top_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(DoubleType), ignoreNullability = true)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<double> argument, got ${child.dataType.sql}"
      )
    }

  override protected def nullSafeEval(a: Any): Any =
    CentroidTopK.topK(a.asInstanceOf[ArrayData], cents, ids, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val idsRef = ctx.addReferenceObj("ids", ids, "int[]")
    defineCodeGen(ctx, ev, a => s"graft.plans.CentroidTopK.topK($a, $centsRef, $idsRef, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidTopK =
    copy(child = newChild)
}

object CentroidTopK {

  /** Top-k centroid ids by (cos desc, id asc): `n` strict left-to-right
    * dot products then a k-pass selection — O(n·(dim + k)) primitive
    * work per row, zero boxing. Selection (not a heap) keeps the tie
    * rule trivially auditable; k and n are both bounded (k ≤ probes,
    * n = lists ≤ √corpus).
    */
  def topK(v: ArrayData, cents: Array[Array[Double]], ids: Array[Int], k: Int): ArrayData = {
    val n = cents.length
    val cos = new Array[Double](n)
    var i = 0
    while (i < n) {
      val c = cents(i)
      val d = c.length
      if (v.numElements() != d) {
        throw new IllegalArgumentException(
          s"centroid_top_k: length mismatch (${v.numElements()} vs $d)"
        )
      }
      var s = 0.0
      var j = 0
      while (j < d) {
        s += v.getDouble(j) * c(j)
        j += 1
      }
      cos(i) = s
      i += 1
    }
    val kk = math.min(k, n)
    val taken = new Array[Boolean](n)
    val out = new Array[Int](kk)
    var r = 0
    while (r < kk) {
      var best = -1
      i = 0
      while (i < n) {
        if (!taken(i)) {
          if (best < 0) best = i
          else {
            val cmp = java.lang.Double.compare(cos(i), cos(best))
            if (cmp > 0 || (cmp == 0 && ids(i) < ids(best))) best = i
          }
        }
        i += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Column-level entry point: `cents` as (id, vector) pairs. */
  def centroidTopK(v: Column, cents: Seq[(Int, Array[Double])], k: Int): Column =
    shims.columnOf(
      CentroidTopK(shims.expressionOf(v), cents.map(_._2).toArray, cents.map(_._1).toArray, k)
    )
}
