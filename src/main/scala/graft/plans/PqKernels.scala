package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native PQ/IVF kernels (round 14). The PQ family's hot projections —
  * subspace encoding, ADC scoring, residual staging, centroid dots —
  * were previously spelled declaratively over `typedlit` codebook
  * literals: `array_max(array(struct(arrayDot(v, lit_cw), -j) * Ks))`
  * per subspace. That spelling costs three ways, all fixed by riding
  * the codebook as a REFERENCE OBJECT into one static primitive loop
  * (the [[CentroidTopK]] lesson applied to the rest of the family):
  *
  *  - per ROW it materializes Ks struct rows and an array per subspace
  *    (M×Ks = 2048 boxed structs per encoded vector) just to take a max;
  *  - per PLAN it embeds M×Ks×subDim doubles as expression-tree
  *    literals, megabytes of task binary re-broadcast per stage and a
  *    matching Janino compile bill per query;
  *  - at SCALE the literal tree grows with the index (k ∝ √n), so task
  *    binaries and codegen grow with corpus size — reference objects
  *    are one serialized array, shipped once per stage.
  *
  * Bit-exactness contract (the gate hashes must not move): every dot
  * is the strict left-to-right fold of [[ArrayDotProduct]]; every
  * argmax resolves ties to the LOWEST id via `java.lang.Double.compare`
  * — the identical total order Spark's struct-max gave the old
  * spelling (NaN greatest, -0.0 < 0.0); ADC sums are left-associated
  * in subspace order, exactly the old `reduce(_ + _)`.
  */
object PqKernels {

  private def requireVec(name: String, dt: DataType): TypeCheckResult =
    if (DataType.equalsStructurally(dt, ArrayType(DoubleType), ignoreNullability = true)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(s"$name requires array<double>, got ${dt.sql}")
    }

  // ------------------------------------------------------------------
  // PQ subspace encoding
  // ------------------------------------------------------------------

  /** argmax-score codeword per subspace over the full vector (read
    * once): score = dot(sub, cw) in dot mode, dot(sub, cw) − ‖cw‖²/2 in
    * L2 mode (argmin-L2 for non-uniform-norm codewords — c104/c108's
    * residual space). halfNormSq is precomputed per codeword at plan
    * construction: zeros in dot mode, 0.5·Σcw² (strict sequential fold)
    * in L2 mode.
    */
  def encode(
      v: ArrayData,
      cb: Array[Array[Array[Double]]],
      halfNormSq: Array[Array[Double]]
  ): ArrayData = {
    val m = cb.length
    val out = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val cws = cb(mi)
      val hn = halfNormSq(mi)
      val ks = cws.length
      val subDim = cws(0).length
      var best = -1
      var bestScore = 0.0
      var j = 0
      while (j < ks) {
        val cw = cws(j)
        var s = 0.0
        var d = 0
        while (d < subDim) {
          s += v.getDouble(off + d) * cw(d)
          d += 1
        }
        s -= hn(j)
        // ties to the lowest codeword id: strictly-greater replaces
        if (best < 0 || java.lang.Double.compare(s, bestScore) > 0) {
          best = j
          bestScore = s
        }
        j += 1
      }
      out(mi) = best
      off += subDim
      mi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  case class PqEncodeExpr(
      child: Expression,
      cb: Array[Array[Array[Double]]],
      halfNormSq: Array[Array[Double]]
  ) extends UnaryExpression
      with ArrayFieldEquality {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    override def checkInputDataTypes(): TypeCheckResult = requireVec(prettyName, child.dataType)

    override protected def nullSafeEval(a: Any): Any =
      PqKernels.encode(a.asInstanceOf[ArrayData], cb, halfNormSq)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("cb", cb, "double[][][]")
      val hnRef = ctx.addReferenceObj("halfNormSq", halfNormSq, "double[][]")
      defineCodeGen(ctx, ev, a => s"graft.plans.PqKernels.encode($a, $cbRef, $hnRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
      copy(child = newChild)
  }

  /** argmax-dot encoding ([[pqEncodeDot]] semantics: uniform-norm
    * codewords, c29's unit-sphere slices).
    */
  def pqEncodeDot(v: Column, cb: Array[Array[Array[Double]]]): Column =
    shims.columnOf(PqEncodeExpr(shims.expressionOf(v), cb, cb.map(_.map(_ => 0.0))))

  /** argmin-L2 encoding via argmax(dot − ‖cw‖²/2) — residual-space
    * codewords (c104/c108).
    */
  def pqEncodeL2(v: Column, cb: Array[Array[Array[Double]]]): Column =
    shims.columnOf(
      PqEncodeExpr(
        shims.expressionOf(v),
        cb,
        cb.map(_.map(cw => 0.5 * cw.foldLeft(0.0)((s, x) => s + x * x)))
      )
    )

  // ------------------------------------------------------------------
  // ADC scoring
  // ------------------------------------------------------------------

  /** Σ_m dot(q_m, cb_m[code_m]) — left-associated in subspace order,
    * each dot the strict sequential fold.
    */
  def adc(codes: ArrayData, qv: ArrayData, cb: Array[Array[Array[Double]]]): Double = {
    val m = cb.length
    var total = 0.0
    var mi = 0
    var off = 0
    while (mi < m) {
      val cw = cb(mi)(codes.getInt(mi))
      val subDim = cw.length
      var s = 0.0
      var d = 0
      while (d < subDim) {
        s += qv.getDouble(off + d) * cw(d)
        d += 1
      }
      total += s
      off += subDim
      mi += 1
    }
    total
  }

  case class AdcScoreExpr(left: Expression, right: Expression, cb: Array[Array[Array[Double]]])
      extends BinaryExpression
      with ArrayFieldEquality {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_score"

    override def checkInputDataTypes(): TypeCheckResult =
      if (!DataType.equalsStructurally(left.dataType, ArrayType(IntegerType), ignoreNullability = true)) {
        TypeCheckResult.TypeCheckFailure(s"$prettyName codes must be array<int>, got ${left.dataType.sql}")
      } else requireVec(prettyName, right.dataType)

    override protected def nullSafeEval(codes: Any, qv: Any): Any =
      PqKernels.adc(codes.asInstanceOf[ArrayData], qv.asInstanceOf[ArrayData], cb)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbRef = ctx.addReferenceObj("cb", cb, "double[][][]")
      defineCodeGen(ctx, ev, (c, q) => s"graft.plans.PqKernels.adc($c, $q, $cbRef)")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScoreExpr =
      copy(left = l, right = r)
  }

  def adcScore(codes: Column, qv: Column, cb: Array[Array[Array[Double]]]): Column =
    shims.columnOf(AdcScoreExpr(shims.expressionOf(codes), shims.expressionOf(qv), cb))

  // ------------------------------------------------------------------
  // Centroid dot & residual (coarse-quantizer table lookups)
  // ------------------------------------------------------------------

  /** dot(v[voff .. voff+len), cents[id]) — the centroid-table dot
    * without materializing either the slice or a literal table.
    */
  def centroidDot(v: ArrayData, id: Int, cents: Array[Array[Double]], voff: Int): Double = {
    val c = cents(id)
    var s = 0.0
    var d = 0
    while (d < c.length) {
      s += v.getDouble(voff + d) * c(d)
      d += 1
    }
    s
  }

  case class CentroidDotExpr(left: Expression, right: Expression, cents: Array[Array[Double]], voff: Int)
      extends BinaryExpression
      with ArrayFieldEquality {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "centroid_dot"

    override def checkInputDataTypes(): TypeCheckResult =
      if (!DataType.equalsStructurally(right.dataType, IntegerType, ignoreNullability = true)) {
        TypeCheckResult.TypeCheckFailure(s"$prettyName id must be int, got ${right.dataType.sql}")
      } else requireVec(prettyName, left.dataType)

    override protected def nullSafeEval(v: Any, id: Any): Any =
      PqKernels.centroidDot(v.asInstanceOf[ArrayData], id.asInstanceOf[Int], cents, voff)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev, (v, id) => s"graft.plans.PqKernels.centroidDot($v, $id, $cRef, $voff)")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidDotExpr =
      copy(left = l, right = r)
  }

  def centroidDot(v: Column, id: Column, cents: Array[Array[Double]], voff: Int = 0): Column =
    shims.columnOf(CentroidDotExpr(shims.expressionOf(v), shims.expressionOf(id), cents, voff))

  /** v − cents[id] element-wise (the IVFADC residual staging). */
  def residual(v: ArrayData, id: Int, cents: Array[Array[Double]]): ArrayData = {
    val c = cents(id)
    val out = new Array[Double](c.length)
    var d = 0
    while (d < c.length) {
      out(d) = v.getDouble(d) - c(d)
      d += 1
    }
    // primitive-backed (see ArrayNormalize.normalize): the residual is
    // re-read per subspace by the encode loop — keep access unboxed
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  case class CentroidResidualExpr(left: Expression, right: Expression, cents: Array[Array[Double]])
      extends BinaryExpression
      with ArrayFieldEquality {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "centroid_residual"

    override def checkInputDataTypes(): TypeCheckResult =
      if (!DataType.equalsStructurally(right.dataType, IntegerType, ignoreNullability = true)) {
        TypeCheckResult.TypeCheckFailure(s"$prettyName id must be int, got ${right.dataType.sql}")
      } else requireVec(prettyName, left.dataType)

    override protected def nullSafeEval(v: Any, id: Any): Any =
      PqKernels.residual(v.asInstanceOf[ArrayData], id.asInstanceOf[Int], cents)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
      defineCodeGen(ctx, ev, (v, id) => s"graft.plans.PqKernels.residual($v, $id, $cRef)")
    }

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CentroidResidualExpr =
      copy(left = l, right = r)
  }

  def centroidResidual(v: Column, id: Column, cents: Array[Array[Double]]): Column =
    shims.columnOf(CentroidResidualExpr(shims.expressionOf(v), shims.expressionOf(id), cents))

  /** v − (centsA[aid] ‖ centsB[bid]) — the IMI cell residual (c108):
    * first half subtracts the A-centroid, second half the B-centroid.
    */
  def residual2(
      v: ArrayData,
      aid: Int,
      bid: Int,
      centsA: Array[Array[Double]],
      centsB: Array[Array[Double]]
  ): ArrayData = {
    val a = centsA(aid)
    val b = centsB(bid)
    val half = a.length
    val out = new Array[Double](half + b.length)
    var d = 0
    while (d < half) {
      out(d) = v.getDouble(d) - a(d)
      d += 1
    }
    var e = 0
    while (e < b.length) {
      out(half + e) = v.getDouble(half + e) - b(e)
      e += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  case class ImiResidualExpr(
      first: Expression,
      second: Expression,
      third: Expression,
      centsA: Array[Array[Double]],
      centsB: Array[Array[Double]]
  ) extends TernaryExpression
      with ArrayFieldEquality {

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "imi_residual"

    override def checkInputDataTypes(): TypeCheckResult =
      if (!DataType.equalsStructurally(second.dataType, IntegerType, ignoreNullability = true) ||
        !DataType.equalsStructurally(third.dataType, IntegerType, ignoreNullability = true)) {
        TypeCheckResult.TypeCheckFailure(s"$prettyName cell ids must be int")
      } else requireVec(prettyName, first.dataType)

    override protected def nullSafeEval(v: Any, aid: Any, bid: Any): Any =
      PqKernels.residual2(
        v.asInstanceOf[ArrayData],
        aid.asInstanceOf[Int],
        bid.asInstanceOf[Int],
        centsA,
        centsB
      )

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("centsA", centsA, "double[][]")
      val bRef = ctx.addReferenceObj("centsB", centsB, "double[][]")
      defineCodeGen(
        ctx,
        ev,
        (v, aid, bid) => s"graft.plans.PqKernels.residual2($v, $aid, $bid, $aRef, $bRef)"
      )
    }

    override protected def withNewChildrenInternal(
        f: Expression,
        s: Expression,
        t: Expression
    ): ImiResidualExpr = copy(first = f, second = s, third = t)
  }

  def imiResidual(
      v: Column,
      aid: Column,
      bid: Column,
      centsA: Array[Array[Double]],
      centsB: Array[Array[Double]]
  ): Column =
    shims.columnOf(
      ImiResidualExpr(
        shims.expressionOf(v),
        shims.expressionOf(aid),
        shims.expressionOf(bid),
        centsA,
        centsB
      )
    )
}
