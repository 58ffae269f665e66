package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native batched term-frequency kernel (round 14): occurrence counts
  * of a FIXED term list over a token array, in one pass over the
  * array. The declarative spelling — one `size(filter(w, x === t))`
  * per term — ran one ArrayFilter per (row × term), and higher-order
  * functions are CodegenFallback: each pass interprets its lambda with
  * per-element boxing. BM25 scoring over a q-query battery paid
  * ~Σ|terms| interpreted array passes per document; this kernel reads
  * the token array once inside whole-stage codegen and emits all
  * counts. Exactness: a count of exact string matches is the same
  * integer either way (NULL tokens match nothing, as with `===`).
  */
case class TermCountsExpr(child: Expression, terms: Array[String])
    extends UnaryExpression
    with ArrayFieldEquality {

  @transient private lazy val utf8Terms: Array[UTF8String] =
    terms.map(UTF8String.fromString)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "term_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(StringType), ignoreNullability = true)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got ${child.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any): Any =
    TermCountsExpr.counts(a.asInstanceOf[ArrayData], utf8Terms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", utf8Terms, "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, a => s"graft.plans.TermCountsExpr.counts($a, $termsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCountsExpr =
    copy(child = newChild)
}

object TermCountsExpr {

  def counts(w: ArrayData, terms: Array[UTF8String]): ArrayData = {
    val out = new Array[Int](terms.length)
    val n = w.numElements()
    var i = 0
    while (i < n) {
      if (!w.isNullAt(i)) {
        val t = w.getUTF8String(i)
        var j = 0
        while (j < terms.length) {
          if (t.equals(terms(j))) out(j) += 1
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def termCounts(w: Column, terms: Seq[String]): Column =
    shims.columnOf(TermCountsExpr(shims.expressionOf(w), terms.toArray))
}
