package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the SimHash signature of a token-hash
  * array, computed entirely within the row.
  *
  * The aggregate formulation ([[SimHashAgg]], kept for the SQL surface)
  * needs the tokens EXPLODED first — at corpus scale that is a shuffle
  * of every token occurrence and a second aggregation back to one row
  * per document. But the signature depends only on the document's own
  * tokens, so it is a scalar function of the token array: one pass,
  * vote_i += ±1 per occurrence (identical to ±cnt per distinct token),
  * signature bit i = 1 iff vote_i > 0 — bit-for-bit the aggregate's
  * semantics with ZERO shuffles.
  */
case class SimHashOfTokens(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"bits must be in [1, 64], got $bits")

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash_of_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsStructurally(child.dataType, ArrayType(LongType), ignoreNullability = true))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<bigint> argument, got ${child.dataType.sql}"
      )

  override protected def nullSafeEval(v: Any): Any =
    SimHashOfTokens.sig(v.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = graft.plans.SimHashOfTokens.sig($v, $bits);")

  override protected def withNewChildInternal(newChild: Expression): SimHashOfTokens =
    copy(child = newChild)
}

object SimHashOfTokens {

  def sig(a: ArrayData, bits: Int): Long = {
    val votes = new Array[Long](bits)
    val n = a.numElements()
    var t = 0
    while (t < n) {
      // strict at ingestion, matching ArrayNormalize: a null token hash
      // would otherwise vote as 0L and fabricate a plausible signature
      if (a.isNullAt(t))
        throw new IllegalArgumentException(
          s"simhash: null token hash at index $t — hash the tokens with a null-free expression")
      val h = a.getLong(t)
      var i = 0
      while (i < bits) {
        votes(i) += (if (((h >> i) & 1L) == 1L) 1L else -1L)
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Column-level entry point. */
  def simHashOfTokens(tokenHashes: Column, bits: Int): Column =
    shims.columnOf(SimHashOfTokens(shims.expressionOf(tokenHashes), bits))
}
