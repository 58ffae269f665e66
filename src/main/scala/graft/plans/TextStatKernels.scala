package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Round-15 kernel sweep: the remaining interpreted higher-order
  * lambdas on per-token / per-element hot paths, each replaced by one
  * static loop inside whole-stage codegen (the round-14 TokenKernels
  * posture; Spark's transform/filter/aggregate/exists are
  * CodegenFallback and interpret their lambda per ELEMENT with
  * boxing). Every kernel documents the exact null/edge semantics of
  * the declarative spelling it replaces — PlanSpec's lambdafunction
  * lint pins the set of queries allowed to keep a lambda.
  */
object TextStatKernels {

  private def requireType(name: String, dt: DataType, want: DataType, what: String): TypeCheckResult =
    if (DataType.equalsStructurally(dt, want, ignoreNullability = true)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$name requires $what, got ${dt.sql}")

  // ------------------------------------------------------------------
  // c37: size(filter(tb, b => element_at(flagsLit, b+1) === 1))
  // ------------------------------------------------------------------

  /** Count of non-null elements b with flags(b) == 1. Null elements are
    * skipped (the lambda's null condition dropped them from the
    * filter); an out-of-range b fails loudly (element_at under ANSI
    * errored too).
    */
  def flagCount(a: ArrayData, flags: Array[Int]): Long = {
    val n = a.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val b = a.getLong(i)
        if (b < 0 || b >= flags.length) {
          throw new IllegalArgumentException(s"flag_count: bucket $b outside [0, ${flags.length})")
        }
        if (flags(b.toInt) == 1) c += 1L
      }
      i += 1
    }
    c
  }

  case class FlagCountExpr(child: Expression, flags: Array[Int])
      extends UnaryExpression
      with ArrayFieldEquality {

    override def dataType: DataType = LongType
    override def prettyName: String = "flag_count"

    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child.dataType, ArrayType(LongType), "array<long>")

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.flagCount(a.asInstanceOf[ArrayData], flags)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val fRef = ctx.addReferenceObj("flags", flags, "int[]")
      defineCodeGen(ctx, ev, a => s"graft.plans.TextStatKernels.flagCount($a, $fRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): FlagCountExpr =
      copy(child = newChild)
  }

  def flagCount(arr: Column, flags: Array[Int]): Column =
    shims.columnOf(FlagCountExpr(shims.expressionOf(arr), flags))

  // ------------------------------------------------------------------
  // c48: in-vocab token count + distinct-OOV-type count, one pass
  // ------------------------------------------------------------------

  /** (n_in_vocab, n_oov_types) over one token pass. Mirrors
    * `size(filter(w, t => map_contains_key(vmap, t)))` and
    * `size(array_distinct(filter(w, t => !map_contains_key(vmap, t))))`:
    * null tokens fall in NEITHER count (the lambda's null condition
    * dropped them from both filters); distinctness is binary string
    * equality, exactly array_distinct's.
    */
  def vocabStats(a: ArrayData, vocab: java.util.HashSet[UTF8String]): InternalRow = {
    val n = a.numElements()
    var inV = 0L
    val oov = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        if (vocab.contains(t)) inV += 1L
        else { oov.add(t); () }
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](inV, oov.size.toLong))
  }

  case class VocabStatsExpr(child: Expression, vocab: Array[String])
      extends UnaryExpression
      with ArrayFieldEquality {

    @transient private lazy val vocabSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String]()
      vocab.foreach(t => s.add(UTF8String.fromString(t)))
      s
    }

    override def dataType: DataType = StructType(
      Seq(
        StructField("n_in_vocab", LongType, nullable = false),
        StructField("n_oov_types", LongType, nullable = false)
      )
    )
    override def prettyName: String = "vocab_stats"

    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child.dataType, ArrayType(StringType), "array<string>")

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.vocabStats(a.asInstanceOf[ArrayData], vocabSet)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val vRef = ctx.addReferenceObj("vocab", vocabSet, "java.util.HashSet")
      defineCodeGen(ctx, ev, a => s"graft.plans.TextStatKernels.vocabStats($a, $vRef)")
    }

    override protected def withNewChildInternal(newChild: Expression): VocabStatsExpr =
      copy(child = newChild)
  }

  def vocabStats(arr: Column, vocab: Seq[String]): Column =
    shims.columnOf(VocabStatsExpr(shims.expressionOf(arr), vocab.toArray))

  // ------------------------------------------------------------------
  // c66: the Gopher per-word signal battery, one pass
  // ------------------------------------------------------------------

  /** One pass over the token array computing the c66 battery. Exact
    * mirrors of the declarative spellings (tokens are
    * whitespace-split, so none contains a newline and the anchored
    * regex mirrors below are byte-exact):
    *  - n_unique  = size(array_distinct(w)) — a null token, if ever
    *    present, counts as ONE distinct element;
    *  - sum_chars = aggregate(w, 0L, acc + length(x)) — length is
    *    CHARACTER count (UTF8String.numChars, Spark's Length); a null
    *    token nulls the whole sum; empty array → 0;
    *  - max_word_len = array_max(transform(w, length)) — null tokens
    *    skipped; empty/all-null → NULL;
    *  - n_alpha   = rlike "[A-Za-z]": any ASCII letter byte (UTF-8
    *    continuation/lead bytes are ≥ 0x80, so byte scan ≡ char scan);
    *  - n_numeric = rlike "^[0-9]+$": non-empty, every byte an ASCII
    *    digit;
    *  - n_cap     = rlike "^[A-Z]": first byte an ASCII uppercase
    *    (a multi-byte first char can never match A–Z);
    *  - null tokens match no rlike (the lambda's null dropped them).
    */
  def gopherStats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    val uniq = new java.util.HashSet[UTF8String]()
    var nullSeen = false
    var sumChars = 0L
    var sumNull = false
    var maxLen = -1L
    var nAlpha = 0L
    var nNum = 0L
    var nCap = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        nullSeen = true
        sumNull = true
      } else {
        val t = a.getUTF8String(i)
        uniq.add(t): Unit
        val chars = t.numChars().toLong
        sumChars += chars
        if (chars > maxLen) maxLen = chars
        val nb = t.numBytes()
        var alpha = false
        var allDigit = nb > 0
        var j = 0
        while (j < nb && !(alpha && !allDigit)) {
          val b = t.getByte(j)
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha = true
          if (b < '0' || b > '9') allDigit = false
          j += 1
        }
        // the early-exit above only fires once both outcomes are
        // settled; finish the scan for alpha if digits ruled out first
        while (j < nb && !alpha) {
          val b = t.getByte(j)
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha = true
          j += 1
        }
        if (alpha) nAlpha += 1L
        if (allDigit) nNum += 1L
        val fb = if (nb > 0) t.getByte(0) else 0.toByte
        if (fb >= 'A' && fb <= 'Z') nCap += 1L
      }
      i += 1
    }
    val nUnique = uniq.size.toLong + (if (nullSeen) 1L else 0L)
    new GenericInternalRow(
      Array[Any](
        nUnique,
        if (sumNull) null else sumChars,
        if (maxLen < 0) null else maxLen,
        nAlpha,
        nNum,
        nCap
      )
    )
  }

  case class GopherTokenStatsExpr(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StructType(
      Seq(
        StructField("n_unique", LongType, nullable = false),
        StructField("sum_chars", LongType, nullable = true),
        StructField("max_word_len", LongType, nullable = true),
        StructField("n_alpha", LongType, nullable = false),
        StructField("n_numeric", LongType, nullable = false),
        StructField("n_cap", LongType, nullable = false)
      )
    )
    override def prettyName: String = "gopher_token_stats"

    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child.dataType, ArrayType(StringType), "array<string>")

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.gopherStats(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.plans.TextStatKernels.gopherStats($a)")

    override protected def withNewChildInternal(newChild: Expression): GopherTokenStatsExpr =
      copy(child = newChild)
  }

  def gopherStats(arr: Column): Column =
    shims.columnOf(GopherTokenStatsExpr(shims.expressionOf(arr)))

  // ------------------------------------------------------------------
  // c88/c89: distinct window minima (winnowing selection), one pass
  // ------------------------------------------------------------------

  /** Distinct minima of every w-wide window, first-occurrence order —
    * the exact value of `array_distinct(transform(sequence(0, nw−1),
    * i => least(element_at(hs, i+1) … element_at(hs, i+w))))` with the
    * `when(nw > 0, …, else empty)` guard folded in: fewer than w
    * elements → empty array. least() skips null elements (all-null
    * window → null, kept once by distinct, as array_distinct does).
    */
  def winnowMins(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    val nw = n - w + 1
    if (nw <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new java.util.LinkedHashSet[Any]()
    var i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var seen = false
      var j = 0
      while (j < w) {
        if (!a.isNullAt(i + j)) {
          val v = a.getLong(i + j)
          if (!seen || v < m) { m = v; seen = true }
        }
        j += 1
      }
      out.add(if (seen) java.lang.Long.valueOf(m) else null): Unit
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  case class WinnowMinsExpr(child: Expression, w: Int) extends UnaryExpression {

    require(w >= 1, "window must be >= 1")

    override def dataType: DataType = ArrayType(LongType, containsNull = true)
    override def prettyName: String = "winnow_mins"

    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child.dataType, ArrayType(LongType), "array<long>")

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.winnowMins(a.asInstanceOf[ArrayData], w)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.plans.TextStatKernels.winnowMins($a, $w)")

    override protected def withNewChildInternal(newChild: Expression): WinnowMinsExpr =
      copy(child = newChild)
  }

  def winnowMins(arr: Column, w: Int): Column =
    shims.columnOf(WinnowMinsExpr(shims.expressionOf(arr), w))

  // ------------------------------------------------------------------
  // aggregate(arr, 0L, _ + _)  →  one loop
  // ------------------------------------------------------------------

  /** Long sum in array order — exactly `aggregate(arr, 0L, (acc, x) =>
    * acc + x)`: empty → 0, any null element → NULL (acc + null).
    */
  def arraySum(a: ArrayData): Any = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      s += a.getLong(i)
      i += 1
    }
    s
  }

  case class ArraySumExpr(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "array_sum_long"
    // null on a null ELEMENT of a non-null array too
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child.dataType, ArrayType(LongType), "array<long>")

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.arraySum(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val res = ctx.freshName("asum")
      nullSafeCodeGen(
        ctx,
        ev,
        a => s"""
          Object $res = graft.plans.TextStatKernels.arraySum($a);
          if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $res).longValue(); }
        """
      )
    }

    override protected def withNewChildInternal(newChild: Expression): ArraySumExpr =
      copy(child = newChild)
  }

  def arraySum(arr: Column): Column =
    shims.columnOf(ArraySumExpr(shims.expressionOf(arr)))

  // ------------------------------------------------------------------
  // c102: content-defined-chunking boundary positions
  // ------------------------------------------------------------------

  /** Boundary positions of the CDC residue rule, plus a constant
    * offset: { p + offset : p ∈ [window, n−1], rh[p−window] % divisor
    * == 0 } in ascending order — the exact value of
    * `filter(sequence(window, n−1), p => element_at(rh, p−(window−1))
    * % divisor === 0)` (then `transform(_, +1)` when offset = 1) with
    * the `when(n−1 ≥ window, …, else empty)` guard folded in. Null rh
    * elements fail the lambda's null condition and are skipped; Java %
    * ≡ SQL % (both truncate toward zero).
    */
  def cdcBoundaries(rh: ArrayData, n: Int, window: Int, divisor: Long, offset: Int): ArrayData = {
    if (n - 1 < window) return new GenericArrayData(new Array[Any](0))
    val buf = new java.util.ArrayList[Any]()
    var p = window
    while (p <= n - 1) {
      val idx = p - window
      if (idx < rh.numElements() && !rh.isNullAt(idx) && rh.getLong(idx) % divisor == 0L) {
        buf.add(java.lang.Integer.valueOf(p + offset)): Unit
      }
      p += 1
    }
    new GenericArrayData(buf.toArray)
  }

  case class CdcBoundariesExpr(left: Expression, right: Expression, window: Int, divisor: Long, offset: Int)
      extends BinaryExpression {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "cdc_boundaries"

    override def checkInputDataTypes(): TypeCheckResult = {
      val l = requireType(prettyName, left.dataType, ArrayType(LongType), "array<long>")
      if (l != TypeCheckResult.TypeCheckSuccess) l
      else requireType(prettyName, right.dataType, IntegerType, "int")
    }

    override protected def nullSafeEval(rh: Any, n: Any): Any =
      TextStatKernels.cdcBoundaries(rh.asInstanceOf[ArrayData], n.asInstanceOf[Int], window, divisor, offset)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(
        ctx,
        ev,
        (rh, n) => s"graft.plans.TextStatKernels.cdcBoundaries($rh, $n, $window, ${divisor}L, $offset)"
      )

    override protected def withNewChildrenInternal(l: Expression, r: Expression): CdcBoundariesExpr =
      copy(left = l, right = r)
  }

  def cdcBoundaries(rh: Column, n: Column, window: Int, divisor: Long, offset: Int): Column =
    shims.columnOf(CdcBoundariesExpr(shims.expressionOf(rh), shims.expressionOf(n), window, divisor, offset))

  // ------------------------------------------------------------------
  // c70: int8 max-abs quantization stats, one pass
  // ------------------------------------------------------------------

  /** The c70 battery over one vector read. Exact mirrors:
    *  - maxabs = array_max(transform(v, abs)) — null elements skipped,
    *    empty/all-null → NULL;
    *  - codes  = when(maxabs === 0, all-0) otherwise
    *    floor(x·127.0/maxabs) per element (Spark's floor(double) is
    *    math.floor(_).toLong) — a null element stays null;
    *  - code_sum = aggregate(codes, 0L, +) — any null code → NULL;
    *    when maxabs is NULL every code is null, so code_sum is NULL
    *    for non-empty v (and 0 for empty);
    *  - code_min/max = array_min/max over codes — nulls skipped;
    *  - n_zero_codes = size(filter(codes, === 0)) — nulls dropped.
    */
  def quantStats(a: ArrayData): InternalRow = {
    val n = a.numElements()
    var maxabs = -1.0
    var anyVal = false
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val x = math.abs(a.getDouble(i))
        if (!anyVal || x > maxabs) { maxabs = x; anyVal = true }
      }
      i += 1
    }
    if (!anyVal) {
      // maxabs NULL: every code is null → sum null unless empty
      return new GenericInternalRow(
        Array[Any](null, if (n == 0) 0L else null, null, null, 0L)
      )
    }
    if (maxabs == 0.0) {
      // the old `when(maxabs === 0, transform(v, _ => 0L))` lambda is
      // CONSTANT — it maps even null elements to 0, so all n codes are
      // 0: sum 0, min = max = 0, every element a zero code
      return new GenericInternalRow(Array[Any](0.0, 0L, 0L, 0L, n.toLong))
    }
    var sum = 0L
    var sumNull = false
    var minC = 0L
    var maxC = 0L
    var anyCode = false
    var nZero = 0L
    i = 0
    while (i < n) {
      if (a.isNullAt(i)) { sumNull = true }
      else {
        val c =
          if (maxabs == 0.0) 0L
          else math.floor(a.getDouble(i) * 127.0 / maxabs).toLong
        if (!sumNull) sum += c
        if (!anyCode || c < minC) minC = c
        if (!anyCode || c > maxC) maxC = c
        anyCode = true
        if (c == 0L) nZero += 1L
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](
        maxabs,
        if (sumNull) null else sum,
        if (anyCode) minC else null,
        if (anyCode) maxC else null,
        nZero
      )
    )
  }

  case class QuantStatsExpr(child: Expression) extends UnaryExpression {

    override def dataType: DataType = StructType(
      Seq(
        StructField("maxabs", DoubleType, nullable = true),
        StructField("code_sum", LongType, nullable = true),
        StructField("code_min", LongType, nullable = true),
        StructField("code_max", LongType, nullable = true),
        StructField("n_zero_codes", LongType, nullable = false)
      )
    )
    override def prettyName: String = "quant_stats"

    override def checkInputDataTypes(): TypeCheckResult =
      requireType(prettyName, child.dataType, ArrayType(DoubleType), "array<double>")

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.quantStats(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.plans.TextStatKernels.quantStats($a)")

    override protected def withNewChildInternal(newChild: Expression): QuantStatsExpr =
      copy(child = newChild)
  }

  def quantStats(arr: Column): Column =
    shims.columnOf(QuantStatsExpr(shims.expressionOf(arr)))

  // ------------------------------------------------------------------
  // s29: exists(embedding, x -> isnan(x))
  // ------------------------------------------------------------------

  /** true iff any non-null element is NaN — exactly
    * `exists(v, isnan)`: isnan(null) is false (IsNaN is non-nullable),
    * so null elements never satisfy the predicate and the exists never
    * returns the tri-state null; empty → false; null array → null.
    * Works on float and double arrays (the quarantine scans the RAW
    * parquet column).
    */
  def hasNaN(a: ArrayData, isFloat: Boolean): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val nan = if (isFloat) java.lang.Float.isNaN(a.getFloat(i)) else java.lang.Double.isNaN(a.getDouble(i))
        if (nan) return true
      }
      i += 1
    }
    false
  }

  case class HasNaNExpr(child: Expression) extends UnaryExpression {

    private def isFloat: Boolean = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def dataType: DataType = BooleanType
    override def prettyName: String = "has_nan"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>, got ${other.sql}")
    }

    override protected def nullSafeEval(a: Any): Any =
      TextStatKernels.hasNaN(a.asInstanceOf[ArrayData], isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.plans.TextStatKernels.hasNaN($a, $isFloat)")

    override protected def withNewChildInternal(newChild: Expression): HasNaNExpr =
      copy(child = newChild)
  }

  def hasNaN(arr: Column): Column =
    shims.columnOf(HasNaNExpr(shims.expressionOf(arr)))
}
