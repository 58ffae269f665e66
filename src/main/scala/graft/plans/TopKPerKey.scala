package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, Descending, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.IntegerType

/** Native whole-operator top-k-per-key — the (c)-level extension point:
  * a custom LogicalPlan planned by an injected SparkStrategy into a
  * two-phase physical operator.
  *
  * The declarative formulation (`row_number().over(partitionBy(key)
  * .orderBy(...))` + filter) forces Spark to SORT EVERY ROW of every
  * key partition, because Catalyst cannot see that only k rows per key
  * survive; with a low-cardinality key the whole table serializes into
  * a handful of sort tasks (b5's salted pre-pass is the compositional
  * workaround). This operator is the principled fix: a bounded heap of
  * k rows per key on the map side — no sort, O(n log k), any number of
  * input partitions — then a shuffle of AT MOST k·partitions rows per
  * key, then a final per-key reduction on the clustered side.
  *
  * Memory safety at ANY key cardinality (the HashAggregate/SortAggregate
  * duality, applied to top-k):
  *   - the PARTIAL phase caps its hash map at `maxKeysInMemory` heaps;
  *     on overflow it FLUSHES the current heaps downstream and starts
  *     fresh — partial output may then carry more than one batch of
  *     candidates per key, which the final phase re-reduces, so
  *     correctness never depends on the cap. Memory is bounded by
  *     maxKeys·k rows regardless of input cardinality.
  *   - the FINAL phase defaults to one in-memory heap per key of its
  *     partition (`sortedFinal = false` — right for grouping keys up to
  *     ~millions per partition, and the only mode that needs no sort
  *     anywhere). For unbounded key cardinality, `sortedFinal = true`
  *     requires key-sorted input instead (Spark's external, spilling
  *     sort over the ALREADY k-pruned exchange output) and reduces one
  *     group at a time in O(k) memory — trading a bounded sort of
  *     ≤ k·mapPartitions rows per key for immunity to cardinality.
  */
object TopKPerKey {

  /** Flush threshold for the partial phase and heap-count guard for the
    * hash final phase: at most this many per-key heaps live at once.
    */
  val DefaultMaxKeysInMemory = 262144

  /** Logical node: top `k` rows per `keys` group under `order`. */
  case class TopKPerKeyNode(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      sortedFinal: Boolean,
      child: LogicalPlan
  ) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  /** Physical node; `partial = true` runs on raw input partitions (map
    * side), `partial = false` requires the key clustering and produces
    * the exact answer (hash heaps, or streaming groups when
    * `sortedFinal`).
    */
  case class TopKPerKeyExec(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: SparkPlan,
      partial: Boolean,
      sortedFinal: Boolean = false,
      maxKeysInMemory: Int = DefaultMaxKeysInMemory
  ) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override lazy val metrics: Map[String, SQLMetric] = Map(
      "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
      "numFlushes" -> SQLMetrics.createMetric(sparkContext, "partial heap-map flushes")
    )

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] =
      if (!partial && sortedFinal) Seq(keys.map(SortOrder(_, Ascending))) else Seq(Nil)

    override def outputOrdering: Seq[SortOrder] =
      if (!partial && sortedFinal) keys.map(SortOrder(_, Ascending)) else Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val keyExprs = keys
      val sortOrder = order
      val childOutput = child.output
      val flushAt = if (partial) maxKeysInMemory else Int.MaxValue
      val groupedInput = !partial && sortedFinal
      val numOutputRows = longMetric("numOutputRows")
      val numFlushes = longMetric("numFlushes")
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // identity projection: heap entries (and thus operator output) are
        // UnsafeRow whatever row class the child iterator hands out, so the
        // downstream Exchange serializes without a conversion pass
        val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
        // total order (callers append a unique tiebreak), codegen'd lazily
        val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)

        def newHeap() = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
        def push(heap: java.util.PriorityQueue[InternalRow], row: InternalRow): Unit =
          if (heap.size < kLocal) heap.add(toUnsafe(row).copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(toUnsafe(row).copy()): Unit
          }

        if (groupedInput) {
          // key-sorted input: one live heap, O(k) memory at any cardinality
          new Iterator[InternalRow] {
            private var curKey: UnsafeRow = null
            private var heap = newHeap()
            private var drain: java.util.Iterator[InternalRow] = java.util.Collections.emptyIterator()
            private def advance(): Unit = {
              while (!drain.hasNext && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                if (curKey == null) curKey = key.copy()
                else if (key != curKey) {
                  // group boundary: emit the finished group, start the next
                  drain = heap.iterator()
                  heap = newHeap()
                  curKey = key.copy()
                }
                push(heap, row)
              }
              // input exhausted and nothing buffered → flush the last group
              // (heap is REPLACED, so this can never re-emit)
              if (!drain.hasNext && !iter.hasNext && heap.size > 0) {
                drain = heap.iterator()
                heap = newHeap()
              }
            }
            override def hasNext: Boolean = { advance(); drain.hasNext }
            override def next(): InternalRow = { numOutputRows += 1; drain.next() }
          }
        } else {
          // hash heaps; the partial phase flushes downstream on overflow so
          // memory stays bounded at ANY key cardinality (the final phase
          // re-reduces whatever reaches it)
          new Iterator[InternalRow] {
            import scala.jdk.CollectionConverters._
            private val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
            private var drain: Iterator[InternalRow] = Iterator.empty
            private def drainHeaps(): Iterator[InternalRow] = {
              val all = heaps.values().asScala.toArray
              heaps.clear()
              all.iterator.flatMap(_.iterator().asScala)
            }
            private def advance(): Unit = {
              while (!drain.hasNext && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row) // reused buffer — copy only on first sight
                var heap = heaps.get(key)
                if (heap == null) {
                  if (heaps.size >= flushAt) {
                    // overflow: emit every live heap downstream and start a
                    // fresh epoch — the final phase re-reduces per key, so
                    // a key spanning epochs is still exact
                    numFlushes += 1
                    drain = drainHeaps()
                  }
                  heap = newHeap()
                  heaps.put(key.copy(), heap)
                }
                push(heap, row)
              }
              // input exhausted → flush whatever remains (map is cleared, so
              // this can never re-emit)
              if (!drain.hasNext && !iter.hasNext && !heaps.isEmpty) drain = drainHeaps()
            }
            override def hasNext: Boolean = { advance(); drain.hasNext }
            override def next(): InternalRow = { numOutputRows += 1; drain.next() }
          }
        }
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
  }

  /** Strategy: logical node → partial + final pair; EnsureRequirements
    * adds the key Exchange between them (and, in sortedFinal mode, the
    * spillable key sort over the pruned exchange output).
    */
  /** Session conf key overriding [[DefaultMaxKeysInMemory]] (mainly for
    * tests, which shrink it to force flush epochs).
    */
  val MaxKeysConfKey = "spark.graft.topKPerKey.maxKeysInMemory"

  object TopKPerKeyStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(keys, order, k, sortedFinal, child) =>
        val maxKeys = org.apache.spark.sql.internal.SQLConf.get
          .getConfString(MaxKeysConfKey, DefaultMaxKeysInMemory.toString)
          .toInt
        val part =
          TopKPerKeyExec(keys, order, k, planLater(child), partial = true, maxKeysInMemory = maxKeys)
        TopKPerKeyExec(keys, order, k, part, partial = false, sortedFinal = sortedFinal, maxKeysInMemory = maxKeys) :: Nil
      case _ => Nil
    }
  }

  /** Session conf key bounding [[RowNumberLimitToTopK]]'s rewrite: a
    * SQL `row_number() ≤ k` filter is only rewritten when k stays at or
    * under this (per-key heaps hold k rows in memory; past this size
    * the declarative window's spillable sort is the safer plan).
    */
  val SqlRewriteMaxKKey = "spark.graft.topKPerKey.sqlRewriteMaxK"
  val DefaultSqlRewriteMaxK = 1000

  /** SQL surface of the native operator: an optimizer rule rewriting
    * the canonical top-k-per-key SQL shape —
    *
    *   SELECT * FROM (SELECT *, row_number() OVER
    *     (PARTITION BY k ORDER BY o) rn FROM t) WHERE rn <= 10
    *
    * — by planting [[TopKPerKeyNode]] UNDER the Window, so the heap
    * prune runs first and the row_number only renumbers the ≤ k
    * survivors per key (the final TopK phase leaves rows clustered by
    * key, so the renumbering window reuses that exchange). The rn
    * bound conjuncts that the prune makes vacuous are dropped from the
    * filter — which also keeps Spark's own InferWindowGroupLimit from
    * matching the already-rewritten shape — and if rn is unreferenced
    * above, later column pruning removes the window entirely.
    *
    * Only the exact shape rewrites: a single row_number window
    * expression, non-empty PARTITION BY (a global top-k has no key to
    * cluster), an integer-literal upper bound ≥ 1 and ≤
    * [[SqlRewriteMaxKKey]]. Ties under a non-total ORDER BY are
    * nondeterministic in both formulations, so the rewrite never
    * changes a deterministic result.
    */
  object RowNumberLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

    /** The rn attribute, possibly under the long-widening cast that
      * `.cast("long")` / bigint comparisons introduce (monotone and
      * injective on the int range, so bounds transfer unchanged).
      */
    private def rnRef(e: Expression): Option[ExprId] = e match {
      case a: Attribute => Some(a.exprId)
      case c: org.apache.spark.sql.catalyst.expressions.Cast if c.dataType == org.apache.spark.sql.types.LongType =>
        c.child match {
          case a: Attribute => Some(a.exprId)
          case _ => None
        }
      case _ => None
    }

    private def intVal(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, org.apache.spark.sql.types.LongType) if v >= Int.MinValue && v <= Int.MaxValue =>
        Some(v.toInt)
      case _ => None
    }

    /** Upper bound on rn implied by one conjunct, if any. */
    private def bound(e: Expression, rn: ExprId): Option[Int] = {
      def ub(lhs: Expression, rhs: Expression, strict: Boolean): Option[Int] =
        for { id <- rnRef(lhs) if id == rn; v <- intVal(rhs) } yield if (strict) v - 1 else v
      e match {
        case LessThanOrEqual(l, r) => ub(l, r, strict = false)
        case LessThan(l, r) => ub(l, r, strict = true)
        case GreaterThanOrEqual(l, r) => ub(r, l, strict = false)
        case GreaterThan(l, r) => ub(r, l, strict = true)
        case EqualTo(l, r) => ub(l, r, strict = false).orElse(ub(r, l, strict = false))
        case _ => None
      }
    }

    /** True when the k-prune makes the conjunct vacuous (pure upper
      * bounds no tighter than k; equality still selects WITHIN the
      * kept rows, so it must survive).
      */
    private def implied(e: Expression, rn: ExprId, k: Int): Boolean = e match {
      case EqualTo(_, _) => false
      case _ => bound(e, rn).exists(_ >= k)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, w: Window)
          if w.windowExpressions.size == 1 && w.partitionSpec.nonEmpty &&
            w.orderSpec.nonEmpty && !w.child.isInstanceOf[TopKPerKeyNode] =>
        w.windowExpressions.head match {
          case alias @ Alias(WindowExpression(RowNumber(), _), _) =>
            val rnId = alias.exprId
            val conjuncts = splitConjunctivePredicates(cond)
            val bounds = conjuncts.flatMap(bound(_, rnId))
            val maxK = conf.getConfString(SqlRewriteMaxKKey, DefaultSqlRewriteMaxK.toString).toInt
            if (bounds.nonEmpty && bounds.min >= 1 && bounds.min <= maxK) {
              val k = bounds.min
              // when injected through experimental.extraOptimizations the
              // rule runs AFTER Spark's InferWindowGroupLimit; the TopK
              // prune is at least as tight as the group limit it derived
              // from the same filter, so drop the now-redundant
              // sort-based pruner instead of stacking on top of it
              val base = w.child match {
                case wgl: WindowGroupLimit
                    if wgl.partitionSpec == w.partitionSpec && wgl.orderSpec == w.orderSpec =>
                  wgl.child
                case other => other
              }
              // sortedFinal: the rewrite fires on arbitrary user queries,
              // so the final phase must be memory-safe at ANY key
              // cardinality — the spillable key-sort runs over the
              // already k-pruned exchange output, a bounded cost
              val pruned = w.copy(child = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, sortedFinal = true, base))
              conjuncts.filterNot(implied(_, rnId, k)).reduceOption(And) match {
                case Some(residual) => Filter(residual, pruned)
                case None => pruned
              }
            } else f
          case _ => f
        }
    }
  }

  /** Public entry point. `orderBy` is (column, ascending) pairs and must
    * form a total order (append a unique id column) for deterministic
    * results. Injects the strategy into the session on first use.
    * Column names resolve with the session's resolver (case-insensitive
    * by default) and REJECT ambiguous matches — self-join outputs with
    * duplicate names must be disambiguated by the caller first.
    *
    * @param sortedFinal pass true when the key cardinality per reduce
    *   partition may exceed [[DefaultMaxKeysInMemory]] (e.g. per-user
    *   top-k over billions of users): the final phase then runs over a
    *   spillable key-sort in O(k) memory instead of in-memory hash heaps.
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int,
      sortedFinal: Boolean = false
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val child = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      child.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() =>
          throw new IllegalArgumentException(s"no column '$name' in ${child.output.map(_.name)}")
        case many =>
          throw new IllegalArgumentException(
            s"ambiguous column '$name' matches ${many.map(_.name)} — rename before topKPerKey")
      }
    val keys = keyCols.map(attr(_).asInstanceOf[Expression])
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    shims.dataFrameOf(spark, TopKPerKeyNode(keys, order, k, sortedFinal, child))
  }
}
