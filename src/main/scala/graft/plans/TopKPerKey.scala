package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, DenseRank, Descending, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper, Rank, RowNumber, SortOrder, UnsafeProjection, UnsafeRow, WindowExpression}
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

  /** Retention semantics of the per-key prune — which window function's
    * `fn ≤ k` filter the operator computes:
    *   - [[RowNumberMode]]: exactly k rows per key (callers supply a
    *     total order); per-key memory is k rows.
    *   - [[RankMode]]: every row whose RANK() ≤ k — ties at the k-th
    *     position are RETAINED, so output may exceed k rows per key;
    *     per-key memory is k rows plus the boundary tie group.
    *   - [[DenseRankMode]]: every row in the first k DISTINCT order
    *     values; per-key memory is the retained rows themselves (k
    *     groups of unbounded size — the semantic minimum, since every
    *     retained row is output).
    * Rank/dense results are deterministic even under a NON-total order
    * (the kept set is downward-closed in the order), which is exactly
    * why analysts reach for RANK() after row_number().
    */
  sealed trait TopKMode extends Serializable
  case object RowNumberMode extends TopKMode
  case object RankMode extends TopKMode
  case object DenseRankMode extends TopKMode

  /** Logical node: top `k` rows per `keys` group under `order`. */
  case class TopKPerKeyNode(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      sortedFinal: Boolean,
      child: LogicalPlan,
      mode: TopKMode = RowNumberMode
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
  /** Per-key retention buffer — the mode-specific data structure the
    * exec pushes rows through. Instantiated per task inside
    * mapPartitions, so none of these are serialized.
    */
  private sealed trait TopKBuf {
    def push(row: InternalRow): Unit
    def isEmpty: Boolean
    /** Destructive: emits the retained rows and resets the buffer. */
    def drain(): Iterator[InternalRow]
  }

  /** row_number: bounded max-heap of the k least rows (total order). */
  private final class RowNumberBuf(
      k: Int,
      ord: Ordering[InternalRow],
      toUnsafe: UnsafeProjection
  ) extends TopKBuf {
    private val heap = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)
    override def push(row: InternalRow): Unit =
      if (heap.size < k) heap.add(toUnsafe(row).copy())
      else if (ord.compare(row, heap.peek()) < 0) {
        heap.poll()
        heap.add(toUnsafe(row).copy()): Unit
      }
    override def isEmpty: Boolean = heap.isEmpty
    override def drain(): Iterator[InternalRow] = {
      import scala.jdk.CollectionConverters._
      val rows = heap.iterator().asScala.toArray
      heap.clear()
      rows.iterator
    }
  }

  /** rank / dense_rank: order-tied rows bucket into GROUPS (a TreeMap
    * keyed by a representative row under the sort comparator — compare
    * == 0 IS the tie predicate), because the droppable unit is a whole
    * group, never a row: rank ≤ k keeps trailing groups only while
    * fewer than k rows precede them; dense_rank ≤ k keeps the first k
    * groups outright.
    */
  private final class RankBuf(
      k: Int,
      ord: Ordering[InternalRow],
      toUnsafe: UnsafeProjection,
      dense: Boolean
  ) extends TopKBuf {
    private val groups = new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](ord)
    private var total = 0
    override def push(row: InternalRow): Unit = {
      val existing = groups.get(row)
      if (existing != null) {
        existing.add(toUnsafe(row).copy())
        total += 1
        // a tie added mid-map can push the LAST group past reach
        if (!dense) prune()
      } else if (dense) {
        // beyond the k-th distinct value and k groups live → unreachable
        if (groups.size < k || ord.compare(row, groups.lastKey()) < 0) {
          val u = toUnsafe(row).copy()
          val l = new java.util.ArrayList[InternalRow]
          l.add(u)
          groups.put(u, l)
          total += 1
          if (groups.size > k) total -= groups.pollLastEntry().getValue.size()
        }
      } else {
        // rank: a NEW value ordered after every retained row, with ≥ k
        // rows already retained, has ≥ k rows strictly before it
        if (total < k || groups.isEmpty || ord.compare(row, groups.lastKey()) < 0) {
          val u = toUnsafe(row).copy()
          val l = new java.util.ArrayList[InternalRow]
          l.add(u)
          groups.put(u, l)
          total += 1
          prune()
        }
      }
    }
    /** Drop trailing groups whose minimum rank exceeds k: the rows
      * strictly before the last group are exactly `total - last.size`.
      */
    private def prune(): Unit = {
      var last = groups.lastEntry()
      while (last != null && total - last.getValue.size() >= k) {
        groups.pollLastEntry()
        total -= last.getValue.size()
        last = groups.lastEntry()
      }
    }
    override def isEmpty: Boolean = groups.isEmpty
    override def drain(): Iterator[InternalRow] = {
      import scala.jdk.CollectionConverters._
      val lists = groups.values().asScala.toArray
      groups.clear()
      total = 0
      lists.iterator.flatMap(_.asScala.iterator)
    }
  }

  case class TopKPerKeyExec(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: SparkPlan,
      partial: Boolean,
      sortedFinal: Boolean = false,
      maxKeysInMemory: Int = DefaultMaxKeysInMemory,
      mode: TopKMode = RowNumberMode
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
      val modeLocal = mode
      val flushAt = if (partial) maxKeysInMemory else Int.MaxValue
      val groupedInput = !partial && sortedFinal
      val numOutputRows = longMetric("numOutputRows")
      val numFlushes = longMetric("numFlushes")
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // identity projection: buffer entries (and thus operator output)
        // are UnsafeRow whatever row class the child iterator hands out,
        // so the downstream Exchange serializes without a conversion pass
        val toUnsafe = UnsafeProjection.create(childOutput.map(_.dataType).toArray)
        // row_number callers append a unique tiebreak for a total order;
        // rank/dense treat compare==0 as the tie predicate. Codegen'd.
        val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)

        def newBuf(): TopKBuf = modeLocal match {
          case RowNumberMode => new RowNumberBuf(kLocal, ordering, toUnsafe)
          case RankMode => new RankBuf(kLocal, ordering, toUnsafe, dense = false)
          case DenseRankMode => new RankBuf(kLocal, ordering, toUnsafe, dense = true)
        }

        if (groupedInput) {
          // key-sorted input: one live buffer, O(retained) memory at any
          // key cardinality
          new Iterator[InternalRow] {
            private var curKey: UnsafeRow = null
            private val buf = newBuf()
            private var drain: Iterator[InternalRow] = Iterator.empty
            private def advance(): Unit = {
              while (!drain.hasNext && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row)
                if (curKey == null) curKey = key.copy()
                else if (key != curKey) {
                  // group boundary: emit the finished group, start the next
                  // (drain() resets the buffer, so this can never re-emit)
                  drain = buf.drain()
                  curKey = key.copy()
                }
                buf.push(row)
              }
              // input exhausted and nothing buffered → flush the last group
              if (!drain.hasNext && !iter.hasNext && !buf.isEmpty) drain = buf.drain()
            }
            override def hasNext: Boolean = { advance(); drain.hasNext }
            override def next(): InternalRow = { numOutputRows += 1; drain.next() }
          }
        } else {
          // hash buffers; the partial phase flushes downstream on overflow
          // so memory stays bounded at ANY key cardinality (the final
          // phase re-reduces whatever reaches it)
          new Iterator[InternalRow] {
            import scala.jdk.CollectionConverters._
            private val bufs = new java.util.HashMap[UnsafeRow, TopKBuf]()
            private var drain: Iterator[InternalRow] = Iterator.empty
            private def drainAll(): Iterator[InternalRow] = {
              val all = bufs.values().asScala.toArray
              bufs.clear()
              all.iterator.flatMap(_.drain())
            }
            private def advance(): Unit = {
              while (!drain.hasNext && iter.hasNext) {
                val row = iter.next()
                val key = keyProj(row) // reused buffer — copy only on first sight
                var buf = bufs.get(key)
                if (buf == null) {
                  if (bufs.size >= flushAt) {
                    // overflow: emit every live buffer downstream and start
                    // a fresh epoch — the final phase re-reduces per key,
                    // so a key spanning epochs is still exact
                    numFlushes += 1
                    drain = drainAll()
                  }
                  buf = newBuf()
                  bufs.put(key.copy(), buf)
                }
                buf.push(row)
              }
              // input exhausted → flush whatever remains (map is cleared,
              // so this can never re-emit)
              if (!drain.hasNext && !iter.hasNext && !bufs.isEmpty) drain = drainAll()
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
      case TopKPerKeyNode(keys, order, k, sortedFinal, child, mode) =>
        val maxKeys = org.apache.spark.sql.internal.SQLConf.get
          .getConfString(MaxKeysConfKey, DefaultMaxKeysInMemory.toString)
          .toInt
        val part =
          TopKPerKeyExec(keys, order, k, planLater(child), partial = true, maxKeysInMemory = maxKeys, mode = mode)
        TopKPerKeyExec(keys, order, k, part, partial = false, sortedFinal = sortedFinal, maxKeysInMemory = maxKeys, mode = mode) :: Nil
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
    * — and its RANK()/DENSE_RANK() siblings — by planting
    * [[TopKPerKeyNode]] UNDER the Window (mode matching the function),
    * so the prune runs first and the window function only renumbers the
    * survivors per key (the final TopK phase leaves rows clustered by
    * key, so the renumbering window reuses that exchange). The prune
    * retains EXACTLY the `fn ≤ k` set, and that set is downward-closed
    * in the order — every row ordered before a kept row is kept — so
    * the window recomputes identical fn values on the survivors. The
    * bound conjuncts that the prune makes vacuous are dropped from the
    * filter — which also keeps Spark's own InferWindowGroupLimit from
    * matching the already-rewritten shape — and if the fn column is
    * unreferenced above, later column pruning removes the window
    * entirely.
    *
    * Only the exact shape rewrites: a single row_number/rank/dense_rank
    * window expression, non-empty PARTITION BY (a global top-k has no
    * key to cluster), an integer-literal upper bound ≥ 1 and ≤
    * [[SqlRewriteMaxKKey]]. row_number ties under a non-total ORDER BY
    * are nondeterministic in both formulations; rank/dense_rank keep
    * all ties, so those rewrites are deterministic even without one.
    */
  object RowNumberLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

    /** The top-k mode computing `fn ≤ k` for this window function. */
    private def modeOf(fn: Expression): Option[TopKMode] = fn match {
      case RowNumber() => Some(RowNumberMode)
      case _: Rank => Some(RankMode)
      case _: DenseRank => Some(DenseRankMode)
      case _ => None
    }

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
          case alias @ Alias(WindowExpression(fn, _), _) if modeOf(fn).isDefined =>
            val mode = modeOf(fn).get
            val rnId = alias.exprId
            val conjuncts = splitConjunctivePredicates(cond)
            val bounds = conjuncts.flatMap(bound(_, rnId))
            val maxK = conf.getConfString(SqlRewriteMaxKKey, DefaultSqlRewriteMaxK.toString).toInt
            if (bounds.nonEmpty && bounds.min >= 1 && bounds.min <= maxK) {
              val k = bounds.min
              // when injected through experimental.extraOptimizations the
              // rule runs AFTER Spark's InferWindowGroupLimit; the TopK
              // prune is at least as tight as the group limit it derived
              // from the same filter (same fn, same k), so drop the
              // now-redundant sort-based pruner instead of stacking on it
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
              val pruned =
                w.copy(child = TopKPerKeyNode(w.partitionSpec, w.orderSpec, k, sortedFinal = true, base, mode))
              conjuncts.filterNot(implied(_, rnId, k)).reduceOption(And) match {
                case Some(residual) => Filter(residual, pruned)
                case None => pruned
              }
            } else f
          case _ => f
        }
    }
  }

  /** Public entry point. `orderBy` is (column, ascending) pairs; in
    * [[RowNumberMode]] it must form a total order (append a unique id
    * column) for deterministic results, while [[RankMode]] /
    * [[DenseRankMode]] keep ALL order-ties and are deterministic
    * without one. Injects the strategy into the session on first use.
    * Column names resolve with the session's resolver (case-insensitive
    * by default) and REJECT ambiguous matches — self-join outputs with
    * duplicate names must be disambiguated by the caller first.
    *
    * @param sortedFinal pass true when the key cardinality per reduce
    *   partition may exceed [[DefaultMaxKeysInMemory]] (e.g. per-user
    *   top-k over billions of users): the final phase then runs over a
    *   spillable key-sort in O(k) memory instead of in-memory hash heaps.
    * @param mode retention semantics — see [[TopKMode]].
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int,
      sortedFinal: Boolean = false,
      mode: TopKMode = RowNumberMode
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
    shims.dataFrameOf(spark, TopKPerKeyNode(keys, order, k, sortedFinal, child, mode))
  }
}
