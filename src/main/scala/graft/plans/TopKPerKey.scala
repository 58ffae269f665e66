package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.shims

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
  * key, then the same heap merge on the reduce side. The plan shape is
  * partial → Exchange → final, exactly like a partial aggregate
  * (EnsureRequirements inserts the Exchange from the final node's
  * required ClusteredDistribution).
  */
object TopKPerKey {

  /** Logical node: top `k` rows per `keys` group under `order`. */
  case class TopKPerKeyNode(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: LogicalPlan
  ) extends UnaryNode {
    override def output: Seq[Attribute] = child.output
    override def maxRows: Option[Long] = child.maxRows
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
      copy(child = newChild)
  }

  /** Physical node; `partial = true` runs on raw input partitions (map
    * side), `partial = false` requires the key clustering and produces
    * the exact answer.
    */
  case class TopKPerKeyExec(
      keys: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: SparkPlan,
      partial: Boolean
  ) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(keys) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val kLocal = k
      val keyExprs = keys
      val sortOrder = order
      val childOutput = child.output
      child.execute().mapPartitions { iter =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // total order (callers append a unique tiebreak), codegen'd lazily
        val ordering = new LazilyGeneratedOrdering(sortOrder, childOutput)
        // heap root = WORST kept row (reverse ordering) → O(log k) replace
        val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        while (iter.hasNext) {
          val row = iter.next()
          val key = keyProj(row) // reused buffer — copy only on first sight
          var heap = heaps.get(key)
          if (heap == null) {
            heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ordering.reverse)
            heaps.put(key.copy(), heap)
          }
          if (heap.size < kLocal) heap.add(row.copy())
          else if (ordering.compare(row, heap.peek()) < 0) {
            heap.poll()
            heap.add(row.copy()): Unit
          }
        }
        import scala.jdk.CollectionConverters._
        heaps.values.iterator.asScala.flatMap(_.iterator().asScala)
      }
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
      copy(child = newChild)
  }

  /** Strategy: logical node → partial + final pair; EnsureRequirements
    * adds the key Exchange between them.
    */
  object TopKPerKeyStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerKeyNode(keys, order, k, child) =>
        val part = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
        TopKPerKeyExec(keys, order, k, part, partial = false) :: Nil
      case _ => Nil
    }
  }

  /** Public entry point. `orderBy` is (column, ascending) pairs and must
    * form a total order (append a unique id column) for deterministic
    * results. Injects the strategy into the session on first use.
    */
  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderBy: Seq[(String, Boolean)],
      k: Int
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark: SparkSession = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(s"no column '$name' in ${child.output.map(_.name)}"))
    val keys = keyCols.map(attr(_).asInstanceOf[Expression])
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    shims.dataFrameOf(spark, TopKPerKeyNode(keys, order, k, child))
  }
}
