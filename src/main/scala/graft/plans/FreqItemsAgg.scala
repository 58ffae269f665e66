package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.shims
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst aggregate: Misra-Gries frequent-item candidates in
  * bounded memory.
  *
  * The classic heavy-hitters problem at 100 TB: find every token whose
  * frequency exceeds a share threshold without shuffling the unbounded
  * long-tail vocabulary. A plain `groupBy(token).count()` is map-side
  * combinable but still shuffles one partial per distinct token per
  * task; this summary carries at most `capacity` counters per partial,
  * merges them with the Mergeable Summaries rule (Agarwal, Cormode,
  * Huang, Phillips, Wei, Yi — PODS'12), and guarantees that every item
  * with true count > N/(capacity+1) survives to the output. Counts in
  * the summary are UNDERestimates (within N/(capacity+1)); callers that
  * need exact counts re-count the ≤ capacity candidates in a second
  * pass (see TextAnalysis.c41HeavyHitters), which restores exactness
  * whenever the query threshold exceeds the guarantee bound.
  *
  * Update is the textbook MG step (new item on a full table decrements
  * every counter — amortized O(1) per row since each decrement epoch
  * retires capacity+1 units of count); merge is pointwise sum followed
  * by subtracting the (capacity+1)-th largest count, which preserves
  * the error bound over the combined stream. Null items are ignored.
  * The final value is the lexicographically sorted candidate array.
  */
case class FreqItemsAgg(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, "freq_item_candidates capacity must be positive")

  override def children: Seq[Expression] = Seq(item)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "freq_item_candidates"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow
  ): mutable.HashMap[UTF8String, Long] = {
    val v = item.eval(input)
    if (v != null) {
      // eval may return a pointer into a reused row buffer — clone on
      // first store (MisraGries applies copyKey only then)
      graft.functions.MisraGries
        .updateOne(buf, v.asInstanceOf[UTF8String], capacity)(_.clone())
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]
  ): mutable.HashMap[UTF8String, Long] = {
    graft.functions.MisraGries.mergeInto(a, b, capacity)
    a
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val keys = buf.keysIterator.toArray
    java.util.Arrays.sort(keys, (x: UTF8String, y: UTF8String) => x.compareTo(y))
    new GenericArrayData(keys.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var size = 4
    buf.foreach { case (k, _) => size += 4 + k.numBytes() + 8 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.put(UTF8String.fromBytes(arr), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqItemsAgg =
    copy(item = newChildren(0))
}

object FreqItemsAgg {

  /** Column-level entry point: candidate heavy hitters of a string
    * column, at most `capacity` of them, superset-guaranteed above
    * share 1/(capacity+1).
    */
  def freqItemCandidates(item: Column, capacity: Int): Column =
    shims.columnOf(
      FreqItemsAgg(shims.expressionOf(item), capacity).toAggregateExpression()
    )
}
