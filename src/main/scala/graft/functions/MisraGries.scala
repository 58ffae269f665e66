package graft.functions

import scala.collection.mutable

/** The Misra-Gries frequent-items summary — the algorithm shared by
  * the batch Catalyst aggregate ([[graft.plans.FreqItemsAgg]]) and the
  * streaming state fold (`StreamingOps.streamingHeavyHitters`).
  *
  * Invariant: the table never holds more than `capacity` counters, and
  * after processing N items (in any combination of [[updateOne]] steps
  * and [[mergeInto]] merges — the merge rule is from Mergeable
  * Summaries, Agarwal et al., PODS'12), every item with true count
  * > N/(capacity+1) is present, with its counter underestimating the
  * true count by at most N/(capacity+1).
  */
object MisraGries {

  /** One MG update step: count `key`, running a decrement epoch when
    * the table is full (the arriving item's unit cancels against one
    * unit of every resident counter — amortized O(1) per item).
    * `copyKey` defends against callers whose key objects alias reused
    * buffers (Catalyst's UTF8String): it is applied only when the key
    * is first stored.
    */
  def updateOne[K](buf: mutable.HashMap[K, Long], key: K, capacity: Int)(copyKey: K => K): Unit =
    buf.get(key) match {
      case Some(c) => buf.update(key, c + 1L) // existing stored key kept
      case None if buf.size < capacity => buf.put(copyKey(key), 1L): Unit
      case None =>
        buf.mapValuesInPlace((_, c) => c - 1L)
        buf.filterInPlace((_, c) => c > 0L): Unit
    }

  /** Mergeable-Summaries merge: pointwise sum, then subtract the
    * (capacity+1)-th largest count from every counter and drop the
    * non-positive — the error bound adds across the merged streams.
    */
  def mergeInto[K](a: mutable.HashMap[K, Long], b: IterableOnce[(K, Long)], capacity: Int): Unit = {
    b.iterator.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val m = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      a.mapValuesInPlace((_, c) => c - m)
      a.filterInPlace((_, c) => c > 0L): Unit
    }
  }
}
