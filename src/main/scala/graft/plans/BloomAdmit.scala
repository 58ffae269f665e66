package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.shims
import org.apache.spark.util.sketch.BloomFilter

/** Column surface over Spark's native runtime-filter Bloom machinery
  * (`BloomFilterAggregate` builds the filter distributedly with OR-merged
  * partials; `BloomFilterMightContain` is a codegen'd probe that requires
  * a CONSTANT filter — the same literal/scalar-subquery shape Spark's own
  * `InjectRuntimeFilter` produces, where the driver materializes the
  * bounded filter binary and ships it broadcast-style into every probe
  * task).
  *
  * Both expressions speak longs: callers hash their join key through
  * `xxhash64` on BOTH the build and probe side. Bit-vector merges are
  * bitwise OR — commutative and associative — so the serialized filter is
  * deterministic regardless of partial-merge order, and a `might_contain`
  * verdict never varies across runs. False positives only ever enlarge
  * the candidate set a caller must exact-verify; false negatives do not
  * exist, which is what makes a Bloom a sound join PRUNER.
  */
object BloomAdmit {

  /** Aggregate column: serialized Bloom filter over a LONG key column,
    * sized for `expectedItems` at false-positive rate `fpp`.
    */
  def bloomAgg(longKey: Column, expectedItems: Long, fpp: Double): Column = {
    val n = math.max(expectedItems, 1L)
    val numBits = BloomFilter.optimalNumOfBits(n, fpp)
    shims.columnOf(
      BloomFilterAggregate(
        shims.expressionOf(longKey),
        Literal(n),
        Literal(numBits),
        0,
        0
      ).toAggregateExpression()
    )
  }

  /** Probe predicate: true iff `longKey` MAY be in the filter
    * (false ⇒ definitely absent).
    */
  def mightContain(bloomBytes: Array[Byte], longKey: Column): Column =
    shims.columnOf(BloomFilterMightContain(Literal(bloomBytes), shims.expressionOf(longKey)))
}
