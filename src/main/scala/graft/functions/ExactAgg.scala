package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum

/** Shared exact-aggregation idioms. */
object ExactAgg {

  /** Exact, order-independent sum of a 2-decimal-valued double column:
    * cast each value to DECIMAL(18,2) (recovers the exact value), sum in
    * decimal (exact, associative), cast the result back to double for a
    * stable output schema. This is load-bearing for cross-engine
    * reproducibility — every money/value sum in the engine goes through
    * here so the precision contract lives in one place.
    */
  def moneySum(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double")
}
