package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join — for each left row, the latest right row (by
  * event time) at-or-before the left row's time, within a tolerance,
  * matched on equi keys. The operator family Spark lacks natively: the
  * naive formulation is a range join (planned as a sort-merge with an
  * inequality residual at best, a nested loop at worst) followed by a
  * per-left-row "latest" reduction.
  *
  * Implementation is the distributed as-of idiom (a11 is its
  * specialized form): UNION both sides tagged, one shuffle on the key,
  * and a running `last(..., ignoreNulls)` window in (time, side) order
  * — right rows sort before left rows at equal timestamps, so a right
  * row is visible to a left row with the same time. One shuffle total,
  * partition count scales with key cardinality, no range predicate in
  * any join, no low-cardinality window.
  *
  * Contract: right rows must be unique per (keys, rightTime) — the
  * standard as-of precondition (otherwise "the" row at a timestamp is
  * ambiguous). Output = every left row + `right_<col>` payload columns
  * (null when no right row is within `toleranceMs`).
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      toleranceMs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "asOf requires at least one key column")
    val leftPayload = left.columns.toSeq.filterNot(c => keyCols.contains(c))
    val rightPayload = right.columns.toSeq.filterNot(c => keyCols.contains(c) || c == rightTime)

    // common shape: keys, _t, _side (right=0 so it sorts first at equal
    // times), left payload (null on right rows), right payload (null on
    // left rows)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("_t"), lit(1).as("_side")) ++
        leftPayload.map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"right_$c")) ++
        Seq(lit(null).cast(right.schema(rightTime).dataType).as("_rt")): _*
    )
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("_t"), lit(0).as("_side")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"right_$c")) ++
        Seq(col(rightTime).as("_rt")): _*
    )

    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedT = last(when(col("_side") === 0, col("_rt")), ignoreNulls = true).over(w)
    val carried = rightPayload.map { c =>
      last(when(col("_side") === 0, col(s"right_$c")), ignoreNulls = true).over(w).as(s"right_$c")
    }

    // microsecond-precision tolerance (a timestamp→long cast truncates
    // to seconds and would mis-round sub-second tolerances)
    val inTolerance =
      col("_matched_t").isNotNull &&
        unix_micros(col("_t")) - unix_micros(col("_matched_t")) <= toleranceMs * 1000L

    l.unionByName(r)
      .select(
        (keyCols.map(col) :+ col("_t") :+ col("_side")) ++ leftPayload.map(col) ++
          carried :+ matchedT.as("_matched_t"): _*
      )
      .filter(col("_side") === 1)
      .select(
        keyCols.map(col) ++
          Seq(col("_t").as(leftTime)) ++
          leftPayload.map(col) ++
          rightPayload.map(c => when(inTolerance, col(s"right_$c")).as(s"right_$c")) :+
          when(inTolerance, col("_matched_t")).as(s"right_$rightTime"): _*
      )
  }
}
