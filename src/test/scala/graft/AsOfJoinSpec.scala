package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

object AsOfJoinSpec {
  case class Trade(sym: String, t: Timestamp, qty: Long)
  case class Quote(sym: String, qt: Timestamp, px: Double)
}

/** Exercises the generic as-of join against a brute-force reference:
  * for each trade, the latest quote at-or-before its time within the
  * tolerance, per symbol.
  */
class AsOfJoinSpec extends SparkSpec {
  import AsOfJoinSpec._

  private def ts(ms: Long): Timestamp = new Timestamp(ms)

  test("asOf picks the latest right row at-or-before, respects tolerance and keys") {
    import spark.implicits._
    val trades = Seq(
      Trade("a", ts(1000), 1),
      Trade("a", ts(2500), 2), // between quotes
      Trade("a", ts(9000), 3), // beyond tolerance of last quote
      Trade("b", ts(2000), 4), // other key
      Trade("c", ts(1000), 5)  // no quotes at all
    ).toDF()
    val quotes = Seq(
      Quote("a", ts(1000), 10.0), // exactly at trade time → visible
      Quote("a", ts(2000), 20.0),
      Quote("a", ts(3000), 30.0),
      Quote("b", ts(1500), 40.0)
    ).toDF()

    val out = AsOfJoin
      .asOf(trades, quotes, keyCols = Seq("sym"), leftTime = "t", rightTime = "qt", toleranceMs = 5000)
      .select(col("sym"), col("qty"), col("right_px"), col("right_qt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (Option(r.get(2)), Option(r.get(3))))
      .toMap

    assert(out(("a", 1L))._1.contains(10.0)) // same-timestamp quote visible
    assert(out(("a", 2L))._1.contains(20.0)) // latest at-or-before 2500
    assert(out(("a", 3L))._1.isEmpty) // 9000 - 3000 > 5000ms tolerance
    assert(out(("a", 3L))._2.isEmpty)
    assert(out(("b", 4L))._1.contains(40.0)) // keys don't cross
    assert(out(("c", 5L))._1.isEmpty) // no right rows for key
    assert(out.size == 5) // every left row survives
  }

  test("asOf carries the matched row WHOLESALE — a null field never stitches in an older row's value") {
    import spark.implicits._
    val trades = Seq(Trade("a", ts(2100), 1)).toDF()
    val quotes = Seq(
      Quote("a", ts(1000), 5.0),
      Quote("a", ts(2000), Double.NaN) // stand-in for a null field below
    ).toDF()
      .withColumn("px", when(col("qt") === ts(2000), lit(null)).otherwise(col("px")))

    // tolerance 500ms: the matched quote is qt=2000 (px=null); the
    // qt=1000 quote is OUTSIDE tolerance — its px must NOT leak in
    val out = AsOfJoin
      .asOf(trades, quotes, Seq("sym"), "t", "qt", toleranceMs = 500)
      .select(col("right_qt"), col("right_px"))
      .collect()
      .head
    assert(out.getTimestamp(0) == ts(2000), "must match the latest in-tolerance row")
    assert(out.isNullAt(1), s"null px of the matched row must stay null, got ${out.get(1)}")
  }

  test("asOf equals the brute-force range-join formulation on the events table") {
    val ev = graft.sources.Tables.events(spark, sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"), col("event_id").as("view_id"))

    val tolMs = 600000L // 10 min
    val fast = AsOfJoin
      .asOf(clicks, views, Seq("user_id"), "ts", "vts", tolMs)
      .select(col("event_id"), col("right_view_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap

    // brute force: range join + latest-per-click reduction
    val brute = clicks
      .join(views, Seq("user_id"))
      .filter(col("vts") <= col("ts") && unix_micros(col("ts")) - unix_micros(col("vts")) <= tolMs * 1000)
      .groupBy(col("event_id"))
      .agg(max(struct(col("vts"), col("view_id"))).as("best"))
      .select(col("event_id"), col("best.view_id"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)))
      .toMap

    clicks.select("event_id").collect().map(_.getLong(0)).foreach { id =>
      assert(fast(id) == brute.getOrElse(id, None), s"click $id")
    }
  }

  test("asOf validates inputs up front with clear messages") {
    val sparkS = spark
    import sparkS.implicits._
    val l = Seq((1L, 100L, "a")).toDF("k", "t_long", "payload")
    val r = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1.0)).toDF("k", "rt", "x")

    // non-timestamp time column → immediate, named failure (not a
    // confusing unix_micros analysis error)
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "t_long", "rt", 1000L)
    }
    assert(e1.getMessage.contains("t_long") && e1.getMessage.contains("TIMESTAMP"))

    // missing time column named explicitly
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, Seq("k"), "nope", "rt", 1000L)
    }
    assert(e2.getMessage.contains("nope"))

    // reserved internal names rejected
    val lt = l.select(col("k"), col("t_long").cast("timestamp").as("t"), col("payload").as("_side"))
    val e3 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(lt, r, Seq("k"), "t", "rt", 1000L)
    }
    assert(e3.getMessage.contains("_side"))

    // left column shadowing a right_<col> output rejected
    val lshadow = l.select(col("k"), col("t_long").cast("timestamp").as("t"), col("payload").as("right_x"))
    val e4 = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(lshadow, r, Seq("k"), "t", "rt", 1000L)
    }
    assert(e4.getMessage.contains("right_x"))
  }
}
