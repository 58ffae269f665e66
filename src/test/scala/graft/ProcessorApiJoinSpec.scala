package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.ProcessorApiJoin
import graft.streaming.StreamingOps.Event

/** Replays the reference producer's exact scenario
  * (ClickstreamJoinExample.clickstream:115-161) through the
  * Processor-API analogue: impressions right after a page view, an
  * at-least-once duplicate, a click within the window, an out-of-order
  * event before its page view, and a purchase after the window closed.
  */
class ProcessorApiJoinSpec extends SparkSpec {

  private def ts(sec: Long): Timestamp = new Timestamp(sec * 1000L)

  test("reference clickstream scenario: join, dedup, out-of-order, late") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[Event]
    val q = ProcessorApiJoin(input.toDS(), joinWindowSec = 15, dedupWindowSec = 5)
      .writeStream
      .format("memory")
      .queryName("papi_out")
      .outputMode("append")
      .start()

    input.addData(
      // main page view (sendPv pv1)
      Event(100, ts(100), 1, "view", 0),
      // impressions collected almost immediately (ev0, ev1, ev2)
      Event(101, ts(101), 1, "click", 0),
      Event(102, ts(101), 1, "click", 0),
      Event(103, ts(102), 1, "click", 0),
      // duplicated event, welcome to distributed world (ev1 again)
      Event(102, ts(103), 1, "click", 0),
      // client clicks on the offer within the join window
      Event(104, ts(110), 1, "click", 0),
      // out-of-order: event arrives before its page view
      Event(105, ts(119), 1, "click", 0),
      // offer page view
      Event(200, ts(120), 1, "view", 0),
      // impression on the new page joins the NEW view
      Event(106, ts(121), 1, "click", 0),
      // purchase after a coffee break longer than the join window
      Event(107, ts(140), 1, "click", 0)
    )
    q.processAllAvailable()

    val rows = spark
      .table("papi_out")
      .as[ProcessorApiJoin.EnrichedClick]
      .collect()
      .map(r => r.click_id -> r.view_id)
      .toMap
    q.stop()

    assert(rows(101L).contains(100L)) // impression joins pv1
    assert(rows(103L).contains(100L))
    assert(rows.count(_._1 == 102L) == 1) // duplicate dropped: emitted once
    assert(rows(104L).contains(100L)) // click 10s later still in window
    assert(rows(105L).isEmpty) // out-of-order: view not stored yet → None
    assert(rows(106L).contains(200L)) // joins the newest view
    assert(rows(107L).isEmpty) // 20s after pv2: window (15s) closed → None
    assert(rows.size == 7)
  }
}
