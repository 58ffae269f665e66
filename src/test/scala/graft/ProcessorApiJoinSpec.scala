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

  // --- state retention: the property that keeps per-key state bounded at
  // any input volume (reference bounds its stores the same way via
  // persistentWindowStore retention, ClickstreamJoinExample.scala:272-301)

  private val joinMs = 15000L
  private val dedupMs = 5000L

  test("retention: views and seenClicks below the horizon are pruned after each batch") {
    val batch1 = Seq(
      Event(1, ts(100), 1, "view", 0),
      Event(2, ts(101), 1, "click", 0),
      Event(3, ts(105), 1, "view", 0)
    )
    val (st1, _) = ProcessorApiJoin.advance(1L, ProcessorApiJoin.JoinState(Nil, Map.empty, 0L), batch1, joinMs, dedupMs)
    assert(st1.views.map(_._1).toSet == Set(1L, 3L)) // both inside the 15s horizon
    assert(st1.seenClicks.keySet == Set(2L))

    // a much later batch advances maxTs far past every stored entry
    val batch2 = Seq(Event(10, ts(200), 1, "view", 0), Event(11, ts(201), 1, "click", 0))
    val (st2, _) = ProcessorApiJoin.advance(1L, st1, batch2, joinMs, dedupMs)
    assert(st2.maxTs == 201000L)
    val horizon = st2.maxTs - math.max(joinMs, dedupMs)
    assert(st2.views.forall(_._2 >= horizon), s"stale view survived: ${st2.views}")
    assert(st2.seenClicks.values.forall(_ >= horizon), s"stale click survived: ${st2.seenClicks}")
    // state SHRANK: the old view/click are gone, only the new entries remain
    assert(st2.views.map(_._1) == List(10L))
    assert(st2.seenClicks.keySet == Set(11L))
  }

  test("retention honors the watermark: a redelivered click above the watermark is still deduped") {
    // batch 1: click A at t=100s
    val (st1, out1) =
      ProcessorApiJoin.advance(1L, ProcessorApiJoin.JoinState(Nil, Map.empty, 0L),
        Seq(Event(1, ts(100), 1, "click", 0)), joinMs, dedupMs, watermarkMs = 0L)
    assert(out1.size == 1)
    // batch 2: a later view advances per-key maxTs to 120s, but the
    // WATERMARK lags at 95s — maxTs-based pruning would drop A's dedup
    // entry (horizon 105s); watermark-based pruning retains it (80s)
    val (st2, _) =
      ProcessorApiJoin.advance(1L, st1, Seq(Event(2, ts(120), 1, "view", 0)), joinMs, dedupMs,
        watermarkMs = 95000L)
    assert(st2.seenClicks.contains(1L), "dedup entry above the watermark horizon must survive")
    // batch 3: at-least-once redelivery of click A (t=100s >= watermark) — must NOT re-emit
    val (_, out3) =
      ProcessorApiJoin.advance(1L, st2, Seq(Event(1, ts(100), 1, "click", 0)), joinMs, dedupMs,
        watermarkMs = 95000L)
    assert(out3.isEmpty, s"redelivered click re-emitted: $out3")
  }

  test("retention: state size stays bounded under a long stream of batches") {
    var st = ProcessorApiJoin.JoinState(Nil, Map.empty, 0L)
    var maxViews = 0
    var maxClicks = 0
    // 200 batches, 1 view + 1 click per second — unbounded state would grow to 200+
    (0 until 200).foreach { i =>
      val t = 1000L + i * 10
      val batch = (0 until 10).flatMap { j =>
        Seq(
          Event(i * 100 + j * 2, ts(t + j), 1, "view", 0),
          Event(i * 100 + j * 2 + 1, ts(t + j), 1, "click", 0)
        )
      }
      st = ProcessorApiJoin.advance(1L, st, batch, joinMs, dedupMs)._1
      maxViews = math.max(maxViews, st.views.size)
      maxClicks = math.max(maxClicks, st.seenClicks.size)
    }
    // horizon is 15s and density is 1 view/sec → ≤ ~16 retained + in-batch 10
    assert(maxViews <= 30, s"views grew to $maxViews — retention not bounding state")
    assert(maxClicks <= 30, s"seenClicks grew to $maxClicks — retention not bounding state")
  }
}
