package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StreamingOps.Event

/** The Processor-API topology of the reference, re-expressed as one
  * keyed stateful operator.
  *
  * Reference: ClickstreamJoinExample.scala —
  * `PvWindowProcessor` (:303-312) stores page views in a windowed
  * store; `EvJoinProcessor` (:314-365) drops duplicate events within a
  * dedup window, looks up the stored views in the join window, and
  * emits the enriched event (None fields when no view matched).
  *
  * Here the two RocksDB window stores become one typed state value per
  * user key inside `flatMapGroupsWithState`; retention is explicit
  * pruning below the watermark-derived horizon (see [[advance]]).
  * Views are 'view' events,
  * clicks are 'click' events; at-least-once duplicates are detected by
  * event_id within the dedup window, like the reference's EvPvKey
  * store.
  *
  * Scale: state is partitioned by user_id across executors and bounded
  * by the two windows — identical behavior to the Streams topology's
  * partition-per-task model, with Spark checkpointing underneath.
  */
object ProcessorApiJoin {

  case class EnrichedClick(
      click_id: Long,
      user_id: Long,
      click_ts: Timestamp,
      view_id: Option[Long],
      view_ts: Option[Timestamp]
  )

  /** views: (event_id, ts-millis); seenClicks: click event_id → ts-millis. */
  case class JoinState(views: List[(Long, Long)], seenClicks: Map[Long, Long], maxTs: Long)

  /** One micro-batch of the per-key state machine, as a pure function:
    * restore event-time order, store views, dedup + join clicks, then
    * prune both stores below the retention horizon — the property that
    * keeps state bounded at any input volume, asserted directly by
    * ProcessorApiJoinSpec's retention tests.
    *
    * The horizon is `watermarkMs − max(joinMs, dedupMs)` when a
    * watermark is known (every future admitted event has ts ≥ watermark,
    * so its dedup/join lookback can never reach below that), falling
    * back to per-key maxTs when it is not (`watermarkMs = 0`). Pruning
    * on per-key maxTs ALONE would be wrong under at-least-once
    * delivery: a redelivered click above the watermark but below the
    * key's max event time would find its dedup entry already pruned and
    * be emitted twice.
    */
  def advance(
      user: Long,
      st0: JoinState,
      batch: Seq[Event],
      joinMs: Long,
      dedupMs: Long,
      watermarkMs: Long = 0L
  ): (JoinState, Seq[EnrichedClick]) = {
    var st = st0
    val out = Seq.newBuilder[EnrichedClick]
    // per-key arrival order (Kafka guarantees it per partition;
    // micro-batches deliver unordered, so restore event-time order)
    batch.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
      val t = e.ts.getTime
      st = st.copy(maxTs = math.max(st.maxTs, t))
      e.event_type match {
        case "view" =>
          // PvWindowProcessor.process: pvStore.put(key, pv)
          st = st.copy(views = (e.event_id, t) :: st.views)
        case "click" =>
          // EvJoinProcessor.isNotDuplicate: evPvStore.fetch(key, t-w, t)
          val isDup = st.seenClicks.get(e.event_id).exists(prev => t - prev <= dedupMs)
          if (!isDup) {
            // EvJoinProcessor.storedPvs(...).find: view within [t-w, t]
            val matched = st.views
              .filter { case (_, vt) => vt <= t && vt >= t - joinMs }
              .sortBy { case (id, vt) => (-vt, -id) }
              .headOption
            out += EnrichedClick(
              e.event_id,
              user,
              e.ts,
              matched.map(_._1),
              matched.map(m => new Timestamp(m._2))
            )
            st = st.copy(seenClicks = st.seenClicks + (e.event_id -> t))
          }
        case _ => // other event types pass through the topology unused
      }
    }
    // retention: prune both stores below the window horizons
    val timeBase = if (watermarkMs > 0) watermarkMs else st.maxTs
    val horizon = timeBase - math.max(joinMs, dedupMs)
    st = st.copy(
      views = st.views.filter(_._2 >= horizon),
      seenClicks = st.seenClicks.filter(_._2 >= horizon)
    )
    (st, out.result())
  }

  def apply(
      events: Dataset[Event],
      joinWindowSec: Long = 15,
      dedupWindowSec: Long = 5,
      watermarkDelay: String = "10 minutes"
  ): Dataset[EnrichedClick] = {
    import events.sparkSession.implicits._
    val joinMs = joinWindowSec * 1000
    val dedupMs = dedupWindowSec * 1000

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[JoinState, EnrichedClick](
        OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout
      ) { (user: Long, rows: Iterator[Event], state: GroupState[JoinState]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val st0 = state.getOption.getOrElse(JoinState(Nil, Map.empty, 0L))
          val (st, out) =
            advance(user, st0, rows.toSeq, joinMs, dedupMs, state.getCurrentWatermarkMs())
          state.update(st)
          state.setTimeoutTimestamp(st.maxTs + 2 * math.max(joinMs, dedupMs))
          out.iterator
        }
      }
  }
}
