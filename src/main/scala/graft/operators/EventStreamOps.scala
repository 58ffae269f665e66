package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Batch re-expressions of the reference's stream semantics
  * (SURVEY.md §2 A-series), so the DuckDB oracle can verify the exact
  * window/join/dedup behavior that the streaming module
  * ([[graft.streaming]]) applies incrementally.
  *
  * Reference: /root/reference/src/main/scala/example —
  * DeduplicationExample.scala (windowed first-wins dedup),
  * ClickstreamJoinExample.scala (windowed left join, selectKey
  * repartitioning, windowed reduce).
  *
  * Design notes for 100 TB: every operator is a single hash shuffle on
  * its key; "first/last per group" is expressed as `min/max(struct(...))`
  * rather than `row_number`, because struct-min folds map-side (partial
  * aggregation) instead of requiring a full sort of each partition.
  */
object EventStreamOps {

  /** Tumbling-window start: floor(epoch_seconds / width) * width, the
    * same alignment Spark's `window()` uses, spelled explicitly so the
    * oracle SQL can reproduce it bit-for-bit.
    */
  private def windowStart(ts: Column, widthSec: Int): Column =
    timestamp_seconds(floor(unix_timestamp(ts) / widthSec) * widthSec)

  private def sumValue: Column = graft.functions.ExactAgg.moneySum(col("value"))

  /** A1: windowed first-wins dedup — DeduplicationExample.scala:126-142.
    * Keep the earliest event per (user_id, event_type) in each 15-min
    * tumbling window; `min(struct(ts, event_id, value))` is the
    * map-side-combinable form of the reference's WindowStore guard.
    */
  def a1DedupWindowed(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .events(spark, sfDir)
      .withColumn("window_start", windowStart(col("ts"), 900))
      .groupBy(col("user_id"), col("event_type"), col("window_start"))
      .agg(min(struct(col("ts"), col("event_id"))).as("first"))
      .select(
        col("user_id"),
        col("event_type"),
        col("window_start"),
        col("first.event_id").as("kept_event_id"),
        col("first.ts").as("kept_ts")
      )

  /** A2: windowed left join — ClickstreamJoinExample.scala:222-234 and
    * the Processor-API variant at :333-352. Each 'click' is enriched
    * with the latest 'view' by the same user within the preceding
    * 10 minutes; clicks with no view in the window keep null view
    * columns (the reference's `EvPv(ev, None, None)` branch).
    * Scale: both sides shuffle once on user_id; the range predicate is
    * evaluated inside the sort-merge join, and the best-match reduction
    * is a struct-max partial agg, not a per-click sort.
    */
  def a2ClickstreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val views = ev
      .filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"), col("ts").as("v_ts"))

    val best = clicks
      .join(
        views,
        col("user_id") === col("v_user") &&
          col("v_ts") <= col("click_ts") &&
          col("v_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES")
      )
      .groupBy(col("click_id"))
      .agg(max(struct(col("v_ts"), col("v_id"))).as("best"))
      .select(
        col("click_id").as("m_click_id"),
        col("best.v_id").as("view_id"),
        col("best.v_ts").as("view_ts")
      )

    clicks
      .join(best, col("click_id") === col("m_click_id"), "left")
      .select(col("click_id"), col("user_id"), col("click_ts"), col("view_id"), col("view_ts"))
  }

  /** A14: full OUTER windowed join — the third member of the Kafka
    * Streams join DSL family (join / leftJoin / outerJoin; the
    * reference demonstrates leftJoin, ClickstreamJoinExample.scala:234).
    * Every in-window (click, view) pair is emitted, plus unmatched rows
    * of BOTH sides with a null opposite side — outerJoin's contract.
    *
    * Spark has no non-equi FULL OUTER strategy short of a nested loop,
    * so the operator decomposes: one LEFT equi-join on user_id with the
    * window as a join-side predicate (covers pairs AND unmatched
    * clicks), then one LEFT ANTI equi-join emitting the views no pair
    * consumed. Three hash-keyed exchanges total, no nested loop at any
    * size — the decomposition IS the full-outer definition, so the
    * DuckDB oracle uses a native FULL JOIN.
    */
  def a14OuterJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val views = ev
      .filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
    val joinCond = col("user_id") === col("v_user") &&
      col("view_ts") <= col("click_ts") &&
      col("view_ts") >= col("click_ts") - expr("INTERVAL 10 MINUTES")
    // pairs + unmatched clicks in ONE keyed join
    val left = clicks
      .join(views, joinCond, "left")
      .select(col("user_id"), col("click_id"), col("click_ts"), col("view_id"), col("view_ts"))
    // a view is unmatched iff NO click satisfies the pair condition —
    // anti-join the SAME keyed condition directly instead of re-joining
    // against the pair output (which would compute the big left join
    // twice and pay a distinct() on matched ids on top)
    val unmatchedViews = views
      .join(clicks, joinCond, "left_anti")
      .select(
        col("v_user").as("user_id"),
        lit(null).cast("long").as("click_id"),
        lit(null).cast("timestamp").as("click_ts"),
        col("view_id"),
        col("view_ts")
      )
    left.unionByName(unmatchedViews)
  }

  /** A11: per-pv-id EQUI-join — the reference's exact join-key
    * structure. ClickstreamJoinExample.scala:208-219, 339-341 re-keys
    * both streams to the composite (clientId, pvId) and joins on that
    * key; a2 approximates it with an interval condition because the
    * test events carry no pv_id. Here the pv_id is derived first —
    * last-view attribution per user via an ignore-nulls running window,
    * what a client-side tracker does when stamping events with the
    * current page-view id — and the Ev↔Pv join is then a pure equi-join
    * on (user_id, pv_id), closing the key-structure gap.
    *
    * Scale: the attribution window partitions by user_id (high
    * cardinality — parallelism grows with users, per-user data is
    * bounded); the join is one hash shuffle per side on the composite
    * key with no range predicate inside the join. Output: per-page-view
    * click rollup (clicks within 6 h of their page view).
    */
  /** a11 attribution window — interpolated into the oracle SQL too. */
  val PvAttributionHours = 6

  def a11PvEquiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables
      .events(spark, sfDir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attributed = ev
      .withColumn("pv_id", last(when(col("event_type") === "view", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("pv_ts", last(when(col("event_type") === "view", col("ts")), ignoreNulls = true).over(w))
    val clicks = attributed
      .filter(
        col("event_type") === "click" && col("pv_id").isNotNull &&
          col("ts") <= col("pv_ts") + expr(s"INTERVAL $PvAttributionHours HOURS")
      )
      .select(col("user_id"), col("pv_id"), col("ts"), col("value"))
    val views = ev
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("pv_id"), col("value").as("pv_value"))
    clicks
      .join(views, Seq("user_id", "pv_id"))
      .groupBy(col("user_id"), col("pv_id"), col("pv_value"))
      .agg(
        count(lit(1)).as("n_clicks"),
        min(col("ts")).as("first_click_ts"),
        max(col("ts")).as("last_click_ts"),
        sumValue.as("sum_click_value")
      )
  }

  /** A3: selectKey + repartition — ClickstreamJoinExample.scala:208-219.
    * Derive a new key from the record and aggregate on it; in Spark the
    * repartition IS the groupBy shuffle, there is no separate re-key
    * materialization (Kafka Streams writes an internal topic here).
    */
  def a3SelectKeyRepartition(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .events(spark, sfDir)
      .select(
        concat(col("event_type"), lit("#"), (col("user_id") % 7).cast("string")).as("part_key"),
        col("value")
      )
      .groupBy(col("part_key"))
      .agg(count(lit(1)).as("n"), sumValue.as("sum_value"))

  /** A4: tumbling-window group-reduce, first-wins —
    * ClickstreamJoinExample.scala:243-257 (`reduce((a, _) => a)`).
    * First event per user per 1-hour window.
    */
  def a4WindowedReduce(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .events(spark, sfDir)
      .withColumn("window_start", windowStart(col("ts"), 3600))
      .groupBy(col("user_id"), col("window_start"))
      .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("first"))
      .select(
        col("user_id"),
        col("window_start"),
        col("first.event_id").as("first_event_id"),
        col("first.event_type").as("first_event_type")
      )

  /** A5: hopping-window aggregation (1 h window, 15 min hop) — the
    * `TimeWindows.of(...).advanceBy(...)` surface. Each event lands in 4
    * windows; the explode is map-side and the aggregate still folds
    * partially before the single shuffle.
    */
  def a5HoppingWindow(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .events(spark, sfDir)
      .select(col("ts"), col("event_type"), col("value"))
      .withColumn("k", explode(array((0 until 4).map(lit): _*)))
      .withColumn(
        "window_start",
        timestamp_seconds((floor(unix_timestamp(col("ts")) / 900) - col("k")) * 900)
      )
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue.as("sum_value"))

  /** A6: session windows (30-min inactivity gap) per user — the
    * SessionWindows surface. Expressed as gaps-and-islands so the
    * semantics are explicit: a new session starts when the gap from the
    * previous event reaches the timeout. One shuffle on user_id; the
    * per-user sort is bounded by the user's own event count.
    */
  def a6SessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables
      .events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") >= 1800,
          1
        ).otherwise(0)
      )
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("last_event_ts"),
        count(lit(1)).as("n_events")
      )
  }

  /** A7: stream-table enrichment join — the KTable/GlobalKTable join
    * surface. The customer dim is broadcast: no shuffle of the event
    * stream at all, which is the only plan that survives 100 TB of
    * events against a small dimension.
    */
  def a7StreamEnrichDim(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment"))
    Tables
      .events(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("segment"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumValue.as("sum_value"))
  }

  /** A9: funnel analysis — FIRST-TOUCH attribution: a user counts for a
    * stage iff their first view strictly precedes their first click
    * (and that their first purchase). A user whose first click predates
    * any view does NOT count, even if a later view→click→purchase
    * sequence exists — the standard first-touch funnel definition (a
    * any-ordered-subsequence funnel is a different, sort-based
    * operator). One shuffle on user_id; stage membership is a
    * conditional-min aggregate, so partials fold map-side and the whole
    * funnel is a single pass at any scale.
    */
  def a9Funnel(spark: SparkSession, sfDir: String): DataFrame = {
    def firstTs(t: String) = min(when(col("event_type") === t, col("ts"))).as(s"first_$t")
    Tables
      .events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(firstTs("view"), firstTs("click"), firstTs("purchase"))
      .agg(
        count(col("first_view")).as("n_view"),
        count(when(col("first_click") > col("first_view"), 1)).as("n_view_then_click"),
        count(
          when(
            col("first_click") > col("first_view") && col("first_purchase") > col("first_click"),
            1
          )
        ).as("n_full_funnel")
      )
  }

  /** A10: cohort retention — users grouped by first-seen 7-day bucket,
    * counted per activity-week offset. Two shuffles (per-user min, then
    * cohort grid) regardless of data size.
    */
  def a10Cohort(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables
      .events(spark, sfDir)
      .select(col("user_id"), floor(unix_timestamp(col("ts")) / 604800).as("week"))
    val firstWeek = ev
      .groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    ev.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
  }

  /** A13: the generic [[AsOfJoin]] operator through the oracle gate —
    * every click enriched with the latest view at-or-before it within
    * 10 minutes, per user (nulls when none). Views are pre-deduped to
    * unique (user_id, ts) keeping the max view_id — AsOfJoin's
    * documented uniqueness precondition, and exactly the tie the
    * oracle's ORDER BY vts DESC, view_id DESC picks.
    */
  def a13AsofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val views = ev
      .filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("vts"))
      .agg(max(col("event_id")).as("view_id"))
    AsOfJoin.asOf(clicks, views, keyCols = Seq("user_id"), leftTime = "ts", rightTime = "vts", toleranceMs = 600000L)
  }

  /** A12: interval/range join WITHOUT an equi key — the operator family
    * Spark has no native strategy for (the naive formulation plans as a
    * nested-loop join against the whole stream). "Incidents" are
    * derived intervals [spike_ts − 5 min, spike_ts + 10 min) around
    * error spikes; every event — any user — is matched to the incidents
    * containing its timestamp.
    *
    * Scale: both sides bucketize to 15-min chunks. Each incident
    * explodes to the 2-3 chunks it overlaps; each event has exactly ONE
    * chunk — so the interval predicate becomes a keyed equi-join on
    * chunk plus a row-local containment filter, and a given (event,
    * incident) pair can meet only once (no post-join dedup exists at
    * all). Chunk width trades interval replication (span/width per
    * incident) against bucket selectivity. The incident side is
    * alert-scale → broadcast; drop the hint and the same plan shuffles
    * both sides on chunk.
    */
  /** a12 constants — interpolated into the oracle SQL too. */
  val RangeChunkSec = 900
  val RangeErrThreshold = 3

  /** @param broadcastIncidents alert-scale incident sides broadcast
    *   (the default); pass false when the incident side is itself large
    *   (e.g. joining against months of incidents) — the SAME plan then
    *   degrades gracefully to a chunk-keyed shuffle join on both sides,
    *   still never a nested loop (PlanSpec asserts both shapes).
    */
  def a12RangeJoin(spark: SparkSession, sfDir: String, broadcastIncidents: Boolean = true): DataFrame = {
    val ChunkSec = RangeChunkSec
    val ErrThreshold = RangeErrThreshold
    val ev = Tables
      .events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("chunk", floor(unix_timestamp(col("ts")) / ChunkSec))
    val incidents = ev
      .filter(col("event_type") === "error")
      .groupBy(col("chunk").as("incident_id"))
      .agg(count(lit(1)).as("n_err"), min(col("ts")).as("spike_ts"))
      .filter(col("n_err") >= ErrThreshold)
      .select(
        col("incident_id"),
        (col("spike_ts") - expr("INTERVAL 5 MINUTES")).as("lo"),
        (col("spike_ts") + expr("INTERVAL 10 MINUTES")).as("hi")
      )
    val incChunks = incidents
      .withColumn(
        "chunk",
        explode(
          sequence(floor(unix_timestamp(col("lo")) / ChunkSec), floor(unix_timestamp(col("hi")) / ChunkSec))
        )
      )
    ev.join(if (broadcastIncidents) broadcast(incChunks) else incChunks, "chunk")
      .filter(col("ts") >= col("lo") && col("ts") < col("hi"))
      .groupBy(col("incident_id"), col("lo").as("incident_start"))
      .agg(count(lit(1)).as("n_events"), count_distinct(col("user_id")).as("n_users"))
  }

  /** A8: event-time windowed stats behind a watermark — only 15-min
    * windows that are fully closed 10 minutes before the stream's max
    * event time are emitted (the batch shape of
    * `withWatermark("ts", "10 minutes")` + append-mode window agg).
    */
  def a8EventTimeStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    val wm = ev.agg((max(unix_timestamp(col("ts"))) - 600).as("wm_sec"))
    ev.withColumn("ws_sec", floor(unix_timestamp(col("ts")) / 900) * 900)
      .join(broadcast(wm))
      .filter(col("ws_sec") + 900 <= col("wm_sec"))
      .groupBy(timestamp_seconds(col("ws_sec")).as("window_start"))
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col("user_id")).as("n_users"),
        sumValue.as("sum_value")
      )
  }
}
