package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational / OLAP operator coverage (SURVEY.md §2 B-series).
  *
  * Every query is declared with the DataFrame API so Catalyst handles
  * pushdown, pruning and join planning. Money aggregations cast each
  * value to DECIMAL before summing: the sum is then exact and
  * independent of partition/merge order (a double sum is not), which
  * makes results reproducible across any cluster size; the final value
  * is cast back to double for a stable output schema.
  */
object Relational {

  private def moneySum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ExactAgg.moneySum(c)

  /** Exact revenue term: extendedprice × (1 − discount), computed in
    * decimal end-to-end. Double products cast to decimal round
    * differently across engines (shortest-repr vs exact-value rounding);
    * decimal×decimal is exact, so every engine agrees.
    */
  private def discPrice: org.apache.spark.sql.Column =
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(3,2)"))

  private def charge: org.apache.spark.sql.Column =
    discPrice * (lit(1).cast("decimal(3,2)") + col("l_tax").cast("decimal(3,2)"))

  /** B1: Q1-style pricing summary — single scan, grouped multi-aggregate.
    * Scale: map-side partial aggregation over 6 groups; no shuffle of raw
    * rows, only partials. Filter + 7-column projection push to the scan.
    */
  def b1AggPricing(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast("double").as("sum_disc_price"),
        sum(charge).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order")
      )

  /** B2: Q3-style shipping-priority — 3-way join, agg, deterministic top-10.
    * Scale: customer filter prunes before the join; orders↔lineitem is the
    * big shuffle join on orderkey; AQE splits skew. Top-N is a
    * TakeOrdered, not a global sort.
    */
  def b2JoinTopn(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, sfDir).filter(col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.lineitem(spark, sfDir).filter(col("l_shipdate") > lit("1998-01-01"))
    // no broadcast hint on customer — it grows with SF; AQE broadcasts
    // when it actually fits instead of OOMing the driver at scale
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(discPrice).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** B3: Q5-style local-supplier volume — 6-table join through the
    * region→nation hierarchy. Scale: region/nation are hinted broadcast
    * (constant size at every SF); supplier/customer broadcast only when
    * AQE measures that they fit.
    */
  def b3MultiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val supp = Tables.supplier(spark, sfDir)
    val ord = Tables
      .orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val li = Tables.lineitem(spark, sfDir)

    // broadcast hints only on the FIXED-size dims (region: 5 rows,
    // nation: 25 — constant at every SF); customer/supplier grow with
    // the data, so AQE decides for them
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(
        cust,
        col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey")
      )
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(discPrice).cast("double").as("revenue"))
  }

  /** B4: semi + anti join — customers with an urgent order and no F-status
    * order. Scale: both are shuffle-free broadcast-able existence joins;
    * Spark plans LeftSemi/LeftAnti with no row duplication.
    */
  def b4SemiAntiJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
    val urgent = Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT")
    val fStatus = Tables.orders(spark, sfDir).filter(col("o_orderstatus") === "F")
    cust
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(fStatus, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  /** B5: window-function top-k — 3 highest-value orders per priority
    * class, written DECLARATIVELY. The priority key has ~5 values, so
    * a naive rank window would sort entire classes in 5 tasks at any
    * cluster size; the engine, not the query, removes that hazard —
    * graft's [[graft.plans.TopKPerKey.RowNumberLimitToTopK]] rule
    * plants the native bounded-heap operator under the window, so the
    * renumbering sees ≤ 3 rows per class (this replaced a hand-salted
    * two-window workaround; b17 remains the direct-API form, and
    * sessions without graft's extensions still get Spark's own
    * WindowGroupLimit pruning).
    */
  def b5WindowRank(spark: SparkSession, sfDir: String): DataFrame = {
    val fin = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables
      .orders(spark, sfDir)
      .withColumn("rk", row_number().over(fin))
      .filter(col("rk") <= 3)
      .select(col("o_orderpriority"), col("rk"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Two-phase grouping-sets aggregation (round-14, guide §2.3
    * "aggregate before you shuffle"): Expand multiplies its INPUT rows
    * by the number of grouping sets, so cube/rollup directly over the
    * fact table pays the per-row aggregate update #sets times — and the
    * decimal sum update is the expensive non-vectorized path (measured:
    * cube×decimal 1.44 s vs 0.45 s for either alone at sf0.1). Instead,
    * aggregate ONCE at the finest grouping (the map-side-combined
    * single-set plan), then run the grouping-sets Expand over the
    * few-rows partial, re-summing. Exact by decimal/long associativity:
    * Σ_cells Σ_group = Σ_rows bit-for-bit, and the final double cast is
    * applied once at the edge as before. The sums fit decimal(28,2) by
    * the same argument as the direct plan (count ≤ 2^63 rows × 10^16).
    */
  private def twoPhaseQtySets(
      spark: SparkSession,
      sfDir: String,
      sets: DataFrame => org.apache.spark.sql.RelationalGroupedDataset
  ): DataFrame = {
    val base = Tables
      .lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("s"),
        count(lit(1)).as("cnt")
      )
    sets(base)
      .agg(
        sum(col("s")).cast("decimal(28,2)").cast("double").as("sum_qty"),
        sum(col("cnt")).as("n")
      )
  }

  /** B6: ROLLUP over (returnflag, linestatus) — grouping-sets aggregation.
    * Scale (round-14): two-phase — one map-side-combined aggregate at
    * the finest grouping, then the rollup Expand over the ≤|rf×ls|-row
    * partial (see [[twoPhaseQtySets]]); the fact table is read once and
    * never multiplied by the number of grouping sets.
    */
  def b6Rollup(spark: SparkSession, sfDir: String): DataFrame =
    twoPhaseQtySets(spark, sfDir, _.rollup(col("l_returnflag"), col("l_linestatus")))

  /** B7: pivot event_type → columns (conditional aggregation form, which
    * is exactly what Spark compiles pivot into). Scale: one shuffle on
    * user_id, counters fold map-side.
    */
  def b7Pivot(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
    def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    ev.groupBy(col("user_id"))
      .agg(cnt("view"), cnt("click"), cnt("purchase"), cnt("signup"), cnt("error"))
  }

  /** B25: unpivot (melt) — the inverse of [[b7Pivot]]: the wide
    * per-user conditional-count matrix back to long (user_id,
    * event_type, n) form via the native `Dataset.unpivot`, zero-count
    * cells dropped. The oracle computes the long form directly from
    * events, so a mislabeled measure column, a value landing under the
    * wrong variable, or a surviving zero row all break the match.
    * Unpivot is row-local (a Generate over the wide row — no shuffle
    * beyond b7's own aggregation).
    */
  def b25Unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("view", "click", "purchase", "signup", "error")
    b7Pivot(spark, sfDir)
      .unpivot(
        Array(col("user_id")),
        types.map(t => col(s"n_$t")).toArray,
        "event_type",
        "n"
      )
      .withColumn("event_type", expr("substring(event_type, 3)"))
      .filter(col("n") > 0)
  }

  /** B8: set operations — high-value vs urgent order keys. */
  def b8SetOps(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val highValue = ord.filter(col("o_totalprice") > 200000).select(col("o_orderkey"))
    val urgent = ord.filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val both = highValue.intersect(urgent).withColumn("tag", lit("both"))
    val highOnly = highValue.except(urgent).withColumn("tag", lit("high_only"))
    both.unionByName(highOnly).groupBy(col("tag")).agg(count(lit(1)).as("n"))
  }

  /** B9: exact discrete percentiles + distinct counts per market segment.
    * Quantiles are picked as the value at rank ceil(p*n) — a value from
    * the data, no interpolation arithmetic — so the result is bit-exact
    * and engine-independent.
    *
    * Scale: the segment key has ~5 values, so ranking via a
    * whole-segment window would sort entire segments in 5 tasks at any
    * cluster size. Instead, two-phase distributed rank: (1) count rows
    * per (segment, fixed-width value bucket) — a map-side-combinable
    * aggregate; (2) cumulative bucket offsets (computed on the tiny
    * per-bucket aggregate, ~100 rows/segment, via a self-join — no
    * segment-only window anywhere in the plan); (3) each rank target
    * lands in exactly one bucket, and only that bucket's rows are
    * sorted (a window over (segment, bucket, stat) — bounded by the
    * bucket width, not the segment size). The bucketing key is
    * floor(value/width), monotone in the order-by value, so in-bucket
    * rank + bucket offset = exact global rank.
    *
    * Bucket edges are SKETCH-DERIVED: a per-segment
    * `percentile_approx` pass (a map-side-combinable quantile sketch,
    * one tiny edges-array row per segment) yields ~100 edges that adapt
    * to ANY value distribution — a domain where all mass sits in one
    * fixed-width bucket still splits into ~equal-count buckets here.
    * The edges only steer bucket BALANCE; the located-bucket rank pick
    * stays exact whatever the sketch returns, so the result is
    * bit-identical to the oracle regardless of sketch error. (A true
    * point-mass domain — every value identical — degenerates for any
    * value-based bucketing; the tie-broken sort is then over equal
    * values and cheap.)
    */
  def b9Percentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val seg = col("c_mktsegment")
    val base = Tables
      .customer(spark, sfDir)
      .select(seg, col("c_acctbal"), col("c_custkey"))
    // ~100 adaptive edges per segment from the quantile sketch; bucket id
    // = #edges strictly below the value — monotone in the order-by value,
    // which is all the two-phase rank needs. n_nations rides the SAME
    // aggregate pass (fused — a separate groupBy would re-scan customer),
    // and the per-segment frame is checkpointed so its two consumers
    // (the broadcast edge join and the final n_nations join) never
    // recompute the sketch scan: customer is read 2x total (sketch,
    // bucket compute — the bucketed frame below is checkpointed and
    // serves both the count pass and the located-bucket sort), each a
    // pruned columnar scan.
    val segAgg = Tables
      .customer(spark, sfDir)
      .groupBy(seg)
      .agg(
        percentile_approx(
          col("c_acctbal"),
          typedlit((1 to 99).map(_ / 100.0)),
          lit(1000)
        ).as("edges"),
        count_distinct(col("c_nationkey")).as("n_nations")
      )
      .localCheckpoint()
    val edges = segAgg.select(seg, col("edges"))
    // round 15, two changes with an exactness argument each:
    //  (1) bkt via the codegen'd count_below kernel instead of the
    //      CodegenFallback aggregate() lambda — identical count by
    //      construction (same SQLOrderingUtil.compareDoubles the old
    //      GreaterThan compiled to, same null fall-through to 0);
    //  (2) the bucketed frame is localCheckpoint'd: its two consumers
    //      (the bucket-count aggregate and the located-bucket sort)
    //      previously EACH re-ran the customer scan + edge join +
    //      99-edge fold. Bucket boundaries derive only from `edges`
    //      (already checkpointed in segAgg) and bkt is a deterministic
    //      row-local function of (edges, c_acctbal), so materializing
    //      the frame changes no value: bcnt counts and the in-bucket
    //      sort see the same (segment, bkt, acctbal, custkey) rows,
    //      hence the same offsets, the same located buckets, the same
    //      picked ranks. Customer is now read 2x (sketch, buckets)
    //      instead of 3x.
    val rows = base
      .join(broadcast(edges), Seq("c_mktsegment"))
      .withColumn("bkt", graft.plans.CountBelowExpr.countBelow(col("edges"), col("c_acctbal")))
      .drop("edges")
      .localCheckpoint()

    val bcnt = rows.groupBy(seg, col("bkt")).agg(count(lit(1)).as("bn"))
    // cumulative count of buckets ≤ bkt, per segment (tiny self-join —
    // at most ~100 buckets/segment ever exist)
    val bcum = bcnt
      .join(
        bcnt.select(seg.as("seg2"), col("bkt").as("bkt2"), col("bn").as("bn2")),
        seg === col("seg2") && col("bkt2") <= col("bkt")
      )
      .groupBy(seg, col("bkt"), col("bn"))
      .agg(sum(col("bn2")).as("cum"))

    val targets = bcnt
      .groupBy(seg)
      .agg(sum(col("bn")).as("n"))
      .select(
        seg,
        explode(
          array(
            struct(lit("median_bal").as("stat"), ceil(col("n") * 0.5).as("target")),
            struct(lit("p90_bal").as("stat"), ceil(col("n") * 0.9).as("target"))
          )
        ).as("t")
      )
      .select(seg, col("t.stat").as("stat"), col("t.target").as("target"))

    // locate the bucket holding each target rank: cum − bn < target ≤ cum
    val located = targets
      .join(bcum, Seq("c_mktsegment"))
      .filter(col("target") > col("cum") - col("bn") && col("target") <= col("cum"))
      .select(seg, col("stat"), col("target"), col("bkt"), (col("cum") - col("bn")).as("offset"))

    // sort ONLY the located buckets; offset + in-bucket rank = global rank
    val wb = Window
      .partitionBy(seg, col("bkt"), col("stat"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val picked = rows
      .join(broadcast(located), Seq("c_mktsegment", "bkt"))
      .withColumn("rn", row_number().over(wb))
      .filter(col("offset") + col("rn") === col("target"))

    val stats = picked
      .groupBy(seg)
      .agg(
        max(when(col("stat") === "median_bal", col("c_acctbal"))).as("median_bal"),
        max(when(col("stat") === "p90_bal", col("c_acctbal"))).as("p90_bal")
      )
    segAgg.select(seg, col("n_nations")).join(stats, Seq("c_mktsegment"))
  }

  /** B10: string/date battery — regexp extraction from the JSON-ish props
    * payload + month bucketing. All codegen'd built-ins, no UDFs.
    */
  def b10StringDate(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .events(spark, sfDir)
      .select(
        date_trunc("month", col("ts")).as("month"),
        upper(col("event_type")).as("etype"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long").as("k")
      )
      .groupBy(col("month"), col("etype"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))

  /** C94: typed semi-structured extraction — `from_json` over the
    * events payload, the schema-on-read path b10's regex only
    * approximates. The parse is declared once with a DDL schema
    * (`k BIGINT`) and Catalyst projects the single field; malformed
    * payloads yield NULL (PERMISSIVE mode), so `n_parsed`/`sum_k`
    * count only valid rows while `n_events` counts all — the
    * bad-record accounting a scraped-corpus ingest needs. Scale: the
    * parse is row-local (JsonToStructs — interpreted-eval fallback,
    * but a single scalar expression inside the scan projection, not a
    * shuffle shape), all six aggregates partial-aggregate map-side,
    * and the only exchange carries one row per event_type. The exact
    * distinct count rides the same hash aggregate (Expand), bounded
    * by |k| ≤ 100 distinct values per group.
    */
  def c94JsonExtract(spark: SparkSession, sfDir: String): DataFrame =
    c94JsonExtractFrom(Tables.events(spark, sfDir))

  /** The extraction over any (event_type, props) frame — split out so
    * the spec can plant malformed / missing-key payloads and prove the
    * PERMISSIVE null accounting (the gate corpus is all well-formed).
    */
  def c94JsonExtractFrom(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        from_json(col("props"), "k BIGINT", Map.empty[String, String]).getField("k").as("k")
      )
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k")
      )

  /** C95: VARIANT ingestion — the schema-FLEXIBLE sibling of c94's
    * fixed-schema `from_json`: `try_parse_json` decodes the payload
    * once into Spark 4's binary VARIANT encoding (no declared schema,
    * malformed → NULL), and each consumer binds its own path + type at
    * read time (`try_variant_get`), the late-binding contract a
    * long-lived ingest needs when payload schemas drift. The bigint
    * and string bindings of the SAME field demonstrate per-consumer
    * typing; a type-mismatched value NULLs only the binding that asked
    * for it. Scale: parse and both gets are row-local scan-projection
    * expressions; the aggregate exchange carries one row per
    * event_type.
    */
  def c95VariantExtract(spark: SparkSession, sfDir: String): DataFrame =
    c95VariantExtractFrom(Tables.events(spark, sfDir))

  /** The row-local VARIANT decode screen c95 aggregates over — split
    * out because it is also the STREAMING ingest unit: a Kafka JSON
    * payload decodes and binds per record with no state, no
    * watermark, no shuffle (StreamingSpec drives it through a
    * MemoryStream and pins row-for-row batch parity, malformed rows
    * included). The VARIANT value itself never leaves the projection
    * — only the validity bit and the typed bindings emit.
    */
  def variantScreen(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), try_parse_json(col("props")).as("v"))
      .select(
        col("event_type"),
        col("v").isNotNull.as("valid"),
        try_variant_get(col("v"), "$.k", "bigint").as("k"),
        try_variant_get(col("v"), "$.k", "string").as("k_str")
      )

  /** The variant pass over any (event_type, props) frame — split out
    * so the spec can plant malformed JSON (NULL variant) and
    * type-mismatched values (NULL binding, variant still valid).
    */
  def c95VariantExtractFrom(events: DataFrame): DataFrame =
    variantScreen(events)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("valid"), lit(1))).as("n_valid"),
        sum(col("k")).as("sum_k"),
        max(col("k_str")).as("max_k_str")
      )

  /** B52: NULL-semantics battery — the three corners of SQL null
    * handling every engine must agree on and none of the other gates
    * isolates: (1) NULL as a GROUP key (grouping treats NULLs as one
    * group — unlike equality, which never matches them); (2)
    * null-safe equality `<=>` as a JOIN key (NULL must meet NULL —
    * Catalyst plans it as a hash join on coalesced keys, not a
    * nested loop); (3) explicit NULLS FIRST ordering (Spark's
    * ascending default — DuckDB defaults NULLS LAST, so the oracle
    * must spell it out; silent engine defaults are exactly the bug
    * this gate pins). NULLs are derived deterministically with
    * `nullif`, since the source tables ship none. The window runs
    * over the ≤5-row aggregated frame — bounded, not a corpus sort.
    */
  def b52NullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grouped = Tables
      .orders(spark, sfDir)
      .select(nullif(col("o_orderkey") % 5, lit(0)).as("k"), col("o_totalprice"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
    val dim = Seq(Option.empty[Long], Some(1L), Some(3L)).toDF("dk")
    val w = Window.orderBy(col("k").asc_nulls_first)
    grouped
      .join(broadcast(dim), col("k") <=> col("dk"))
      .withColumn("rk", rank().over(w).cast("long"))
      .select(col("k"), col("n"), col("sum_price"), col("rk"))
  }

  /** B11: scalar + correlated-style subquery — orders above their
    * priority class's average price. Declared as a join against the
    * per-class aggregate (what Catalyst de-correlates subqueries into).
    */
  def b11ScalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
    val classAvg = ord
      .groupBy(col("o_orderpriority").as("prio"))
      .agg((moneySum(col("o_totalprice")) / count(lit(1))).as("avg_price"))
    ord
      .join(broadcast(classAvg), col("o_orderpriority") === col("prio"))
      .filter(col("o_totalprice") > col("avg_price") * 1.5)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"))
  }

  /** B14: CUBE over (returnflag, linestatus) — all grouping-set
    * combinations. Scale (round-14): two-phase like [[b6Rollup]] — the
    * 4-way Expand runs over the ≤|rf×ls|-row finest-grouping partial,
    * not over the fact table (measured at sf0.1: 1.44 s → the
    * single-set aggregate's 0.45 s; in-suite the direct plan's 2.4M-row
    * decimal-update pass spiked to 9.7 s under memory pressure).
    */
  def b14Cube(spark: SparkSession, sfDir: String): DataFrame =
    twoPhaseQtySets(spark, sfDir, _.cube(col("l_returnflag"), col("l_linestatus")))

  /** B15: window frames — per-customer running order total (ROWS
    * UNBOUNDED PRECEDING). Decimal running sum: exact at every prefix,
    * so each row compares cross-engine. Restricted to custkey < 100 to
    * keep the dump bounded.
    */
  def b15RunningSum(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .orders(spark, sfDir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("running_total")
      )
  }

  /** B20: rolling TIME-window aggregate — per customer, each order's
    * trailing-90-day revenue (a RANGE frame over event time, vs b15's
    * ROWS frame over positions). Spark's RangeFrame needs a numeric
    * order key, so the frame runs on epoch seconds with a ±90-day
    * bound; peers (equal timestamps) are included wholesale on both
    * engines, which is what makes the DuckDB `RANGE INTERVAL` oracle
    * bit-comparable. Decimal sums per the exactness rules.
    *
    * Scale: partitioned by o_custkey (high cardinality — parallelism
    * grows with customers, per-customer data is bounded), one shuffle,
    * and the range frame is evaluated by a sliding accumulator over the
    * sorted partition — never a per-row rescan.
    */
  val RollingDays = 90

  def b20RollingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-RollingDays.toLong * 86400, 0)
    Tables
      .orders(spark, sfDir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").as("rolling_90d"),
        count(lit(1)).over(w).as("n_orders_90d")
      )
  }

  /** B21: ties-aware top-k — RANK() ≤ 3 per returnflag over quantity
    * DESC. Quantities repeat heavily (integral values 1..50), so the
    * boundary rank carries hundreds of tied rows per flag: the
    * canonical "top sellers including ties" SQL shape. The declarative
    * window + filter rewrites to the native [[graft.plans.TopKPerKey]]
    * in [[graft.plans.TopKPerKey.RankMode]] (ties-retaining grouped
    * buffers), so no task ever sorts a whole returnflag partition —
    * rank only renumbers the survivors. The kept SET is deterministic
    * without a tiebreak column because rank keeps every tie — the
    * extension past the reference's keep-one per-key reductions
    * (ClickstreamJoinExample.scala:256) that b5/b17 generalized first.
    */
  def b21RankTies(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity").desc)
    Tables
      .lineitem(spark, sfDir)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 3)
      .select(col("l_returnflag"), col("rk"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  /** B51: DENSE_RANK ≤ k under heavy ties — the third rank-family
    * top-k semantics (b5 row_number keeps exactly k, b21 rank keeps
    * every row fewer than k rows precede, dense_rank keeps EVERY row
    * in the first k distinct order values — the "top 3 price points
    * per segment, all takers" question). Coarse integer quantities
    * over ~2 linestatus partitions are the hostile case for the
    * declarative window (each partition = one whole-table sort task);
    * the RowNumberLimitToTopK rewrite plants the native bounded
    * GROUP-heap (a TreeMap of at most k distinct order values per key,
    * each bucket holding its ties) map-side, so no task ever sorts a
    * partition — the same prune b21 gets, with group- instead of
    * row-counting. Deterministic without a tiebreak: dense_rank keeps
    * all ties by definition.
    */
  def b51DenseTopk(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("l_linestatus")).orderBy(col("l_quantity").desc)
    Tables
      .lineitem(spark, sfDir)
      .withColumn("drk", dense_rank().over(w))
      .filter(col("drk") <= 3)
      .select(col("l_linestatus"), col("drk"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
  }

  /** B22: order-gap analysis — LAG over each customer's order history:
    * previous order timestamp and the gap in seconds (epoch difference,
    * exact integer — day-granularity datediff semantics differ between
    * engines at boundaries, epoch seconds do not). First order per
    * customer carries nulls. The window partitions by o_custkey — high
    * cardinality, so parallelism grows with customers and no task ever
    * sorts more than one customer's bounded history.
    */
  def b22OrderGaps(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables
      .orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev_ts", lag(col("o_orderdate"), 1).over(w))
      .withColumn(
        "gap_seconds",
        unix_timestamp(col("o_orderdate")) - unix_timestamp(col("prev_ts"))
      )
  }

  /** B12: sketches — approx distinct users + approx value quantiles per
    * event type. Not bit-equal across engines (rows-only check); the
    * point is the sketch mergeability: HLL partials merge associatively,
    * so this is one shuffle of tiny sketch buffers at any scale.
    */
  def b12ApproxSketch(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        expr("approx_percentile(value, array(0.5, 0.99), 1000)").as("value_q")
      )
      .select(
        col("event_type"),
        col("approx_users"),
        col("value_q").getItem(0).as("p50"),
        col("value_q").getItem(1).as("p99")
      )

  /** B17: native top-k-per-key — the same contract as b5 computed by
    * the custom [[graft.plans.TopKPerKey]] operator (LogicalPlan +
    * SparkStrategy + two-phase SparkPlan) instead of a rank window:
    * bounded per-partition heaps, shuffle of ≤ k·partitions candidate
    * rows per key, heap merge. No sort of any key partition exists in
    * the plan at any key cardinality.
    */
  def b17TopkNative(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      Tables
        .orders(spark, sfDir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      keyCols = Seq("o_orderpriority"),
      orderBy = Seq(("o_totalprice", false), ("o_orderkey", true)),
      k = 3
    )

  /** B18: Q13-style customer order-count distribution — the outer-join
    * shape: customers with NO orders must survive with count 0, then a
    * second aggregation histograms the counts. Scale: one shuffle per
    * agg level; the left-outer join shuffles both sides on custkey
    * (AQE may broadcast customer at small SF).
    */
  def b18Custdist(spark: SparkSession, sfDir: String): DataFrame =
    Tables
      .customer(spark, sfDir)
      .select(col("c_custkey"))
      .join(
        Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"),
        "left"
      )
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** B43: distributed NTILE — quartile assignment per order within its
    * priority class WITHOUT the global per-partition sort NTILE normally
    * costs. `ntile(4) OVER (PARTITION BY priority ORDER BY price, key)`
    * has 5 partition values, so the declarative window serializes the
    * whole orders table into 5 sort tasks — the b5 anti-pattern, and
    * unlike rank-≤-k there is no prune: every row gets a tile. Instead
    * the exact two-phase rank (b9/c64's shape generalized to FULL rank):
    * coarse price buckets (monotone in the order-by, ties stay inside
    * one bucket), per-(priority, bucket) counts → tiny cumulative-offset
    * frame (rows ∝ buckets), global rank = broadcast offset + in-bucket
    * row_number (each bucket sorts in parallel), then the tile is pure
    * integer arithmetic on (rank, n) — NTILE's definition: the first
    * n mod t tiles hold ceil(n/t) rows, the rest floor(n/t). Provably
    * equal to the naive window (randomized trials in OperatorsSpec cover
    * every n mod t case incl. n < t).
    */
  def b43Ntile(spark: SparkSession, sfDir: String): DataFrame =
    b43NtileFrom(
      Tables
        .orders(spark, sfDir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
      tiles = 4
    )

  /** NTILE's definition in pure integer arithmetic over columns `grn`
    * (1-based global rank within the partition) and `n` (partition row
    * count): tiles 1..(n mod t) hold (n DIV t)+1 rows, the rest
    * n DIV t. The ELSE division is unreachable when n DIV t = 0 (then
    * the WHEN spans all n rows) — CASE short-circuits, so no division
    * by zero fires. Shared by b43 and every other two-phase tiler
    * (c80's per-language perplexity buckets).
    */
  def ntileFromRank(tiles: Int): Column = expr(
    s"""CASE WHEN grn <= (n % $tiles) * (n DIV $tiles + 1)
       |     THEN (grn + (n DIV $tiles)) DIV (n DIV $tiles + 1)
       |     ELSE (n % $tiles) + (grn - (n % $tiles) * (n DIV $tiles + 1) + (n DIV $tiles) - 1) DIV (n DIV $tiles)
       |END""".stripMargin
  )

  /** The two-phase NTILE over any (o_orderpriority, o_orderkey,
    * o_totalprice) frame — split out so randomized trials can drive it
    * with planted group sizes hitting every n mod tiles case.
    */
  def b43NtileFrom(input: DataFrame, tiles: Int): DataFrame = {
    require(tiles >= 1, s"tiles must be >= 1, got $tiles")
    // bucket is monotone in o_totalprice: cross-bucket order refines the
    // order-by, in-bucket ties resolve by the row_number below
    val rows = input.withColumn("bkt", floor(col("o_totalprice") / 1000.0).cast("long"))
    val counts = rows.groupBy(col("o_orderpriority"), col("bkt")).agg(count(lit(1)).as("cnt"))
    // offsets + group totals over the AGGREGATED bucket frame (rows ∝
    // distinct buckets, not orders) — the only windows over a
    // low-cardinality partition key run here, on the tiny frame
    val wOff = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("o_orderpriority"))
    val offsets = counts
      .withColumn("offset", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select(col("o_orderpriority"), col("bkt"), col("offset"), col("n"))
    // in-bucket rank in parallel; offset + rn = exact global rank
    val wb = Window
      .partitionBy(col("o_orderpriority"), col("bkt"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val tile = ntileFromRank(tiles)
    rows
      .join(broadcast(offsets), Seq("o_orderpriority", "bkt"))
      .withColumn("grn", col("offset") + row_number().over(wb))
      .withColumn("quartile", tile.cast("long"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("quartile"))
  }

  /** B50: distribution-window battery — PERCENT_RANK and CUME_DIST
    * through the same two-phase exact-rank shape as b43/b9/c80 (bucket
    * counts → tiny offset frame → parallel in-bucket ranks), never a
    * whole-partition sort: with ~5 priority values a declarative
    * distribution window serializes the table into 5 tasks. The
    * order-by is tie-free by construction (price, unique orderkey), so
    * RANK = ROW_NUMBER and both statistics are one exact-integer
    * division each — PERCENT_RANK = (rank−1)/(n−1) (0 for a
    * single-row partition, the SQL convention), CUME_DIST = rank/n —
    * bit-identical to the declarative windows on any engine.
    */
  def b50DistWindows(spark: SparkSession, sfDir: String): DataFrame =
    b50DistWindowsFrom(
      Tables
        .orders(spark, sfDir)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    )

  /** The two-phase distribution windows over any (o_orderpriority,
    * o_orderkey, o_totalprice) frame — split out so the spec can plant
    * single-row partitions and randomized group sizes.
    */
  def b50DistWindowsFrom(input: DataFrame): DataFrame = {
    val rows = input.withColumn("bkt", floor(col("o_totalprice") / 1000.0).cast("long"))
    val counts = rows.groupBy(col("o_orderpriority"), col("bkt")).agg(count(lit(1)).as("cnt"))
    val wOff = Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(col("o_orderpriority"))
    val offsets = counts
      .withColumn("offset", coalesce(sum(col("cnt")).over(wOff), lit(0L)))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select(col("o_orderpriority"), col("bkt"), col("offset"), col("n"))
    val wb = Window
      .partitionBy(col("o_orderpriority"), col("bkt"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    rows
      .join(broadcast(offsets), Seq("o_orderpriority", "bkt"))
      .withColumn("grn", col("offset") + row_number().over(wb))
      .withColumn(
        "pct_rank",
        when(col("n") === 1, lit(0.0))
          .otherwise((col("grn") - 1).cast("double") / (col("n") - 1).cast("double"))
      )
      .withColumn("cume_dist", col("grn").cast("double") / col("n").cast("double"))
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("pct_rank"), col("cume_dist"))
  }

  /** B44: value-window battery — LEAD / FIRST_VALUE / LAST_VALUE /
    * NTH_VALUE over each customer's order history, completing the
    * navigation-function family (b22 covered LAG). All four share ONE
    * partition spec (o_custkey — high cardinality, parallelism grows
    * with customers) and ONE ordering, so Catalyst plans a single sort
    * feeding every frame; the unbounded-following frames only ever span
    * one customer's bounded history. first/next are bigint keys — no
    * float leaves the window.
    */
  def b44ValueWindows(spark: SparkSession, sfDir: String): DataFrame =
    b44ValueWindowsFrom(
      Tables.orders(spark, sfDir).select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    )

  /** The window battery over any (o_custkey, o_orderkey, o_orderdate)
    * frame — split out so the spec can plant a single-order customer
    * (all three null branches) that the gate corpus lacks.
    */
  def b44ValueWindowsFrom(input: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    input
      .withColumn("next_orderkey", lead(col("o_orderkey"), 1).over(ord))
      .withColumn(
        "first_orderkey",
        first(col("o_orderkey")).over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .withColumn("latest_orderkey", last(col("o_orderkey")).over(full))
      .withColumn("second_orderkey", nth_value(col("o_orderkey"), 2).over(full))
  }

  /** B45: bounded ordered LISTAGG — each nation's top-5 suppliers by
    * account balance as ONE ordered comma-joined string (the
    * string_agg/LISTAGG surface). Unbounded listagg is output-∝-group —
    * a group's payload grows with the corpus, the one aggregate that
    * can never stream at 100 TB — so the operator bounds it FIRST: the
    * native TopKPerKey (bounded heaps, no per-nation sort) admits ≤ 5
    * rows per key, and only that bounded frame pays collect_list. Order
    * inside the string is imposed by array_sort on a (−acctbal,
    * suppkey) struct — collect_list order is partition-nondeterministic
    * and must never reach the output.
    */
  def b45Listagg(spark: SparkSession, sfDir: String): DataFrame = {
    val sup = Tables
      .supplier(spark, sfDir)
      .join(broadcast(Tables.nation(spark, sfDir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val top = graft.plans.TopKPerKey.topKPerKey(
      sup,
      keyCols = Seq("n_name"),
      orderBy = Seq(("s_acctbal", false), ("s_suppkey", true)),
      k = 5
    )
    top
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_top"),
        array_join(
          transform(
            array_sort(
              collect_list(struct(negate(col("s_acctbal")).as("nb"), col("s_suppkey").as("sk"), col("s_name").as("nm")))
            ),
            x => x.getField("nm")
          ),
          ","
        ).as("top_names"),
        moneySum(col("s_acctbal")).as("sum_top_bal")
      )
  }

  /** B47: exact MODE per group — the most frequent quantity per return
    * flag (tie → smallest value), computed as value-counts + the native
    * TopKPerKey at k=1: bounded heaps over the (flag, quantity) count
    * frame, no per-flag sort anywhere (the declarative alternative is
    * a rank window over the counts — fine here because counts are
    * small, but the native prune is the shape that holds when the
    * value domain is large). Mode is the one "average" that is exact
    * on any data type; counts are integers, so the result is
    * engine-exact by construction.
    */
  def b47ModeNative(spark: SparkSession, sfDir: String): DataFrame =
    graft.plans.TopKPerKey
      .topKPerKey(
        Tables
          .lineitem(spark, sfDir)
          .groupBy(col("l_returnflag"), col("l_quantity"))
          .agg(count(lit(1)).as("n_occurrences")),
        keyCols = Seq("l_returnflag"),
        orderBy = Seq(("n_occurrences", false), ("l_quantity", true)),
        k = 1
      )
      .select(col("l_returnflag"), col("l_quantity").as("mode_quantity"), col("n_occurrences"))

  /** B48: ratio-to-report WITHOUT the window — each order's share of
    * its priority class's revenue. The declarative form is
    * `price / SUM(price) OVER (PARTITION BY priority)` — which at 5
    * partition values serializes the whole table into 5 window tasks
    * (the b5/b43 anti-pattern, and unlike rank there is no prune).
    * The scalable plan is the decomposition Catalyst does NOT do for
    * you: one map-side-combined aggregate to a 5-row totals frame,
    * broadcast back, row-local divide. Exact: numerator and
    * denominator are DECIMAL(18,2) values cast to double once each,
    * divided once — engine-identical (the oracle states the window
    * form; the values are equal by exactness of the decimal sum).
    * Spec asserts the plan contains NO Window node at all.
    */
  def b48RatioToReport(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables
      .orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val totals = ord
      .groupBy(col("o_orderpriority"))
      .agg(moneySum(col("o_totalprice")).as("prio_total"))
    ord
      .join(broadcast(totals), Seq("o_orderpriority"))
      .select(
        col("o_orderpriority"),
        col("o_orderkey"),
        col("o_totalprice"),
        col("prio_total"),
        (col("o_totalprice").cast("decimal(18,2)").cast("double") / col("prio_total")).as("price_share")
      )
  }

  /** B16: Q14-style promo revenue share — lineitem⋈part with a
    * conditional decimal aggregate, closing the star schema (the one
    * table no other query touched). Scale: the shipdate filter prunes
    * lineitem at the scan; the join is a keyed shuffle on partkey (or a
    * broadcast when part fits — AQE decides); numerator and denominator
    * are exact decimal sums, divided once in double so every engine
    * agrees bit-for-bit.
    */
  def b16PromoRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
    li.join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", discPrice).otherwise(lit(0))).cast("double")
          / sum(discPrice).cast("double")).as("promo_revenue"),
        sum(discPrice).cast("double").as("total_revenue"),
        count(lit(1)).as("n")
      )
  }
}
