package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Generalized relational operator surface (SURVEY.md §2.2–2.8).
  *
  * Each query is a declarative DataFrame plan — Catalyst handles predicate
  * pushdown, column pruning, and join strategy selection; every query has a
  * DuckDB oracle in [[oracles]] with identical column names and ORDER BY so
  * the driver's hash-compare is deterministic.
  *
  * Scale notes (100 TB design intent) are on each query: which side
  * broadcasts, where the shuffle lands, and why the plan survives 1000
  * executors.
  */
object Relational {

  private type Q = (SparkSession, String) => DataFrame

  /** q01 — scan + filter + projection. Both predicate and projection reach
    * the parquet reader (PushedFilters / ReadSchema), so at 100 TB this
    * reads only 2 row-group columns and prunes row groups on shipdate
    * stats. Mirrors reference P4/P5 filters (R/functions.R:64-65,175).
    */
  val q01PrunedScan: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
        col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice").as("price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** q02 — hash aggregation with partial (map-side) combine: TPC-H Q1
    * shape. 4-6 groups means the shuffle moves only num_partitions×groups
    * rows after partial agg — scales linearly. Reference A1-ish grouped
    * summarise (R/functions.R:183-185).
    */
  val q02AggPushdown: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q03 — 3-way join + agg (J2). orders⋈lineitem shuffles on orderkey.
    * customer is SF-proportional (150k rows × SF), so it carries NO
    * broadcast hint: a static hint bypasses
    * `autoBroadcastJoinThreshold` and would OOM the executors once the
    * table outgrows them at a real SF. Size-based selection (and AQE's
    * runtime re-plan) still picks a broadcast join at any SF where
    * customer actually fits, and degrades to a shuffle join when it
    * doesn't. The engine's hint rule: fixed-cardinality dims (nation
    * 25 / region 5) may hint; SF-scaled tables never do —
    * PlanSpec proves the hint is absent by disabling the threshold
    * and asserting the join degrades.
    */
  val q03JoinAgg: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("c_mktsegment")
  }

  /** q04 — size-chosen broadcast hash join (J1): `part` is small
    * RELATIVE to lineitem but still SF-proportional (200k rows × SF),
    * so the broadcast must come from the size estimate / AQE, never a
    * static hint (see q03's hint rule). At bench SFs Spark still
    * broadcasts part and the fact side never shuffles; at a 100 TB SF
    * the same plan degrades safely to a shuffle join.
    */
  val q04BroadcastJoin: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
      .orderBy("p_brand")

  /** q05 — 5-way star join (flagship). nation (25 rows) and region
    * (5 rows) are FIXED-cardinality dims at every SF, so they carry
    * explicit broadcast hints; customer is SF-proportional and is
    * left to the size estimate / AQE (q03's hint rule). At bench SFs
    * all three dimension joins broadcast and only orders⋈lineitem
    * shuffles; at 100 TB the customer join degrades to a shuffle
    * join instead of OOMing the executors.
    */
  val q05StarJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o  = Tables.orders(s, d)
    val c  = Tables.customer(s, d)
    val n  = Tables.nation(s, d)
    val r  = Tables.region(s, d)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name", "n_name")
  }

  /** q06 — left-semi join (EXISTS; reference J4 `%in%` classification).
    * Semi-join keeps only the probe side's columns, so no payload shuffle
    * for the build side beyond its key.
    */
  val q06SemiJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o1999 = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
      .select("o_custkey")
    c.join(o1999, c("c_custkey") === o1999("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** q07 — left-anti join (NOT IN; reference J3 inactive-ID exclusion,
    * R/functions.R:215) + broadcast dim join for labels.
    */
  val q07AntiJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
      .select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_no_order_customers"))
      .orderBy("n_name")
  }

  /** q08 — windowed top-k per group (reference J5/A4: latest-event-per-cert
    * done as row_number over a partition instead of a correlated per-row
    * lookup). One shuffle on the partition key; no driver collect.
    */
  val q08WindowTopk: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 200)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
        col("o_totalprice"))
      .orderBy("o_custkey", "rk")
  }

  /** q09 — running-frame window (rows between unbounded preceding and
    * current) + lag. Frame evaluation is streaming within each partition —
    * no extra shuffle beyond the partitionBy.
    */
  val q09WindowRunning: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        round(sum("o_totalprice")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_spend"),
        coalesce(lag("o_orderkey", 1).over(w), lit(-1L)).as("prev_orderkey"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q41 — RANGE-frame (time-interval) window, the one frame species
    * §2.5's rowsBetween entries don't exercise: per customer, the
    * trailing-30-day spend and order count at each order — the frame
    * is VALUE-bounded (orders within 30 days, however many rows that
    * is, peers included), not row-counted. Spark orders by epoch
    * seconds with `rangeBetween(-30·86400, 0)`; the oracle's
    * `RANGE BETWEEN INTERVAL 30 DAYS PRECEDING` is the same peer-
    * inclusive value frame over the midnight-aligned timestamps.
    */
  val q41RangeWindow: Q = (s, d) => {
    // NTZ → TZ (session is pinned UTC) → epoch seconds: NTZ has no
    // direct long cast
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        round(sum("o_totalprice").over(w), 2).as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q42 — retention COHORT matrix, the canonical product-analytics
    * rollup over the events table: users are cohorted by their first
    * active day, and each (cohort_day, day_offset) cell counts the
    * distinct users of that cohort active offset days later. Two
    * keyed shuffles: the per-user min-day aggregation, then the join
    * back to events on user_id — deliberately NOT hint-broadcast (the
    * cohort table is per-user-sized, the t13-defect shape; AQE may
    * still choose a broadcast at runtime when it measures small). The
    * distinct-user count is Spark's two-phase distinct aggregate —
    * partial on (cohort, offset, user), final count — so nothing
    * corpus-sized crosses the wire unaggregated.
    */
  val q42RetentionCohorts: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val cohort = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long")
          .as("day_offset"))
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_day", "day_offset")
  }

  /** q43 — ordered conversion FUNNEL over events: users who viewed,
    * then clicked strictly after their first view, then purchased
    * strictly after that first qualifying click — the other canonical
    * product-analytics rollup next to q42's cohort matrix, and a
    * DIFFERENT shape: a chain of order-dependent semi-aggregations
    * rather than one distinct count. Each step is a per-user min over
    * a type-pruned scan joined keyed on user_id to the previous
    * step's frontier (no hint broadcast — per-user tables, the t13
    * rule; AQE may broadcast the shrinking frontiers at runtime when
    * it measures them small, which is exactly when it's safe). Three
    * rows out: survivors at each funnel step.
    */
  val q43Funnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
    def firstAfter(typ: String, prev: DataFrame, prevTs: String,
        outTs: String): DataFrame =
      ev.filter(col("event_type") === typ)
        .join(prev, "user_id")
        .filter(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min("ts").as(outTs))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("v_ts"))
    val c = firstAfter("click", v, "v_ts", "c_ts")
    val p = firstAfter("purchase", c, "c_ts", "p_ts")
    def counted(df: DataFrame, step: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), col("n_users"))
    counted(v, "step1_view")
      .unionByName(counted(c, "step2_click"))
      .unionByName(counted(p, "step3_purchase"))
      .orderBy("step")
  }

  /** q44 — LINEAR MULTI-TOUCH ATTRIBUTION over events (the third
    * canonical product-analytics rollup next to q42's cohorts and
    * q43's funnel): every purchase distributes one unit of credit
    * equally across that user's click/view/signup touches in the
    * prior 24 hours; rolled up to (touch_type, day). The shape is an
    * event-time range join KEYED ON user_id (equi key carries the
    * shuffle; the 24 h band is a post-join filter inside each user's
    * partition — never a time-cross-join) followed by a per-conversion
    * window count for the 1/n split. Credit sums are floats under the
    * round-4 contract; n_touches pins the join cardinality exactly.
    */
  val q44Attribution: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("ts").as("conv_ts"))
    val touch = ev.filter(col("event_type")
        .isin("click", "view", "signup"))
      .select(col("user_id"), col("event_type").as("touch_type"),
        col("ts").as("touch_ts"))
    val pairs = conv.join(touch, Seq("user_id"))
      .filter(col("touch_ts") < col("conv_ts") &&
        col("touch_ts") >= col("conv_ts") - expr("INTERVAL 24 HOURS"))
    val perConv = Window.partitionBy("conv_id")
    pairs
      .withColumn("credit", lit(1.0) / count(lit(1)).over(perConv))
      .groupBy(col("touch_type"),
        date_format(col("touch_ts"), "yyyy-MM-dd").as("day"))
      .agg(round(sum("credit"), 4).as("credit"),
        count(lit(1)).as("n_touches"))
      .orderBy("touch_type", "day")
  }

  /** q45 — ROLLING 7-DAY DISTINCT ACTIVES over events ("weekly active
    * users per day", the staple engagement metric): for each event day
    * D, the distinct users active in [D-6, D]. The scale-safe shape is
    * contribution EXPLOSION, not a range join: each (user, day) row
    * fans out to the ≤7 window-days it contributes to via
    * `explode(0..6)` + `date_add`, then one equi-shuffle
    * `groupBy(window_day).countDistinct(user)` — at 100 TB a 7× fanout
    * of narrow (user, day) pairs beats an interval join's sort or a
    * 7-day self-join, and the distinct is partial-aggregated map-side.
    * Window-days are restricted to observed event days (inner join
    * with the day dimension) so no partial trailing windows appear.
    */
  val q45RollingActives: Q = (s, d) => {
    val du = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cal = du.select(col("day").as("wday")).distinct()
    du.withColumn("off", explode(sequence(lit(0), lit(6))))
      .select(col("user_id"),
        date_add(col("day"), col("off")).as("wday"))
      .join(cal, Seq("wday"))
      .groupBy(date_format(col("wday"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct("user_id").as("active_users"))
      .orderBy("day")
  }

  /** q46 — CHANGELOG COMPACTION (CDC "merge into current state"): the
    * events table read as an upsert log keyed by user_id, compacted to
    * one current-state row per key — the operation every incremental
    * lakehouse pipeline runs to turn an append-only log into a
    * serving table. Latest-wins is decided by (ts, event_id) — the
    * event_id tiebreak makes the winner deterministic when two events
    * share a timestamp.
    *
    * Scale shape: ONE keyed shuffle. Latest-row selection is the
    * struct-max aggregation (`max(struct(ts, event_id, payload...))`,
    * Spark's max_by shape) fused into the same groupBy as the lifetime
    * counters — partial aggregation runs map-side, so each mapper
    * ships at most one candidate struct + one counter row per key,
    * never the log itself. The window-sort alternative
    * (row_number over user_id ORDER BY ts DESC) would shuffle AND
    * sort every log row; at 100 TB of changelog that sort is the
    * bottleneck, the struct-max is a plain hash agg.
    */
  val q46ChangelogCompact: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("last"),
        count(lit(1)).as("n_events"),
        // value is 2-decimal by construction, so the lifetime sum is
        // carried as exact BIGINT cents: associative/commutative under
        // ANY re-association, which is what lets s16's incremental
        // MERGE loop (different batch slicing → different summation
        // order) equal this batch result EXACTLY instead of to within
        // double-rounding luck (ADVICE r11)
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("user_id"),
        date_format(col("last.ts"), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        col("last.event_id").as("last_event_id"),
        col("last.event_type").as("last_type"),
        round(col("last.value"), 2).as("last_value"),
        col("n_events"),
        round(col("cents") / 100.0, 2).as("lifetime_value"))
      .orderBy("user_id")

  /** q47 — UNPIVOT / MELT (wide → long reshaping, the R
    * `pivot_longer` the reference's tidyverse idiom implies and the
    * inverse of q23's conditional pivot): the four lineitem measure
    * columns melt into (measure, value) rows which then aggregate per
    * (returnflag, measure). Spark's native `unpivot` (Expand under
    * the hood) emits the 4 long rows per input row IN-ROW — no join,
    * no union of 4 re-scans: one pass over the table, then one keyed
    * aggregation over a 4×-taller but 3-column-narrow frame. At
    * 100 TB the single-scan property is the point — the UNION ALL
    * form the oracle uses (portable SQL) would read the table 4
    * times.
    */
  val q47UnpivotMelt: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")),
        "measure", "value")
      .groupBy("l_returnflag", "measure")
      .agg(round(sum("value"), 2).as("total"),
        round(avg("value"), 4).as("mean"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "measure")

  /** q10 — exact dedup by key (reference A3 `distinct(.keep_all)`),
    * deterministic keep-lowest via min. Aggregation form (not
    * dropDuplicates) so the result is order-independent and the shuffle is
    * a plain partial-agg'd groupBy.
    */
  val q10DedupExact: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min("l_orderkey").as("first_orderkey"),
        count(lit(1)).as("n_dupes"))
      .orderBy("l_partkey", "l_suppkey")

  /** q11 — global top-k (reference O3 largest/smallest): TakeOrderedAndProject,
    * i.e. per-partition heap + driver merge of k rows — no full sort at scale.
    */
  val q11TopkOrders: Q = (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** q12 — CASE/conditional projection + conditional aggregation
    * (reference P7 `ifelse` chains, R/functions.R:208-212,490-498).
    */
  val q12CaseWhen: Q = (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("qty_bucket",
        when(col("l_quantity") <= 10, "small")
          .when(col("l_quantity") <= 30, "medium")
          .otherwise("large"))
      .groupBy("qty_bucket")
      .agg(
        count(lit(1)).as("n_lines"),
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice"))
          .otherwise(lit(0.0))), 2).as("returned_value"),
        round(avg("l_discount"), 4).as("avg_disc"))
      .orderBy("qty_bucket")

  /** q13 — date functions (reference §2.8: year()/date ordering/sentinel
    * dates): calendar rollup by year × month.
    */
  val q13DateFunctions: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_orderdate").cast("date")).as("first_day"),
        max(col("o_orderdate").cast("date")).as("last_day"),
        round(sum("o_totalprice"), 2).as("month_value"))
      .orderBy("yr", "mo")

  /** q14 — string kernel ops (reference §2.8 regex/lower/concat/substr):
    * all codegen'd Catalyst built-ins, no UDFs.
    */
  val q14StringFunctions: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        length(col("p_name")).as("name_len"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat(col("p_brand"), lit("|"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 3).as("prefix3"),
        when(col("p_name").rlike("gear|bolt"), true).otherwise(false)
          .as("is_hardware"))
      .filter(col("p_partkey") < 500)
      .orderBy("p_partkey")

  /** q15 — set operations (reference U1/§2.7): customers active in 1995
    * vs 1996 → intersect / except / union, tagged and counted.
    */
  val q15SetOps: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def active(y: Int): DataFrame = o
      .filter(year(col("o_orderdate")) === y)
      .select("o_custkey").distinct()
    val a = active(1995)
    val b = active(1996)
    val both    = a.intersect(b).agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("both_years"))
    val only95  = a.except(b).agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("only_1995"))
    val either  = a.union(b).distinct().agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("either_year"))
    both.union(only95).union(either).select("tag", "n").orderBy("tag")
  }

  /** q16 — rollup (multi-level aggregate; north-star grouping-sets
    * coverage, SURVEY §2.4). Null grouping keys are coalesced to 'ALL' so
    * null-ordering differences between engines can't bite.
    */
  val q16Rollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n_lines"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** q17 — decorrelated latest-per-key (reference J5: "latest chronology
    * event per certificate" done per-row in R; here one window pass +
    * filter — the hand-decorrelated form SURVEY §4 calls for).
    */
  val q17LatestPerKey: Q = (s, d) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("o_custkey") < 300)
      .select(col("o_custkey"),
        col("o_orderdate").cast("date").as("latest_order_date"),
        col("o_orderkey").as("latest_orderkey"),
        col("o_totalprice").as("latest_totalprice"))
      .orderBy("o_custkey")
  }

  /** q18 — grouped existential filter (reference P9/A7: keep group
    * members iff any row in the group matches). Physical choice: a
    * pre-aggregated key set + semi-join, NOT a window — the window form
    * full-sorts every partition, while the aggregate gets map-side
    * combine (bench: ~2× faster at sf0.1, and the gap widens with
    * group cardinality).
    */
  val q18GroupAnyFilter: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val bulkParts = li
      .groupBy("l_partkey")
      .agg(max(col("l_quantity")).as("max_qty"))
      .filter(col("max_qty") > 49)
      .select("l_partkey")
    li.join(bulkParts, Seq("l_partkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")
  }

  /** q19 — universal quantifier aggregate (reference A5: int-downcast rule
    * `all(x == floor(x))`, R/functions.R:220-224) via `every`.
    */
  val q19EveryDowncast: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        every(col("l_quantity") === floor(col("l_quantity")))
          .as("all_integral"),
        count(lit(1)).as("n_lines"))
      .orderBy("l_returnflag")

  /** q20 — generator/explode (reference §2.8 `unnest`): word frequencies
    * from split part names. Explode-then-agg does partial aggregation
    * before the shuffle.
    */
  val q20ExplodeWords: Q = (s, d) =>
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc)

  /** q21 — event-time tumbling window over the events table (batch form of
    * SURVEY §2.9's streaming path; the streaming twin is
    * `s01_stream_tumbling`). Hour truncation keys the shuffle.
    */
  val q21EventsHourly: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .filter(col("hour_start") < "2024-01-03 00:00:00")
      .orderBy("hour_start", "event_type")

  /** q22 — sessionization via lag + cumulative conditional sum (gap > 30
    * min starts a new session). The classic two-window pattern; partitions
    * by user so it scales with user cardinality.
    */
  val q22Sessionize: Q = (s, d) => {
    val byUser = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .filter(col("user_id") < 50)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id")
      .agg(max("session_id").as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** q23 — pivot-style conditional aggregation (portable across engines,
    * unlike engine-native PIVOT syntax): events per ISO weekday ×
    * event_type.
    */
  val q23PivotConditional: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("isodow", weekday(col("ts")) + 1)
      .groupBy("isodow")
      .agg(
        sum(when(col("event_type") === "click", 1).otherwise(0)).as("n_click"),
        sum(when(col("event_type") === "view", 1).otherwise(0)).as("n_view"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("n_purchase"),
        sum(when(col("event_type") === "error", 1).otherwise(0)).as("n_error"),
        sum(when(col("event_type") === "signup", 1).otherwise(0))
          .as("n_signup"),
        count(lit(1)).as("n_total"))
      .orderBy("isodow")

  /** q24 — approx distinct (HLL) next to the exact count. No oracle —
    * sketch values are engine-specific — but the driver still checks rows
    * land. At 100 TB approx_count_distinct is the only affordable form.
    */
  val q24ApproxDistinct: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** Register count (b = 10 index bits of the 48-bit portable hash)
    * for the q37 portable HLL; σ ≈ 1.04/√m ≈ 3.3%.
    */
  val Q37Registers = 1024

  /** alpha_m · m² · 2⁵⁰ — the numerator of the scaled-integer HLL
    * estimate. A Scala double whose decimal form is interpolated into
    * the oracle SQL; both engines then divide the SAME double by the
    * same exact integer.
    */
  private val q37Num: Double = {
    val m = Q37Registers.toDouble
    0.7213 / (1.0 + 1.079 / m) * m * m * math.pow(2.0, 50)
  }

  /** q37 — PORTABLE HyperLogLog (Flajolet et al. 2007): approx distinct
    * whose ESTIMATE hash-matches across engines — the oracled sibling
    * of q24/q33, whose engine-private HLL++ sketches can only be
    * golden-pinned. Every step is engine-neutral and exact:
    * register index = top 10 bits of the md5-derived 48-bit hash;
    * rank ρ = position of the remainder's highest set bit, computed
    * from `length(bin(x))` — a STRING length, no float log; registers
    * are `max(ρ)` (duplicate-insensitive, mergeable — the same
    * property q33's sketches union on); the harmonic sum Σ2^(-ρ_j) is
    * kept as the SCALED INTEGER Σ2^(50-ρ_j) (every term and partial
    * sum exact in a BIGINT), so the only float op is one final
    * division of a shared double literal. Linear counting — the
    * standard small-range estimate — rides along when zero registers
    * remain. Exact countDistinct joins in for transparent error.
    *
    * Scale shape: two partial-aggregated shuffles — (group, register)
    * then group — each output row count bounded by groups × m, never
    * data-sized; the register table is a mergeable sketch, so at
    * 100 TB partitions combine map-side exactly like any HLL.
    */
  val q37PortableHll: Q = (s, d) => {
    graft.functions.Md5Hash48.registerAll(s)
    val regs = hllRegisterProjection(
      Tables.lineitem(s, d).select("l_returnflag", "l_partkey"))
      .groupBy("l_returnflag", "idx")
      .agg(max("rho").as("r"))
    hllFinalize(regs, hllExactCounts(Tables.lineitem(s, d)))
  }

  /** The q37 register projection — (group, register index, rank ρ) per
    * row, all engine-neutral integer arithmetic (see q37's doc). Shared
    * with the streaming s07 twin, whose stateful max(ρ) over exactly
    * these columns IS the register table.
    */
  private[graft] def hllRegisterProjection(
      df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val rem = col("h").bitwiseAND(lit((1L << 38) - 1))
    df.select(col("l_returnflag"),
        graft.functions.Md5Hash48
          .md5_hash48(col("l_partkey").cast("string")).as("h"))
      .select(col("l_returnflag"), expr("h >> 38").as("idx"),
        when(rem === 0, lit(39))
          .otherwise(lit(39) - length(bin(rem))).as("rho"))
  }

  /** The transparent-error exact side q37 reports next to its estimate. */
  private[graft] def hllExactCounts(
      lineitem: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lineitem.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))

  /** The q37/q38 estimate walk over a finished (key, idx, r) register
    * table: scaled-integer harmonic sum, one final float division,
    * linear counting alongside. Shared with s07 so the
    * streaming-maintained sketch finalizes through literally the same
    * plan tail the oracle verifies.
    */
  private[graft] def hllFinalize(regs: org.apache.spark.sql.DataFrame,
      exact: org.apache.spark.sql.DataFrame,
      key: String = "l_returnflag")
      : org.apache.spark.sql.DataFrame = {
    val m = Q37Registers
    regs
      .groupBy(key)
      .agg(count(lit(1)).cast("int").as("regs_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 50 - r)")).as("s_present"))
      .select(col(key), col("regs_hit"),
        (lit(m) - col("regs_hit")).cast("int").as("v_zero"),
        (col("s_present") +
          (lit(m.toLong) - col("regs_hit")) * lit(1L << 50))
          .as("s_scaled"))
      .select(col(key), col("regs_hit"), col("v_zero"),
        col("s_scaled"),
        round(lit(q37Num) / col("s_scaled"), 4).as("hll_estimate"),
        when(col("v_zero") > 0,
          round(lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero")), 4))
          .as("lc_estimate"))
      .join(broadcast(exact), key)
      .orderBy(key)
  }

  /** q39 histogram geometry: 1024 equi-width bins over [0, 110000.00)
    * in integer CENTS — l_extendedprice is ≤ ~104,950 at any TPC-H SF
    * (50 × max part retail price), so the fixed range covers every
    * row and bin assignment is pure BIGINT arithmetic:
    * (cents · 1024) // 11000000.
    */
  val Q39Bins = 1024
  val Q39RangeCents = 11000000L

  /** q39 — PORTABLE mergeable histogram quantiles: the q37 story
    * applied to percentiles. q29 is exact (holds all values — wrong at
    * 100 TB), q29b is the engine-private GK sketch (un-oracle-able);
    * q39 is the third member: a fixed-bin integer histogram whose
    * QUANTILE ESTIMATES hash-match across engines. Bin assignment is
    * exact BIGINT arithmetic on cents; the per-group histogram is a
    * mergeable sketch (counts add — the property q40 proves); the
    * quantile is the lower boundary of the first bin whose cumulative
    * count reaches ⌈q·n⌉, all integer. Output stays in integer cents —
    * no float appears anywhere in the pipeline.
    *
    * Scale shape: one partial-aggregated shuffle keyed (group, bin) —
    * output bounded by groups × 1024, never data-sized; the
    * cumulative walk windows over sketch-sized frames only.
    */
  val q39PortableHistQuantiles: Q = (s, d) =>
    histQuantilesFromCounts(
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), binCol.as("bin"))
        .groupBy("l_returnflag", "bin")
        .agg(count(lit(1)).as("c")))

  private[graft] def binCol =
    expr(s"CAST(round(l_extendedprice * 100) AS BIGINT) * $Q39Bins " +
      s"div $Q39RangeCents")

  /** Shared quantile tail over a (l_returnflag, bin, c) histogram:
    * cumulative walk → integer rank thresholds → bin lower boundary
    * in cents. Windows run over sketch-sized frames (≤ 1024 rows per
    * group), never the data.
    */
  private[graft] def histQuantilesFromCounts(
      hist: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val wCum = Window.partitionBy("l_returnflag").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("l_returnflag")
    def pick(k: String) = min(when(col("cum") >= expr(k), col("bin")))
    hist
      .withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wAll))
      .groupBy("l_returnflag")
      .agg(max("n").as("n_rows"),
        pick("(n + 1) div 2").as("p50_bin"),
        pick("(9 * n + 9) div 10").as("p90_bin"),
        pick("(99 * n + 99) div 100").as("p99_bin"))
      .select(col("l_returnflag"), col("n_rows"),
        col("p50_bin"),
        expr(s"p50_bin * $Q39RangeCents div $Q39Bins")
          .as("p50_lo_cents"),
        col("p90_bin"),
        expr(s"p90_bin * $Q39RangeCents div $Q39Bins")
          .as("p90_lo_cents"),
        col("p99_bin"),
        expr(s"p99_bin * $Q39RangeCents div $Q39Bins")
          .as("p99_lo_cents"))
      .orderBy("l_returnflag")
  }

  /** q40 — histogram MERGEABILITY (the q38-union story for q39): two
    * disjoint halves of lineitem are histogrammed INDEPENDENTLY, the
    * two sketches merge by plain bin-count addition, and the merged
    * sketch's quantiles must equal q39's whole-corpus answer — which
    * is why the same oracle SQL verifies it. This is the exact
    * operation a 100 TB run performs: per-partition histograms
    * combine map-side, and a day×day rollup adds stored sketches
    * instead of rescanning raw data.
    */
  val q40PortableHistMerge: Q = (s, d) => {
    val parts = Tables.lineitem(s, d)
      .select(col("l_returnflag"), binCol.as("bin"),
        pmod(col("l_orderkey"), lit(2)).as("half"))
      .groupBy("l_returnflag", "bin", "half")
      .agg(count(lit(1)).as("c"))
    // merge = bin-count addition of the two independent sketches
    histQuantilesFromCounts(
      parts.groupBy("l_returnflag", "bin").agg(sum("c").as("c")))
  }

  /** q25 — range (non-equi) join: price-band classification. Band table is
    * tiny → broadcast nested loop, which is the right physical plan for a
    * non-equi join against a constant-size dim at any scale.
    */
  val q25RangeJoin: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    val bands = Seq(
      ("budget", 0.0, 20000.0),
      ("mid", 20000.0, 60000.0),
      ("premium", 60000.0, 1e18))
      .toDF("band", "lo", "hi")
    Tables.orders(s, d)
      .join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("band_value"))
      .orderBy("band")
  }

  /** q26 — ordered string aggregation (reference A2: PLSS codes folded
    * into an `(MTRS='..') OR ..` query string, R/functions.R:385-392).
    * Sort inside the aggregate for determinism.
    */
  val q26StringAgg: Q = (s, d) =>
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        array_join(array_sort(collect_list(col("s_name"))), " | ")
          .as("supplier_list"),
        count(lit(1)).as("n_suppliers"))
      .orderBy("n_name")

  /** q27 — positional slice (reference P8: `slice(-(1:2), -nrow(t))` —
    * drop scraped header rows + trailer). Position is only meaningful
    * under an explicit order; the slice runs on an ordered window.
    * Positional ops are inherently sequential — the reference applies
    * them to driver-small scraped tables, and so do we (top-20 frame).
    */
  val q27PositionalSlice: Q = (s, d) => {
    val top20 = Tables.orders(s, d)
      .orderBy(col("o_orderkey").asc).limit(20)
    val w = Window.orderBy(col("o_orderkey").asc)
    top20
      .withColumn("pos", row_number().over(w))
      .withColumn("total", count(lit(1)).over(
        Window.partitionBy()))
      .filter(col("pos") > 2 && col("pos") < col("total"))
      .select("pos", "o_orderkey", "o_totalprice")
      .orderBy("pos")
  }

  /** q28 — JSON extraction from the events props column (reference map
    * client parses GeoJSON properties via `.json()`, index.qmd:24;
    * engine-side: get_json_object, codegen'd).
    */
  val q28JsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      // floor-div, not cast-of-division: double→int casts truncate in
      // Spark but round in DuckDB
      .withColumn("k_bucket", floor(col("k") / 10).cast("int"))
      .groupBy("k_bucket")
      .agg(count(lit(1)).as("n_events"),
        round(avg("value"), 2).as("avg_value"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("k_bucket")

  /** q49 — MAP-typed feature profiles (§2.8's map surface as a real
    * feature-store shape): each user's event-type histogram built as a
    * MapType column (`map_from_entries` over a sorted entry list —
    * deterministic construction), then consumed back through
    * `size(map)` and `explode(map)` into the per-type rollup. The map
    * round-trip is the point: construction, width, and explosion all
    * run distributed and codegen'd, with the map living only INSIDE
    * the plan — the declared output is flat columns, so the oracle is
    * plain SQL with no cross-engine map-ordering hazard. Two keyed
    * shuffles (user×type counts, then the type rollup), both
    * partial-aggregated.
    */
  val q49MapProfile: Q = (s, d) => {
    val profiles = Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("c"))
      .groupBy("user_id")
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("event_type"), col("c"))))).as("m"))
    profiles
      .select(col("user_id"), size(col("m")).as("n_types"),
        explode(col("m")).as(Seq("event_type", "c")))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum("c").as("n_events"),
        round(avg("n_types"), 4).as("avg_profile_width"))
      .orderBy("event_type")
  }

  /** q50 — ACTIVITY-GAP DETECTION over events (the telemetry downtime
    * audit, the reference's monitoring flavor generalized): for each
    * user, the hours between their first and last activity with NO
    * events — span/active/gap counts plus the gap-run structure
    * (number of outages, longest outage) via the same gaps-and-islands
    * rank trick m16 uses on audio frames. Scale shape: the hour
    * calendar comes from an in-row `sequence` explode bounded by each
    * user's own span (never a global calendar cross-join), observed
    * hours partial-aggregate before the anti-join, and the islands
    * window runs per user over gap rows only.
    */
  val q50ActivityGaps: Q = (s, d) => {
    val hours = Tables.events(s, d)
      .select(col("user_id"), date_trunc("hour", col("ts")).as("h"))
    val spans = hours.groupBy("user_id")
      .agg(min("h").as("h0"), max("h").as("h1"))
    val cal = spans.select(col("user_id"), col("h0"), col("h1"),
      explode(sequence(col("h0"), col("h1"),
        expr("INTERVAL 1 HOUR"))).as("h"))
    val observed = hours.distinct()
    val gaps = cal.join(observed, Seq("user_id", "h"), "left_anti")
      .withColumn("idx",
        (unix_timestamp(col("h")) - unix_timestamp(col("h0"))) / 3600)
    val w = Window.partitionBy("user_id").orderBy("idx")
    val runs = gaps
      .withColumn("grp", col("idx") - row_number().over(w))
      .groupBy("user_id", "grp")
      .agg(count(lit(1)).as("run_len"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gap_runs"),
        max("run_len").as("longest_gap"))
    spans
      .withColumn("span_hours",
        ((unix_timestamp(col("h1")) - unix_timestamp(col("h0"))) / 3600
          + 1).cast("long"))
      .join(observed.groupBy("user_id")
        .agg(count(lit(1)).as("active_hours")), Seq("user_id"))
      .join(runs, Seq("user_id"), "left")
      .na.fill(0L, Seq("n_gap_runs", "longest_gap"))
      .select(col("user_id"), col("span_hours"), col("active_hours"),
        (col("span_hours") - col("active_hours")).as("gap_hours"),
        col("n_gap_runs"), col("longest_gap"))
      .orderBy("user_id")
  }

  /** q29 — exact interpolated percentiles (both engines implement the
    * same linear-interpolation definition: Spark `percentile`, DuckDB
    * `quantile_cont`). At 100 TB you'd switch to `approx_percentile`
    * (KLL/GK sketch) — kept exact here so the oracle can hash-match.
    */
  val q29Percentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      // round to 3, not 2: medians of 2-decimal prices land EXACTLY on
      // .005 — the 2-decimal rounding boundary — so engine ulp noise
      // would decide the cent; 3-decimal rounding keeps values on-grid
      // and boundaries off-grid
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 3).as("med_price"),
        round(expr("percentile(l_extendedprice, 0.9)"), 3).as("p90_price"),
        round(expr("percentile(l_quantity, 0.25)"), 2).as("p25_qty"))
      .orderBy("l_returnflag")

  /** q29b — the 100 TB twin of q29: `approx_percentile` (Greenwald-
    * Khanna sketch, accuracy 10000 → rank error ≤ n/10000) instead of
    * the holds-all-values exact `percentile`. Benched alongside q29
    * (SparkEntry.benchOnly) and spec-checked against it; NOT part of
    * the verify contract — sketch outputs can't hash-match a DuckDB
    * twin (different sketch), the exact q29 stays the oracle.
    */
  val q29bPercentilesApprox: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 3)
          .as("med_price"),
        round(expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 3)
          .as("p90_price"),
        round(expr("approx_percentile(l_quantity, 0.25, 10000)"), 2)
          .as("p25_qty"))
      .orderBy("l_returnflag")

  /** q35 — salted two-phase aggregation as a declared, oracled query
    * (mandate "salting for skew"): the hot-key-safe plan —
    * groupBy(keys + row-hash salt) partials, then merge — must produce
    * EXACTLY the plain GROUP BY answer, so its oracle IS the plain
    * GROUP BY. Aggregates chosen order-exact (integer-valued quantity
    * sum ≤ 2^53, count, max) so the salted partial order can't shift a
    * ulp. PlanSpec asserts the salt actually enters the phase-1
    * grouping.
    */
  val q35SaltedAgg: Q = (s, d) =>
    graft.operators.Skew.saltedAggregate(
      Tables.lineitem(s, d), Seq("l_returnflag"), buckets = 32,
      Seq(
        graft.operators.Skew.AggSpec("sum", "l_quantity", "sum_qty"),
        graft.operators.Skew.AggSpec("count", "l_orderkey", "n_rows"),
        graft.operators.Skew.AggSpec("max", "l_extendedprice",
          "max_price")))
      .orderBy("l_returnflag")

  /** q48 — SALTED EQUI-JOIN as a declared, oracled query (the join
    * half of the skew mandate, next to q35's salted aggregation):
    * lineitem joins supplier through [[graft.operators.Skew.saltedJoin]]
    * — left rows take a row-hash salt, the right side replicates once
    * per salt value, and the join key becomes (suppkey, __salt), so a
    * hot supplier's rows split across `buckets` tasks instead of
    * landing on one reducer. This is the static remedy for the case
    * AQE's skew split doesn't cover (broadcast-ineligible right side,
    * hot-key left); correctness is salt-invariant, so the plain join
    * is the oracle. The rollup per nation keeps the output small and
    * order-exact.
    */
  val q48SaltedJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"),
        col("l_extendedprice"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    graft.operators.Skew.saltedJoin(li, sup, "suppkey", buckets = 8)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"))
      .orderBy("s_nationkey")
  }

  /** q36 — co-located bucketed join as a declared, oracled query
    * (mandate "bucketing for co-located joins"): both sides are written
    * bucketed+sorted on the join key (paid once at write time — the
    * recurring-join amortization a 100 TB fact-fact join needs), then
    * the SortMergeJoin runs with ZERO exchange on either side —
    * PlanSpec asserts the shuffle-free plan with broadcast disabled.
    * Result must equal the plain file join, so the plain join is the
    * oracle; aggregates are order-exact.
    */
  /** Table-name tag carrying the SOURCE DATA fingerprint (path + size +
    * mtime — [[graft.pipeline.StageCache.fingerprint]], the one shared
    * definition): regenerated source parquet produces a new table name
    * and hence a rebuild — a bare existence check would serve stale
    * bucketed files.
    */
  private def dataTag(paths: Seq[String]): String =
    graft.pipeline.StageCache.fingerprint(paths)

  val q36BucketedJoin: Q = (s, d) => {
    val tag = dataTag(Seq(s"$d/lineitem.parquet", s"$d/orders.parquet"))
    val lt = s"graft_lineitem_b_$tag"
    val ot = s"graft_orders_b_$tag"
    // the in-memory catalog forgets tables across JVMs but the
    // warehouse FILES persist: re-register the metadata over the old
    // location when possible (paying the bucketing write once per sf
    // dir, ever), else write fresh
    def ensure(table: String, df: org.apache.spark.sql.DataFrame): Unit =
      if (!s.catalog.tableExists(table)) {
        val wh = java.net.URI.create(
          s.conf.get("spark.sql.warehouse.dir")).getPath
        val path = s"$wh/$table"
        if (java.nio.file.Files.exists(
            java.nio.file.Paths.get(path, "_SUCCESS")))
          graft.operators.Bucketing.registerBucketed(
            s, table, df.schema.toDDL, "l_orderkey", 16, path)
        else
          graft.operators.Bucketing.writeBucketed(
            df, table, "l_orderkey", 16)
      }
    ensure(lt, Tables.lineitem(s, d)
      .select("l_orderkey", "l_quantity", "l_extendedprice"))
    ensure(ot, Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus")))
    graft.operators.Bucketing.bucketedJoin(s, lt, ot, "l_orderkey")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum("l_quantity").as("sum_qty"),
        max("l_extendedprice").as("max_price"))
      .orderBy("o_orderstatus")
  }

  /** q30 — CUBE (full grouping-sets lattice; q16 covers ROLLUP). */
  val q30Cube: Q = (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_value"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_value"))
      .orderBy("status", "priority")

  /** q34 — explicit GROUPING SETS (SURVEY §2.4 mandate; the general
    * form of q16's rollup and q30's cube): an asymmetric set list —
    * (flag, status), (flag), (status) — that neither shorthand
    * expresses (rollup lacks (status); cube adds the grand total).
    * Catalyst expands the sets via a single Expand node and
    * partial-aggregates before the one exchange.
    */
  val q34GroupingSets: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_q34")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_lines,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem_q34
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** q31 — AS-OF join (each event matched to the same key's most recent
    * order at-or-before the event time). Spark has no asof operator;
    * the scalable form is the union-merge: tag both streams, union,
    * one window pass per key ordered by time does last-observation-
    * carried-forward, then keep probe rows. ONE shuffle on the key —
    * no range-join explosion, no per-row subquery. Orders are deduped
    * to one per (key, date) first so tie-breaking is well-defined in
    * both engines (DuckDB's native ASOF JOIN is the oracle).
    */
  val q31AsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .filter(col("user_id") < 200)
      .select(col("event_id"), col("user_id").as("k"), col("ts"))
    val ord = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("k"),
        col("o_orderdate").as("ots"))
      .agg(max("o_orderkey").as("o_orderkey"))
    val tagged = ev
      .select(col("k"), col("ts"), lit(1).as("side"),
        col("event_id"), lit(null).cast("long").as("o_orderkey"))
      .unionByName(ord.select(col("k"), col("ots").as("ts"),
        lit(0).as("side"), lit(null).cast("long").as("event_id"),
        col("o_orderkey")))
    // order-side rows sort BEFORE a same-instant event (side 0 < 1):
    // an order at exactly ts matches, per ASOF >= semantics
    val w = Window.partitionBy("k")
      .orderBy(col("ts").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_orderkey", last(col("o_orderkey"), true).over(w))
      .filter(col("side") === 1 && col("asof_orderkey").isNotNull)
      .select(col("event_id"), col("k").as("user_id"),
        col("asof_orderkey"))
      .orderBy("event_id")
  }

  /** q32 — ranking-function window coverage: ntile quartiles +
    * percent_rank over order values per status.
    */
  val q32RankingWindows: Q = (s, d) => {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        dense_rank().over(w).as("drank"))
      .orderBy("o_orderstatus", "o_orderkey")
  }

  /** q33 — mergeable HLL sketches (Spark 3.5+ hll_sketch_agg /
    * hll_union_agg): per-day distinct-user sketches unioned into a
    * weekly estimate — the reaggregatable form a 100 TB rollup needs
    * (raw countDistinct can't be merged across partial results). No
    * oracle: sketch estimates are engine-specific; exact counts ride
    * along for the spec's sanity bound.
    */
  val q33HllSketchUnion: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(dayofyear(col("ts")).as("doy"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"),
        countDistinct("user_id").as("exact_daily"))
    daily
      .withColumn("week", ((col("doy") - 1) / 7).cast("int"))
      .groupBy("week")
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk))").as("approx_users"),
        sum("exact_daily").as("sum_daily_exact"),
        count(lit(1)).as("n_days"))
      .orderBy("week")
  }

  /** q38 — portable-HLL UNION (the q33 shape with q37's engine-neutral
    * registers, so the MERGED estimate hash-matches the oracle):
    * per-day register tables — the partial sketches a warehouse stores
    * alongside each day's partition — merge into weekly sketches by
    * `max` per register (union of HLL sketches IS the register-wise
    * max: associative, commutative, partial-aggregable — the property
    * q33 demonstrates with engine-private sketches and this query
    * proves end-to-end against DuckDB). Exact weekly distinct joins in
    * for transparent error; the scaled-integer estimate arithmetic is
    * q37's.
    */
  val q38PortableHllUnion: Q = (s, d) => {
    graft.functions.Md5Hash48.registerAll(s)
    val rem = col("h").bitwiseAND(lit((1L << 38) - 1))
    val daily = Tables.events(s, d)
      .select(dayofyear(col("ts")).as("doy"),
        graft.functions.Md5Hash48
          .md5_hash48(col("user_id").cast("string")).as("h"))
      .select(col("doy"), expr("h >> 38").as("idx"),
        when(rem === 0, lit(39))
          .otherwise(lit(39) - length(bin(rem))).as("rho"))
      .groupBy("doy", "idx")
      .agg(max("rho").as("r"))
    val weekly = daily
      .withColumn("week", expr("CAST((doy - 1) DIV 7 AS INT)"))
      .groupBy("week", "idx")
      .agg(max("r").as("r")) // sketch union = register-wise max
    val exact = Tables.events(s, d)
      .withColumn("week",
        expr("CAST((dayofyear(ts) - 1) DIV 7 AS INT)"))
      .groupBy("week")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    hllFinalize(weekly, exact, key = "week")
  }

  /** Benched-but-not-oracled variants: scale-path twins of oracled
    * queries whose outputs are sketch-dependent (run by Bench next to
    * their exact siblings; spec-checked for closeness in
    * RelationalSpec, deliberately NOT in the verify contract).
    */
  val benchOnly: Map[String, Q] = Map(
    "q29b_percentiles_approx" -> q29bPercentilesApprox,
  )

  /** q51 — HIVE-PARTITIONED LAYOUT + PARTITION-PRUNED SCAN (the
    * lakehouse layout primitive next to g07's z-order clustering and
    * q36's bucketing): the events log written once as a
    * dt-partitioned dataset (StageCache-memoized, like g07's
    * clustered copy), then a 10-day window query over it. The date
    * predicate resolves against the PARTITION DIRECTORIES at plan
    * time — `PartitionFilters` in the scan, PlanSpec-gated — so the
    * query reads 10 of 30 partitions and never opens the rest: at
    * 100 TB of time-partitioned log this is the difference between
    * scanning a third of the lake and scanning a day list. The
    * aggregate itself is one keyed partial-agg'd shuffle per day.
    */
  val q51PartitionPruned: Q = (s, d) =>
    dayWindowAggOf(eventsByDt(s, d))

  /** q51's 10-day window aggregate over a dt-bearing events frame —
    * one definition shared with s22's streamed layout so the pair
    * (which share one oracle) cannot drift apart (review r12). The
    * value sum goes through exact BIGINT cents like q46's: s22's
    * micro-batched layout sums in a different order than the batch
    * staging and than DuckDB, and integer addition is the only way
    * the three are equal by construction rather than to within
    * double re-association luck.
    */
  private[graft] def dayWindowAggOf(parted: DataFrame): DataFrame =
    parted
      .filter(col("dt") >= lit("2024-01-10").cast("date") &&
        col("dt") <= lit("2024-01-19").cast("date"))
      .groupBy("dt")
      .agg(count(lit(1)).as("n_events"),
        countDistinct("user_id").as("n_users"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("dt"), col("n_events"), col("n_users"),
        round(col("cents") / 100.0, 2).as("day_value"))
      .orderBy("dt")

  /** The q51/q52 dt-partitioned staging of the events log (shared —
    * StageCache serves the second caller from the artifact).
    */
  private def eventsByDt(s: SparkSession, d: String): DataFrame = {
    val cache = new graft.pipeline.StageCache(s,
      graft.pipeline.StageCache.indexRoot)
    cache.stage("events_by_dt",
      cache.versionHash(Seq("events_by_dt", "v1")),
      Seq(s"$d/events.parquet"), partitionCols = Seq("dt")) {
      Tables.events(s, d).withColumn("dt", to_date(col("ts")))
    }
  }

  /** q52 — DYNAMIC PARTITION PRUNING (runtime partition pruning
    * through a join, q51's static sibling): the dt-partitioned log
    * joined to a small calendar dimension filtered on a
    * NON-partition attribute (day-number mod 3 — deliberately
    * opaque to static pruning). Catalyst inserts a
    * DynamicPruningSubquery on the scan: the dim side's broadcast
    * result prunes the fact scan's partition list AT RUNTIME, so the
    * query reads the 10 matching day directories even though no
    * static date predicate exists — at 100 TB the fact-side saving
    * of every star join whose dimension carries the selective
    * filter. PlanSpec asserts the dynamicpruning expression lands in
    * the scan's PartitionFilters.
    */
  val q52DynamicPruning: Q = (s, d) => {
    val parted = eventsByDt(s, d)
    val cache = new graft.pipeline.StageCache(s,
      graft.pipeline.StageCache.indexRoot)
    val dim = cache.stage("dates_dim",
      cache.versionHash(Seq("dates_dim", "v1")),
      Seq(s"$d/events.parquet")) {
      Tables.events(s, d)
        .select(to_date(col("ts")).as("dt")).distinct()
        .withColumn("day_bucket",
          pmod(dayofmonth(col("dt")), lit(3)))
    }
    parted
      .join(dim.filter(col("day_bucket") === 1), "dt")
      .groupBy("dt")
      .agg(count(lit(1)).as("n_events"),
        // exact BIGINT cents (the q46/q51/s16 pattern): value is
        // 2-decimal by construction, and a double sum re-associated
        // differently across engines can flip round(...,2) at a
        // half-cent boundary (ADVICE r12)
        round(sum(round(col("value") * 100).cast("long")) / 100.0, 2)
          .as("day_value"))
      .orderBy("dt")
  }

  /** q54's shuffle seed and shard count — part of the artifact's
    * identity (the StageCache version key), so changing either
    * rebuilds the layout instead of serving stale shards.
    */
  private[graft] val Q54Seed = 13
  private[graft] val Q54Shards = 8

  /** The q54 shard layout plan over an arbitrary (doc_id, text, ...)
    * frame — exposed for PlanSpec's single-exchange assertion.
    */
  private[graft] def shardLayoutOf(docs: DataFrame): DataFrame = {
    graft.functions.Md5Hash48.registerAll(docs.sparkSession)
    docs
      .select(col("doc_id"), col("text"))
      .withColumn("h", expr(
        s"md5_hash48('$Q54Seed:' || CAST(doc_id AS STRING))"))
      .withColumn("shard",
        pmod(col("h"), lit(Q54Shards)).cast("int"))
      .repartition(Q54Shards, col("shard"))
      .sortWithinPartitions("shard", "h", "doc_id")
  }

  /** q54 — DETERMINISTIC SHUFFLE-TO-SHARDS WRITER (the final
    * training-data step after the pipeline curates t14/t39, packs
    * t28, mixes t29/t35, and splits t40 — r12 VERDICT gap #2): a
    * SEEDED, reproducible global shuffle of the corpus materialized
    * as [[Q54Shards]] shard files plus a manifest row per shard. The
    * shuffle order is the portable hash h = md5-48(seed ':' doc_id)
    * — content-addressed, so any engine (and the DuckDB oracle)
    * derives the identical permutation; the shard is the portable
    * bucket h mod [[Q54Shards]]; rows land in their shard file sorted
    * by (h, doc_id). One `repartition(shards, shard)` exchange + an
    * in-partition sort is the WHOLE physical plan (PlanSpec gates a
    * single exchange, no driver materialization — every row moves at
    * most once, the 100 TB shuffle-write shape), and the
    * StageCache-memoized write doubles as the reproducibility claim:
    * same seed, same corpus, same shards byte-for-byte. The returned
    * manifest audits the artifact per shard — row count, content
    * byte size, and the position-weighted order checksum
    * Σ pos·(h mod 1000003) that pins the exact within-shard sequence
    * a loader will stream.
    */
  val q54ShardShuffle: Q = (s, d) => {
    val cache = new graft.pipeline.StageCache(s,
      graft.pipeline.StageCache.indexRoot)
    val shards = cache.stage("q54_shards",
      cache.versionHash(Seq("q54_shards", "v1", Q54Seed.toString,
        Q54Shards.toString)),
      Seq(s"$d/documents.parquet"), partitionCols = Seq("shard")) {
      shardLayoutOf(Tables.documents(s, d))
    }
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    shards
      .withColumn("pos", row_number().over(w))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("text")).cast("long")).as("n_bytes"),
        sum(col("pos") * (col("h") % 1000003)).as("order_checksum"))
      .orderBy("shard")
  }

  /** q53 — CORRELATED SCALAR SUBQUERY, decorrelated by Catalyst (the
    * reference's J5 "latest per key" lookup expressed the way an
    * analyst actually writes it — a per-row correlated aggregate —
    * instead of the hand-decorrelated join q17 demonstrates): which
    * customers sit exactly at their segment's maximum balance,
    * written as SQL with `c_acctbal = (SELECT max(..) WHERE
    * c2.c_mktsegment = c.c_mktsegment)`. Catalyst's
    * RewriteCorrelatedScalarSubquery turns the per-row subquery into
    * ONE segment-keyed aggregate joined back — the plan PlanSpec
    * asserts: a per-row subplan would be a 100 TB disaster, the
    * rewrite makes it two scans and a broadcast-sized join. The
    * correlated aggregate is max (order-independent), so the exact
    * double equality is safe in both engines.
    */
  val q53CorrelatedSubquery: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("q53_customer")
    s.sql(
      """SELECT c.c_mktsegment, count(*) AS n_at_max,
        |  round(max(c.c_acctbal), 2) AS seg_max
        |FROM q53_customer c
        |WHERE c.c_acctbal = (
        |  SELECT max(c2.c_acctbal) FROM q53_customer c2
        |  WHERE c2.c_mktsegment = c.c_mktsegment)
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q54_shard_shuffle" -> q54ShardShuffle,
    "q53_correlated_subquery" -> q53CorrelatedSubquery,
    "q52_dynamic_pruning" -> q52DynamicPruning,
    "q51_partition_pruned" -> q51PartitionPruned,
    "q39_portable_hist_quantiles" -> q39PortableHistQuantiles,
    "q40_portable_hist_merge" -> q40PortableHistMerge,
    "q36_bucketed_join" -> q36BucketedJoin,
    "q35_salted_agg" -> q35SaltedAgg,
    "q48_salted_join" -> q48SaltedJoin,
    "q49_map_profile" -> q49MapProfile,
    "q50_activity_gaps" -> q50ActivityGaps,
    "q33_hll_sketch_union" -> q33HllSketchUnion,
    "q32_ranking_windows" -> q32RankingWindows,
    "q31_asof_join" -> q31AsofJoin,
    "q30_cube" -> q30Cube,
    "q29_percentiles" -> q29Percentiles,
    "q26_string_agg" -> q26StringAgg,
    "q27_positional_slice" -> q27PositionalSlice,
    "q28_json_extract" -> q28JsonExtract,
    "q01_pruned_scan" -> q01PrunedScan,
    "q02_agg_pushdown" -> q02AggPushdown,
    "q03_join_agg" -> q03JoinAgg,
    "q04_broadcast_join" -> q04BroadcastJoin,
    "q05_star_join" -> q05StarJoin,
    "q06_semi_join" -> q06SemiJoin,
    "q07_anti_join" -> q07AntiJoin,
    "q08_window_topk" -> q08WindowTopk,
    "q09_window_running" -> q09WindowRunning,
    "q41_range_window" -> q41RangeWindow,
    "q42_retention_cohorts" -> q42RetentionCohorts,
    "q43_funnel" -> q43Funnel,
    "q44_attribution" -> q44Attribution,
    "q45_rolling_actives" -> q45RollingActives,
    "q46_changelog_compact" -> q46ChangelogCompact,
    "q47_unpivot_melt" -> q47UnpivotMelt,
    "q10_dedup_exact" -> q10DedupExact,
    "q11_topk_orders" -> q11TopkOrders,
    "q12_case_when" -> q12CaseWhen,
    "q13_date_functions" -> q13DateFunctions,
    "q14_string_functions" -> q14StringFunctions,
    "q15_set_ops" -> q15SetOps,
    "q16_rollup" -> q16Rollup,
    "q17_latest_per_key" -> q17LatestPerKey,
    "q18_group_any_filter" -> q18GroupAnyFilter,
    "q19_every_downcast" -> q19EveryDowncast,
    "q20_explode_words" -> q20ExplodeWords,
    "q21_events_hourly" -> q21EventsHourly,
    "q22_sessionize" -> q22Sessionize,
    "q23_pivot_conditional" -> q23PivotConditional,
    "q24_approx_distinct" -> q24ApproxDistinct,
    "q25_range_join" -> q25RangeJoin,
    "q34_grouping_sets" -> q34GroupingSets,
    "q37_portable_hll" -> q37PortableHll,
    "q38_portable_hll_union" -> q38PortableHllUnion,
  )

  private lazy val q39OracleSql: String =
    s"""WITH h AS (
      |  SELECT l_returnflag,
      |    (CAST(round(l_extendedprice * 100) AS BIGINT) * $Q39Bins)
      |      // $Q39RangeCents AS bin,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_returnflag, bin, c,
      |    CAST(sum(c) OVER (PARTITION BY l_returnflag ORDER BY bin)
      |      AS BIGINT) AS cum,
      |    CAST(sum(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
      |  FROM h)
      |SELECT l_returnflag,
      |  max(n) AS n_rows,
      |  min(CASE WHEN cum >= (n + 1) // 2 THEN bin END) AS p50_bin,
      |  min(CASE WHEN cum >= (n + 1) // 2 THEN bin END)
      |    * $Q39RangeCents // $Q39Bins AS p50_lo_cents,
      |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END) AS p90_bin,
      |  min(CASE WHEN cum >= (9 * n + 9) // 10 THEN bin END)
      |    * $Q39RangeCents // $Q39Bins AS p90_lo_cents,
      |  min(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END)
      |    AS p99_bin,
      |  min(CASE WHEN cum >= (99 * n + 99) // 100 THEN bin END)
      |    * $Q39RangeCents // $Q39Bins AS p99_lo_cents
      |FROM cum GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** DuckDB oracles. Column names and ORDER BY match the Spark plans
    * exactly; integer sums are cast to BIGINT (DuckDB widens to HUGEINT),
    * timestamps are cast to DATE or formatted as strings.
    */
  val oracles: Map[String, String] = Map(
    // q51: the layout must not change the relation — same window over
    // the raw unpartitioned log
    "q51_partition_pruned" ->
      """SELECT CAST(ts AS DATE) AS dt,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
        |    AS day_value
        |FROM events
        |WHERE CAST(ts AS DATE) >= DATE '2024-01-10'
        |  AND CAST(ts AS DATE) <= DATE '2024-01-19'
        |GROUP BY 1 ORDER BY dt""".stripMargin,
    // q53: the same correlated form runs verbatim in DuckDB (its
    // optimizer performs the equivalent decorrelation)
    "q53_correlated_subquery" ->
      """SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_at_max,
        |  round(max(c.c_acctbal), 2) AS seg_max
        |FROM customer c
        |WHERE c.c_acctbal = (
        |  SELECT max(c2.c_acctbal) FROM customer c2
        |  WHERE c2.c_mktsegment = c.c_mktsegment)
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin,
    // q54: the same content-addressed permutation re-derived from the
    // raw table — identical md5-48 hash, bucket, order, and per-shard
    // aggregates (strlen = UTF-8 byte length, Spark's octet_length)
    "q54_shard_shuffle" ->
      s"""WITH h AS (
         |  SELECT doc_id, text,
         |    CAST('0x' || substr(md5('$Q54Seed:' ||
         |      CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) AS h
         |  FROM documents),
         |sh AS (
         |  SELECT *, CAST(h % $Q54Shards AS INT) AS shard,
         |    row_number() OVER (PARTITION BY h % $Q54Shards
         |      ORDER BY h, doc_id) AS pos
         |  FROM h)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
         |  CAST(sum(pos * (h % 1000003)) AS BIGINT) AS order_checksum
         |FROM sh GROUP BY shard ORDER BY shard""".stripMargin,
    // q52: the dim filter re-derived directly on the raw log —
    // day-of-month mod 3 is engine-neutral arithmetic
    "q52_dynamic_pruning" ->
      """SELECT CAST(ts AS DATE) AS dt,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
        |    AS day_value
        |FROM events
        |WHERE day(CAST(ts AS DATE)) % 3 = 1
        |GROUP BY 1 ORDER BY dt""".stripMargin,
    // q39/q40: the oracle recomputes the integer histogram and the
    // cumulative quantile walk — pure BIGINT throughout. q40 merges
    // two independently-built half-histograms by bin addition, which
    // must reproduce the whole-corpus histogram exactly — hence the
    // SAME oracle text verifies both (mergeability is the claim).
    "q39_portable_hist_quantiles" -> q39OracleSql,
    "q40_portable_hist_merge" -> q39OracleSql,
    // q37: the oracle recomputes the WHOLE portable HLL — hash,
    // register index, bin()-length rank, scaled-integer harmonic sum —
    // and divides the same interpolated double numerator.
    "q37_portable_hll" -> {
      val m = Q37Registers
      s"""WITH h AS (
        |  SELECT l_returnflag,
        |    CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS h
        |  FROM lineitem),
        |r AS (
        |  SELECT l_returnflag, h >> 38 AS idx,
        |    CASE WHEN (h & ((1::BIGINT << 38) - 1)) = 0 THEN 39
        |         ELSE 39 - length(bin(h & ((1::BIGINT << 38) - 1)))
        |    END AS rho
        |  FROM h),
        |regs AS (
        |  SELECT l_returnflag, idx, max(rho) AS r
        |  FROM r GROUP BY 1, 2),
        |agg AS (
        |  SELECT l_returnflag, CAST(count(*) AS INT) AS regs_hit,
        |    CAST(sum(1::BIGINT << (50 - r)) AS BIGINT) AS s_present
        |  FROM regs GROUP BY 1),
        |sc AS (
        |  SELECT l_returnflag, regs_hit,
        |    CAST($m - regs_hit AS INT) AS v_zero,
        |    CAST(s_present + CAST($m - regs_hit AS BIGINT)
        |      * (1::BIGINT << 50) AS BIGINT) AS s_scaled
        |  FROM agg),
        |ex AS (
        |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        |  FROM lineitem GROUP BY 1)
        |SELECT sc.l_returnflag, regs_hit, v_zero, s_scaled,
        |  round($q37Num / s_scaled, 4) AS hll_estimate,
        |  CASE WHEN v_zero > 0
        |    THEN round($m.0 * ln($m.0 / v_zero), 4) END AS lc_estimate,
        |  exact_parts
        |FROM sc JOIN ex ON sc.l_returnflag = ex.l_returnflag
        |ORDER BY sc.l_returnflag""".stripMargin
    },
    // q38: daily registers → weekly register-wise max (sketch union) →
    // the same scaled-integer estimate as q37, all recomputed.
    "q38_portable_hll_union" -> {
      val m = Q37Registers
      s"""WITH h AS (
        |  SELECT dayofyear(ts) AS doy,
        |    CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
        |      AS BIGINT) AS h
        |  FROM events),
        |r AS (
        |  SELECT doy, h >> 38 AS idx,
        |    CASE WHEN (h & ((1::BIGINT << 38) - 1)) = 0 THEN 39
        |         ELSE 39 - length(bin(h & ((1::BIGINT << 38) - 1)))
        |    END AS rho
        |  FROM h),
        |daily AS (SELECT doy, idx, max(rho) AS r FROM r GROUP BY 1, 2),
        |weekly AS (
        |  SELECT CAST((doy - 1) // 7 AS INT) AS week, idx, max(r) AS r
        |  FROM daily GROUP BY 1, 2),
        |agg AS (
        |  SELECT week, CAST(count(*) AS INT) AS regs_hit,
        |    CAST(sum(1::BIGINT << (50 - r)) AS BIGINT) AS s_present
        |  FROM weekly GROUP BY 1),
        |sc AS (
        |  SELECT week, regs_hit,
        |    CAST($m - regs_hit AS INT) AS v_zero,
        |    CAST(s_present + CAST($m - regs_hit AS BIGINT)
        |      * (1::BIGINT << 50) AS BIGINT) AS s_scaled
        |  FROM agg),
        |ex AS (
        |  SELECT CAST((dayofyear(ts) - 1) // 7 AS INT) AS week,
        |    count(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY 1)
        |SELECT sc.week, regs_hit, v_zero, s_scaled,
        |  round($q37Num / s_scaled, 4) AS hll_estimate,
        |  CASE WHEN v_zero > 0
        |    THEN round($m.0 * ln($m.0 / v_zero), 4) END AS lc_estimate,
        |  exact_users
        |FROM sc JOIN ex ON sc.week = ex.week
        |ORDER BY sc.week""".stripMargin
    },
    "q32_ranking_windows" ->
      """SELECT o_orderstatus, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  CAST(dense_rank() OVER w AS INT) AS drank
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice ASC, o_orderkey ASC)
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "q31_asof_join" ->
      """WITH ord AS (
        |  SELECT o_custkey AS k, o_orderdate AS ots,
        |    max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2),
        |ev AS (SELECT event_id, user_id AS k, ts FROM events
        |       WHERE user_id < 200)
        |SELECT ev.event_id, ev.k AS user_id,
        |  ord.o_orderkey AS asof_orderkey
        |FROM ev ASOF JOIN ord
        |  ON ev.k = ord.k AND ev.ts >= ord.ots
        |ORDER BY event_id""".stripMargin,
    "q30_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_value
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    // the bucketed co-located join must equal the plain file join
    "q36_bucketed_join" ->
      """SELECT o_orderstatus, count(*) AS n_items,
        |  sum(l_quantity) AS sum_qty,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    // the salted two-phase plan must equal the PLAIN group-by — that
    // equality is the point, so the plain form is the oracle
    // q50: per-user hour calendar via generate_series, missing hours
    // by anti-join, the same idx − row_number islands, and the same
    // span/active/gap arithmetic — every outage recomputed
    "q50_activity_gaps" ->
      """WITH hours AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h FROM events),
        |obs AS (SELECT DISTINCT user_id, h FROM hours),
        |spans AS (
        |  SELECT user_id, min(h) AS h0, max(h) AS h1
        |  FROM hours GROUP BY 1),
        |cal AS (
        |  SELECT s.user_id, s.h0,
        |    unnest(generate_series(s.h0, s.h1, INTERVAL 1 HOUR)) AS h
        |  FROM spans s),
        |gaps AS (
        |  SELECT c.user_id,
        |    CAST(date_diff('hour', c.h0, c.h) AS BIGINT) AS idx
        |  FROM cal c LEFT JOIN obs o
        |    ON o.user_id = c.user_id AND o.h = c.h
        |  WHERE o.h IS NULL),
        |runs AS (
        |  SELECT user_id,
        |    idx - row_number() OVER (PARTITION BY user_id
        |      ORDER BY idx) AS grp
        |  FROM gaps),
        |rr AS (
        |  SELECT user_id, grp, count(*) AS run_len
        |  FROM runs GROUP BY 1, 2),
        |rs AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gap_runs,
        |    CAST(max(run_len) AS BIGINT) AS longest_gap
        |  FROM rr GROUP BY 1),
        |act AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS active_hours
        |  FROM obs GROUP BY 1)
        |SELECT s.user_id,
        |  CAST(date_diff('hour', s.h0, s.h1) + 1 AS BIGINT)
        |    AS span_hours,
        |  act.active_hours,
        |  CAST(date_diff('hour', s.h0, s.h1) + 1 - act.active_hours
        |    AS BIGINT) AS gap_hours,
        |  CAST(coalesce(rs.n_gap_runs, 0) AS BIGINT) AS n_gap_runs,
        |  CAST(coalesce(rs.longest_gap, 0) AS BIGINT) AS longest_gap
        |FROM spans s JOIN act ON act.user_id = s.user_id
        |LEFT JOIN rs ON rs.user_id = s.user_id
        |ORDER BY s.user_id""".stripMargin,
    // q49: the flat re-derivation — per-(user, type) counts, per-user
    // profile width, per-type rollup; the engine's map round-trip
    // must land on exactly these numbers
    "q49_map_profile" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT user_id, count(*) AS n_types FROM c GROUP BY 1)
        |SELECT c.event_type, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(c.c) AS BIGINT) AS n_events,
        |  round(avg(w.n_types), 4) AS avg_profile_width
        |FROM c JOIN w ON w.user_id = c.user_id
        |GROUP BY 1 ORDER BY c.event_type""".stripMargin,
    // q48: salting is correctness-invariant, so the plain join + the
    // same per-nation rollup is the oracle
    "q48_salted_join" ->
      """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_rows,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
        |GROUP BY 1 ORDER BY s_nationkey""".stripMargin,
    "q35_salted_agg" ->
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  count(l_orderkey) AS n_rows,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q29_percentiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.5), 3) AS med_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 3) AS p90_price,
        |  round(quantile_cont(l_quantity, 0.25), 2) AS p25_qty
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q26_string_agg" ->
      """SELECT n_name,
        |  string_agg(s_name, ' | ' ORDER BY s_name) AS supplier_list,
        |  count(*) AS n_suppliers
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q27_positional_slice" ->
      """WITH top20 AS (
        |  SELECT * FROM orders ORDER BY o_orderkey ASC LIMIT 20),
        |pos AS (
        |  SELECT CAST(row_number() OVER (ORDER BY o_orderkey ASC) AS INT)
        |      AS pos,
        |    CAST(count(*) OVER () AS INT) AS total,
        |    o_orderkey, o_totalprice
        |  FROM top20)
        |SELECT pos, o_orderkey, o_totalprice FROM pos
        |WHERE pos > 2 AND pos < total ORDER BY pos""".stripMargin,
    "q28_json_extract" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS INT)
        |    / 10.0) AS INT) AS k_bucket,
        |  count(*) AS n_events,
        |  round(avg(value), 2) AS avg_value,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
        |    AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT)
        |    AS max_k
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q01_pruned_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice AS price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_broadcast_join" ->
      """SELECT p_brand, count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q05_star_join" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q06_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '1999-01-01'
        |  AND o_orderdate < TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q07_anti_join" ->
      """SELECT n_name, count(*) AS n_no_order_customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate < TIMESTAMP '1995-04-01')
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q08_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders WHERE o_custkey < 200) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_spend,
        |  coalesce(lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC), -1) AS prev_orderkey
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // q41: the same peer-inclusive VALUE frame — DuckDB's interval
    // range over midnight timestamps ≡ Spark's epoch-second range
    "q41_range_window" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        |  round(sum(o_totalprice) OVER w, 2) AS spend_30d,
        |  CAST(count(*) OVER w AS BIGINT) AS n_orders_30d
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // q42: per-user first-day cohort + distinct-active count per
    // (cohort, offset) — date_diff('day') over DATE casts matches
    // Spark's datediff on the same UTC-truncated days
    "q42_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohort AS (
        |  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT c.cohort_day,
        |  date_diff('day', c.cohort_day, e.day) AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM ev e JOIN cohort c ON c.user_id = e.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
    // q43: the same strictly-ordered step chain — each CTE is the
    // previous frontier's first qualifying later event
    "q43_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT * FROM (
        |  SELECT 'step1_view' AS step, CAST(count(*) AS BIGINT) AS n_users
        |  FROM v
        |  UNION ALL
        |  SELECT 'step2_click', CAST(count(*) AS BIGINT) FROM c
        |  UNION ALL
        |  SELECT 'step3_purchase', CAST(count(*) AS BIGINT) FROM p)
        |ORDER BY step""".stripMargin,
    // q44: the same user-keyed range join + per-conversion 1/n split;
    // CAST(1 AS DOUBLE) keeps the division out of DECIMAL arithmetic
    // (Spark's lit(1.0) is a double)
    "q44_attribution" ->
      """WITH conv AS (
        |  SELECT event_id AS conv_id, user_id, ts AS conv_ts
        |  FROM events WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, event_type AS touch_type, ts AS touch_ts
        |  FROM events
        |  WHERE event_type IN ('click', 'view', 'signup')),
        |pairs AS (
        |  SELECT c.conv_id, t.touch_type, t.touch_ts
        |  FROM conv c JOIN touch t ON t.user_id = c.user_id
        |  WHERE t.touch_ts < c.conv_ts
        |    AND t.touch_ts >= c.conv_ts - INTERVAL 24 HOUR),
        |credited AS (
        |  SELECT touch_type, touch_ts,
        |    CAST(1 AS DOUBLE) / (count(*) OVER (PARTITION BY conv_id))
        |      AS credit
        |  FROM pairs)
        |SELECT touch_type, strftime(touch_ts, '%Y-%m-%d') AS day,
        |  round(sum(credit), 4) AS credit,
        |  CAST(count(*) AS BIGINT) AS n_touches
        |FROM credited GROUP BY 1, 2
        |ORDER BY touch_type, day""".stripMargin,
    // q45: the same contribution-explosion rewrite — each (user, day)
    // feeds the 7 window-days it belongs to; window-days restricted to
    // observed event days
    "q45_rolling_actives" ->
      """WITH du AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE)
        |    AS day
        |  FROM events),
        |cal AS (SELECT DISTINCT day AS wday FROM du),
        |contrib AS (
        |  SELECT du.user_id, du.day + o.off AS wday
        |  FROM du CROSS JOIN
        |    (SELECT CAST(unnest(range(0, 7)) AS INT) AS off) o)
        |SELECT strftime(c.wday, '%Y-%m-%d') AS day,
        |  CAST(count(DISTINCT c.user_id) AS BIGINT) AS active_users
        |FROM contrib c JOIN cal ON cal.wday = c.wday
        |GROUP BY 1 ORDER BY day""".stripMargin,
    // q46: latest-wins replicated as a deterministic row_number over
    // (ts DESC, event_id DESC) — the same winner the struct-max picks
    // (event_id is unique, so the struct comparison never reaches the
    // payload fields). The lifetime sum goes through exact BIGINT
    // cents, mirroring the engine (order-independent — see q46's doc).
    "q46_changelog_compact" ->
      """WITH last AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |agg AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
        |      AS lifetime_value
        |  FROM events GROUP BY 1)
        |SELECT a.user_id, strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
        |  l.event_id AS last_event_id, l.event_type AS last_type,
        |  round(l.value, 2) AS last_value, a.n_events, a.lifetime_value
        |FROM agg a JOIN last l ON l.user_id = a.user_id AND l.rn = 1
        |ORDER BY a.user_id""".stripMargin,
    // q47: the portable long-form equivalent — 4 UNION ALL branches
    // (the engine's unpivot is ONE scan; SQL portability costs 4 here)
    "q47_unpivot_melt" ->
      """WITH long AS (
        |  SELECT l_returnflag, 'l_quantity' AS measure,
        |    l_quantity AS value FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice',
        |    l_extendedprice FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount',
        |    l_discount FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax',
        |    l_tax FROM lineitem)
        |SELECT l_returnflag, measure, round(sum(value), 2) AS total,
        |  round(avg(value), 4) AS mean,
        |  CAST(count(*) AS BIGINT) AS n_rows
        |FROM long GROUP BY 1, 2
        |ORDER BY l_returnflag, measure""".stripMargin,
    "q10_dedup_exact" ->
      """SELECT l_partkey, l_suppkey, min(l_orderkey) AS first_orderkey,
        |  count(*) AS n_dupes
        |FROM lineitem GROUP BY l_partkey, l_suppkey
        |ORDER BY l_partkey, l_suppkey""".stripMargin,
    "q11_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q12_case_when" ->
      """SELECT CASE WHEN l_quantity <= 10 THEN 'small'
        |            WHEN l_quantity <= 30 THEN 'medium'
        |            ELSE 'large' END AS qty_bucket,
        |  count(*) AS n_lines,
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice
        |                 ELSE 0.0 END), 2) AS returned_value,
        |  round(avg(l_discount), 4) AS avg_disc
        |FROM lineitem GROUP BY 1 ORDER BY qty_bucket""".stripMargin,
    "q13_date_functions" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  count(*) AS n_orders,
        |  min(CAST(o_orderdate AS DATE)) AS first_day,
        |  max(CAST(o_orderdate AS DATE)) AS last_day,
        |  round(sum(o_totalprice), 2) AS month_value
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q14_string_functions" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |  length(p_name) AS name_len,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  p_brand || '|' || p_type AS brand_type,
        |  substr(p_name, 1, 3) AS prefix3,
        |  CASE WHEN regexp_matches(p_name, 'gear|bolt') THEN true
        |       ELSE false END AS is_hardware
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,
    "q15_set_ops" ->
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE year(o_orderdate) = 1995),
        |     b AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE year(o_orderdate) = 1996)
        |SELECT 'both_years' AS tag,
        |  CAST((SELECT count(*) FROM (SELECT * FROM a INTERSECT
        |    SELECT * FROM b)) AS BIGINT) AS n
        |UNION ALL SELECT 'only_1995',
        |  CAST((SELECT count(*) FROM (SELECT * FROM a EXCEPT
        |    SELECT * FROM b)) AS BIGINT)
        |UNION ALL SELECT 'either_year',
        |  CAST((SELECT count(*) FROM (SELECT * FROM a UNION
        |    SELECT * FROM b)) AS BIGINT)
        |ORDER BY tag""".stripMargin,
    "q34_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_lines,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus))
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q16_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_lines, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,
    "q17_latest_per_key" ->
      """SELECT o_custkey, CAST(o_orderdate AS DATE) AS latest_order_date,
        |  o_orderkey AS latest_orderkey, o_totalprice AS latest_totalprice
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk FROM orders) t
        |WHERE rk = 1 AND o_custkey < 300 ORDER BY o_custkey""".stripMargin,
    "q18_group_any_filter" ->
      """SELECT l_returnflag, count(*) AS n_lines,
        |  count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem
        |WHERE l_partkey IN (SELECT l_partkey FROM lineitem
        |  GROUP BY l_partkey HAVING max(l_quantity) > 49)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q19_every_downcast" ->
      """SELECT l_returnflag,
        |  bool_and(l_quantity = floor(l_quantity)) AS all_integral,
        |  count(*) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q20_explode_words" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        |GROUP BY word ORDER BY n DESC, word ASC""".stripMargin,
    "q21_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS hour_start,
        |  event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2
        |HAVING hour_start < '2024-01-03 00:00:00'
        |ORDER BY hour_start, event_type""".stripMargin,
    "q22_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC) AS prev_us
        |  FROM events WHERE user_id < 50),
        |m AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_us IS NULL
        |         OR epoch_us(ts) - prev_us > 1800 * 1000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM g),
        |sess AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM m)
        |SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        |  count(*) AS n_events
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q23_pivot_conditional" ->
      """SELECT isodow(ts) AS isodow,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  count(*) AS n_total
        |FROM events GROUP BY 1 ORDER BY isodow""".stripMargin,
    "q25_range_join" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('budget', 0.0, 20000.0), ('mid', 20000.0, 60000.0),
        |  ('premium', 60000.0, 1e18))
        |SELECT band, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS band_value
        |FROM orders JOIN bands
        |  ON o_totalprice >= lo AND o_totalprice < hi
        |GROUP BY band ORDER BY band""".stripMargin,
  )
}
