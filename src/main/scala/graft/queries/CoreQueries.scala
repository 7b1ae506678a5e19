package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Core relational surface of the engine: scan, filter, project, computed
  * columns (Affiliate), grouped aggregation, joins, windows — the SURVEY §2.1,
  * §2.2, §2.4, §2.5, §2.6 operators, expressed as declarative DataFrame plans
  * so Catalyst handles pushdown/pruning/join-strategy.
  *
  * Reference semantics mirrored (citations into /root/reference):
  *   - Filter: Codegen/V1.hs:235-240 — WHERE as a row predicate.
  *   - Project/Affiliate: Planner.hs:153-222 — computed SELECT items.
  *   - Reduce: Codegen/V1.hs:382-456 — grouped aggregation, plain + windowed.
  *   - Interval join: Stream.hs:273-312 — range-scan [ts-before, ts+after].
  */
object CoreQueries extends QueryPack {

  override def queries: Map[String, Q] = Map(
    // §2.1 StreamScan + §2.5 Reduce: TPC-H Q1-style pricing summary.
    // Filter on l_shipdate pushes into the parquet scan (PushedFilters);
    // partial aggregation happens map-side before the 2-key shuffle.
    "q_agg_pricing" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2001-09-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // §2.2 Filter + Project + Affiliate (computed column pre-projection).
    "q_filter_project" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .filter($"event_type" === "purchase" && $"value" > 100.0)
        .select($"event_id", $"user_id",
          round($"value" * lit(2) - lit(1), 4).as("v2"))
        .orderBy($"event_id")
    }),

    // §2.5 unwindowed Reduce with the full agg set (COUNT/SUM/MIN/MAX/AVG).
    "q_agg_unwindowed" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_suppkey")
        .agg(
          count(lit(1)).as("cnt"),
          round(sum($"l_extendedprice"), 2).as("sum_price"),
          round(min($"l_quantity"), 2).as("min_qty"),
          round(max($"l_quantity"), 2).as("max_qty"),
          round(avg($"l_discount"), 6).as("avg_disc"))
        .orderBy($"l_suppkey")
    }),

    // §2.4 equi-join chain; `nation`/`region` are tiny dims → broadcast, so
    // only the orders⋈customer shuffle survives at 100 TB.
    "q_join_revenue_by_nation" -> ((s, dir) => {
      import s.implicits._
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      o.join(c, $"o_custkey" === $"c_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(round(sum($"o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("num_orders"))
        .orderBy($"n_name")
    }),

    // TPC-H Q9-shaped 6-table profit query — the deepest relational chain
    // in the gate, covering the otherwise-unused part/supplier/region
    // tables. Scale shape: part/supplier/nation/region are dims (filters
    // pushed to their scans, then broadcast — supplier⋈nation⋈region
    // collapses into ONE broadcast relation), so the only real shuffles
    // are lineitem⋈orders on orderkey and the final groupBy. Per-row
    // amounts round to 4 dp (identical doubles both engines), then sum as
    // DECIMAL(38,6) — exact and order-independent — before one division-
    // free cast back.
    "q_join_profit_by_nation" -> ((s, dir) => {
      import s.implicits._
      val part = Tables.load(s, dir, "part").filter($"p_type" === "PROMO")
      val supplier = Tables.load(s, dir, "supplier")
      val nation = Tables.load(s, dir, "nation")
      val region = Tables.load(s, dir, "region")
        .filter($"r_name".isin("ASIA", "EUROPE"))
      val suppGeo = supplier
        .join(broadcast(nation.join(broadcast(region),
          $"n_regionkey" === $"r_regionkey")), $"s_nationkey" === $"n_nationkey")
      val amount = round($"l_extendedprice" * (lit(1.0) - $"l_discount")
        - $"p_retailprice" * $"l_quantity" * 0.1, 4)
      Tables.load(s, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .join(broadcast(suppGeo), $"l_suppkey" === $"s_suppkey")
        // No join hint (r15, tested and reverted): at bench scale the
        // planner already picks BroadcastHashJoin for orders (no shuffle
        // of lineitem at all); a SHUFFLE_HASH hint forced the strictly
        // worse shuffle plan (A/B 1.59 → 1.73 s). At 100 TB, where orders
        // outgrows broadcast, the size-based planner degrades to
        // SMJ/shuffled-hash on its own — the adaptive choice is the right
        // one at every scale, so the plan is left to it.
        .join(Tables.load(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .select($"n_name".as("nation"),
          year($"o_orderdate").cast("long").as("o_year"),
          amount.as("amount"))
        .groupBy($"nation", $"o_year")
        .agg(round(sum($"amount".cast("decimal(38,6)")).cast("double"), 2)
          .as("profit"), count(lit(1)).as("n_items"))
        .orderBy($"nation", $"o_year")
    }),

    // §2.6 TUMBLE window (TimeWindows.hs:34-40): 1-day tumbling agg on the
    // event-time column, via Spark's window() — start/end struct matches the
    // reference's serialized TimeWindow {start,end} (Codegen/V1.hs:422-425).
    "q_window_tumble" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 day"))
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("sum_value"))
        .select($"window.start".as("window_start"), $"cnt", $"sum_value")
        .orderBy($"window_start")
    }),

    // §2.6 HOP window (TimeWindows.hs:42-48): size 1h, advance 30m — every
    // record lands in size/advance = 2 windows.
    "q_window_hop" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select($"window.start".as("window_start"), $"cnt")
        .orderBy($"window_start")
    }),

    // §2.6 SESSION window (SessionWindowedStream.hs:93-138): 30-minute gap,
    // merged per key — Spark's session_window implements the same
    // overlap-merge (min start, max end, merged accumulators).
    "q_window_session" -> ((s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("sum_value"))
        .select($"user_id", $"session_window.start".as("session_start"),
          $"cnt", $"sum_value")
        .orderBy($"user_id", $"session_start")
    }),

    // §2.4 interval join (Stream.hs:297 range scan): pairs of events by the
    // same user within ±2 minutes. Equi-key on user_id lets Spark hash-
    // partition; the time bounds become a post-join range predicate — the
    // same plan a stream-stream join with watermarks produces.
    // RESTRUCTURED r15 (guide §1.1 first-principles; equivalence proven by
    // the unchanged DuckDB oracle): the aggregate-over-self-join form
    // materialized every (a, b) pair — O(Σ_user n_u²) rows through a
    // sort-merge join — only to count them per user. The count of ordered
    // pairs is exactly Σ_a (|events within ±2 min of a| − 1), which a
    // RANGE-frame window computes with ONE shuffle on user_id and a
    // two-pointer sliding frame: O(n log n) per user, no pair
    // materialization, no join state. Users with zero pairs are filtered
    // (the inner join never emitted them). The JOIN-shaped plan this row
    // used to carry still runs in the gate as q_interval_join_salted /
    // q_interval_join_left / q_sql_interval_join (same oracle family),
    // so operator coverage is unchanged.
    // Equivalence assumptions of the window-count form (r16, ADVICE):
    // (1) event_id is unique per row, so the `− 1` removes exactly the
    // self-pair that the join's a.event_id <> b.event_id predicate
    // excluded; (2) user_id/ts are non-null — the join's a_user = b_user
    // null-rejected, while partitionBy(user_id) groups NULLs together.
    // The defensive filter below makes (2) hold by construction (it drops
    // rows the join form could never pair), so a future data generation
    // with NULL users/timestamps cannot silently diverge from the oracle.
    "q_interval_join" -> ((s, dir) => {
      import s.implicits._
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-120000000L, 120000000L)
      Tables.load(s, dir, "events")
        .select($"user_id", $"ts")
        .filter($"user_id".isNotNull && $"ts".isNotNull)
        .withColumn("c", count(lit(1)).over(win) - 1)
        .groupBy($"user_id")
        .agg(sum($"c").as("pairs"))
        .filter($"pairs" > 0)
        .orderBy($"user_id")
    }),

    // FUNNEL analysis — the flagship event-analytics shape the reference's
    // user base runs on streams: who progressed view → click → purchase,
    // each step within 24 hours of the previous step's FIRST occurrence.
    // Sequential dependence planned as chained per-step min aggregations
    // (each is a partial-agg shuffle keyed by user_id; the step relations
    // shrink monotonically as users drop out) — no per-user event sort,
    // no collect_list of a user's history anywhere, so a power user with
    // 10M events costs the same as anyone else.
    "q_events_funnel" -> ((s, dir) =>
      funnelFrom(Tables.load(s, dir, "events"))),

    // COHORT RETENTION — funnel's sibling flagship: users grouped by the
    // day they first appeared (cohort), counted again for each later day
    // they returned. Shape: per-user first-day is a partial-agg min; per-(user,
    // day) activity is a distinct projection; the join back keys on
    // user_id and the final count groups by (cohort_day, day_offset) —
    // three key-partitioned shuffles, no windows, no per-user history.
    "q_events_retention" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", to_date($"ts").as("d"))
      val cohort = ev.groupBy($"user_id").agg(min($"d").as("c0"))
      val active = ev.distinct()
      active.join(cohort, "user_id")
        .groupBy($"c0".as("cohort_day"),
          datediff($"d", $"c0").cast("long").as("day_offset"))
        .agg(count_distinct($"user_id").as("n_users"))
        .orderBy($"cohort_day", $"day_offset")
    }),

    // A/B EXPERIMENT analysis — the third member of the event-analytics
    // pack (funnel, retention, experiment): users assign to variants by a
    // deterministic hash (reproducible bucketing — the same reason
    // q_curation_sample refuses rand()), conversion = a purchase within
    // 24 h of the user's first view, and every reported number is an
    // exact integer or a single terminal round — counts and DECIMAL-free
    // cent sums survive any partial-agg order. Shapes: per-user min,
    // one semi-join-like distinct, two tiny groupBys keyed by variant.
    "q_events_experiment" -> ((s, dir) => {
      import s.implicits._
      val variant = when(pmod(graft.functions.PipelineFunctions.hash32(
        concat(lit("exp1"), $"user_id".cast("string"))), lit(2L)) === 0,
        "control").otherwise("treatment")
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", $"ts", $"value",
          variant.as("variant"))
      val entered = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"variant").agg(min($"ts").as("t1"))
      val converted = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts")
        .join(entered, Seq("user_id"))
        .filter($"ts" > $"t1" && $"ts" <= $"t1" + expr("INTERVAL 24 HOURS"))
        .select($"user_id", $"variant").distinct()
      val conv = converted.groupBy($"variant")
        .agg(count(lit(1)).as("n_converted"))
      val spend = ev.filter($"event_type" === "purchase")
        .groupBy($"variant")
        .agg(sum(round($"value" * 100)).cast("long").as("purchase_cents"),
          count(lit(1)).as("n_purchases"))
      entered.groupBy($"variant").agg(count(lit(1)).as("n_users"))
        .join(conv, Seq("variant"), "left")
        .join(spend, Seq("variant"), "left")
        .select($"variant", $"n_users",
          coalesce($"n_converted", lit(0L)).as("n_converted"),
          round(coalesce($"n_converted", lit(0L)).cast("double") / $"n_users", 6)
            .as("conv_rate"),
          coalesce($"purchase_cents", lit(0L)).as("purchase_cents"),
          coalesce($"n_purchases", lit(0L)).as("n_purchases"))
        .orderBy($"variant")
    }),

    // §2.4 LEFT interval join honoring the declared join type (the reference
    // V1 engine drops it — Codegen/V1.hs:301; we match V2/diffflow semantics,
    // DiffFlow/Types.hs:323-328).
    "q_interval_join_left" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val a = e.filter($"event_type" === "click")
        .select($"user_id".as("a_user"), $"ts".as("a_ts"), $"event_id".as("a_id"))
      val b = e.filter($"event_type" === "purchase")
        .select($"user_id".as("b_user"), $"ts".as("b_ts"), $"event_id".as("b_id"))
      a.join(b, $"a_user" === $"b_user"
          && $"b_ts" >= $"a_ts" && $"b_ts" <= $"a_ts" + expr("INTERVAL 10 MINUTES"),
          "left")
        .groupBy($"a_id")
        .agg(count($"b_id").as("purchases_within_10m"))
        .orderBy($"a_id")
    }),

    // Skew-resistant form of q_interval_join: the hot key's pairs are spread
    // over SALT partitions by salting side A and replicating side B once per
    // salt. Same oracle as q_interval_join — identical results, different
    // physical distribution. At 100 TB this is the shape that survives a
    // power-law user distribution (one user = one partition otherwise).
    "q_interval_join_salted" -> ((s, dir) => {
      import s.implicits._
      val SALT = 8
      val e = Tables.load(s, dir, "events")
      val a = e.select($"user_id".as("a_user"), $"ts".as("a_ts"),
          $"event_id".as("a_id"))
        .withColumn("a_salt", pmod($"a_id", lit(SALT)).cast("int"))
      val b = e.select($"user_id".as("b_user"), $"ts".as("b_ts"),
          $"event_id".as("b_id"))
        .withColumn("b_salt", explode(sequence(lit(0), lit(SALT - 1)).cast("array<int>")))
      a.join(b, $"a_user" === $"b_user" && $"a_salt" === $"b_salt"
          && $"a_id" =!= $"b_id"
          && $"b_ts" >= $"a_ts" - expr("INTERVAL 2 MINUTES")
          && $"b_ts" <= $"a_ts" + expr("INTERVAL 2 MINUTES"))
        .groupBy($"a_user")
        .agg(count(lit(1)).as("pairs"))
        .select($"a_user".as("user_id"), $"pairs")
        .orderBy($"user_id")
    }),

    // Beyond-reference §2.4 extension: point-in-time (as-of) join — each
    // click picks the user's single LATEST purchase at-or-before its ts
    // (the feature-store lookup shape; the reference grammar stops at
    // INTERVAL joins, Stream.hs:273-312). Union-trick plan: ONE shuffle on
    // user_id, running last() fills forward — no range self-join, no row
    // explosion, unmatched clicks keep null purchase columns.
    "q_join_asof" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts",
          round($"value", 4).as("click_value"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          round($"value", 4).as("purchase_value"), $"ts".as("purchase_ts"))
      graft.operators.AsofJoin.backward(clicks, purchases,
          "user_id", "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_ts"))
        .orderBy($"event_id")
    }),

    // FORWARD as-of: each click picks the user's NEXT purchase at-or-after
    // its ts — time-to-next-conversion enrichment, the mirror direction
    // (pandas merge_asof direction='forward'); same union-trick single
    // shuffle, FOLLOWING frame instead of PRECEDING.
    "q_join_asof_forward" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts",
          round($"value", 4).as("click_value"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          round($"value", 4).as("purchase_value"), $"ts".as("purchase_ts"))
      graft.operators.AsofJoin.forward(clicks, purchases,
          "user_id", "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_ts"))
        .orderBy($"event_id")
    }),

    // NEAREST as-of — the third merge_asof direction: each click picks
    // whichever purchase is closer in time, before or after (backward
    // wins ties, the pandas convention). Composed from the two directed
    // picks joined on the left key — each is one shuffle, the final
    // choice is a per-row CASE; no new operator machinery needed, which
    // is the point of having both directions.
    "q_join_asof_nearest" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts",
          round($"value", 4).as("click_value"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          round($"value", 4).as("purchase_value"), $"ts".as("purchase_ts"))
      val back = graft.operators.AsofJoin.backward(clicks, purchases,
          "user_id", "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_ts"))
        .select($"event_id", $"user_id", $"ts", $"click_value",
          $"purchase_value".as("bv"), $"purchase_ts".as("bts"))
      val fwd = graft.operators.AsofJoin.forward(clicks, purchases,
          "user_id", "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_ts"))
        .select($"event_id", $"purchase_value".as("fv"),
          $"purchase_ts".as("fts"))
      val backWins = $"fts".isNull ||
        ($"bts".isNotNull &&
          unix_micros($"ts") - unix_micros($"bts") <=
            unix_micros($"fts") - unix_micros($"ts"))
      back.join(fwd, "event_id")
        .select($"event_id", $"user_id", $"ts", $"click_value",
          when(backWins, $"bv").otherwise($"fv").as("purchase_value"),
          when(backWins, $"bts").otherwise($"fts").as("purchase_ts"))
        .orderBy($"event_id")
    }),

    // Skew-safe form of q_join_asof (same oracle — identical results):
    // time cut into 1-day buckets, so the sort granularity is (user, day)
    // instead of one user's ENTIRE history. At 100 TB a power-law user is
    // years of events — the exact form makes that one un-splittable sort
    // task; this form bounds every sort group by the bucket width.
    "q_join_asof_bucketed" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"ts",
          round($"value", 4).as("click_value"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts",
          round($"value", 4).as("purchase_value"), $"ts".as("purchase_ts"))
      graft.operators.AsofJoin.backwardBucketed(clicks, purchases,
          "user_id", "user_id", "ts", "ts",
          Seq("purchase_value", "purchase_ts"), bucket = 86400L)
        .orderBy($"event_id")
    }),

    // §2.7 Distinct (plan node Planner.hs:48; unsupported in ref V1, we
    // support it) + Union (Planner.hs:54).
    "q_distinct_union" -> ((s, dir) => {
      import s.implicits._
      val e = Tables.load(s, dir, "events")
      val clicks = e.filter($"event_type" === "click").select($"user_id")
      val views = e.filter($"event_type" === "view").select($"user_id")
      clicks.union(views).distinct().orderBy($"user_id")
    })
  )

  /** The batch funnel pipeline (shared by the q_events_funnel gate and the
    * ScaleProbe row): chained per-step min aggregations — see the gate
    * entry's design notes. */
  private[graft] def funnelFrom(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val ev = events.select($"user_id", $"event_type", $"ts")
      val s1 = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val s2 = ev.filter($"event_type" === "click").join(s1, "user_id")
        .filter($"ts" > $"t1" && $"ts" <= $"t1" + expr("INTERVAL 24 HOURS"))
        .groupBy($"user_id").agg(min($"ts").as("t2"))
      val s3 = ev.filter($"event_type" === "purchase").join(s2, "user_id")
        .filter($"ts" > $"t2" && $"ts" <= $"t2" + expr("INTERVAL 24 HOURS"))
        .groupBy($"user_id").agg(min($"ts").as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .select($"user_id", $"t1", $"t2", $"t3",
          when($"t3".isNotNull, 3L).when($"t2".isNotNull, 2L)
            .otherwise(1L).as("reached"))
        .orderBy($"user_id")
  }

  override def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         round(avg(l_discount),6) AS avg_disc,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         GROUP BY 1,2 ORDER BY 1,2""",
    "q_filter_project" ->
      """SELECT event_id, user_id, round(value*2-1,4) AS v2 FROM events
         WHERE event_type = 'purchase' AND value > 100.0 ORDER BY event_id""",
    "q_agg_unwindowed" ->
      """SELECT l_suppkey, count(*) AS cnt,
         round(sum(l_extendedprice),2) AS sum_price,
         round(min(l_quantity),2) AS min_qty,
         round(max(l_quantity),2) AS max_qty,
         round(avg(l_discount),6) AS avg_disc
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_join_revenue_by_nation" ->
      """SELECT n_name, round(sum(o_totalprice),2) AS revenue,
         count(*) AS num_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1 ORDER BY 1""",
    "q_join_profit_by_nation" ->
      """SELECT n_name AS nation, year(o_orderdate)::BIGINT AS o_year,
         round(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount)
             - p_retailprice * l_quantity * 0.1, 4) AS DECIMAL(38,6)))
           AS DOUBLE), 2) AS profit,
         count(*) AS n_items
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
           AND r_name IN ('ASIA', 'EUROPE')
         JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_window_tumble" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT date_trunc('day', ts) AS window_start, count(*) AS cnt,
         round(sum(value),2) AS sum_value
         FROM ev GROUP BY 1 ORDER BY 1""",
    "q_window_hop" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT ws AS window_start, count(*) AS cnt FROM (
           SELECT time_bucket(INTERVAL '30 minutes', ts)
                  - k * (INTERVAL '30 minutes') AS ws
           FROM ev CROSS JOIN (VALUES (0),(1)) t(k))
         GROUP BY 1 ORDER BY 1""",
    "q_window_session" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         marked AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
           FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         numbered AS (
           SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts) AS sid
           FROM marked)
         SELECT user_id, min(ts) AS session_start, count(*) AS cnt,
           round(sum(value),2) AS sum_value
         FROM numbered GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "q_interval_join" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.user_id AS user_id, count(*) AS pairs
         FROM ev a JOIN ev b ON a.user_id = b.user_id
           AND a.event_id <> b.event_id
           AND b.ts >= a.ts - INTERVAL '2 minutes'
           AND b.ts <= a.ts + INTERVAL '2 minutes'
         GROUP BY 1 ORDER BY 1""",
    "q_events_experiment" ->
      """WITH ev AS (SELECT user_id, event_type, ts::TIMESTAMP AS ts, value,
             CASE WHEN ('0x' || substr(md5('exp1' || user_id::VARCHAR), 1, 8))
                       ::BIGINT % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS variant
           FROM events),
         entered AS (SELECT user_id, variant, min(ts) AS t1 FROM ev
                     WHERE event_type = 'view' GROUP BY user_id, variant),
         converted AS (SELECT DISTINCT e.user_id, en.variant
                       FROM ev e JOIN entered en USING (user_id)
                       WHERE e.event_type = 'purchase' AND e.ts > en.t1
                         AND e.ts <= en.t1 + INTERVAL '24 hours'),
         conv AS (SELECT variant, count(*) AS n_converted
                  FROM converted GROUP BY variant),
         spend AS (SELECT variant,
                     sum(round(value * 100))::BIGINT AS purchase_cents,
                     count(*) AS n_purchases
                   FROM ev WHERE event_type = 'purchase' GROUP BY variant),
         users AS (SELECT variant, count(*) AS n_users
                   FROM entered GROUP BY variant)
         SELECT u.variant, n_users,
           coalesce(n_converted, 0) AS n_converted,
           round(coalesce(n_converted, 0)::DOUBLE / n_users, 6) AS conv_rate,
           coalesce(purchase_cents, 0) AS purchase_cents,
           coalesce(n_purchases, 0) AS n_purchases
         FROM users u LEFT JOIN conv USING (variant)
         LEFT JOIN spend USING (variant)
         ORDER BY variant""",
    "q_events_retention" ->
      """WITH ev AS (SELECT user_id, (ts::TIMESTAMP)::DATE AS d FROM events),
         cohort AS (SELECT user_id, min(d) AS c0 FROM ev GROUP BY user_id),
         active AS (SELECT DISTINCT user_id, d FROM ev)
         SELECT c0 AS cohort_day, (d - c0)::BIGINT AS day_offset,
           count(DISTINCT user_id) AS n_users
         FROM active JOIN cohort USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_events_funnel" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         s1 AS (SELECT user_id, min(ts) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.ts) AS t2
                FROM ev e JOIN s1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > t1
                  AND e.ts <= t1 + INTERVAL '24 hours'
                GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.ts) AS t3
                FROM ev e JOIN s2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > t2
                  AND e.ts <= t2 + INTERVAL '24 hours'
                GROUP BY e.user_id)
         SELECT s1.user_id, t1, t2, t3,
           (CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                 ELSE 1 END)::BIGINT AS reached
         FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
         ORDER BY user_id""",
    "q_interval_join_left" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.event_id AS a_id, count(b.event_id) AS purchases_within_10m
         FROM (SELECT * FROM ev WHERE event_type='click') a
         LEFT JOIN (SELECT * FROM ev WHERE event_type='purchase') b
           ON a.user_id = b.user_id AND b.ts >= a.ts
           AND b.ts <= a.ts + INTERVAL '10 minutes'
         GROUP BY 1 ORDER BY 1""",
    "q_distinct_union" ->
      """SELECT DISTINCT user_id FROM (
           SELECT user_id FROM events WHERE event_type='click'
           UNION ALL
           SELECT user_id FROM events WHERE event_type='view')
         ORDER BY user_id""",
    "q_join_asof" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         c AS (SELECT event_id, user_id, ts, round(value,4) AS click_value
               FROM ev WHERE event_type='click'),
         p AS (SELECT user_id, ts AS pts, round(value,4) AS purchase_value
               FROM ev WHERE event_type='purchase')
         SELECT c.event_id, c.user_id, c.ts, c.click_value,
           p.purchase_value, p.pts AS purchase_ts
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts >= p.pts
         ORDER BY c.event_id""",
    "q_join_asof_forward" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         c AS (SELECT event_id, user_id, ts, round(value,4) AS click_value
               FROM ev WHERE event_type='click'),
         p AS (SELECT user_id, ts AS pts, round(value,4) AS purchase_value
               FROM ev WHERE event_type='purchase')
         SELECT c.event_id, c.user_id, c.ts, c.click_value,
           p.purchase_value, p.pts AS purchase_ts
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts <= p.pts
         ORDER BY c.event_id""",
    "q_join_asof_nearest" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         c AS (SELECT event_id, user_id, ts, round(value,4) AS click_value
               FROM ev WHERE event_type='click'),
         p AS (SELECT user_id, ts AS pts, round(value,4) AS purchase_value
               FROM ev WHERE event_type='purchase'),
         b AS (SELECT c.event_id, c.user_id, c.ts, c.click_value,
                 p.purchase_value AS bv, p.pts AS bts
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts >= p.pts),
         f AS (SELECT c.event_id, p.purchase_value AS fv, p.pts AS fts
               FROM c ASOF LEFT JOIN p
                 ON c.user_id = p.user_id AND c.ts <= p.pts)
         SELECT b.event_id, b.user_id, b.ts, b.click_value,
           CASE WHEN fts IS NULL
                  OR (bts IS NOT NULL AND (b.ts - bts) <= (fts - b.ts))
                THEN bv ELSE fv END AS purchase_value,
           CASE WHEN fts IS NULL
                  OR (bts IS NOT NULL AND (b.ts - bts) <= (fts - b.ts))
                THEN bts ELSE fts END AS purchase_ts
         FROM b JOIN f USING (event_id) ORDER BY event_id""",
    // identical result contract as the exact as-of join — that's the point
    "q_join_asof_bucketed" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events),
         c AS (SELECT event_id, user_id, ts, round(value,4) AS click_value
               FROM ev WHERE event_type='click'),
         p AS (SELECT user_id, ts AS pts, round(value,4) AS purchase_value
               FROM ev WHERE event_type='purchase')
         SELECT c.event_id, c.user_id, c.ts, c.click_value,
           p.purchase_value, p.pts AS purchase_ts
         FROM c ASOF LEFT JOIN p
           ON c.user_id = p.user_id AND c.ts >= p.pts
         ORDER BY c.event_id""",
    // identical result contract as the unsalted join — that's the point
    "q_interval_join_salted" ->
      """WITH ev AS (SELECT * REPLACE (ts::TIMESTAMP AS ts) FROM events)
         SELECT a.user_id AS user_id, count(*) AS pairs
         FROM ev a JOIN ev b ON a.user_id = b.user_id
           AND a.event_id <> b.event_id
           AND b.ts >= a.ts - INTERVAL '2 minutes'
           AND b.ts <= a.ts + INTERVAL '2 minutes'
         GROUP BY 1 ORDER BY 1"""
  )
}
