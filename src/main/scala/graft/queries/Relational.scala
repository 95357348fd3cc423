package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational operator inventory (SURVEY.md §2 A/D/E/F/G/H/I + §2 L
  * extensions) expressed Spark-first over the driver's TPC-H-ish tables.
  *
  * Design rules applied to every query here:
  *   - filters/projections phrased so Catalyst pushes them into the Parquet
  *     scan (`PushedFilters`, pruned `ReadSchema`);
  *   - dimension sides of joins are `broadcast()` when they are dimension
  *     scale (region/nation/customer/orders ≪ fact), so the fact table never
  *     shuffles for enrichment — the exact Spark answer to the reference's
  *     batched UPDATE-join (database_manager.py:200-241);
  *   - no global sorts except on already-aggregated (small) results — output
  *     ordering exists only to make the oracle hash deterministic;
  *   - double-typed aggregates are `round()`ed so Spark's and the oracle's
  *     floating-point summation order cannot flip the hash.
  */
object Relational {

  /** A1/G-family — TPC-H Q1-style pricing summary: scan-filter-agg with
    * map-side partial aggregation; the shipdate predicate is pushed to
    * Parquet row-group stats. */
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** E-family — fact ⋈ dim ⋈ dim star join; customer and orders are the
    * small sides. orders(150k rows @sf0.1) joins lineitem on the shuffle-free
    * broadcast path; at true 100 TB scale orders stops being broadcastable
    * and AQE picks sort-merge on the co-partitioned key instead — the query
    * text does not change. */
  def q02RevenueBySegment(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    val c = Tables(spark, dir, "customer")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("c_mktsegment"))
  }

  /** E1/D5 — the reference's only real query (database_manager.py:200-241):
    * enrichment left-join assigning the dim's surrogate key to fact rows,
    * null-guarded. The reference's 50-key batched UPDATE loop collapses to
    * one broadcast hash join done at read time; nothing is mutated. */
  def q03EnrichLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    // spreadScan: the broadcast probe + full-width global sort are the
    // cost here, and both parallelize (A/B-measured win, guide §2.5)
    val fact = graft.Tables.spreadScan(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val dim = Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    fact
      .join(broadcast(dim), col("l_orderkey") === col("o_orderkey"), "left")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        coalesce(col("o_custkey"), lit(-1L)).as("enriched_custkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** G1/G2 — high-water marks with the first-run NULL fixed via coalesce
    * (the reference crashes when fact is empty, SURVEY.md §3.3; we return
    * 0). The empty-side max exercises agg-over-zero-rows semantics. */
  def q04HighWater(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem")
    val dimMax = o.agg(coalesce(max(col("o_orderkey")), lit(0L)).as("hw_dim"))
    val factMax = li.filter(col("l_orderkey") < 0)
      .agg(coalesce(max(col("l_orderkey")), lit(0L)).as("hw_fact"))
    dimMax.crossJoin(factMax)
  }

  /** F-family — set difference as a left-anti join (the Spark phrasing of
    * the reference's `set(required) - set(present)` check, F1/F2): orders
    * that have no lineitem. Anti join broadcasts nothing here — both sides
    * hash-partition on the key; at 100 TB this is the shuffle we accept. */
  def q05AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val li = Tables(spark, dir, "lineitem").select(col("l_orderkey"))
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** H4/J3 — surrogate-key assignment: PG sequence semantics rebuilt as
    * row_number over a deterministic order. Single-partition window by
    * design: ONLY ever run on dimension tables (one row per simulation /
    * order-day slice). Fact-side row ids use monotonically_increasing_id
    * instead (see pipeline.Load) — never a global window at 100 TB. */
  def q06DimNumbering(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.orderBy(col("o_orderdate"), col("o_orderkey"))
    val dim = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    // same dim-only contract (and guard) as Enrich.numberDim. The
    // urgent-orders slice is a stand-in dim that GROWS with sf; past
    // the cap (~sf 3.5) the guard throws BY DESIGN — that is the point
    // where global row numbering stops being the right tool and the
    // fact-side monotonically_increasing_id path takes over
    graft.ops.Enrich.requireDimSized(dim, graft.ops.Enrich.DimRowCap,
      "q06DimNumbering")
    dim
      .withColumn("sim_num", row_number().over(w))
      .orderBy(col("o_orderkey"))
      .select(col("o_orderkey"), col("sim_num"))
  }

  /** B4/B5/H1-H3 — ledger-style duration computation: per user, first/last
    * event and elapsed seconds (`extract(epoch from (finished-started))` →
    * unix_timestamp delta). Epochs floored to whole seconds on both engines
    * so ns-vs-µs timestamp precision cannot skew the hash. */
  def q07LedgerDurations(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.groupBy(col("user_id"))
      .agg(
        unix_timestamp(min(col("ts"))).as("started_epoch"),
        unix_timestamp(max(col("ts"))).as("finished_epoch"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_seconds",
        col("finished_epoch") - col("started_epoch"))
      .orderBy(col("user_id"))
  }

  /** D5 — null + half-open-range conjunction: lineitems whose part is NOT in
    * the large-size dim slice (null side of an outer join) within a key
    * window, mirroring `fs.simulation_num is null and dr.simulation_num >
    * lo and <= hi`. */
  def q08NullRangeFilter(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val p = Tables(spark, dir, "part").filter(col("p_size") > 40)
      .select(col("p_partkey"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
      .filter(col("p_partkey").isNull &&
        col("l_partkey") > 50 && col("l_partkey") <= 1500)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  /** D6 — LIKE / NOT LIKE predicates (pg_indexes filter analogue); both
    * push down as StringContains/StringStartsWith. */
  def q09LikeFilter(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    p.filter(col("p_type").like("%ROMO%") && !col("p_name").like("small%"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        round(avg(col("p_retailprice")), 4).as("avg_price"))
      .orderBy(col("p_brand"))
  }

  /** I-family — global top-k: TakeOrderedAndProject, i.e. per-partition
    * heap + driver merge of k rows, never a full sort of the fact table. */
  def q10TopK(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** G-family — distinct aggregation (expand + two-phase agg under the
    * hood) plus its scalable companion approx_count_distinct is used in
    * Bench; the oracle checks the exact variant. */
  def q11DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** Grouping-sets family — ROLLUP region → nation with the subtotal rows
    * labelled '(all)' so null-ordering differences between engines cannot
    * affect the hash. */
  def q12Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val n = Tables(spark, dir, "nation")
    val r = Tables(spark, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("(all)")).as("region"),
        coalesce(col("n_name"), lit("(all)")).as("nation"),
        col("n_customers"), col("sum_bal"))
      .orderBy(col("region"), col("nation"))
  }

  /** E-family — semi join (EXISTS): customers with ≥1 urgent order. The
    * semi join needs only the key column of the probe side — Catalyst
    * prunes orders to one column before the shuffle. */
  def q13SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** F-family — UNION ALL of heterogeneous sources normalized to one
    * schema, then re-aggregated; the union is a narrow (no-shuffle) op. */
  def q14UnionAll(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables(spark, dir, "supplier")
      .select(lit("supplier").as("side"), col("s_acctbal").as("acctbal"))
    val c = Tables(spark, dir, "customer")
      .select(lit("customer").as("side"), col("c_acctbal").as("acctbal"))
    s.unionAll(c)
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("acctbal")), 2).as("sum_bal"))
      .orderBy(col("side"))
  }

  /** Subquery family — scalar subquery: customers above global average
    * balance. Spark plans the scalar agg as a broadcast single-row
    * subquery; no per-row recomputation. */
  def q15SubqueryAvg(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val avgBal = c.agg(avg(col("c_acctbal")).as("g")).select(col("g"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("g"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_above_avg"))
      .orderBy(col("c_mktsegment"))
  }

  /** Window family — running revenue per customer ordered by (date, key):
    * partitioned window, so it scales horizontally with the number of
    * customers; the frame is rows-unbounded-preceding (streaming-friendly
    * prefix sum). */
  def q16RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.filter(col("o_custkey") <= 200)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"),
        row_number().over(w).as("order_seq"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Streaming-window family (batch shape) — tumbling 1h event-time window
    * via window(); identical code runs under readStream + watermark (see
    * graft.streaming). Window starts exported as epoch seconds so the
    * oracle's ns timestamps hash identically. */
  def q17TumblingWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start_epoch"), col("event_type"))
  }

  /** Sliding 1h window, 30m slide — each event lands in exactly 2 windows;
    * Spark expands via the Expand operator before the hash agg. */
  def q18SlidingWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start_epoch"))
  }

  /** Session windows (30m inactivity gap) per user — batch shape of
    * session_window; the oracle reproduces it with gaps-and-islands SQL.
    * Session bounds exported as floored epoch seconds (ns-safe). */
  def q19SessionWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start_epoch"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start_epoch"))
  }

  /** JSON scalar family — events.props is a JSON string column; extract a
    * field with get_json_object and aggregate on it. JSON stays opaque in
    * storage (schema-on-read), the Spark-idiomatic answer to the
    * reference's parse-at-ingest pydantic step. */
  def q20JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
    e.select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull && col("k") % 10 === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))
  }

  /** q66: the skew-salted join ([[graft.ops.Skew.saltedJoin]]) under the
    * oracle gate — fact⋈dim on the supplier key with the fact side salted
    * 8 ways and the dim side replicated per salt. Semantically identical
    * to the plain equi-join (which is exactly what the oracle runs); the
    * payoff is the shuffle shape: the hottest join key's partition
    * shrinks ~8×, the tool of record when one key is so hot that even
    * AQE's split partitions exceed executor memory. */
  def q66SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    graft.ops.Skew.saltedJoin(li, sup, "l_suppkey", factor = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("s_nationkey"))
  }

  val q66Oracle: String =
    """SELECT s_nationkey, count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
       FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       GROUP BY s_nationkey ORDER BY s_nationkey"""
}
