package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TopK

/** Second analytics family: grouping-set variants, exact percentiles,
  * date arithmetic, string/array scalar-function coverage, and the SQL
  * front door (temp views + spark.sql with a correlated subquery) —
  * rounding out SURVEY.md §2 L's "absent in reference" inventory. */
object Analytics {

  /** CUBE over (priority, status): all four grouping-set combinations,
    * subtotals labelled so null-ordering can't skew the hash. */
  def q34Cube(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("n"), col("sum_price"))
      .orderBy(col("priority"), col("status"))
  }

  val q34Oracle: String =
    """SELECT coalesce(o_orderpriority, '(all)') AS priority,
       coalesce(o_orderstatus, '(all)') AS status,
       count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
       FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
       ORDER BY priority, status"""

  /** Exact discrete percentiles per group, via integer rank selection
    * (value at row ⌈q·n⌉ of the sorted group). Interpolated percentiles
    * average two neighbors and land on .xx5 midpoints — a cross-engine
    * rounding coin flip — so the discrete form is the hash-stable exact
    * surface; approx_percentile (q40) is the sketch twin.
    *
    * Scale: the naive plan (row_number window per stratum) funnels every
    * stratum — 3 distinct return flags — through one reducer sort chain:
    * a near-global sort at 100×. This is the two-phase exact form
    * instead: phase 1 aggregates a coarse per-(stratum, value-bucket)
    * histogram — map-side combinable, result rows bounded by strata ×
    * price domain / bucket width, never corpus size — and the driver
    * locates, per stratum, the single bucket containing each target rank
    * plus the count of rows in buckets strictly below it. Phase 2
    * broadcast-joins those target buckets back and windows ONLY the rows
    * inside them (≈ n/buckets of the stratum): the value at global rank
    * r is the row with local rank r − offset inside its bucket, because
    * every row in a lower bucket is strictly smaller and ties (equal
    * values) can never straddle a bucket boundary. Exact by
    * construction at any scale; worst case (all values in one bucket)
    * degrades to the naive window, never to a wrong answer. */
  def q35Percentile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val bucketed = li.withColumn("bkt",
      floor(col("l_extendedprice") / 1000.0).cast("long"))
    // phase 1: coarse histogram (tiny) → per-stratum target buckets
    val hist = bucketed.groupBy(col("l_returnflag"), col("bkt"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // rows below `bkt` = offset; rank r lives in the first bucket whose
    // cumulative count reaches r
    def locate(sorted: Seq[(Long, Long)], r: Long): (Long, Long) = {
      var cum = 0L
      var found: Option[(Long, Long)] = None
      val it = sorted.iterator
      while (found.isEmpty && it.hasNext) {
        val (b, c) = it.next()
        if (r <= cum + c) found = Some((b, cum)) else cum += c
      }
      found.getOrElse(throw new IllegalStateException(
        s"rank $r exceeds stratum size $cum"))
    }
    val targets = hist.groupBy(_._1).toSeq.flatMap { case (flag, rows) =>
      val sorted = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val n = sorted.map(_._2).sum
      Seq("p50" -> math.ceil(0.5 * n).toLong,
          "p95" -> math.ceil(0.95 * n).toLong).map { case (qn, r) =>
        val (bkt, offset) = locate(sorted, r)
        (flag, qn, bkt, offset, r, n)
      }
    }
    val targetDf = spark.createDataFrame(targets)
      .toDF("l_returnflag", "q", "bkt", "offset", "rank", "n")
    // phase 2: window only the bracketed buckets' rows
    val w = Window.partitionBy(col("l_returnflag"), col("q"), col("bkt"))
      .orderBy(col("l_extendedprice"))
    bucketed.join(broadcast(targetDf), Seq("l_returnflag", "bkt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("offset") + col("rn") === col("rank"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(when(col("q") === "p50", col("l_extendedprice"))).as("p50"),
        max(when(col("q") === "p95", col("l_extendedprice"))).as("p95"),
        max(col("n")).as("n"))
      .orderBy(col("l_returnflag"))
  }

  val q35Oracle: String =
    """WITH s AS (
         SELECT l_returnflag, l_extendedprice,
           row_number() OVER (PARTITION BY l_returnflag
             ORDER BY l_extendedprice) AS rn,
           count(*) OVER (PARTITION BY l_returnflag) AS n
         FROM lineitem)
       SELECT l_returnflag,
         max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
           THEN l_extendedprice END) AS p50,
         max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
           THEN l_extendedprice END) AS p95,
         max(n) AS n
       FROM s GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** Date arithmetic family: month truncation, day-diff vs a fixed epoch
    * date, extraction. */
  def q36DateArith(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.select(
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"),
        year(col("o_orderdate")).as("yr"),
        col("o_totalprice"))
      .groupBy(col("order_month"), col("yr"))
      .agg(count(lit(1)).as("n"),
        min(col("days_since")).as("min_days_since"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("order_month"))
  }

  val q36Oracle: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       CAST(year(o_orderdate) AS INT) AS yr,
       count(*) AS n,
       CAST(min(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS INT) AS min_days_since,
       round(sum(o_totalprice), 2) AS sum_price
       FROM orders GROUP BY 1, 2 ORDER BY order_month"""

  /** String scalar-function family: case mapping, substring, concat,
    * replace, trim, length — all codegen'd built-ins. */
  def q37StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    p.select(
        col("p_partkey"),
        upper(col("p_name")).as("uname"),
        substring(col("p_name"), 1, 3).as("prefix"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
        length(col("p_name")).as("name_len"))
      .orderBy(col("p_partkey"))
  }

  val q37Oracle: String =
    """SELECT p_partkey, upper(p_name) AS uname,
       substring(p_name, 1, 3) AS prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       length(p_name) AS name_len
       FROM part ORDER BY p_partkey"""

  /** Array function family over the embedding vectors: size, element
    * access, slicing, element-wise aggregate fold (float widened to
    * double before any arithmetic, matching the oracle's cast). */
  def q38ArrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    val dvec = col("embedding").cast("array<double>")
    e.select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        round(element_at(dvec, 1), 4).as("first_elem"),
        round(aggregate(dvec, lit(0.0), (acc, x) => acc + x), 4).as("sum_elems"),
        round(array_max(slice(dvec, 1, 8)), 4).as("max_first8"))
      .orderBy(col("vec_id"))
  }

  val q38Oracle: String =
    """SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
       round(list_sum(CAST(embedding AS DOUBLE[])), 4) AS sum_elems,
       round(list_max(CAST(embedding[1:8] AS DOUBLE[])), 4) AS max_first8
       FROM embeddings ORDER BY vec_id"""

  /** SQL front door: temp views + spark.sql with a correlated EXISTS
    * subquery (decorrelated by Catalyst into a join). */
  def q39CorrelatedSql(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "customer").createOrReplaceTempView("v_customer")
    Tables(spark, dir, "orders").createOrReplaceTempView("v_orders")
    spark.sql(
      """SELECT c_mktsegment, count(*) AS n_loyal
        |FROM v_customer c
        |WHERE (SELECT count(*) FROM v_orders o
        |       WHERE o.o_custkey = c.c_custkey) >= 3
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
  }

  val q39Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_loyal
       FROM customer c
       WHERE (SELECT count(*) FROM orders o
              WHERE o.o_custkey = c.c_custkey) >= 3
       GROUP BY c_mktsegment ORDER BY c_mktsegment"""

  /** Set-operation family: INTERSECT and EXCEPT (both distinct
    * semantics), tagged and unioned into one result. */
  def q43SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
    val highBal = c.filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("key"))
    val withOrders = o.select(col("o_custkey").as("key"))
    val both = highBal.intersect(withOrders)
      .select(lit("both").as("side"), col("key"))
    val only = highBal.except(withOrders)
      .select(lit("no_orders").as("side"), col("key"))
    both.unionAll(only).orderBy(col("side"), col("key"))
  }

  val q43Oracle: String =
    """SELECT * FROM (
         SELECT 'both' AS side, key FROM (
           SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
           INTERSECT SELECT o_custkey AS key FROM orders)
         UNION ALL
         SELECT 'no_orders' AS side, key FROM (
           SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000
           EXCEPT SELECT o_custkey AS key FROM orders))
       ORDER BY side, key"""

  /** Pivot (wide aggregation): quantity totals per linestatus, one
    * column per return flag; oracle phrases it as conditional
    * aggregation. */
  def q44Pivot(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .na.fill(0.0, Seq("A", "N", "R"))
      .orderBy(col("l_linestatus"))
  }

  val q44Oracle: String =
    """SELECT l_linestatus,
       coalesce(round(sum(l_quantity) FILTER (l_returnflag = 'A'), 2), 0) AS A,
       coalesce(round(sum(l_quantity) FILTER (l_returnflag = 'N'), 2), 0) AS N,
       coalesce(round(sum(l_quantity) FILTER (l_returnflag = 'R'), 2), 0) AS R
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""

  /** Range (theta) join: lineitem quantities banded against a small
    * interval dimension. The band table is broadcast, so the
    * non-equi predicate runs as BroadcastNestedLoopJoin over a
    * 4-row build side — the right plan for interval dims; an
    * equi-prejoin on a bucketed key is the path when the band table
    * itself is large. */
  def q45RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables(spark, dir, "lineitem")
    val bands = Seq(
      ("tiny", 0.0, 10.0), ("small", 10.0, 25.0),
      ("mid", 25.0, 40.0), ("large", 40.0, 1e9)
    ).toDF("band", "lo", "hi")
    li.join(broadcast(bands),
        col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("band"))
  }

  val q45Oracle: String =
    """SELECT band, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
       FROM lineitem
       JOIN (VALUES ('tiny', 0.0, 10.0), ('small', 10.0, 25.0),
                    ('mid', 25.0, 40.0), ('large', 40.0, 1e9)) AS bands(band, lo, hi)
         ON l_quantity >= lo AND l_quantity < hi
       GROUP BY band ORDER BY band"""

  /** q65: per-group top-k through the bounded-heap
    * [[graft.functions.TopK]] aggregate — the grouped form of q10's
    * global TakeOrdered. The compositional plan (row_number window +
    * rank ≤ k) sorts EVERY row of every group on one reducer chain per
    * group; the aggregate keeps a k-element heap per group instead, so
    * partials are map-side, the shuffle carries only k-element buffers,
    * and no sort ever sees the full group. Same output contract as the
    * window form (score desc, ties id asc) — oracled against exactly
    * that window in DuckDB. */
  def q65GroupTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val o = Tables(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(TopK.top_k_by_score(col("o_totalprice"), col("o_orderkey"), k)
        .as("top"))
      .select(col("o_orderpriority"), inline(col("top")))
      .withColumnRenamed("id", "o_orderkey")
      .orderBy(col("o_orderpriority"), col("rank"))
  }

  val q65Oracle: String =
    """WITH ranked AS (
         SELECT o_orderpriority, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank
         FROM orders)
       SELECT o_orderpriority, rank, o_orderkey FROM ranked
       WHERE rank <= 5 ORDER BY o_orderpriority, rank"""

  /** Scalable percentile twin for the bench path: approx_percentile with
    * a bounded sketch — the form that survives 100 TB (single-pass,
    * mergeable, no global sort). Rows-only (sketch values are
    * engine-specific). */
  def q40ApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        round(approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000)), 2)
          .as("p50_approx"),
        approx_count_distinct(col("l_partkey")).as("nd_part_approx"))
      .orderBy(col("l_returnflag"))
  }

  /** q74: time-series resample with gap-fill and forward-fill — the
    * standard sensor-series regularization pass (the reference domain is
    * reaction time-series): each user's events land on a dense daily
    * grid from their first to last active day; gap days carry
    * n_events=0 and the last observed day-max value forward.
    *
    * Forward-fill is the count-partition idiom, chosen because it is
    * expressible IDENTICALLY in both engines (no IGNORE NULLS, which
    * Spark and DuckDB support with different spellings): `grp` = running
    * count of non-null observations per user — constant across a gap
    * run — and the carried value is the max (= the only) observation in
    * the (user, grp) frame.
    *
    * Values are count and max only: both order-independent and exact,
    * no float summation anywhere. Scale: the grid explode is per-user
    * bounded (days in span, not events); both windows partition by
    * user_id — high-cardinality, never global; the join is keyed on
    * (user_id, d) — skew-free. */
  def q74Resample(spark: SparkSession, dir: String): DataFrame =
    q74ResampleOf(Tables(spark, dir, "events"))

  /** Same over any (user_id, ts, value) DataFrame (injectable for
    * tests). */
  def q74ResampleOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
    val daily = e.groupBy(col("user_id"), col("d"))
      .agg(count(lit(1)).as("n_events"), max(col("value")).as("day_max"))
    val grid = e.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"), expr("interval 1 day")))
          .as("d"))
    val filled = grid.join(daily, Seq("user_id", "d"), "left")
      .withColumn("n_events", coalesce(col("n_events"), lit(0L)))
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled.withColumn("grp", count(col("day_max")).over(wRun))
      .withColumn("ff_max", max(col("day_max"))
        .over(Window.partitionBy(col("user_id"), col("grp"))))
      // dates export as formatted strings (repo rule: temporal values
      // cross the oracle boundary as strings or epoch seconds)
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_events"), col("ff_max"))
      .orderBy(col("user_id"), col("day"))
  }

  val q74Oracle: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events),
       daily AS (SELECT user_id, d, CAST(count(*) AS BIGINT) AS n_events,
                   max(value) AS day_max FROM e GROUP BY 1, 2),
       grid AS (SELECT user_id,
                  CAST(unnest(generate_series(min(d), max(d),
                    INTERVAL 1 DAY)) AS DATE) AS d
                FROM e GROUP BY user_id),
       filled AS (SELECT g.user_id, g.d,
                    coalesce(daily.n_events, 0) AS n_events, daily.day_max
                  FROM grid g LEFT JOIN daily
                    ON g.user_id = daily.user_id AND g.d = daily.d),
       grps AS (SELECT *, count(day_max) OVER
                  (PARTITION BY user_id ORDER BY d) AS grp FROM filled)
       SELECT user_id, strftime(d, '%Y-%m-%d') AS day,
         CAST(n_events AS BIGINT) AS n_events,
         max(day_max) OVER (PARTITION BY user_id, grp) AS ff_max
       FROM grps ORDER BY user_id, day"""

  /** q75: ranking-function inventory — ntile, percent_rank, cume_dist,
    * lag and lead in one windowed pass, completing §2 L's window-function
    * coverage (q10/q16/q65 cover rank/row_number/running aggregates).
    * All five are exact integer-rational computations over a unique
    * ordering key — deterministic and hash-stable cross-engine.
    *
    * Scale note: this is the REPORT-shaped form (5 priority partitions,
    * input bounded by the key prefilter). For corpus-scale ranks the
    * production paths are the two-phase forms: q35 (percentile), q55
    * (prefix sums), q65 (bounded-heap top-k) — a cume_dist over a
    * 5-value partition key at 100 TB would funnel each fifth of the
    * table through one reducer, exactly what those plans avoid. */
  def q75WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
    Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 31 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"))
      .orderBy(col("o_orderkey"))
  }

  val q75Oracle: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cume,
         lag(o_totalprice, 1) OVER w AS prev_price,
         lead(o_totalprice, 1) OVER w AS next_price
       FROM orders WHERE o_orderkey % 31 = 0
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
       ORDER BY o_orderkey"""

  /** q85: ordered-step funnel — how many users progressed
    * view → click → purchase, each step strictly after the previous
    * one and within a 1-day conversion window. The classic product
    * analytics query, built as a cascade of conditional-min
    * aggregates: step k's table is (user, first qualifying ts), so
    * each stage is one groupBy(user_id) plus a join against the
    * SHRINKING survivor set from the previous step.
    *
    * Scale: all joins key on user_id (high-cardinality, skew-free) and
    * the right side only ever shrinks — by step 3 it is the converted
    * cohort, typically broadcast-sized. No window functions, so no
    * per-user event sort; timestamps never appear in the output (repo
    * rule: raw event ts does not cross the oracle boundary). */
  def q85Funnel(spark: SparkSession, dir: String): DataFrame =
    q85FunnelOf(Tables(spark, dir, "events"))

  /** Same over any (user_id, event_type, ts) DataFrame. Each step table
    * is localCheckpoint'ed: it is user-cohort-sized (one row per
    * surviving user) and feeds BOTH the next step's join and its own
    * count branch — without the checkpoint the final union re-derives
    * the cascade per branch, re-scanning the event table six times
    * instead of once per step. */
  def q85FunnelOf(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"), col("event_type"), col("ts"))
    def step(prev: DataFrame, prevT: String, evt: String, t: String) =
      e.filter(col("event_type") === evt)
        .join(prev.select(col("user_id"), col(prevT)), "user_id")
        .filter(col("ts") > col(prevT) &&
          col("ts") <= col(prevT) + expr("interval 1 day"))
        .groupBy(col("user_id")).agg(min(col("ts")).as(t))
        .localCheckpoint(eager = false)
    val s1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      .localCheckpoint(eager = false)
    val s2 = step(s1, "t1", "click", "t2")
    val s3 = step(s2, "t2", "purchase", "t3")
    def cnt(s: DataFrame, label: String) =
      s.agg(count(lit(1)).as("n_users")).select(lit(label).as("step"),
        col("n_users"))
    cnt(s1, "1_view").unionByName(cnt(s2, "2_click"))
      .unionByName(cnt(s3, "3_purchase"))
      .orderBy(col("step"))
  }

  val q85Oracle: String =
    """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY 1),
       s2 AS (SELECT e.user_id, min(ts) AS t2 FROM events e
              JOIN s1 USING (user_id)
              WHERE event_type = 'click' AND ts > t1
                AND ts <= t1 + INTERVAL 1 DAY GROUP BY 1),
       s3 AS (SELECT e.user_id, min(ts) AS t3 FROM events e
              JOIN s2 USING (user_id)
              WHERE event_type = 'purchase' AND ts > t2
                AND ts <= t2 + INTERVAL 1 DAY GROUP BY 1)
       SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1
       UNION ALL
       SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
       UNION ALL
       SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3
       ORDER BY step"""

  /** q86: per-user daily-volume anomalies — days where a user's event
    * count exceeds their own mean by more than `z` sample standard
    * deviations, with the z-test done ENTIRELY in integer arithmetic:
    *
    *   (cnt − S/N) > z·√((N·SS − S²)/(N·(N−1)))
    *     ⇔  (N·cnt − S) > 0  ∧  (N·cnt − S)²·(N−1) > z²·N·(N·SS − S²)
    *
    * where S = Σcnt, SS = Σcnt² over the user's active days. Counts are
    * integers, so both sides are exact BIGINTs — no float mean/stddev
    * whose summation order could flip the driver's hash (the repo rule
    * that keeps avg out of oracled outputs). Headroom: the largest
    * term is (N·cnt)²·N ≈ (days·daily_max)²·days; at 10⁴ days and 10⁶
    * events/day that is ~10²⁴ — past BIGINT — so the 100 TB form
    * switches the comparison operands to DECIMAL(38,0); at any
    * plausible per-user volume below that, BIGINT is exact.
    *
    * Scale: one groupBy(user_id, day), one groupBy(user_id), one join
    * keyed on user_id — partial aggregation everywhere, no windows. */
  def q86Anomaly(spark: SparkSession, dir: String, z: Int = 2,
      minDays: Int = 5): DataFrame =
    q86AnomalyOf(Tables(spark, dir, "events"), z, minDays)

  /** Same over any (user_id, ts) DataFrame. */
  def q86AnomalyOf(events: DataFrame, z: Int = 2,
      minDays: Int = 5): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
    val dev = col("n") * col("cnt") - col("s")
    daily.join(stats, "user_id")
      .filter(col("n") >= minDays && dev > 0 &&
        dev * dev * (col("n") - 1) >
          lit(z.toLong * z) * col("n") * (col("n") * col("ss") - col("s") * col("s")))
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("cnt"), col("n").as("n_days"))
      .orderBy(col("user_id"), col("day"))
  }

  val q86Oracle: String =
    """WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS d,
                        CAST(count(*) AS BIGINT) AS cnt
                      FROM events GROUP BY 1, 2),
       st AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(cnt) AS BIGINT) AS s,
                CAST(sum(cnt * cnt) AS BIGINT) AS ss
              FROM daily GROUP BY 1)
       SELECT user_id, strftime(d, '%Y-%m-%d') AS day, cnt,
         n AS n_days
       FROM daily JOIN st USING (user_id)
       WHERE n >= 5 AND (n * cnt - s) > 0
         AND (n * cnt - s) * (n * cnt - s) * (n - 1) > 4 * n * (n * ss - s * s)
       ORDER BY user_id, day"""

  /** q90: cohort retention matrix — users grouped by the week of their
    * first purchase, tracked by how many stay active (≥1 purchase) in
    * each subsequent week. The standard product-retention report, and
    * the second conditional-aggregation shape next to q85's funnel.
    *
    * Exactness: every value is a date-trunc or an integer count; week
    * offsets are exact multiples of 7 days so the division carries no
    * float risk. Both engines truncate weeks to Monday.
    *
    * Scale: distinct (user, week) is one map-side-combinable aggregate;
    * cohort assignment is a groupBy(user_id) + a user_id-keyed join —
    * high-cardinality and skew-free; the matrix itself is
    * (cohorts × weeks)-sized. */
  def q90Cohort(spark: SparkSession, dir: String): DataFrame =
    q90CohortOf(Tables(spark, dir, "events"))

  /** Same over any (user_id, event_type, ts) DataFrame. */
  def q90CohortOf(events: DataFrame): DataFrame = {
    val d = events.filter(col("event_type") === "purchase")
      .select(col("user_id"),
        to_date(date_trunc("week", to_date(col("ts")))).as("wk"))
      .distinct()
    val c = d.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
    d.join(c, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int")
          .as("week_offset"))
      .agg(count(lit(1)).as("n_users")) // d is distinct per (user, wk)
      .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  val q90Oracle: String =
    """WITH d AS (SELECT user_id, date_trunc('week', CAST(ts AS DATE)) AS wk
                  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
       c AS (SELECT user_id, min(wk) AS cohort FROM d GROUP BY 1)
       SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
         CAST((wk - cohort) / 7 AS INT) AS week_offset,
         CAST(count(*) AS BIGINT) AS n_users
       FROM d JOIN c USING (user_id)
       GROUP BY 1, 2 ORDER BY cohort_week, week_offset"""

  /** q95: time-based rolling features — per user, per event, the count
    * of events and of purchases in the trailing 7 days, via a RANGE
    * window frame over epoch seconds (`RANGE BETWEEN 604800 PRECEDING
    * AND CURRENT ROW`). This is the feature-engineering sibling of the
    * ROWS-frame inventory in q16/q75: a ROWS frame counts rows, a
    * RANGE frame measures TIME, which is what "activity in the last
    * week" means when events are irregularly spaced. Epoch seconds
    * (integer floor) on both engines, so ns-vs-µs timestamp precision
    * cannot move a row across a frame edge; RANGE peers (same user,
    * same second) are included by both engines per the SQL standard.
    *
    * Scale: one shuffle on user_id, one per-user ordered pass with O(1)
    * incremental frame state (Spark's WindowExec slides the frame
    * bounds monotonically — no per-row rescan). Per-user partitions are
    * event-history-sized; a pathological single-user firehose would
    * want the q74-style pre-bucketed day grid instead, traded off in
    * that docstring. */
  def q95RollingWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .filter(col("user_id") % 7 === 0)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"),
        when(col("event_type") === "purchase", lit(1L)).otherwise(lit(0L))
          .as("is_p"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_s"))
      .rangeBetween(-604800L, 0L)
    e.select(col("user_id"), col("event_id"), col("epoch_s"),
        count(lit(1)).over(w).as("n_7d"),
        sum(col("is_p")).over(w).as("n_purch_7d"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q95Oracle: String =
    """WITH e AS (SELECT user_id, event_id,
         epoch_ns(ts) // 1000000000 AS epoch_s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
       FROM events WHERE user_id % 7 = 0)
       SELECT user_id, event_id, epoch_s,
         CAST(count(*) OVER w AS BIGINT) AS n_7d,
         CAST(sum(is_p) OVER w AS BIGINT) AS n_purch_7d
       FROM e WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, event_id"""

  /** q97: explicit GROUPING SETS via the Spark 4 `Dataset.groupingSets`
    * API — the free-form sibling of q12's ROLLUP and q34's CUBE,
    * completing the §2 L grouping-extension family. `grouping_id()`
    * disambiguates a genuine NULL group value from a rolled-up one
    * (both engines use the same MSB-first bit order over the listed
    * columns). One Expand + one aggregate — 4 sets → 4× the input to
    * the partial aggregate, combined map-side like any other groupBy;
    * the (all) coalescing is cosmetic and engine-portable. */
  def q97GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables(spark, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")),
          Seq(col("o_orderstatus")),
          Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("gid"), col("n_orders"), col("sum_price"))
      .orderBy(col("gid"), col("priority"), col("status"))
  }

  val q97Oracle: String =
    """SELECT coalesce(o_orderpriority, '(all)') AS priority,
         coalesce(o_orderstatus, '(all)') AS status,
         CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS sum_price
       FROM orders
       GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
         (o_orderpriority), (o_orderstatus), ())
       ORDER BY gid, priority, status"""

  /** q100: time-based burst dedup — the batch twin of
    * [[graft.streaming.StreamingDedup]]'s watermark semantics: within
    * each (user, event_type) stream, an event is KEPT iff it starts a
    * burst (first ever, or > 10 minutes after the previous event —
    * gap-based, same session-start rule as q19's session windows);
    * repeats inside a burst are duplicates. Reported as kept-vs-total
    * per stream. Integer epoch seconds, integer counts — engine-exact.
    *
    * Scale: one shuffle on (user_id, event_type), per-stream ordered
    * lag pass (O(1) state), then a map-side-combinable count — no
    * global window, nothing driver-side. */
  def q100BurstDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("epoch_s"))
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("epoch_s"), col("event_id"))
    val gap = col("epoch_s") - lag(col("epoch_s"), 1).over(w)
    e.withColumn("kept",
        when(gap.isNull || gap > 600, lit(1L)).otherwise(lit(0L)))
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_total"), sum(col("kept")).as("n_kept"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val q100Oracle: String =
    """WITH e AS (SELECT user_id, event_type, event_id,
         epoch_ns(ts) // 1000000000 AS epoch_s FROM events),
       g AS (SELECT user_id, event_type,
         epoch_s - lag(epoch_s) OVER
           (PARTITION BY user_id, event_type
            ORDER BY epoch_s, event_id) AS gap
       FROM e)
       SELECT user_id, event_type,
         CAST(count(*) AS BIGINT) AS n_total,
         CAST(sum(CASE WHEN gap IS NULL OR gap > 600 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_kept
       FROM g GROUP BY 1, 2 ORDER BY user_id, event_type"""

  /** q108: market-basket association rules over supplier NATIONS — for
    * every nation pair co-occurring in at least max(1, baskets/200)
    * orders (0.5% min-support), the A-priori trio: support count,
    * confidence P(b|a) and lift P(a,b)/(P(a)·P(b)). Orders are the
    * baskets; items are each line's supplier nation (25 at every sf),
    * because raw-supplier density FALLS as TPC-H scales and would leave
    * an empty lattice at bench scale — see the inline comment. Both
    * directions of each pair are emitted (confidence is asymmetric),
    * ranked by lift.
    *
    * Exactness: support counts are integers; confidence and lift are
    * single divisions of longs rounded to 6 dp (no summation of
    * floats anywhere), so the hash is engine-stable — same recipe as
    * q64's ln rounding.
    *
    * Scale: basket→distinct-item dedup and both count layers are
    * map-side-combinable aggregates; the pair generation is the q104
    * co-occurrence self-join (baskets × C(items-per-basket, 2), never
    * item-space²) and the min-support filter prunes before the rule
    * join, which then joins pair counts to two broadcast-sized single
    * counts. The A-priori pruning insight in distributed form. */
  def q108AssocRules(spark: SparkSession, dir: String): DataFrame = {
    // item space = the supplier's NATION (25 items at every sf): the
    // supplier key's own density FALLS as TPC-H scales (more suppliers,
    // same lines per order), so supplier-level rules vanish at bench
    // scale; the nation rollup keeps the basket lattice dense at any
    // sf, and min-support scales with the basket count (0.5%)
    val sup = Tables(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    // spreadScan on the order key: the distinct, the n count, AND both
    // sides of the pair self-join below then cluster on l_orderkey
    // without any further exchange (A/B-measured win)
    val os = graft.Tables.spreadScan(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(broadcast(sup), "l_suppkey")
      .select(col("l_orderkey"), col("s_nationkey")).distinct()
      .localCheckpoint(eager = false) // feeds three aggregates below
    val n = os.select(col("l_orderkey")).distinct().count()
    val minSupport = math.max(1L, n / 200L)
    val singles = os.groupBy(col("s_nationkey")).agg(count(lit(1)).as("c1"))
    val pairs = os.select(col("l_orderkey"), col("s_nationkey").as("a"))
      .join(os.select(col("l_orderkey"), col("s_nationkey").as("b")),
        "l_orderkey")
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support_cnt"))
      .filter(col("support_cnt") >= minSupport)
    pairs
      .join(broadcast(singles.select(col("s_nationkey").as("a"),
        col("c1").as("ca"))), "a")
      .join(broadcast(singles.select(col("s_nationkey").as("b"),
        col("c1").as("cb"))), "b")
      .select(col("a"), col("b"), col("support_cnt"),
        round(col("support_cnt").cast("double") / col("ca"), 6)
          .as("confidence"),
        round(col("support_cnt").cast("double") * n /
          (col("ca") * col("cb")), 6).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(50)
  }

  val q108Oracle: String =
    """WITH os AS (SELECT DISTINCT l_orderkey, s_nationkey
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
       n AS (SELECT count(DISTINCT l_orderkey) AS n FROM os),
       singles AS (SELECT s_nationkey, CAST(count(*) AS BIGINT) AS c1
         FROM os GROUP BY 1),
       pairs AS (SELECT x.s_nationkey a, y.s_nationkey b,
           CAST(count(*) AS BIGINT) AS support_cnt
         FROM os x JOIN os y ON x.l_orderkey = y.l_orderkey
           AND x.s_nationkey <> y.s_nationkey, n
         GROUP BY 1, 2, n.n
         HAVING count(*) >= greatest(1, n.n // 200))
       SELECT p.a, p.b, p.support_cnt,
         round(CAST(p.support_cnt AS DOUBLE) / sa.c1, 6) AS confidence,
         round(CAST(p.support_cnt AS DOUBLE) * n.n / (sa.c1 * sb.c1), 6)
           AS lift
       FROM pairs p JOIN singles sa ON sa.s_nationkey = p.a
         JOIN singles sb ON sb.s_nationkey = p.b CROSS JOIN n
       ORDER BY lift DESC, a, b LIMIT 50"""

  /** q114: training-sequence assembly — turn an event log into one
    * ordered interaction sequence per user, the construction step behind
    * behavioral-LM / recommendation training examples (and the
    * "conversation assembly" step of chat-log pipelines). Events are
    * ordered by (epoch µs, event_id) — a total order, so the sequence is
    * unique — and concatenated; the oracled output carries the exact
    * count, the first 40 chars, and an md5 of the FULL sequence, so any
    * reordering or dropped event flips the hash.
    *
    * Spark-first shape: `collect_list(struct(us, event_id, type))` then a
    * per-row `array_sort` + `transform` + `array_join` — one shuffle on
    * user_id, no window, the sort is local to each assembled row. At
    * 100 TB per-user sequences are bounded (and a pathological user would
    * be capped upstream), so the collected array never approaches
    * executor memory; this is the standard sessionize-then-sort posture.
    *
    * Timestamps follow the q100 rule: epoch µs derived by integer
    * division of the stored nanos on both engines, never a raw ts. The
    * stored `ts` is timestamp-without-timezone (Spark 4 reads parquet
    * `timestamp[us]` with no tz as TIMESTAMP_NTZ) and `unix_micros` is
    * the one epoch function restricted to TIMESTAMP — cast first; with
    * the session pinned to UTC the NTZ→LTZ cast is a bit-identical
    * relabel and matches DuckDB's `epoch_us(ts)`. */
  def q114SequenceAssembly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"), col("event_type"))
    e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          " ").as("seq"))
      .select(col("user_id"), col("n_events"),
        substring(col("seq"), 1, 40).as("seq_head"),
        md5(col("seq").cast("binary")).as("seq_md5"))
      .orderBy(col("user_id"))
  }

  val q114Oracle: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
         FROM events),
       g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           string_agg(event_type, ' ' ORDER BY us, event_id) AS seq
         FROM e GROUP BY 1)
       SELECT user_id, n_events, substring(seq, 1, 40) AS seq_head,
         md5(seq) AS seq_md5
       FROM g ORDER BY user_id"""

  /** q116: HyperLogLog distinct users per event type — the mergeable
    * fixed-size sketch next to q67's KMV and q40's builtin, with its
    * ESTIMATE oracled: input hashes are [[graft.functions.DetMix]] SQL,
    * the register file is [[graft.functions.HllAgg]] (2⁹ = 512 bytes per
    * group, elementwise-max mergeable, so map-side partials ship 512
    * bytes per group per partition no matter the corpus), and a DuckDB
    * CTE rebuilds the identical registers from the same integer ops —
    * `reg_sum` pins every register value, `est_micro` the shared-text
    * floor-quantized estimate, `n_exact` makes the ~4.6% (1.04/√512)
    * error auditable. See [[graft.functions.Hll]] for why no linear-
    * counting correction is applied (it would need ln). */
  def q116HllDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.{DetMix, Hll}
    val p = 9
    val e = Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        expr(DetMix.mixSql("user_id", 13)).as("h"))
    e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        Hll.hll_registers(col("h"), p).as("regs"))
      .select(col("event_type"), col("n_exact"),
        expr("aggregate(regs, CAST(0 AS BIGINT), (acc, r) -> " +
          "acc + shiftleft(CAST(1 AS BIGINT), 23 - CAST(r AS INT)))")
          .as("reg_sum"),
        expr("CAST(size(filter(regs, r -> r = 0)) AS BIGINT)")
          .as("zero_regs"))
      .withColumn("est_micro", expr(Hll.estMicroSql("reg_sum", p)))
      .orderBy(col("event_type"))
  }

  val q116Oracle: String = {
    import graft.functions.{DetMix, Hll}
    val mix = DetMix.mixSql("user_id", 13)
    val rho = Hll.rhoCaseSql("(h // 512)", 9)
    s"""WITH h AS (SELECT event_type, user_id, $mix AS h FROM events),
       b AS (SELECT event_type, h % 512 AS bucket,
           CAST(max($rho) AS BIGINT) AS m_j
         FROM h GROUP BY 1, 2),
       a AS (SELECT event_type,
           CAST(sum(CAST(1 AS BIGINT) << CAST(23 - m_j AS INT))
             AS BIGINT) AS present_sum,
           CAST(count(*) AS BIGINT) AS present
         FROM b GROUP BY 1),
       d AS (SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         FROM h GROUP BY 1),
       f AS (SELECT d.event_type, d.n_exact,
           a.present_sum + (512 - a.present) * 8388608 AS reg_sum,
           512 - a.present AS zero_regs
         FROM d JOIN a ON a.event_type = d.event_type)
       SELECT event_type, n_exact, reg_sum, zero_regs,
         ${Hll.estMicroSql("reg_sum", 9)} AS est_micro
       FROM f ORDER BY event_type"""
  }

  /** q117: Count–Min frequency estimates vs exact counts for the top-20
    * heaviest users — [[graft.functions.Cms]] (4×1024 sum-mergeable
    * counters; ~32 KB shipped per partition however large the corpus)
    * next to q76's Misra–Gries: MG yields the candidate set, CMS the
    * frequencies. Being all-integer the sketch is EXACTLY oracled — a
    * DuckDB CTE rebuilds every counter from the same DetMix row hashes,
    * so `cms_cnt` (always ≥ `exact_cnt`, over by ≤ eN/1024 w.h.p.) must
    * match to the cell. The exact top-20 is a deterministic
    * (count desc, user_id) order both engines share.
    *
    * Scale: the exact side is one map-side-combinable count + top-k; the
    * sketch side is one global aggregate; the point queries join the
    * 20-row top set against the one-row sketch by broadcast. */
  def q117CmsFrequency(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Cms
    val (d, w, sb) = (4, 1024, 100L)
    val e = Tables(spark, dir, "events").select(col("user_id"))
    val cms = e.agg(Cms.cms_counters(col("user_id"), d, w, sb).as("cms"))
    val top = e.groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id")).limit(20)
    val cells = (0 until d).map { r =>
      expr(s"element_at(cms, CAST(${Cms.cellSql("user_id", r, w, sb)}" +
        " + 1 AS INT))")
    }
    top.crossJoin(broadcast(cms))
      .select(col("user_id"), col("exact_cnt"),
        least(cells: _*).as("cms_cnt"))
      .orderBy(col("exact_cnt").desc, col("user_id"))
  }

  val q117Oracle: String = {
    import graft.functions.Cms
    val (w, sb) = (1024, 100L)
    def cell(r: Int) = Cms.cellSql("user_id", r, w, sb)
    val unions = (0 until 4).map(r =>
      s"SELECT ${cell(r)} AS cell FROM events").mkString(" UNION ALL ")
    val joins = (0 until 4).map(r =>
      s"JOIN cnt c$r ON c$r.cell = ${cell(r).replace("user_id", "t.user_id")}")
      .mkString(" ")
    s"""WITH top AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
         FROM events GROUP BY 1
         ORDER BY exact_cnt DESC, user_id LIMIT 20),
       cnt AS (SELECT cell, CAST(count(*) AS BIGINT) AS c
         FROM ($unions) u GROUP BY 1)
       SELECT t.user_id, t.exact_cnt,
         least(c0.c, c1.c, c2.c, c3.c) AS cms_cnt
       FROM top t $joins
       ORDER BY exact_cnt DESC, user_id"""
  }
}
