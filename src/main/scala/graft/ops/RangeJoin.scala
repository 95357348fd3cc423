package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Banded (bucketed) interval join: match points into [from, to)
  * intervals WITHOUT an equality key.
  *
  * Catalyst has no range-join operator: a pure `p >= from AND p < to`
  * join plans as BroadcastNestedLoopJoin when one side is small and a
  * cartesian product when neither is — both dead ends once the
  * interval side outgrows broadcast (the as-of join in
  * [[graft.plans.AsOfJoin]] covers the "latest at or before" special
  * case; this covers containment). The classic fix — the same banding
  * trick our MinHash/SimHash/LSH layers use for similarity — is to
  * quantize time into fixed-width bands: an interval overlaps
  * ceil(len/band)+1 bands at most, a point lies in exactly one, and
  * overlap in time implies equality in some band. The join becomes a
  * shuffle equi-join on the band id with the exact range predicate as
  * a post-join filter.
  *
  * Band width tuning is the usual bucket tradeoff: ~= the typical
  * interval length. Too narrow → interval-side fanout (rows =
  * intervals × bands-per-interval); too wide → each band pairs many
  * points with many non-overlapping intervals before the filter. Both
  * sides stay distributed; no nested loop, no broadcast requirement.
  */
object RangeJoin {

  /** Join `points` (with integer column `pSec`) into `intervals`
    * (integer columns `iFrom` inclusive, `iTo` exclusive), banding by
    * `bandSeconds`. Returns interval columns + point columns for every
    * containment pair. Intervals with `iTo <= iFrom` match nothing.
    *
    * Column sets must be disjoint. Floor-division banding is
    * sign-correct for pre-epoch values too (`floorDiv`, not `/`).
    */
  /** Max bands one interval may span before the join refuses: a single
    * corrupt interval (year 0 → year 9999) would otherwise explode to
    * millions of band rows and take the stage down with it. Fail loud,
    * per row, executor-side — the same untrusted-input posture as the
    * media chunk walks. */
  val MaxBandsPerInterval = 4096L

  private def guardedBands(df: DataFrame, from: String, to: String,
      bandCol: String, b: org.apache.spark.sql.Column): DataFrame = {
    val lo = floor(col(from) / b)
    val hi = floor((col(to) - 1) / b)
    df.filter(col(to) > col(from))
      .withColumn(bandCol, explode(sequence(lo,
        when(hi - lo < MaxBandsPerInterval, hi).otherwise(raise_error(
          concat(lit(s"interval spans more than $MaxBandsPerInterval " +
            "bands; widen bandSeconds or drop corrupt rows: "),
            col(from), lit(" .. "), col(to)))))))
  }

  def bandedIntervalJoin(points: DataFrame, pSec: String,
      intervals: DataFrame, iFrom: String, iTo: String,
      bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, "band width must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point and interval column names must be disjoint")
    val b = lit(bandSeconds)
    val bands = guardedBands(intervals, iFrom, iTo, "_band", b)
    val pts = points.withColumn("_pband", floor(col(pSec) / b))
    bands.join(pts, col("_band") === col("_pband") &&
        col(pSec) >= col(iFrom) && col(pSec) < col(iTo))
      .drop("_band", "_pband")
  }

  /** Data-driven band width: the median interval length (one
    * approxQuantile pass, bounded driver state). Median — not mean —
    * so a few corrupt monster intervals cannot drag every band wide;
    * they hit the [[MaxBandsPerInterval]] guard instead of silently
    * degrading the join. */
  def suggestBandSeconds(intervals: DataFrame, iFrom: String,
      iTo: String): Long = {
    val lens = intervals.filter(col(iTo) > col(iFrom))
      .select((col(iTo) - col(iFrom)).cast("double").as("_len"))
    val q = lens.stat.approxQuantile("_len", Array(0.5), 0.01)
    math.max(1L, math.round(q.headOption.getOrElse(1.0)))
  }

  /** q93: event-burst windows — every 97th purchase event opens a
    * 4-hour window; count ALL events (any user — deliberately no
    * equality key) falling in each window. Epoch-second integers on
    * both engines so ns-vs-µs timestamp precision can never straddle a
    * boundary. Band width = the window length (4 h): each window spans
    * at most 2 bands.
    *
    * Scale: windows here are ~1% of one event type, but the plan never
    * assumes that — both sides shuffle on the band id, so 10^9 windows
    * against 10^12 events is the same equi-join, just wider. The
    * nested-loop alternative is O(|events| × |windows|). */
  def q93IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir, "events")
    val points = ev.select(unix_timestamp(col("ts")).as("s"))
    val windows = ev
      .filter(col("event_type") === "purchase" && col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"),
        unix_timestamp(col("ts")).as("w_from"),
        (unix_timestamp(col("ts")) + 14400L).as("w_to"))
    bandedIntervalJoin(points, "s", windows, "w_from", "w_to", 14400L)
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("window_id"))
  }

  /** Interval × interval overlap join, same banding trick: explode BOTH
    * sides into their covered bands, equi-join on the band, filter the
    * exact half-open overlap (`lFrom < rTo && rFrom < lTo`). A pair
    * overlapping across k shared bands would match k times, so the join
    * keeps each pair only in its canonical band — the band of the LATER
    * start (`greatest` of the two start bands): the later start lies
    * inside both intervals whenever they overlap, so exactly one copy
    * survives, with no distinct() pass over the output.
    */
  def bandedOverlapJoin(left: DataFrame, lFrom: String, lTo: String,
      right: DataFrame, rFrom: String, rTo: String,
      bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, "band width must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "left and right column names must be disjoint")
    val b = lit(bandSeconds)
    val lb = guardedBands(left, lFrom, lTo, "_lband", b)
    val rb = guardedBands(right, rFrom, rTo, "_rband", b)
    lb.join(rb, col("_lband") === col("_rband") &&
        col(lFrom) < col(rTo) && col(rFrom) < col(lTo) &&
        col("_lband") === greatest(floor(col(lFrom) / b),
          floor(col(rFrom) / b)))
      .drop("_lband", "_rband")
  }

  /** q98: overlap join over order "activity windows" — every fifth
    * urgent order opens a 7-day window, every fifth-plus-one low
    * priority order likewise; count, per urgent window, the low windows
    * it overlaps. Same engine-portable integer epoch seconds as q93;
    * date-aligned inputs make the seconds exact in both engines. */
  def q98OverlapJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
    def windows(prio: String, residue: Int, keyName: String,
        fromName: String, toName: String): DataFrame =
      o.filter(col("o_orderpriority") === prio &&
          col("o_orderkey") % 5 === residue)
        .select(col("o_orderkey").as(keyName),
          unix_timestamp(col("o_orderdate")).as(fromName),
          (unix_timestamp(col("o_orderdate")) + 604800L).as(toName))
    val urgent = windows("1-URGENT", 0, "l_orderkey", "lf", "lt")
    val low = windows("5-LOW", 1, "r_orderkey", "rf", "rt")
    bandedOverlapJoin(urgent, "lf", "lt", low, "rf", "rt", 604800L)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("l_orderkey"))
  }

  val q98Oracle: String =
    """WITH l AS (SELECT o_orderkey AS lk,
         epoch_ms(o_orderdate) // 1000 AS lf,
         epoch_ms(o_orderdate) // 1000 + 604800 AS lt
       FROM orders
       WHERE o_orderpriority = '1-URGENT' AND o_orderkey % 5 = 0),
       r AS (SELECT o_orderkey AS rk,
         epoch_ms(o_orderdate) // 1000 AS rf,
         epoch_ms(o_orderdate) // 1000 + 604800 AS rt
       FROM orders
       WHERE o_orderpriority = '5-LOW' AND o_orderkey % 5 = 1)
       SELECT l.lk AS l_orderkey, CAST(count(*) AS BIGINT) AS n_overlaps
       FROM l JOIN r ON l.lf < r.rt AND r.rf < l.lt
       GROUP BY 1 ORDER BY 1"""

  val q93Oracle: String =
    """WITH w AS (SELECT event_id AS window_id,
         epoch_ns(ts) // 1000000000 AS w_from
       FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0),
       e AS (SELECT epoch_ns(ts) // 1000000000 AS s FROM events)
       SELECT w.window_id, CAST(count(*) AS BIGINT) AS n_events
       FROM w JOIN e ON e.s >= w.w_from AND e.s < w.w_from + 14400
       GROUP BY 1 ORDER BY 1"""
}
