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
  def bandedIntervalJoin(points: DataFrame, pSec: String,
      intervals: DataFrame, iFrom: String, iTo: String,
      bandSeconds: Long): DataFrame = {
    require(bandSeconds > 0, "band width must be positive")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "point and interval column names must be disjoint")
    val b = lit(bandSeconds)
    // sequence() is safe: bands-per-interval = len/band + 1, bounded by
    // construction; a runaway interval would blow the fanout, so guard
    val bands = intervals
      .filter(col(iTo) > col(iFrom))
      .withColumn("_band",
        explode(sequence(floor(col(iFrom) / b), floor((col(iTo) - 1) / b))))
    val pts = points.withColumn("_pband", floor(col(pSec) / b))
    bands.join(pts, col("_band") === col("_pband") &&
        col(pSec) >= col(iFrom) && col(pSec) < col(iTo))
      .drop("_band", "_pband")
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

  val q93Oracle: String =
    """WITH w AS (SELECT event_id AS window_id,
         epoch_ns(ts) // 1000000000 AS w_from
       FROM events WHERE event_type = 'purchase' AND event_id % 97 = 0),
       e AS (SELECT epoch_ns(ts) // 1000000000 AS s FROM events)
       SELECT w.window_id, CAST(count(*) AS BIGINT) AS n_events
       FROM w JOIN e ON e.s >= w.w_from AND e.s < w.w_from + 14400
       GROUP BY 1 ORDER BY 1"""
}
