package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join with bounded state — the streaming twin
  * of the batch range/as-of joins (q41/q45/q46): match events on two
  * live streams by key, where the right event lands inside a bounded
  * time window after the left event (click-through attribution,
  * request/response pairing, doc-content ↔ doc-score reconciliation).
  *
  * Why the shape matters: a plain stream-stream equi-join must retain
  * EVERY past row of both streams forever — any future row might still
  * match — so state grows with the feed and the job eventually dies.
  * Two things bound it, and both are required: event-time watermarks on
  * BOTH inputs (late data cutoff) and an explicit event-time RANGE in
  * the join condition (how far apart matching events may be). Together
  * they let the engine compute, per side, the oldest row that could
  * still match, and evict everything older — state is O(rate × (horizon
  * + watermark)), independent of stream lifetime.
  *
  * Outer variants ride the same bound: a left row whose match window
  * has fully passed the right watermark is emitted with nulls and
  * evicted — the streaming analogue of the batch left join's unmatched
  * rows, with latency traded for completeness.
  */
object StreamingJoin {

  /** Join `left` and `right` on equal `keys` where
    * `right[rightTs] ∈ [left[leftTs], left[leftTs] + horizon]`.
    *
    * Column contract: the streams share ONLY the key columns; each side
    * brings its own event-time column (`leftTs` / `rightTs`). The right
    * key columns are internally renamed for the join and dropped from
    * the output, so the result carries `left`'s keys plus both
    * payloads. `joinType`: "inner", "leftOuter", etc. — outer sides
    * must be the watermarked ones per Spark's stream-join rules. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, horizon: String,
      watermark: String, joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin requires at least one key column")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared == keys.toSet,
      s"streams must share only the key columns; shared=$shared keys=$keys")
    val l = left.withWatermark(leftTs, watermark)
    val renamed = keys.map(k => k -> s"__r_$k")
    val r = renamed.foldLeft(right.withWatermark(rightTs, watermark)) {
      case (d, (k, rk)) => d.withColumnRenamed(k, rk)
    }
    val cond = renamed.map { case (k, rk) => col(k) === col(rk) }
      .reduce(_ && _) &&
      col(rightTs) >= col(leftTs) &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $horizon")
    l.join(r, cond, joinType).drop(renamed.map(_._2): _*)
  }
}
