package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{DetMix, Hll}

/** Streaming windowed distinct counts with BOUNDED per-window state —
  * [[StreamingTrending]]'s companion for the cardinality question
  * ("how many distinct users this hour", "how many distinct documents
  * per source per window" for ingest monitoring).
  *
  * The naive streaming form (`groupBy(window).approx_count_distinct` or
  * a `dropDuplicates` + count) keeps state per (window, user); here the
  * aggregate IS the [[graft.functions.HllAgg]] register file, so each
  * window's state is exactly 2ᵖ bytes (512 at the default p = 9, ~4.6%
  * standard error) no matter how many distinct users stream through,
  * partials merge map-side by elementwise max, and the watermark closes
  * windows in append mode.
  *
  * Output per closed window: the raw register file (so downstream can
  * merge windows into coarser rollups — max of registers IS the union),
  * `reg_sum`/`zero_regs` (the q116 estimate inputs), and `est_micro`
  * via the shared-text [[Hll.estMicroSql]]. Small windows (zero_regs
  * high) should be read through linear counting — see [[Hll]]. */
object StreamingDistinct {

  /** Over a streaming (ts: timestamp, user_id: bigint) frame. */
  def windowedDistinct(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour", p: Int = 9,
      seed: Long = 13): DataFrame = {
    val w = Hll.suffixBits(p) + 1
    events.withWatermark("ts", watermark)
      .select(col("ts"), expr(DetMix.mixSql("user_id", seed)).as("h"))
      .groupBy(window(col("ts"), window_))
      .agg(Hll.hll_registers(col("h"), p).as("regs"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("regs"),
        expr(s"aggregate(regs, CAST(0 AS BIGINT), (acc, r) -> " +
          s"acc + shiftleft(CAST(1 AS BIGINT), $w - CAST(r AS INT)))")
          .as("reg_sum"),
        expr("CAST(size(filter(regs, r -> r = 0)) AS BIGINT)")
          .as("zero_regs"))
      .withColumn("est_micro", expr(Hll.estMicroSql("reg_sum", p)))
  }
}
