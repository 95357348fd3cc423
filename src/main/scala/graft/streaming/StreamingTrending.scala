package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis
import graft.functions.MisraGries.misra_gries

/** Streaming trending tokens — windowed heavy hitters with BOUNDED
  * per-window state.
  *
  * The naive streaming form (`groupBy(window, token).count()`) keeps
  * one state-store row per (window, token): state grows with the
  * vocabulary — unbounded on web text, and exactly what a trending
  * query doesn't need. Here the aggregate IS the
  * [[graft.functions.MisraGriesAgg]] summary, so each window's state
  * is one ≤ k-entry buffer no matter how many distinct tokens stream
  * through, partials merge map-side, and the watermark closes windows
  * in append mode.
  *
  * Output per closed window: the ≤ k candidate map (token →
  * lower-bound count, MG undercount ≤ n/(k+1) with n the window's
  * token count — every token above that bar is guaranteed present).
  * For exact figures run the batch recount
  * ([[TextAnalysis.heavyHitters]]) over the window's raw data; the
  * streaming stage's job is the cheap always-on candidate feed. */
object StreamingTrending {

  /** Over a streaming (ts: timestamp, text: string) frame. */
  def trendingTokens(docs: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour", k: Int = 64): DataFrame =
    docs.withWatermark("ts", watermark)
      .select(col("ts"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(window(col("ts"), window_))
      .agg(misra_gries(col("token"), k).as("candidates"))
      .select(
        unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("candidates"))
}
