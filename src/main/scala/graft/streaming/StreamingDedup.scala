package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming twin of
  * `ext/Dedup.exact`: drop any document whose content digest has already
  * been seen, keeping state only inside the watermark horizon.
  *
  * `dropDuplicatesWithinWatermark` is the operator built for exactly
  * this: plain `dropDuplicates` on a stream keeps every key forever
  * (state grows with the corpus — a non-starter for a 100 TB/day feed),
  * while the watermark variant evicts digests older than the horizon, so
  * state is bounded by the duplicate-arrival window you actually care
  * about. Duplicates arriving farther apart than the horizon pass
  * through — cross-horizon dedup belongs to the batch compaction pass
  * (`Dedup.exact`), the standard lambda split.
  *
  * Keyed on the 256-bit content digest, not the text: state rows hold 32
  * bytes + timestamp each, and the shuffle key is fixed-width.
  */
object StreamingDedup {

  /** `docs` must carry an event-time column `ts` and a `text` column.
    * Emits the first-seen row per digest within the watermark horizon,
    * with the digest attached. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")
}
