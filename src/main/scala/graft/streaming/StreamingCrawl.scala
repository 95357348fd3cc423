package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Warc

/** Streaming crawl-to-corpus accounting — the q162 rollup as archive
  * segments STREAM in: each micro-batch of (blob_id, payload) blobs is
  * parsed, fetch-gated, WET-derived and quality-gated by the SAME
  * [[Warc.crawlCorpusOf]] the batch query runs, and its per-domain
  * result is written as ADDITIVE delta rows (counts and sums only —
  * q162 has no min/max or distinct column), tagged with `src_batch`
  * provenance under a `batch_id=` partition. The current corpus
  * scorecard is the sum over deltas — exact by additivity, never a
  * recomputation over history (the StreamingShards manifest recipe).
  *
  * Exactly-once: the batch's partition is deleted up front, so a
  * replay rewrites byte-identically and an emptied replay clears it.
  * Per-domain skew cannot hurt: a delta holds one row per domain per
  * batch, and the rollup sums delta rows, not documents.
  */
object StreamingCrawl {

  private val deltaSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("domain",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("n_fetched",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("n_admitted",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("tok_admitted",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("src_batch",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch_id",
      org.apache.spark.sql.types.LongType)))

  /** One micro-batch: write the batch's per-domain delta rows.
    * Package-visible for direct testing without a streaming harness. */
  private[graft] def processBatch(blobs: DataFrame, batchId: Long,
      outDir: String): Unit = {
    DeltaIndex.deleteBatchPartition(blobs.sparkSession, outDir, batchId)
    if (blobs.isEmpty) return
    DeltaIndex.writeDelta(Warc.crawlCorpusOf(blobs), batchId, outDir)
  }

  /** The CURRENT per-domain corpus scorecard: sum of all committed
    * deltas. Same read contract as the other streaming indexes: a
    * missing or only-just-bootstrapped dir is EMPTY, anything other
    * than batch_id= partitions with the delta schema is refused —
    * never silently summed. */
  def currentCorpus(spark: SparkSession, outDir: String): DataFrame =
    DeltaIndex.readDeltas(spark, outDir, deltaSchema,
        "crawl-corpus delta index")
      .groupBy(col("domain"))
      .agg(sum(col("n_fetched")).as("n_fetched"),
        sum(col("n_admitted")).as("n_admitted"),
        sum(col("tok_admitted")).as("tok_admitted"))

  /** Start the accounting sink over a streaming (blob_id, payload)
    * frame — [[graft.ext.Warc.readWarcStream]] in production. */
  def start(blobs: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    blobs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
