package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.ext.Dedup

/** Streaming near-duplicate admission — [[Dedup.incrementalNearDupSigs]]
  * wired into a `foreachBatch` stage against a persisted signature
  * index, the production shape of incremental near-dup:
  *
  *   - every micro-batch's documents are MinHash-signed once;
  *   - the batch is checked against the INDEX (parquet of (doc_id, sig),
  *     64 longs per admitted doc — never text), with the BucketCap guard
  *     on both sides of the banded join;
  *   - clean docs are appended to `admittedDir` and their signatures to
  *     the index; flagged docs go to `flaggedDir` with their best match.
  *
  * State posture at 100 TB/day: stream state is the parquet signature
  * index, which grows by 8×64 bytes per admitted document regardless of
  * document size, and the text of a batch never joins against anything
  * larger than the batch itself. Exactly-once: every output (admitted,
  * flagged, index) is partitioned by batch_id and written with dynamic
  * partition overwrite, so a re-run batch replaces exactly its own
  * partition; the index read also excludes the current batchId so a
  * half-written prior attempt cannot flag a batch as a dup of itself.
  */
object StreamingNearDup {

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("batch_id", LongType)))

  /** Read the signature index, tolerating its absence (first batch). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    try spark.read.schema(sigSchema).parquet(indexDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], sigSchema)
    }

  /** One micro-batch: flag near-dups of the index, admit the rest,
    * append the admitted signatures. Package-visible for direct testing
    * without a streaming harness. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, admittedDir: String, flaggedDir: String,
      tau: Double): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val sigs = Dedup.minhashSignaturesOf(batch).localCheckpoint()
    val seen = readIndex(spark, indexDir)
      .filter(col("batch_id") =!= batchId) // idempotent re-run
      .select(col("doc_id"), col("sig")).localCheckpoint()
    val flagged = Dedup.incrementalNearDupSigs(sigs, seen, tau)
      .localCheckpoint()
    // idempotent per batch: each write lands in its own batch_id
    // partition and overwrites ONLY that partition on re-run
    def writeBatch(df: DataFrame, dir: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(dir)
    writeBatch(flagged, flaggedDir)
    writeBatch(batch.join(flagged.select(col("doc_id")),
      Seq("doc_id"), "left_anti"), admittedDir)
    writeBatch(sigs.join(flagged.select(col("doc_id")),
      Seq("doc_id"), "left_anti"), indexDir)
  }

  /** Start the stage over a streaming (doc_id, text) frame. */
  def start(docs: DataFrame, indexDir: String, admittedDir: String,
      flaggedDir: String, checkpointDir: String,
      tau: Double = 0.5): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexDir, admittedDir,
          flaggedDir, tau)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
