package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import graft.ext.Dedup

/** Streaming exact-substring repeat-span detection — the q120 pass
  * ([[Dedup.repeatSpansOf]], Lee et al. 2022 ExactSubstr) wired into a
  * `foreachBatch` stage against a persisted window-hash index, the same
  * production shape as [[StreamingNearDup]]:
  *
  *   - every micro-batch's documents are window-hashed once
  *     ([[Dedup.windowHashes]] — position-preserving, no window string
  *     ever materialized);
  *   - each occurrence is checked against the INDEX (parquet of
  *     (h, doc_id, p) — the corpus-first copy of every distinct window
  *     seen so far), and ALSO against the batch itself (min (doc_id, p)
  *     per hash within the batch wins, so two copies arriving in one
  *     micro-batch don't both pass);
  *   - marked occurrences merge into maximal per-doc spans
  *     ([[Dedup.mergeRepeatSpans]] — the identical islands logic the
  *     batch oracle pins) and land in `spansDir`;
  *   - windows whose content is NEW to the corpus append to the index.
  *
  * State posture at 100 TB/day: stream state is the parquet index, which
  * is exactly the ExactSubstr working set — one (hash, doc_id, pos) row
  * per distinct window content, 24 bytes each, independent of document
  * size and never holding text. Unlike a GroupState formulation (one
  * state entry per hash key inside the state store), the parquet index
  * is compactable, inspectable, and shared with the batch path.
  * Exactly-once: outputs are partitioned by batch_id; a re-run first
  * deletes its own batch_id partition from both sinks and the index
  * read excludes the current batchId, so a half-written prior attempt
  * can neither duplicate spans nor flag a batch against itself.
  */
object StreamingRepeatSpans {

  private val indexSchema = StructType(Seq(
    StructField("h", LongType),
    StructField("doc_id", LongType),
    StructField("p", LongType),
    StructField("batch_id", LongType)))

  /** Read the window index, tolerating its absence (first batch). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    try spark.read.schema(indexSchema).parquet(indexDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], indexSchema)
    }

  /** One micro-batch: mark occurrences repeating the index OR a
    * lower-(doc_id, p) occurrence within the batch, merge to spans,
    * index the fresh window contents. Package-visible for direct
    * testing without a streaming harness. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, spansDir: String, k: Int): Unit = {
    val spark = batch.sparkSession
    // clear this attempt's partitions up front — dynamic overwrite only
    // replaces partitions PRESENT in the new data, so a re-run that
    // computes an empty span set would otherwise keep stale rows
    Seq(spansDir, indexDir).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    if (batch.isEmpty) return
    val wins = Dedup.windowHashes(batch, k).localCheckpoint()
    val seen = readIndex(spark, indexDir)
      .filter(col("batch_id") =!= batchId) // idempotent re-run
      .select(col("h"), lit(true).as("_seen"))
    // batch-internal first occurrence per hash (the self pass)
    val batchFirst = wins.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("p"))).as("first"))
    val tagged = wins
      .join(seen, Seq("h"), "left")
      .join(batchFirst, "h")
      .localCheckpoint() // feeds the repeat mark AND the index append
    val repeated = tagged
      .filter(col("_seen").isNotNull ||
        col("doc_id") =!= col("first.doc_id") ||
        col("p") =!= col("first.p"))
      .select(col("doc_id"), col("p"))
    val spans = Dedup.mergeRepeatSpans(repeated, k)
    // index only window contents NEW to the corpus, one row each (the
    // batch-first occurrence), so the index stays one row per distinct
    // window at any stream length
    val fresh = tagged
      .filter(col("_seen").isNull &&
        col("doc_id") === col("first.doc_id") &&
        col("p") === col("first.p"))
      .select(col("h"), col("doc_id"), col("p"))
    def writeBatch(df: DataFrame, dir: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(dir)
    writeBatch(spans, spansDir)
    writeBatch(fresh, indexDir)
  }

  /** Start the stage over a streaming (doc_id, text) frame. */
  def start(docs: DataFrame, indexDir: String, spansDir: String,
      checkpointDir: String, k: Int = 10): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, indexDir, spansDir, k)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
