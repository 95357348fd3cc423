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
  *   - the batch is ALSO checked against itself ([[Dedup.selfNearDupSigs]])
  *     so two near-identical docs arriving in one micro-batch don't both
  *     get admitted — the lowest id of an intra-batch dup group survives;
  *   - clean docs are appended to `admittedDir` and their signatures to
  *     the index; flagged docs go to `flaggedDir` with their best match.
  *
  * State posture at 100 TB/day: stream state is the parquet signature
  * index, which grows by 8×64 bytes per admitted document regardless of
  * document size, and the text of a batch never joins against anything
  * larger than the batch itself. Exactly-once: every output (admitted,
  * flagged, index) is partitioned by batch_id; a re-run first DELETES
  * its own batch_id partition from all three sinks (dynamic partition
  * overwrite alone would leave a failed attempt's rows behind when the
  * re-run computes an empty set), and the index read also excludes the
  * current batch's rows so a half-written prior attempt cannot flag a
  * batch as a dup of itself.
  *
  * Replay vs compaction: foreachBatch is at-least-once, so batch N may
  * replay AFTER [[compactIndex]] folded N's admitted signatures into
  * the reserved `batch_id=-1` partition — the partition column then no
  * longer says which batch contributed a row. Every index row therefore
  * carries its ORIGIN batch as a data column (`src_batch`), preserved
  * verbatim through compaction, and the idempotent-replay filter
  * excludes on `src_batch`, never on the partition column. Without
  * this, a replayed batch would match every doc against its own
  * compacted signature (est_jaccard 1.0) and the whole batch would
  * silently vanish from the admitted sink.
  */
object StreamingNearDup {

  private val sigSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig", ArrayType(LongType)),
    StructField("src_batch", LongType),
    StructField("batch_id", LongType)))

  /** Read the signature index, tolerating its absence (first batch). */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame = {
    // probe the path explicitly: ONLY a genuinely-missing index (first
    // batch) reads as empty — a corrupt or schema-broken index must fail
    // loudly, not silently under-flag a batch (a blanket AnalysisException
    // catch here used to swallow both cases). Verify the on-disk columns
    // too: a forced-schema read would fill a missing src_batch with
    // nulls, and the =!= filter over nulls drops every row silently.
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries =
      if (fs.exists(p)) fs.listStatus(p).map(_.getPath.getName) else Array.empty[String]
    val hasParts = entries.exists(_.startsWith("batch_id="))
    if (!hasParts) {
      // legitimately empty only when missing, bare, or holding nothing
      // beyond write-job metadata (_SUCCESS etc.); anything else is not
      // our index and must not silently read as empty
      val stray = entries.filterNot(n => n.startsWith("_") || n.startsWith("."))
      require(stray.isEmpty,
        s"signature index at $indexDir has no batch_id= partitions but " +
          s"contains ${stray.mkString(", ")} — not a StreamingNearDup " +
          "index; refusing to read it as empty")
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], sigSchema)
    } else {
      val onDisk = spark.read.parquet(indexDir).schema.fieldNames.toSet
      val missing = sigSchema.fieldNames.filterNot(onDisk)
      require(missing.isEmpty,
        s"signature index at $indexDir is missing column(s) " +
          s"${missing.mkString(", ")} — not a StreamingNearDup index " +
          "(or pre-provenance format); rebuild it")
      spark.read.schema(sigSchema).parquet(indexDir)
    }
  }

  /** One micro-batch: flag near-dups of the index AND of lower-id docs
    * within the batch itself (without the self pass, two copies arriving
    * in one micro-batch would both be admitted and indexed), admit the
    * rest, append the admitted signatures. Package-visible for direct
    * testing without a streaming harness. */
  private[graft] def processBatch(batch: DataFrame, batchId: Long,
      indexDir: String, admittedDir: String, flaggedDir: String,
      tau: Double): Unit = {
    val spark = batch.sparkSession
    // a re-run attempt must not inherit the failed attempt's partition:
    // dynamic overwrite only replaces partitions PRESENT in the new
    // data, so a re-run that computes an empty set (or an empty batch)
    // would otherwise leave the stale rows — e.g. a doc both flagged
    // and admitted. Drop batch_id=N from every sink up front.
    Seq(flaggedDir, admittedDir, indexDir).foreach { dir =>
      val p = new org.apache.hadoop.fs.Path(dir, s"batch_id=$batchId")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (fs.exists(p)) fs.delete(p, true)
    }
    if (batch.isEmpty) return
    val sigs = Dedup.minhashSignaturesOf(batch).localCheckpoint(eager = false)
    // idempotent re-run: exclude THIS batch's prior contribution by its
    // provenance column, not the partition — compaction may have moved
    // the rows into batch_id=-1, where only src_batch still knows
    val seen = readIndex(spark, indexDir)
      .filter(col("src_batch") =!= batchId)
      .select(col("doc_id"), col("sig")).localCheckpoint(eager = false)
    // union of the index pass and the intra-batch self pass, best match
    // per doc (the self pass never flags a group's lowest id, so one
    // representative of a batch-internal dup group is still admitted)
    val flagged = Dedup.incrementalNearDupSigs(sigs, seen, tau)
      .unionByName(Dedup.selfNearDupSigs(sigs, tau))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("est_jaccard"), col("near_dup_of"))).as("best"))
      .select(col("doc_id"), col("best.near_dup_of").as("near_dup_of"),
        col("best.est_jaccard").as("est_jaccard"))
      .localCheckpoint(eager = false)
    // idempotent per batch: each write lands in its own batch_id
    // partition (cleared above) and overwrites ONLY that partition
    def writeBatch(df: DataFrame, dir: String): Unit =
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(dir)
    writeBatch(flagged, flaggedDir)
    writeBatch(batch.join(flagged.select(col("doc_id")),
      Seq("doc_id"), "left_anti"), admittedDir)
    writeBatch(sigs.join(flagged.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
      .withColumn("src_batch", lit(batchId)), indexDir)
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

  /** Compact the signature index into the single reserved
    * `batch_id=-1` partition — the [[StreamingRepeatSpans.compactIndex]]
    * recipe applied to the signatures: one partition directory per
    * micro-batch otherwise accumulates forever (small-files, not size —
    * the index stays 8×64 bytes per admitted doc). Dedup by doc_id
    * keeping the min-src_batch copy is defensive only (admission writes
    * each doc once). Each kept row's `src_batch` provenance is preserved
    * so a later replay of any batch can still exclude its own rows (see
    * the class doc). Same crash ordering: materialize → commit −1 →
    * delete sources; duplicates from an in-between crash admit/flag
    * identically (the banded join is set-shaped) and vanish next
    * compaction. Cadence is the caller's knob (every N batches or a
    * maintenance job); flag equality is spec-pinned. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val old = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("batch_id=") &&
        p.getName != "batch_id=-1")
    val compacted = readIndex(spark, indexDir)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("src_batch"), col("sig"))).as("first"))
      .select(col("doc_id"), col("first.sig").as("sig"),
        col("first.src_batch").as("src_batch"))
      .localCheckpoint(eager = false) // materialize BEFORE overwriting what was read
    compacted.withColumn("batch_id", lit(-1L))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(indexDir)
    old.foreach(p => fs.delete(p, true))
  }
}
