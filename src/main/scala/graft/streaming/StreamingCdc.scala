package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Merge, Scd}

/** Streaming CDC apply: fold a Debezium-shaped changelog stream
  * (key columns, a monotone `version` offset, an `op` code with 'D'
  * tombstones, payload columns, a partition column) into a partitioned
  * parquet table, one micro-batch at a time.
  *
  * Per batch:
  *   1. pre-compact the batch with [[Scd.applyChangelogKeepOps]] —
  *      latest version per key INCLUDING tombstones, so one merge sees
  *      one row per key no matter how chatty the feed was;
  *   2. drop STALE winners: a winner whose version is ≤ the target's
  *      stored `last_version` for that key lost to an earlier batch
  *      (cross-batch out-of-order delivery — the guard plain MERGE
  *      lacks; within a batch step 1 already ordered by version);
  *   3. one [[Merge.mergeIntoParquet]]: tombstone winners delete
  *      (`deleteWhen` on the op column, carried via extraSourceCols),
  *      everything else upserts. Only partitions holding affected keys
  *      or receiving rows are rewritten; emptied partition dirs are
  *      removed.
  *
  * The target table's schema is keys ++ payload ++ `last_version` ++
  * partition column — `last_version` is both the out-of-order guard
  * and the audit trail of WHICH feed offset a row reflects.
  *
  * Re-run idempotence: the same batch against the post-merge target is
  * a no-op — every upsert rewrites equal values (its version equals the
  * stored one... and equal versions are treated as stale, so the
  * re-run's winners all drop at step 2), every delete finds no key.
  * Tombstones for keys the target never saw (or already deleted) merge
  * as "matched: none, deleteWhen: irrelevant" — they INSERT unless
  * filtered, so step 3 drops not-matched tombstones explicitly before
  * merging.
  *
  * Scale: state lives entirely in the partitioned parquet table; the
  * per-batch cost is one map-side-combinable compaction of the batch,
  * one key-join against ONLY the affected partitions' slice, and a
  * rewrite of those partitions — batch-sized, never table-sized.
  */
object StreamingCdc {

  /** One micro-batch. Package-visible for direct testing — this is the
    * whole foreachBatch body. `payload` = target columns minus keys,
    * version and partition col. */
  private[graft] def processBatch(batch: DataFrame, keys: Seq[String],
      version: String, op: String, payload: Seq[String],
      partitionCol: String, targetDir: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val winners = Scd.applyChangelogKeepOps(batch, keys, version, op,
      payload :+ partitionCol).localCheckpoint()
    val targetCols = keys ++ payload ++ Seq("last_version", partitionCol)
    val source = winners.withColumnRenamed(op, "_cdc_op")
    val existing =
      try Some(spark.read.parquet(targetDir)) catch {
        case _: org.apache.spark.sql.AnalysisException => None
      }
    existing match {
      case None =>
        // bootstrap: no target yet — surviving rows become the table
        // overwrite: "no readable table" includes an existing-but-empty
        // directory (fresh checkout, failed first attempt)
        source.filter(col("_cdc_op") =!= "D")
          .select(targetCols.map(col): _*)
          .write.mode("overwrite").partitionBy(partitionCol)
          .parquet(targetDir)
      case Some(target) =>
        // cross-batch out-of-order guard: drop winners at or below the
        // stored offset for their key (also what makes re-runs no-ops)
        val stored = target.select(
          (keys.map(col) :+ col("last_version").as("_stored_v")): _*)
        val fresh = source.join(stored, keys, "left_outer")
          .filter(col("_stored_v").isNull ||
            col("last_version") > col("_stored_v"))
          .drop("_stored_v")
        // a tombstone for a key the target doesn't hold would INSERT
        // under merge semantics — drop those before merging
        val applicable = fresh.join(target.select(keys.map(col): _*),
            keys, "left_semi")
          .unionByName(fresh.filter(col("_cdc_op") =!= "D")
            .join(target.select(keys.map(col): _*), keys, "left_anti"))
        Merge.mergeIntoParquet(spark, targetDir,
          applicable.localCheckpoint(), keys, partitionCol,
          deleteWhen = Some(col("s._cdc_op") === "D"),
          extraSourceCols = Seq("_cdc_op"))
    }
  }

  /** Start the stage over a streaming changelog frame. */
  def start(changelog: DataFrame, keys: Seq[String], version: String,
      op: String, payload: Seq[String], partitionCol: String,
      targetDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, keys, version, op, payload, partitionCol,
          targetDir)
      }
      .start()
}
