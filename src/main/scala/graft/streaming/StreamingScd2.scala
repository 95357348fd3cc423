package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.Scd

/** Streaming SCD Type-2 maintenance: fold a changelog stream into a
  * bucket-partitioned history table, one micro-batch at a time — the
  * always-on sibling of [[graft.ops.Scd.applyScd2Increment]], which
  * holds all the semantics (bucket-scoped copy-on-write, per-key
  * re-collapse, re-run idempotence, the recorded-changes late-data
  * contract). State lives entirely in the parquet table: restarting
  * the query resumes from the stream checkpoint and the table as
  * written — there is no executor state to lose.
  */
object StreamingScd2 {

  def start(changelog: DataFrame, key: String, ts: String,
      tieBreak: String, attrs: Seq[String], historyDir: String,
      checkpointDir: String, nBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Scd.applyScd2Increment(batch.sparkSession, historyDir, batch,
          key, ts, tieBreak, attrs, nBuckets)
      }
      .start()
}
