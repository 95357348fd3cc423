package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.{Clean, Enrich}
import graft.pipeline.FilePipeline.Layout
import graft.schema.Schemas

/** Structured Streaming variant of the ingest pipeline (SURVEY.md §2 K2/K3,
  * B6): the file-source checkpoint replaces the reference's
  * directory-state machine — exactly-once per file with no moves needed —
  * and `cleanSource=archive` reproduces the cold-storage move as a source
  * option.
  *
  * The per-batch body is the same clean→enrich→append used by the batch
  * pipeline; `foreachBatch` gives one atomic commit per micro-batch (the
  * Spark analogue of the reference's per-file transaction, K3/K6).
  */
object StreamingIngest {

  /** Start the incremental CSV ingest stream over `incoming/ * / *.csv`.
    * maxFilesPerTrigger bounds micro-batch size (the scale knob the
    * reference's 50-file index-drop heuristic, D3, approximates). */
  def start(spark: SparkSession, root: String,
      checkpoint: String, maxFilesPerTrigger: Int = 50,
      archiveSource: Boolean = true): StreamingQuery = {
    val layout = Layout(root)
    val reader = spark.readStream
      .option("header", "true")
      .option("pathGlobFilter", "*.csv")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .schema(Schemas.rawCsvSchema)
    val withArchive =
      if (archiveSource)
        reader.option("cleanSource", "archive")
          .option("sourceArchiveDir", layout.archive)
      else reader
    val raw = withArchive
      .csv(s"${layout.incoming}/*")
      .withColumn("_file", input_file_name())
      .withColumn("file_simulation_id",
        regexp_extract(col("_file"), "rxndata_([0-9a-fA-F-]{36})\\.csv", 1))
      .withColumn("day",
        regexp_extract(col("_file"), "/([^/]+)/[^/]+\\.csv$", 1))
      .drop("_file")

    raw.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val cleaned = Clean.clean(batch)
          .withColumn("row_id", monotonically_increasing_id())
          .withColumn("simulation_num", lit(null).cast("int"))
        val dim = graft.pipeline.FilePipeline.readDim(batch.sparkSession, layout)
        Enrich.enrichFact(cleaned, dim)
          .select((Schemas.factSimSchema.fieldNames.map(col) :+ col("day")): _*)
          .write.mode("append").partitionBy("day").parquet(layout.factTable)
        ()
      }
      .start()
  }

  /** Event-time analytics over a stream: tumbling window + watermark —
    * the streaming twin of queries.Relational.q17 (same plan shape under
    * readStream; late rows beyond the watermark are dropped). */
  def windowedCounts(events: DataFrame,
      watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start_epoch"),
        col("event_type"), col("n_events"), col("sum_value"))
}
