package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.Redirects

/** Streaming redirect tracking — q158's chain resolution as fetch
  * results STREAM in: each micro-batch appends its (url, http_status,
  * location) rows to an ADDITIVE fetch index (src_batch provenance,
  * batch_id partitions deleted up front — the house recipe), and a
  * snapshot resolves every chain against the index accumulated SO FAR
  * with the same bounded walk the batch operator runs.
  *
  * Semantics under arrival order: a chain's links may arrive in any
  * order across batches — a `Location` target fetched in a LATER batch
  * than its referrer resolves identically once both are in the index,
  * because resolution reads the index, not the arrival sequence
  * (spec-pinned by feeding the same corpus in opposite orders). A
  * snapshot's `dangling` therefore means "not fetched YET" — it can
  * progress to `resolved` in a later snapshot as the crawl catches up,
  * which is exactly a frontier's view of an in-flight crawl; `resolved`
  * and `cap_exceeded` verdicts never change once reachable state is
  * complete. */
object StreamingRedirects {

  private val fetchSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("url",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("http_status",
      org.apache.spark.sql.types.IntegerType),
    org.apache.spark.sql.types.StructField("location",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("src_batch",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("batch_id",
      org.apache.spark.sql.types.LongType)))

  /** One micro-batch: append the batch's fetch rows to the index.
    * Package-visible for direct testing without a streaming harness. */
  private[graft] def processBatch(fetches: DataFrame, batchId: Long,
      outDir: String): Unit = {
    val spark = fetches.sparkSession
    val p = new org.apache.hadoop.fs.Path(outDir, s"batch_id=$batchId")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
    if (fetches.isEmpty) return
    fetches
      .select(col("url"), col("http_status").cast("int"),
        col("location").cast("string"))
      .withColumn("src_batch", lit(batchId))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)
  }

  /** The fetch index accumulated so far. Shared read contract: a
    * missing or just-bootstrapped dir is EMPTY; anything other than
    * batch_id= partitions with the fetch schema is refused. */
  def readFetches(spark: SparkSession, outDir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries =
      if (fs.exists(p)) fs.listStatus(p).map(_.getPath.getName)
      else Array.empty[String]
    if (!entries.exists(_.startsWith("batch_id="))) {
      val stray = entries.filterNot(n => n.startsWith("_") || n.startsWith("."))
      require(stray.isEmpty,
        s"fetch index at $outDir has no batch_id= partitions but " +
          s"contains ${stray.mkString(", ")} — refusing to read as empty")
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], fetchSchema)
    } else {
      val onDisk = spark.read.parquet(outDir).schema.fieldNames.toSet
      val missing = fetchSchema.fieldNames.filterNot(onDisk)
      require(missing.isEmpty,
        s"fetch index at $outDir is missing column(s) " +
          s"${missing.mkString(", ")} — not a StreamingRedirects index")
      spark.read.schema(fetchSchema).parquet(outDir)
    }
  }

  /** Resolve every chain against the index accumulated so far — the
    * batch operator over the streamed state. */
  def snapshot(spark: SparkSession, outDir: String,
      maxHops: Int = Redirects.MaxHops): DataFrame =
    Redirects.resolveOf(
      readFetches(spark, outDir)
        .select(col("url"), col("http_status"), col("location")),
      maxHops)

  /** Start the fetch-index sink over a streaming (url, http_status,
    * location) frame. */
  def start(fetches: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    fetches.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
