package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The shared write/read recipe for ADDITIVE streaming delta indexes —
  * one definition of the three moves every delta-index module makes:
  *
  *   - delete the batch's own `batch_id=` partition up front, so a
  *     replay rewrites byte-identically and an EMPTIED replay clears
  *     stale rows instead of keeping them;
  *   - write the batch's delta rows tagged with `src_batch` provenance
  *     under that partition (after any data files the delta accounts
  *     for, so delta-present implies data-present);
  *   - read the whole index under the refuse-foreign-state contract: a
  *     missing or just-bootstrapped dir is EMPTY, anything other than
  *     `batch_id=` partitions carrying the expected schema is refused,
  *     never silently summed.
  *
  * [[StreamingCrawl]] and [[StreamingRedirects]] build on this; the
  * five older indexed modules (Shards, DomainCaps, NearDup, Quantiles,
  * RepeatSpans) predate it and keep their in-place copies — several
  * interleave module-specific compaction into the same moves. */
private[streaming] object DeltaIndex {

  /** Delete `outDir/batch_id=N` if present (call FIRST, even for an
    * empty batch). */
  def deleteBatchPartition(spark: SparkSession, outDir: String,
      batchId: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(outDir, s"batch_id=$batchId")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Write `delta` as the batch's rows: `src_batch` + `batch_id`
    * appended, one file (delta frames are aggregate-sized). */
  def writeDelta(delta: DataFrame, batchId: Long, outDir: String): Unit =
    delta
      .withColumn("src_batch", lit(batchId))
      .withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  /** Read all committed delta rows under the shared contract. `what`
    * names the index in refusal messages. */
  def readDeltas(spark: SparkSession, outDir: String,
      schema: StructType, what: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(outDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val entries =
      if (fs.exists(p)) fs.listStatus(p).map(_.getPath.getName)
      else Array.empty[String]
    if (!entries.exists(_.startsWith("batch_id="))) {
      val stray = entries.filterNot(n => n.startsWith("_") || n.startsWith("."))
      require(stray.isEmpty,
        s"$what at $outDir has no batch_id= partitions but contains " +
          s"${stray.mkString(", ")} — refusing to read as empty")
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    } else {
      // the refuse-foreign-state contract holds on the populated side
      // too: stray non-partition entries at the index root would be
      // silently folded into the rollup by spark.read.parquet (or
      // surface as a confusing partition-discovery failure)
      val stray = entries.filterNot(n =>
        n.startsWith("batch_id=") || n.startsWith("_") || n.startsWith("."))
      require(stray.isEmpty,
        s"$what at $outDir contains non-partition entries " +
          s"${stray.mkString(", ")} next to its batch_id= partitions — " +
          "refusing to fold foreign files into the index")
      val onDisk = spark.read.parquet(outDir).schema.fieldNames.toSet
      val missing = schema.fieldNames.filterNot(onDisk)
      require(missing.isEmpty,
        s"$what at $outDir is missing column(s) " +
          s"${missing.mkString(", ")} — refusing to read it")
      spark.read.schema(schema).parquet(outDir)
    }
  }
}
