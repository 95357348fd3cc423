package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Graph accumulation over an IN-FLIGHT edge stream — link-graph
  * edges (q124) or co-occurrence pairs arrive crawl-batch by
  * crawl-batch, and the community / cohesion reads (q187/q189) want
  * the graph SO FAR. Edges are FACTS: the index is a growing edge SET
  * under the additive [[DeltaIndex]] recipe (delete-own-partition,
  * src_batch provenance, refuse-foreign-state reads), with each batch
  * normalized on write — endpoints ordered a < b, self-loops dropped,
  * in-batch duplicates collapsed — so the set union at snapshot is
  * exact-dup-free by construction.
  *
  * Community labels are GLOBAL derivations — one new edge can relabel
  * whole regions — so (the [[StreamingCcnet]] posture: index additive,
  * verdict derived) [[communities]] runs the SAME fixed-round
  * [[graft.ops.LabelProp.propagateOf]] the batch q187 runs, over the
  * deduplicated snapshot. State is two longs per distinct edge —
  * bounded by graph size, never batch count. */
object StreamingGraph {

  private val edgeSchema: StructType = StructType(Seq(
    StructField("a", LongType),
    StructField("b", LongType),
    StructField("src_batch", LongType),
    StructField("batch_id", LongType)))

  /** One micro-batch of (a, b) edge observations: normalize and
    * append. Package-visible for direct testing. */
  private[graft] def processBatch(edges: DataFrame, batchId: Long,
      outDir: String): Unit = {
    DeltaIndex.deleteBatchPartition(edges.sparkSession, outDir, batchId)
    if (edges.isEmpty) return
    // cast FIRST: least/greatest on a string-typed source would order
    // lexicographically ("10" < "2") and break the a < b invariant
    val norm = edges
      .select(col("a").cast("long").as("_a"),
        col("b").cast("long").as("_b"))
      .select(least(col("_a"), col("_b")).as("a"),
        greatest(col("_a"), col("_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    DeltaIndex.writeDelta(norm, batchId, outDir)
  }

  /** All edge delta rows so far (shared read contract). */
  def readEdges(spark: SparkSession, outDir: String): DataFrame =
    DeltaIndex.readDeltas(spark, outDir, edgeSchema, "edge index")

  /** The accumulated distinct undirected edge set. */
  def snapshotEdges(spark: SparkSession, outDir: String): DataFrame =
    readEdges(spark, outDir).select(col("a"), col("b")).distinct()

  /** Communities of the graph so far — the batch q187 report (ONE
    * rollup definition, [[graft.ops.LabelProp.communityReport]]) over
    * the streamed edge set. */
  def communities(spark: SparkSession, outDir: String): DataFrame =
    graft.ops.LabelProp.communityReport(
      graft.ops.LabelProp.propagateOf(snapshotEdges(spark, outDir))
        .localCheckpoint(eager = false))

  /** Modularity scorecard of the graph so far — the q189 read over the
    * streamed edge set and its derived communities (both global:
    * derived at snapshot, never accumulated). */
  def modularity(spark: SparkSession, outDir: String): DataFrame = {
    val edges = snapshotEdges(spark, outDir).localCheckpoint(eager = false)
    graft.ops.LabelProp.modularityOf(edges,
      graft.ops.LabelProp.propagateOf(edges))
  }

  /** Start the edge sink over a streaming (a, b) frame. */
  def start(edges: DataFrame, outDir: String,
      checkpointDir: String): StreamingQuery =
    edges.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        processBatch(batch.toDF(), batchId, outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
