package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.LabelProp
import graft.streaming.StreamingGraph

/** Streaming edge accumulation: community snapshots equal the batch
  * LPA over the union of batches, arrival order is immaterial,
  * replays (including emptied ones) are idempotent, and edge
  * observations normalize/dedup across batches. */
class StreamingGraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sgraph").toString

  private def edgesDf(rows: Seq[(Long, Long)]) = rows.toDF("a", "b")

  private def push(out: String, id: Long, rows: Seq[(Long, Long)]): Unit =
    StreamingGraph.processBatch(edgesDf(rows), id, out)

  private def snap(out: String): Set[(Long, Long, Long)] =
    StreamingGraph.communities(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet

  private def wantBatch(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val labels = LabelProp.propagateOf(
      edgesDf(rows).select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    val sizes = labels.groupBy(col("lbl"))
      .agg(count(lit(1)).as("s"))
    labels.join(sizes, Seq("lbl"))
      .select(col("node"), col("lbl"), col("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  // two triangles bridged, plus an isolated pair
  private val g: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L),
    (20L, 21L))

  test("streamed communities equal batch LPA over the union, both " +
      "arrival orders") {
    val want = wantBatch(g)
    val out1 = tmp()
    push(out1, 0L, g.take(4)); push(out1, 1L, g.drop(4))
    assert(snap(out1) == want)
    val out2 = tmp()
    push(out2, 0L, g.drop(4)); push(out2, 1L, g.take(4))
    assert(snap(out2) == want)
  }

  test("re-observed and reversed edges collapse; self-loops dropped") {
    val out = tmp()
    push(out, 0L, g)
    push(out, 1L, g.map { case (a, b) => (b, a) } :+ (5L -> 5L))
    assert(StreamingGraph.snapshotEdges(spark, out).count() == g.size)
    assert(snap(out) == wantBatch(g))
  }

  test("replay (including an emptied batch) is idempotent") {
    val out = tmp()
    push(out, 0L, g.take(4)); push(out, 1L, g.drop(4))
    val before = snap(out)
    push(out, 1L, g.drop(4))
    assert(snap(out) == before)
    // upstream retraction: batch 1 replayed empty — its edges go
    push(out, 1L, Seq.empty)
    assert(snap(out) == wantBatch(g.take(4)))
  }

  test("streamed modularity equals the batch q189 composition over " +
      "the union") {
    val out = tmp()
    push(out, 0L, g.take(4)); push(out, 1L, g.drop(4))
    val got = StreamingGraph.modularity(spark, out)
      .collect().map(_.toSeq).toSet
    val e = edgesDf(g).select(col("a"), col("b")).distinct()
      .localCheckpoint()
    val want = LabelProp.modularityOf(e, LabelProp.propagateOf(e))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    // the two triangles carry positive contributions (community-like)
    assert(got.count(_.last.asInstanceOf[Long] > 0L) >= 2)
  }

  test("bootstrapped-empty index yields an empty snapshot") {
    val out = tmp()
    push(out, 0L, Seq.empty)
    assert(StreamingGraph.snapshotEdges(spark, out).count() == 0)
    assert(snap(out).isEmpty)
  }
}
