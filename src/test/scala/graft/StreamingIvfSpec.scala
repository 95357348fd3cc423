package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{IvfIndex, Similarity}
import graft.streaming.StreamingIvf

/** Streaming IVF postings: snapshots equal the batch assignment over
  * the union, arrival order is immaterial, replay is idempotent,
  * re-ingested vectors supersede latest-wins, mixed index definitions
  * are refused, a bootstrapped-empty index yields an empty snapshot,
  * and probing a snapshot equals probing the batch index. */
class StreamingIvfSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sivf").toString

  private def corpus() =
    Tables(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding")).as[Similarity.Vec]

  private val centroids = IvfIndex.detCentroids(8, 64, 17L)

  private def push(out: String, batchId: Long,
      vecs: org.apache.spark.sql.DataFrame): Unit =
    StreamingIvf.processBatch(vecs, centroids, batchId, out)

  private def snap(out: String): List[(Long, Int)] =
    StreamingIvf.snapshot(spark, out)
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList

  private def wantBatch(ds: org.apache.spark.sql.Dataset[Similarity.Vec])
      : List[(Long, Int)] =
    IvfIndex.assign(ds, centroids)
      .orderBy(col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList

  test("stream equals batch over the union, in both arrival orders") {
    val all = corpus().localCheckpoint()
    val a = all.filter(col("vec_id") % 2 === 0).toDF()
    val b = all.filter(col("vec_id") % 2 =!= 0).toDF()
    val want = wantBatch(all)

    val out1 = tmp()
    push(out1, 0L, a); push(out1, 1L, b)
    assert(snap(out1) == want)

    val out2 = tmp()
    push(out2, 0L, b); push(out2, 1L, a)
    assert(snap(out2) == want)
  }

  test("replaying a batch is idempotent") {
    val all = corpus().localCheckpoint()
    val a = all.filter(col("vec_id") < 100).toDF()
    val b = all.filter(col("vec_id") >= 100).toDF()
    val out = tmp()
    push(out, 0L, a); push(out, 1L, b)
    val before = snap(out)
    push(out, 1L, b) // crash-recovery replay of the same batch
    assert(snap(out) == before)
  }

  test("a re-ingested vector supersedes its earlier posting latest-wins") {
    val all = corpus().localCheckpoint()
    val v = all.filter(col("vec_id") === 0).head()
    // "re-embed" vector 0: a different embedding can land a different list
    val moved = Seq(Similarity.Vec(0L,
      centroids(5).map(_.toFloat))).toDS().toDF()
    val out = tmp()
    push(out, 0L, Seq(v).toDS().toDF())
    push(out, 1L, moved)
    val got = snap(out)
    assert(got.length == 1)
    assert(got.head == (0L -> 5))
  }

  test("postings from two index definitions are refused, not merged") {
    val all = corpus().localCheckpoint()
    val other = IvfIndex.detCentroids(8, 64, 99L)
    val out = tmp()
    push(out, 0L, all.filter(col("vec_id") < 50).toDF())
    StreamingIvf.processBatch(all.filter(col("vec_id") >= 50).toDF(),
      other, 1L, out)
    val e = intercept[IllegalArgumentException] { snap(out) }
    assert(e.getMessage.contains("index definitions"))
  }

  test("bootstrapped-empty index snapshots empty; empty batch clears " +
      "its partition on replay") {
    val out = tmp()
    push(out, 0L, corpus().limit(0).toDF()) // bootstrap with nothing
    assert(snap(out).isEmpty)
    push(out, 1L, corpus().filter(col("vec_id") < 10).toDF())
    assert(snap(out).size == 10)
    // the batch is replayed EMPTY (upstream retraction): rows must go
    push(out, 1L, corpus().limit(0).toDF())
    assert(snap(out).isEmpty)
  }

  test("probing a snapshot equals probing the batch-built index") {
    val all = corpus().localCheckpoint()
    val out = tmp()
    push(out, 0L, all.filter(col("vec_id") % 3 === 0).toDF())
    push(out, 1L, all.filter(col("vec_id") % 3 === 1).toDF())
    push(out, 2L, all.filter(col("vec_id") % 3 === 2).toDF())
    val streamPostings = StreamingIvf.snapshot(spark, out)
    val batchPostings = IvfIndex.assign(all, centroids)
    val qs = all.filter(col("vec_id") < 8)
    val viaStream = IvfIndex.probe(qs, all, streamPostings, centroids,
      nProbe = 4, k = 5).collect().map(_.toString).toList
    val viaBatch = IvfIndex.probe(qs, all, batchPostings, centroids,
      nProbe = 4, k = 5).collect().map(_.toString).toList
    assert(viaStream == viaBatch)
  }

  test("centroidFp distinguishes definitions and is stable") {
    val a = IvfIndex.detCentroids(8, 64, 17L)
    val b = IvfIndex.detCentroids(8, 64, 18L)
    assert(StreamingIvf.centroidFp(a) ==
      StreamingIvf.centroidFp(IvfIndex.detCentroids(8, 64, 17L)))
    assert(StreamingIvf.centroidFp(a) != StreamingIvf.centroidFp(b))
    val c = a.map(_.clone())
    c(3)(40) += 1.0
    assert(StreamingIvf.centroidFp(a) != StreamingIvf.centroidFp(c))
  }
}
