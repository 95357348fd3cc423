package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.{TextAnalysis, Warc}
import graft.streaming.StreamingCcnet

/** Streaming CCNet terciles: snapshots over the accumulated scored
  * index equal the batch q170 rollup over the union, arrival order is
  * immaterial, replay is idempotent, revisits supersede latest-wins,
  * and a bootstrapped-empty index yields an empty (not failing)
  * snapshot. */
class StreamingCcnetSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-sccnet").toString

  private val model = TextAnalysis.refLmTrainOf(
    Seq((100L, "train", true, "the cat sat on the mat"),
        (101L, "train", true, "der hund lief durch den wald"),
        (102L, "train", true, "the dog ran through the park"))
      .toDF("doc_id", "split", "is_ref", "text"))

  private type Doc = (Long, String, String)

  // mixed predicted languages, enough docs per language for three
  // buckets, plus a one-token doc that carries no transition (out of
  // scope in batch AND stream)
  private val corpus: Seq[Doc] = Seq(
    (1L, "the cat sat on the mat and the dog barked", "en"),
    (2L, "the dog ran through the park with the cat", "en"),
    (3L, "a cat and a dog met in the park", "en"),
    (4L, "the mat was flat and the cat was fat", "en"),
    (5L, "der hund lief durch den wald und der fuchs", "de"),
    (6L, "der fuchs sprang ueber den faulen hund schnell", "de"),
    (7L, "den wald mag der hund und der fuchs auch", "de"),
    (8L, "mat", "en"))

  private def docsDf(rows: Seq[Doc]) =
    rows.toDF("doc_id", "text", "lang")

  private def push(out: String, batchId: Long, rows: Seq[Doc]): Unit =
    StreamingCcnet.processBatch(docsDf(rows), model, batchId, out)

  private def snap(out: String): Seq[String] =
    StreamingCcnet.snapshot(spark, out).collect().map(_.toString).toSeq

  private def wantBatch(rows: Seq[Doc]): Seq[String] = {
    val d = docsDf(rows)
    Warc.ccnetBucketsOf(
        d.withColumn("_toks",
          size(split(col("text"), " ")).cast("long")),
        d.select(col("doc_id"), col("lang")), model)
      .orderBy(col("pred_lang"), col("bucket"))
      .collect().map(_.toString).toSeq
  }

  test("snapshot over streamed state equals the batch tercile rollup " +
      "over the union, regardless of arrival order") {
    val want = wantBatch(corpus)
    assert(want.nonEmpty)
    val forward = tmp()
    push(forward, 0L, corpus.take(4))
    push(forward, 1L, corpus.drop(4))
    assert(snap(forward) == want)
    val reverse = tmp()
    push(reverse, 0L, corpus.drop(4))
    push(reverse, 1L, corpus.take(4))
    assert(snap(reverse) == want)
  }

  test("replaying a batch is idempotent (delete-own-partition)") {
    val out = tmp()
    push(out, 0L, corpus.take(4))
    push(out, 1L, corpus.drop(4))
    val before = snap(out)
    push(out, 1L, corpus.drop(4)) // replay
    assert(snap(out) == before)
  }

  test("a re-crawled doc_id supersedes its earlier score latest-wins") {
    val out = tmp()
    push(out, 0L, corpus)
    // doc 3 re-crawled with different content in a later batch
    val recrawled = (3L,
      "der wald und der hund und der fuchs zusammen", "de")
    push(out, 1L, Seq(recrawled))
    val want = wantBatch(corpus.filterNot(_._1 == 3L) :+ recrawled)
    assert(snap(out) == want)
  }

  test("bootstrapped-empty index snapshots to empty, not an error; " +
      "sub-2-token docs are out of scope in both paths") {
    val out = tmp()
    assert(snap(out).isEmpty)
    push(out, 0L, Seq((8L, "mat", "en")))
    assert(snap(out).isEmpty)
    // the 1-token doc contributes nothing to the full-corpus rollup
    assert(wantBatch(corpus) == wantBatch(corpus.filterNot(_._1 == 8L)))
  }
}
