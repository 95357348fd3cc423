package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.StreamingRepeatSpans
import graft.ext.Dedup

/** Batch-level contract of the streaming exact-substring repeat-span
  * stage — exercises [[StreamingRepeatSpans.processBatch]] directly
  * (the foreachBatch body), mirroring StreamingNearDupSpec. k = 3
  * throughout so short fixtures exercise every path. */
class StreamingRepeatSpanSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-srs").toString

  private def df(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def spans(dir: String): Set[(Long, Long, Long, Long)] =
    try spark.read.parquet(dir)
      .select("doc_id", "span_start", "span_end", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }

  test("batch N repeating batch N-1 content is marked; fresh content " +
      "indexes once per distinct window, never text") {
    val (idx, out) = (tmp(), tmp())
    StreamingRepeatSpans.processBatch(
      df(1L -> "a b c d e", 2L -> "p q r s"), 0L, idx, out, k = 3)
    assert(spans(out).isEmpty)
    // doc 11 embeds doc 1's "a b c d" -> windows @2 [a b c], @3 [b c d]
    // merge to tokens 2..5; doc 12 is fresh
    StreamingRepeatSpans.processBatch(
      df(11L -> "x a b c d y", 12L -> "f g h i"), 1L, idx, out, k = 3)
    assert(spans(out) == Set((11L, 2L, 5L, 4L)))
    val index = spark.read.parquet(idx)
    assert(index.columns.toSet == Set("h", "doc_id", "p", "batch_id"))
    // batch 0: 3+2 windows, all fresh; batch 1: doc 11 contributes its
    // two non-repeating windows [x a b], [c d y]; doc 12 its two — and
    // the repeated contents do NOT re-index
    assert(index.filter(col("batch_id") === 0).count() == 5)
    assert(index.filter(col("batch_id") === 1).count() == 4)
    // one row per distinct window content across the whole stream
    assert(index.select("h").distinct().count() == index.count())
  }

  test("intra-batch repeats: the lowest (doc_id, p) copy wins, the " +
      "other is marked in the same micro-batch") {
    val (idx, out) = (tmp(), tmp())
    StreamingRepeatSpans.processBatch(
      df(5L -> "m n o p", 9L -> "z m n o"), 0L, idx, out, k = 3)
    // doc 9's window @2 [m n o] repeats doc 5's @1 -> span tokens 2..4
    assert(spans(out) == Set((9L, 2L, 4L, 3L)))
  }

  test("re-running a batch is idempotent: spans and index rows are " +
      "replaced, not duplicated, and a batch never repeats itself") {
    val (idx, out) = (tmp(), tmp())
    StreamingRepeatSpans.processBatch(df(1L -> "a b c d e"), 0L, idx, out, 3)
    StreamingRepeatSpans.processBatch(df(21L -> "a b c d e"), 1L, idx, out, 3)
    val first = spans(out)
    assert(first == Set((21L, 1L, 5L, 5L)))
    // replay batch 1 (failure recovery): same output, index unchanged
    StreamingRepeatSpans.processBatch(df(21L -> "a b c d e"), 1L, idx, out, 3)
    assert(spans(out) == first)
    val index = spark.read.parquet(idx)
    assert(index.count() == 3) // doc 1's three windows, indexed once
    // empty re-run of batch 1 clears its partitions (no stale rows)
    StreamingRepeatSpans.processBatch(df(), 1L, idx, out, 3)
    assert(spans(out).isEmpty)
  }

  test("end-to-end through writeStream: spans accumulate across real " +
      "micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (idx, out) = (tmp(), tmp())
    val input = MemoryStream[(Long, String)]
    val q = StreamingRepeatSpans.start(
      input.toDF().toDF("doc_id", "text"), idx, out,
      checkpointDir = tmp(), k = 3)
    input.addData(1L -> "a b c d e")
    q.processAllAvailable()
    input.addData(21L -> "z a b c d")
    q.processAllAvailable()
    q.stop()
    // doc 21's windows @2 [a b c], @3 [b c d] repeat batch 0 -> one span
    assert(spans(out) == Set((21L, 2L, 5L, 4L)))
    // index: doc 1's three windows + doc 21's fresh [z a b]
    assert(spark.read.parquet(idx).count() == 4)
  }

  test("streaming marks equal the batch q120 pass over the union of " +
      "all batches (same corpus, same spans)") {
    val (idx, out) = (tmp(), tmp())
    val b0 = Seq(1L -> "a b c d e", 2L -> "p q r s t")
    val b1 = Seq(11L -> "x a b c d y", 12L -> "p q r s w")
    StreamingRepeatSpans.processBatch(df(b0: _*), 0L, idx, out, 3)
    StreamingRepeatSpans.processBatch(df(b1: _*), 1L, idx, out, 3)
    val batchSpans = Dedup.repeatSpansOf(df((b0 ++ b1): _*), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(spans(out) == batchSpans)
  }
}
