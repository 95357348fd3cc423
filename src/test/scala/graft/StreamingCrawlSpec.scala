package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Warc
import graft.streaming.StreamingCrawl

/** Streaming crawl-to-corpus accounting: summed deltas equal batch
  * q162 over the union of batches, replay (including an emptied batch)
  * is idempotent, the read contract refuses foreign state, and the
  * wiring works end to end through a real file-source stream. */
class StreamingCrawlSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-scrawl").toString

  private def blobRows(): Seq[(Long, Array[Byte])] = {
    import spark.implicits._
    Warc.synthesizeWarcBlobsOf(Tables(spark, sf0001, "documents"))
      .as[(Long, Array[Byte])].collect().toSeq
  }

  private def rollup(outDir: String): Map[String, (Long, Long, Long)] =
    StreamingCrawl.currentCorpus(spark, outDir).collect()
      .map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_fetched"), r.getAs[Long]("n_admitted"),
          r.getAs[Long]("tok_admitted")))).toMap

  private def want(blobs: Seq[(Long, Array[Byte])])
      : Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    Warc.crawlCorpusOf(blobs.toDF("blob_id", "payload")).collect()
      .map(r => r.getAs[String]("domain") ->
        ((r.getAs[Long]("n_fetched"), r.getAs[Long]("n_admitted"),
          r.getAs[Long]("tok_admitted")))).toMap
  }

  test("summed deltas equal the batch q162 rollup over the union of " +
      "batches; replay and an emptied replay are idempotent") {
    import spark.implicits._
    val out = tmp()
    val blobs = blobRows()
    val (b0, b1) = blobs.splitAt(blobs.size / 2)
    StreamingCrawl.processBatch(b0.toDF("blob_id", "payload"), 0L, out)
    StreamingCrawl.processBatch(b1.toDF("blob_id", "payload"), 1L, out)
    val full = want(blobs)
    assert(full.nonEmpty && rollup(out) == full)
    // replay batch 1: byte-identical accounting, no double count
    StreamingCrawl.processBatch(b1.toDF("blob_id", "payload"), 1L, out)
    assert(rollup(out) == full)
    // an emptied replay clears that batch's contribution
    StreamingCrawl.processBatch(
      Seq.empty[(Long, Array[Byte])].toDF("blob_id", "payload"), 1L, out)
    assert(rollup(out) == want(b0))
  }

  test("read contract: missing dir is empty; foreign parquet refused") {
    assert(StreamingCrawl.currentCorpus(spark, tmp() + "/absent")
      .collect().isEmpty)
    import spark.implicits._
    val foreign = tmp()
    Seq((1L, "x")).toDF("a", "b").write.mode("overwrite").parquet(foreign)
    val ex = intercept[IllegalArgumentException](
      StreamingCrawl.currentCorpus(spark, foreign).collect())
    assert(ex.getMessage.contains("refusing"))
  }

  test("restart from checkpoint replays the batch whose offset was " +
      "never committed — the scorecard must not double count") {
    import spark.implicits._
    val blobs = blobRows().take(6)
    val dir = Files.createTempDirectory("graft-scrawl-rec").toFile
    def seg(i: Int): Unit = {
      val (b, bytes) = blobs(i)
      java.nio.file.Files.write(
        new java.io.File(dir, s"seg-$b.warc.gz").toPath, Warc.gzip(bytes))
    }
    val (out, ck) = (tmp(), tmp())
    def startQ() = StreamingCrawl.start(
      Warc.readWarcStream(spark, dir.getAbsolutePath,
        maxFilesPerTrigger = 1), out, ck)
    seg(0)
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    assert(rollup(out) == want(blobs.take(1)))
    // crash window: batch 1's side effect commits, its offset does not
    seg(1)
    StreamingCrawl.processBatch(
      Seq(blobs(1)).toDF("blob_id", "payload"), 1L, out)
    assert(rollup(out) == want(blobs.take(2)))
    // restart: seg 1 is re-delivered as batch 1 and must rewrite
    // byte-identically; the recovered query keeps processing new data
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(rollup(out) == want(blobs.take(2)), "replay must be a no-op")
      (2 until 6).foreach(seg)
      q2.processAllAvailable()
      assert(rollup(out) == want(blobs))
    } finally q2.stop()
    dir.listFiles().foreach(_.delete()); dir.delete()
  }

  test("end to end through the real file-source stream: segments on " +
      "disk to the per-domain scorecard") {
    val blobs = blobRows().take(6)
    val dir = Files.createTempDirectory("graft-scrawl-src").toFile
    blobs.foreach { case (b, bytes) =>
      java.nio.file.Files.write(
        new java.io.File(dir, s"seg-$b.warc.gz").toPath, Warc.gzip(bytes))
    }
    val out = tmp()
    val q = StreamingCrawl.start(
      Warc.readWarcStream(spark, dir.getAbsolutePath,
        maxFilesPerTrigger = 2),
      out, checkpointDir = tmp())
    q.processAllAvailable()
    q.stop()
    assert(rollup(out) == want(blobs))
    dir.listFiles().foreach(_.delete()); dir.delete()
  }
}
