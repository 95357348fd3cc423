package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Shards
import graft.streaming.StreamingShards

/** Streaming shard append: the summed delta manifest equals the batch
  * q143 manifest over the union of batches, assignment is stable across
  * arrival batches, replay is idempotent, shard reads see every batch,
  * and the wiring works through a real MemoryStream. */
class StreamingShardsSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-sshards").toString

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def manifestRows(df: DataFrame): Map[Int, Seq[Any]] =
    df.select("shard_id", "n_docs", "n_tokens", "min_doc_id",
        "max_doc_id", "checksum")
      .collect().map(r => r.getInt(0) -> r.toSeq.tail).toMap

  private val b0 = (0L to 39L).map(i =>
    i -> (s"alpha beta doc $i " + ("w " * (i % 7).toInt).trim).trim)
  private val b1 = (40L to 99L).map(i =>
    i -> (s"gamma delta doc $i " + ("v " * (i % 5).toInt).trim).trim)

  test("summed deltas == batch manifest over the union; assignment " +
      "stable across batches; replay idempotent; reads see all batches") {
    val out = tmp()
    StreamingShards.processBatch(docs(b0: _*), 0L, out)
    StreamingShards.processBatch(docs(b1: _*), 1L, out)
    val want = manifestRows(
      Shards.manifestOf(Shards.shardAssignOf(docs(b0 ++ b1: _*))))
    assert(manifestRows(StreamingShards.readManifest(spark, out)) == want)
    // replay batch 1 (at-least-once): byte-identical sums, no double count
    StreamingShards.processBatch(docs(b1: _*), 1L, out)
    assert(manifestRows(StreamingShards.readManifest(spark, out)) == want)
    // per-shard read across the batch dimension matches the manifest
    val m = manifestRows(StreamingShards.readManifest(spark, out))
    for ((sid, vals) <- m) {
      val back = spark.read.option("basePath", s"$out/data")
        .parquet(s"$out/data/batch_id=*/shard_id=$sid")
      assert(back.count() == vals.head.asInstanceOf[Long])
      // a document's shard never depends on which batch delivered it
      val re = Shards.shardAssignOf(back.select("doc_id", "text"))
      assert(re.filter(col("shard_id") =!= sid).isEmpty)
    }
    // empty replay of a batch clears both its data and its delta
    StreamingShards.processBatch(docs(), 1L, out)
    val only0 = manifestRows(
      Shards.manifestOf(Shards.shardAssignOf(docs(b0: _*))))
    assert(manifestRows(StreamingShards.readManifest(spark, out)) == only0)
  }

  test("readManifest read contract: missing dir is an EMPTY manifest; " +
      "a foreign parquet at the path is refused, never silently summed") {
    val out = tmp()
    // bootstrap state (nothing written yet): empty frame, not an
    // AnalysisException — same contract as the other streaming indexes
    assert(StreamingShards.readManifest(spark, out).isEmpty)
    // a parquet that isn't a delta manifest (no batch_id= layout)
    import spark.implicits._
    Seq((1, "x")).toDF("a", "b").write.parquet(s"$out/manifest")
    val e1 = intercept[IllegalArgumentException] {
      StreamingShards.readManifest(spark, out).collect()
    }
    assert(e1.getMessage.contains("refusing"))
    // batch_id= layout but a pre-format/foreign schema
    val out2 = tmp()
    Seq((1, "x")).toDF("a", "b").write
      .parquet(s"$out2/manifest/batch_id=0")
    val e2 = intercept[IllegalArgumentException] {
      StreamingShards.readManifest(spark, out2).collect()
    }
    assert(e2.getMessage.contains("missing column"))
  }

  test("end-to-end through writeStream across real micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = tmp()
    val input = MemoryStream[(Long, String)]
    val q = StreamingShards.start(
      input.toDF().toDF("doc_id", "text"), out, checkpointDir = tmp())
    input.addData(b0: _*)
    q.processAllAvailable()
    input.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    val want = manifestRows(
      Shards.manifestOf(Shards.shardAssignOf(docs(b0 ++ b1: _*))))
    assert(manifestRows(StreamingShards.readManifest(spark, out)) == want)
  }
}
