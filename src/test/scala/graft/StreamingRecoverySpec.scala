package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingCdc, StreamingScd2}

/** Crash-recovery evidence for the streaming sinks: stop a query
  * mid-stream, restart from the SAME checkpoint, and — the hard case —
  * crash in the window BETWEEN the foreachBatch side effect committing
  * and the checkpoint recording the offset. On restart Spark re-delivers
  * that batch, so exactly-once table state holds only if the batch
  * apply is idempotent under replay. Same-process re-run idempotence is
  * pinned in StreamingCdcSpec/Scd2IncrementSpec; this suite proves the
  * restart-from-checkpoint path with a real file source whose offset
  * log lives in the checkpoint. */
class StreamingRecoverySpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-recover").toString

  private def writeJsonl(dir: String, name: String,
      rows: Seq[String]): Unit =
    Files.write(Paths.get(dir, name),
      (rows.mkString("\n") + "\n").getBytes("UTF-8"))

  test("StreamingCdc: restart from checkpoint replays the batch whose " +
      "offset was never committed, and the table still converges") {
    val (src, ck, dir) = (tmp(), tmp(), tmp())
    val schema = "k LONG, v LONG, op STRING, x STRING, part STRING"
    def startQ() = StreamingCdc.start(
      spark.readStream.schema(schema).json(src),
      Seq("k"), "v", "op", Seq("x"), "part", dir, ck)
    def state(): Map[Long, (Long, String)] =
      StreamingCdc.readTable(spark, dir).collect()
        .map(r => r.getAs[Long]("k") ->
          ((r.getAs[Long]("last_version"), r.getAs[String]("x")))).toMap

    writeJsonl(src, "a.json", Seq(
      """{"k":1,"v":1,"op":"I","x":"a0","part":"p1"}"""))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop() // clean stop mid-stream
    assert(state() == Map(1L -> ((1L, "a0"))))

    // crash window: batch b's side effect commits, offset does NOT —
    // simulate by applying the batch directly (exactly what the
    // foreachBatch body did before the "crash")
    writeJsonl(src, "b.json", Seq(
      """{"k":1,"v":2,"op":"U","x":"a1","part":"p1"}""",
      """{"k":2,"v":1,"op":"I","x":"b0","part":"p2"}"""))
    StreamingCdc.processBatch(
      spark.read.schema(schema).json(s"$src/b.json"),
      Seq("k"), "v", "op", Seq("x"), "part", dir)
    assert(state() == Map(1L -> ((2L, "a1")), 2L -> ((1L, "b0"))))

    // restart: the checkpoint has only seen a.json, so b.json is
    // re-delivered and re-applied — state must not double-apply
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(state() == Map(1L -> ((2L, "a1")), 2L -> ((1L, "b0"))),
        "replayed batch must be a no-op")
      // and the recovered query keeps processing new data
      writeJsonl(src, "c.json", Seq(
        """{"k":2,"v":2,"op":"D","x":"b0","part":"p2"}"""))
      q2.processAllAvailable()
      assert(state() == Map(1L -> ((2L, "a1"))))
    } finally q2.stop()
  }

  test("StreamingScd2: restart from checkpoint replays the uncommitted " +
      "batch; history equals the no-crash run") {
    val (src, ck, dir) = (tmp(), tmp(), tmp())
    val schema = "k LONG, ts LONG, seq LONG, status STRING"
    def startQ() = StreamingScd2.start(
      spark.readStream.schema(schema).json(src),
      "k", "ts", "seq", Seq("status"), dir, ck, nBuckets = 4)
    def hist(): Set[(Long, Int, String, Int)] =
      spark.read.parquet(dir)
        .select("k", "version", "status", "is_current").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
        .toSet

    writeJsonl(src, "a.json", Seq(
      """{"k":1,"ts":10,"seq":1,"status":"a"}"""))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    assert(hist() == Set((1L, 1, "a", 1)))

    // crash between side-effect commit and offset write
    writeJsonl(src, "b.json", Seq(
      """{"k":1,"ts":20,"seq":2,"status":"b"}""",
      """{"k":2,"ts":15,"seq":3,"status":"x"}"""))
    graft.ops.Scd.applyScd2Increment(spark, dir,
      spark.read.schema(schema).json(s"$src/b.json"),
      "k", "ts", "seq", Seq("status"), nBuckets = 4)
    val afterB = Set((1L, 1, "a", 0), (1L, 2, "b", 1), (2L, 1, "x", 1))
    assert(hist() == afterB)

    val q2 = startQ()
    try {
      q2.processAllAvailable() // b.json replayed
      assert(hist() == afterB, "replayed SCD2 batch must be a no-op")
      writeJsonl(src, "c.json", Seq(
        """{"k":2,"ts":25,"seq":4,"status":"y"}"""))
      q2.processAllAvailable()
      assert(hist() ==
        Set((1L, 1, "a", 0), (1L, 2, "b", 1), (2L, 1, "x", 0),
          (2L, 2, "y", 1)))
    } finally q2.stop()
  }

  test("StreamingIvf: restart from checkpoint replays the batch whose " +
      "offset was never committed, and the postings still converge") {
    import graft.ext.IvfIndex
    import graft.streaming.StreamingIvf
    val (src, ck, dir) = (tmp(), tmp(), tmp())
    val schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    val centroids = IvfIndex.detCentroids(4, 2, 17L)
    def startQ() = StreamingIvf.start(
      spark.readStream.schema(schema).json(src), centroids, dir, ck)
    def state(): List[Long] =
      StreamingIvf.snapshot(spark, dir)
        .orderBy(col("vec_id")).collect().map(_.getLong(0)).toList

    writeJsonl(src, "a.json",
      Seq("""{"vec_id":1,"embedding":[100.0,0.0]}"""))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    assert(state() == List(1L))

    // crash window: batch 1's postings partition commits, the offset
    // does not — simulate by applying the batch body directly
    writeJsonl(src, "b.json",
      Seq("""{"vec_id":2,"embedding":[0.0,100.0]}"""))
    StreamingIvf.processBatch(
      spark.read.schema(schema).json(src + "/b.json"),
      centroids, 1L, dir)
    assert(state() == List(1L, 2L))

    // restart: Spark re-delivers batch 1; delete-own-partition makes
    // the replay byte-identical, so the snapshot must not change
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    assert(state() == List(1L, 2L))
  }

  test("StreamingSft: restart from checkpoint replays the batch whose " +
      "offset was never committed, and the turn index still converges") {
    import graft.streaming.StreamingSft
    val (src, ck, dir) = (tmp(), tmp(), tmp())
    val schema =
      "event_id LONG, user_id LONG, us LONG, event_type STRING, value DOUBLE"
    def startQ() = StreamingSft.start(
      spark.readStream.schema(schema).json(src), dir, ck)
    def state(): List[Long] =
      StreamingSft.snapshotThreads(spark, dir)
        .orderBy(col("user_id")).collect().map(_.getLong(0)).toList

    writeJsonl(src, "a.json", Seq(
      """{"event_id":1,"user_id":1,"us":1000,"event_type":"click","value":1.0}"""))
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    assert(state() == List(1L))

    // crash window: batch 1's turn partition commits, the offset does
    // not — simulate by applying the batch body directly
    writeJsonl(src, "b.json", Seq(
      """{"event_id":2,"user_id":2,"us":2000,"event_type":"error","value":3.0}"""))
    StreamingSft.processBatch(
      spark.read.schema(schema).json(src + "/b.json"), 1L, dir)
    assert(state() == List(1L, 2L))

    // restart: Spark re-delivers batch 1; delete-own-partition makes
    // the replay byte-identical, so the snapshot must not change
    val q2 = startQ()
    try q2.processAllAvailable() finally q2.stop()
    assert(state() == List(1L, 2L))
  }
}
