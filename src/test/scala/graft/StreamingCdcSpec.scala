package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.StreamingCdc

/** Batch-level contract of the streaming CDC apply stage — exercises
  * [[StreamingCdc.processBatch]] directly (the foreachBatch body, where
  * all the semantics live): bootstrap, intra-batch compaction,
  * cross-batch out-of-order staleness, tombstones (including for
  * unknown keys), cross-partition moves, emptied-partition removal,
  * and re-run idempotence. */
class StreamingCdcSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-cdc").toString

  // changelog rows: (key, version, op, value, part)
  private def batch(rows: (Long, Long, String, String, String)*): DataFrame =
    rows.toDF("k", "v", "op", "x", "part")

  private def apply(dir: String, b: DataFrame): Unit =
    StreamingCdc.processBatch(b, Seq("k"), "v", "op", Seq("x"), "part", dir)

  private def state(dir: String): Map[Long, (Long, String, String)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("last_version"), r.getAs[String]("x"),
          r.getAs[String]("part"))))
      .toMap

  test("bootstrap batch compacts and drops tombstones; later batches upsert and delete") {
    val dir = tmp()
    apply(dir, batch(
      (1L, 1L, "I", "a0", "p1"), (1L, 2L, "U", "a1", "p1"), // compacts to v2
      (2L, 1L, "I", "b0", "p1"),
      (3L, 1L, "I", "c0", "p2"), (3L, 2L, "D", "c0", "p2")  // dead on arrival
    ))
    assert(state(dir) == Map(1L -> ((2L, "a1", "p1")), 2L -> ((1L, "b0", "p1"))))
    apply(dir, batch(
      (1L, 3L, "U", "a2", "p1"),  // update
      (2L, 2L, "D", "b0", "p1"),  // delete
      (4L, 1L, "I", "d0", "p2")   // insert
    ))
    assert(state(dir) == Map(1L -> ((3L, "a2", "p1")), 4L -> ((1L, "d0", "p2"))))
  }

  test("stale cross-batch updates lose to the stored offset") {
    val dir = tmp()
    apply(dir, batch((1L, 5L, "I", "new", "p1")))
    apply(dir, batch((1L, 3L, "U", "old", "p1"))) // late arrival: ignored
    assert(state(dir) == Map(1L -> ((5L, "new", "p1"))))
    apply(dir, batch((1L, 3L, "D", "old", "p1"))) // late tombstone: ignored
    assert(state(dir) == Map(1L -> ((5L, "new", "p1"))))
  }

  test("tombstones for unknown keys do not insert") {
    val dir = tmp()
    apply(dir, batch((1L, 1L, "I", "a", "p1")))
    apply(dir, batch((9L, 1L, "D", "x", "p3")))
    assert(state(dir) == Map(1L -> ((1L, "a", "p1"))))
    assert(!new java.io.File(s"$dir/part=p3").exists())
  }

  test("re-running a batch is a no-op; untouched partitions are not rewritten") {
    val dir = tmp()
    apply(dir, batch((1L, 1L, "I", "a", "p1"), (2L, 1L, "I", "b", "p2")))
    val p2Files = new java.io.File(s"$dir/part=p2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    val b2 = batch((1L, 2L, "U", "a2", "p1"))
    apply(dir, b2)
    apply(dir, b2) // re-run (failed-attempt replay)
    assert(state(dir) == Map(1L -> ((2L, "a2", "p1")), 2L -> ((1L, "b", "p2"))))
    val p2After = new java.io.File(s"$dir/part=p2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    assert(p2After.toSeq == p2Files.toSeq,
      "a merge touching only p1 must leave p2's files byte-identical")
  }

  test("cross-partition move rewrites both partitions; emptied partition dir is removed") {
    val dir = tmp()
    apply(dir, batch((1L, 1L, "I", "a", "p1"), (2L, 1L, "I", "b", "p2")))
    apply(dir, batch((2L, 2L, "U", "b2", "p9"))) // key 2 moves p2 -> p9
    assert(state(dir) == Map(1L -> ((1L, "a", "p1")), 2L -> ((2L, "b2", "p9"))))
    assert(!new java.io.File(s"$dir/part=p2").exists(),
      "emptied partition directory must be removed")
  }

  test("processBatch runs end-to-end under a real MemoryStream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val ck = tmp()
    val ms = MemoryStream[(Long, Long, String, String, String)]
    val q = StreamingCdc.start(
      ms.toDF().toDF("k", "v", "op", "x", "part"),
      Seq("k"), "v", "op", Seq("x"), "part", dir, ck)
    try {
      ms.addData((1L, 1L, "I", "a", "p1"))
      q.processAllAvailable()
      ms.addData((1L, 2L, "U", "a2", "p1"), (2L, 1L, "I", "b", "p2"))
      q.processAllAvailable()
      assert(state(dir) == Map(1L -> ((2L, "a2", "p1")), 2L -> ((1L, "b", "p2"))))
    } finally q.stop()
  }
}
