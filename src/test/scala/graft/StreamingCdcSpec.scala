package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.StreamingCdc

/** Batch-level contract of the streaming CDC apply stage — exercises
  * [[StreamingCdc.processBatch]] directly (the foreachBatch body, where
  * all the semantics live): bootstrap, intra-batch compaction,
  * cross-batch out-of-order staleness, tombstone retention (watermark
  * rows that block stale post-delete resurrection), cross-partition
  * moves, re-run idempotence, and tombstone vacuum. */
class StreamingCdcSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-cdc").toString

  // changelog rows: (key, version, op, value, part)
  private def batch(rows: (Long, Long, String, String, String)*): DataFrame =
    rows.toDF("k", "v", "op", "x", "part")

  private def apply(dir: String, b: DataFrame): Unit =
    StreamingCdc.processBatch(b, Seq("k"), "v", "op", Seq("x"), "part", dir)

  /** Live (reader-visible) state via the reader API. */
  private def state(dir: String): Map[Long, (Long, String, String)] =
    StreamingCdc.readTable(spark, dir).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("last_version"), r.getAs[String]("x"),
          r.getAs[String]("part"))))
      .toMap

  /** Raw state including tombstone watermark rows: k -> (v, deleted). */
  private def rawState(dir: String): Map[Long, (Long, Boolean)] =
    spark.read.parquet(dir).collect()
      .map(r => r.getAs[Long]("k") ->
        ((r.getAs[Long]("last_version"), r.getAs[Boolean]("_deleted"))))
      .toMap

  test("bootstrap batch compacts; later batches upsert and delete; " +
      "deletes leave watermark rows readers never see") {
    val dir = tmp()
    apply(dir, batch(
      (1L, 1L, "I", "a0", "p1"), (1L, 2L, "U", "a1", "p1"), // compacts to v2
      (2L, 1L, "I", "b0", "p1"),
      (3L, 1L, "I", "c0", "p2"), (3L, 2L, "D", "c0", "p2")  // dead on arrival
    ))
    assert(state(dir) == Map(1L -> ((2L, "a1", "p1")), 2L -> ((1L, "b0", "p1"))))
    assert(rawState(dir)(3L) == ((2L, true)), "tombstone watermark retained")
    apply(dir, batch(
      (1L, 3L, "U", "a2", "p1"),  // update
      (2L, 2L, "D", "b0", "p1"),  // delete
      (4L, 1L, "I", "d0", "p2")   // insert
    ))
    assert(state(dir) == Map(1L -> ((3L, "a2", "p1")), 4L -> ((1L, "d0", "p2"))))
    assert(rawState(dir)(2L) == ((2L, true)))
  }

  test("stale cross-batch updates lose to the stored offset") {
    val dir = tmp()
    apply(dir, batch((1L, 5L, "I", "new", "p1")))
    apply(dir, batch((1L, 3L, "U", "old", "p1"))) // late arrival: ignored
    assert(state(dir) == Map(1L -> ((5L, "new", "p1"))))
    apply(dir, batch((1L, 3L, "D", "old", "p1"))) // late tombstone: ignored
    assert(state(dir) == Map(1L -> ((5L, "new", "p1"))))
  }

  test("a delete's watermark blocks stale post-delete resurrection " +
      "(round-6 ADVICE scenario); only genuinely newer data revives") {
    val dir = tmp()
    apply(dir, batch((1L, 1L, "I", "a0", "p1")))
    apply(dir, batch((1L, 5L, "D", "a0", "p1")))     // delete at v5
    assert(state(dir).isEmpty)
    apply(dir, batch((1L, 3L, "U", "zombie", "p1"))) // late OLD update
    assert(state(dir).isEmpty, "stale upsert must not resurrect a deleted key")
    assert(rawState(dir)(1L) == ((5L, true)), "watermark keeps the delete's offset")
    apply(dir, batch((1L, 6L, "I", "reborn", "p1"))) // genuinely newer
    assert(state(dir) == Map(1L -> ((6L, "reborn", "p1"))))
  }

  test("tombstones for unknown keys insert a hidden watermark that " +
      "blocks their own stale upserts") {
    val dir = tmp()
    apply(dir, batch((1L, 1L, "I", "a", "p1")))
    apply(dir, batch((9L, 4L, "D", "x", "p3")))
    assert(state(dir) == Map(1L -> ((1L, "a", "p1"))))
    assert(rawState(dir)(9L) == ((4L, true)))
    apply(dir, batch((9L, 2L, "I", "late", "p3"))) // older than the tombstone
    assert(state(dir) == Map(1L -> ((1L, "a", "p1"))))
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
    // tombstone re-run is equally idempotent (watermark blocks v==stored)
    val b3 = batch((2L, 2L, "D", "b", "p2"))
    apply(dir, b3)
    apply(dir, b3)
    assert(state(dir) == Map(1L -> ((2L, "a2", "p1"))))
    assert(rawState(dir)(2L) == ((2L, true)))
  }

  test("cross-partition move rewrites both partitions; emptied partition dir is removed") {
    val dir = tmp()
    apply(dir, batch((1L, 1L, "I", "a", "p1"), (2L, 1L, "I", "b", "p2")))
    apply(dir, batch((2L, 2L, "U", "b2", "p9"))) // key 2 moves p2 -> p9
    assert(state(dir) == Map(1L -> ((1L, "a", "p1")), 2L -> ((2L, "b2", "p9"))))
    assert(!new java.io.File(s"$dir/part=p2").exists(),
      "emptied partition directory must be removed")
  }

  test("vacuumTombstones prunes expired watermarks only, removes " +
      "partitions they alone held, and leaves others byte-identical") {
    val dir = tmp()
    apply(dir, batch(
      (1L, 1L, "I", "a", "p1"), (2L, 2L, "I", "b", "p2"),
      (3L, 3L, "D", "c", "p3")))                    // p3 = tombstone only
    apply(dir, batch((2L, 9L, "D", "b", "p2")))     // recent tombstone
    val p1Files = new java.io.File(s"$dir/part=p1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    // horizon 5: key 3's v3 tombstone expires; key 2's v9 is too recent
    val rewritten = StreamingCdc.vacuumTombstones(spark, dir, "part", 5L)
    assert(rewritten.toSet == Set("p3"))
    assert(!new java.io.File(s"$dir/part=p3").exists())
    assert(rawState(dir).keySet == Set(1L, 2L))
    assert(rawState(dir)(2L) == ((9L, true)), "recent tombstone survives")
    val p1After = new java.io.File(s"$dir/part=p1").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    assert(p1After.toSeq == p1Files.toSeq)
    // after vacuum the skew contract is the only protection left — a
    // no-op vacuum returns Nil
    assert(StreamingCdc.vacuumTombstones(spark, dir, "part", 5L).isEmpty)
  }

  test("null partition values flow through merge and vacuum via the " +
      "Hive default directory") {
    val dir = tmp()
    val withNull = Seq((1L, 1L, "I", "a", Option("p1")),
      (2L, 2L, "D", "b", Option.empty[String]))
      .toDF("k", "v", "op", "x", "part")
    StreamingCdc.processBatch(withNull, Seq("k"), "v", "op", Seq("x"),
      "part", dir)
    val hive = s"$dir/part=__HIVE_DEFAULT_PARTITION__"
    assert(new java.io.File(hive).exists())
    // merge an update into the null partition (exercises Merge's
    // normalized affected-set path)
    StreamingCdc.processBatch(
      Seq((3L, 5L, "I", "c", Option.empty[String]))
        .toDF("k", "v", "op", "x", "part"),
      Seq("k"), "v", "op", Seq("x"), "part", dir)
    assert(StreamingCdc.readTable(spark, dir)
      .filter(col("part").isNull).count() == 1)
    // vacuum the expired null-partition tombstone; key 3 keeps the dir
    assert(StreamingCdc.vacuumTombstones(spark, dir, "part", 5L)
      == Seq("__HIVE_DEFAULT_PARTITION__"))
    assert(rawState(dir).keySet == Set(1L, 3L))
    assert(new java.io.File(hive).exists())
    // vacuuming the last null-partition row removes the directory
    StreamingCdc.processBatch(
      Seq((3L, 6L, "D", "c", Option.empty[String]))
        .toDF("k", "v", "op", "x", "part"),
      Seq("k"), "v", "op", Seq("x"), "part", dir)
    StreamingCdc.vacuumTombstones(spark, dir, "part", 10L)
    assert(!new java.io.File(hive).exists())
  }

  test("a pre-retention table (no _deleted column) upgrades in place on " +
      "the first post-upgrade batch and reads as all-live") {
    val dir = tmp()
    // simulate the old layout: keys ++ payload ++ last_version ++ part
    Seq((1L, "a", 3L, "p1"), (2L, "b", 1L, "p2"))
      .toDF("k", "x", "last_version", "part")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    assert(state(dir) == Map(1L -> ((3L, "a", "p1")), 2L -> ((1L, "b", "p2"))))
    apply(dir, batch((2L, 2L, "U", "b2", "p2"), (1L, 2L, "U", "stale", "p1")))
    // upgraded schema, stale guard still works against migrated offsets
    assert(state(dir) == Map(1L -> ((3L, "a", "p1")), 2L -> ((2L, "b2", "p2"))))
    assert(rawState(dir).values.forall(!_._2))
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
