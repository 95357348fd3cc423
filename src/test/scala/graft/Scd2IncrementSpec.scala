package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Scd

/** Contract of the incremental SCD2 maintainer
  * ([[Scd.applyScd2Increment]]) and its streaming wrapper: equivalence
  * with a from-scratch rebuild for in-order feeds, bucket-scoped
  * rewrites, re-run idempotence, and the documented late-data
  * semantics. */
class Scd2IncrementSpec extends SparkSpecBase {

  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-scd2").toString

  private def batch(rows: (Long, Long, Long, String)*): DataFrame =
    rows.toDF("k", "ts", "seq", "status")

  private def apply(dir: String, b: DataFrame, nBuckets: Int = 8): Unit =
    Scd.applyScd2Increment(spark, dir, b, "k", "ts", "seq",
      Seq("status"), nBuckets)

  private def hist(df: DataFrame): Set[(Long, Int, String, Long, Option[Long], Int)] =
    df.select("k", "version", "status", "valid_from", "valid_to",
        "is_current")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getInt(5))).toSet

  private def stored(dir: String) = hist(spark.read.parquet(dir))

  test("incremental batches equal the from-scratch rebuild (in-order feed)") {
    val dir = tmp()
    val b1 = batch((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (2L, 10L, 3L, "x"))
    val b2 = batch((1L, 30L, 4L, "b"), // non-change: no new version
      (1L, 40L, 5L, "c"),              // closes b, opens c
      (3L, 15L, 6L, "z"))              // brand-new key
    apply(dir, b1)
    apply(dir, b2)
    val full = hist(Scd.scd2Of(b1.unionByName(b2), "k", "ts", "seq",
      Seq("status")))
    assert(stored(dir) == full)
  }

  test("re-running a batch is a no-op; untouched buckets stay byte-identical") {
    val dir = tmp()
    apply(dir, batch((1L, 10L, 1L, "a"), (2L, 10L, 2L, "x")))
    val before = stored(dir)
    // find a key in a different bucket than key 1 so one bucket rests
    val bucketOf = (k: Long) => spark.range(1).select(
      pmod(hash(lit(k)), lit(8)).cast("int")).head().getInt(0)
    val restingBucket = bucketOf(2L)
    assume(bucketOf(1L) != restingBucket, "fixture keys collide; adjust")
    val restingDir = new java.io.File(s"$dir/bucket=$restingBucket")
    val filesBefore = restingDir.listFiles().map(f =>
      (f.getName, f.lastModified)).toSeq
    val b = batch((1L, 20L, 3L, "b"))
    apply(dir, b)
    apply(dir, b) // replay after a simulated failure
    assert(stored(dir) == before ++ Set(
      (1L, 1, "a", 10L, Some(20L), 0), (1L, 2, "b", 20L, None, 1))
      - ((1L, 1, "a", 10L, None, 1)))
    assert(restingDir.listFiles().map(f =>
      (f.getName, f.lastModified)).toSeq == filesBefore,
      "bucket without touched keys must not be rewritten")
  }

  test("late row re-collapses against recorded changes (documented contract)") {
    val dir = tmp()
    apply(dir, batch((1L, 10L, 1L, "a"), (1L, 30L, 2L, "b")))
    apply(dir, batch((1L, 20L, 3L, "x"))) // late: lands between versions
    assert(stored(dir) == Set(
      (1L, 1, "a", 10L, Some(20L), 0),
      (1L, 2, "x", 20L, Some(30L), 0),
      (1L, 3, "b", 30L, None, 1)))
  }

  test("streaming wrapper maintains the table across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp()
    val ck = tmp()
    val ms = MemoryStream[(Long, Long, Long, String)]
    val q = graft.streaming.StreamingScd2.start(
      ms.toDF().toDF("k", "ts", "seq", "status"),
      "k", "ts", "seq", Seq("status"), dir, ck, nBuckets = 8)
    try {
      ms.addData((1L, 10L, 1L, "a"))
      q.processAllAvailable()
      ms.addData((1L, 20L, 2L, "b"), (2L, 5L, 3L, "x"))
      q.processAllAvailable()
      assert(stored(dir) == Set(
        (1L, 1, "a", 10L, Some(20L), 0),
        (1L, 2, "b", 20L, None, 1),
        (2L, 1, "x", 5L, None, 1)))
    } finally q.stop()
  }
}
