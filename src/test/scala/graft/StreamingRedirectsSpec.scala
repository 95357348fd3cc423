package graft

import java.nio.file.Files

import graft.streaming.StreamingRedirects

/** Streaming redirect tracking: snapshots over the accumulated fetch
  * index equal batch q158 resolution over the union, ARRIVAL ORDER is
  * immaterial (links-before-seeds and seeds-before-links converge to
  * the same verdicts), dangling progresses to resolved as the crawl
  * catches up, and replay is idempotent. */
class StreamingRedirectsSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("graft-sredir").toString

  private type Fetch = (String, Int, Option[String])

  private def push(out: String, batchId: Long, rows: Seq[Fetch]): Unit = {
    import spark.implicits._
    StreamingRedirects.processBatch(
      rows.toDF("url", "http_status", "location"), batchId, out)
  }

  private def snap(out: String): Map[String, (String, Int, String)] =
    StreamingRedirects.snapshot(spark, out).collect()
      .map(r => r.getAs[String]("origin") ->
        ((r.getAs[String]("final_url"), r.getAs[Int]("n_hops"),
          r.getAs[String]("outcome")))).toMap

  private val corpus: Seq[Fetch] = Seq(
    ("a", 301, Some("b")), ("b", 301, Some("c")), ("c", 200, None),
    ("s", 307, Some("s")),
    ("d", 302, Some("ghost")))

  private def wantBatch(rows: Seq[Fetch])
      : Map[String, (String, Int, String)] = {
    import spark.implicits._
    graft.ext.Redirects.resolveOf(
        rows.toDF("url", "http_status", "location")).collect()
      .map(r => r.getAs[String]("origin") ->
        ((r.getAs[String]("final_url"), r.getAs[Int]("n_hops"),
          r.getAs[String]("outcome")))).toMap
  }

  test("snapshot over streamed state equals the batch walk over the " +
      "union, regardless of which batch each link arrived in") {
    val forward = tmp()
    push(forward, 0L, corpus.take(2))
    push(forward, 1L, corpus.drop(2))
    val reverse = tmp()
    push(reverse, 0L, corpus.drop(2))
    push(reverse, 1L, corpus.take(2))
    val want = wantBatch(corpus)
    assert(want("a") == (("c", 2, "resolved")))
    assert(snap(forward) == want)
    assert(snap(reverse) == want)
  }

  test("dangling is 'not fetched YET': a chain broken mid-stream " +
      "progresses to resolved when the target arrives; settled " +
      "verdicts keep their values") {
    val out = tmp()
    push(out, 0L, Seq(("a", 301, Some("b")), ("s", 307, Some("s"))))
    val s0 = snap(out)
    assert(s0("a") == (("b", 0, "dangling")))
    assert(s0("s")._3 == "cap_exceeded")
    push(out, 1L, Seq(("b", 200, None)))
    val s1 = snap(out)
    assert(s1("a") == (("b", 1, "resolved")))
    assert(s1("s") == s0("s"))
  }

  test("replay is idempotent; an emptied replay removes that batch's " +
      "fetches; the read contract refuses foreign state") {
    val out = tmp()
    push(out, 0L, corpus.take(3))
    push(out, 1L, corpus.drop(3))
    val full = snap(out)
    push(out, 1L, corpus.drop(3))
    assert(snap(out) == full)
    push(out, 1L, Seq.empty)
    assert(snap(out) == wantBatch(corpus.take(3)))
    import spark.implicits._
    val foreign = tmp()
    Seq((1L, "x")).toDF("a", "b").write.mode("overwrite").parquet(foreign)
    val ex = intercept[IllegalArgumentException](
      StreamingRedirects.snapshot(spark, foreign).collect())
    assert(ex.getMessage.contains("refusing"))
  }

  test("restart from checkpoint replays the batch whose offset was " +
      "never committed — the index must not double count fetches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (out, ck) = (tmp(), tmp())
    val input = MemoryStream[(String, Int, Option[String])]
    def startQ() = StreamingRedirects.start(
      input.toDF().toDF("url", "http_status", "location"), out, ck)
    input.addData(corpus.take(2): _*)
    val q1 = startQ()
    try q1.processAllAvailable() finally q1.stop()
    // crash window: batch 1's side effect commits, its offset does not
    input.addData(corpus.drop(2): _*)
    push(out, 1L, corpus.drop(2))
    assert(snap(out) == wantBatch(corpus))
    // restart: batch 1 is re-delivered and must rewrite identically
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      assert(snap(out) == wantBatch(corpus), "replay must be a no-op")
    } finally q2.stop()
  }

  test("a URL re-fetched in a later batch supersedes its earlier " +
      "observation: one row per origin, the newer status decides") {
    val out = tmp()
    push(out, 0L, Seq(("a", 301, Some("b")), ("b", 200, None)))
    assert(snap(out)("a") == (("b", 1, "resolved")))
    // revisit: b is now itself a redirect to a fetched 200
    push(out, 1L, Seq(("b", 301, Some("c")), ("c", 200, None)))
    val rows = StreamingRedirects.snapshot(spark, out).collect()
    assert(rows.count(_.getAs[String]("origin") == "a") == 1,
      "duplicate origin rows from the revisit")
    val s = snap(out)
    assert(s("a") == (("c", 2, "resolved")))
    assert(s("b") == (("c", 1, "resolved")))
  }

  test("end to end through a real MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val out = tmp()
    val input = MemoryStream[(String, Int, Option[String])]
    val q = StreamingRedirects.start(
      input.toDF().toDF("url", "http_status", "location"),
      out, checkpointDir = tmp())
    input.addData(corpus.take(2): _*)
    q.processAllAvailable()
    input.addData(corpus.drop(2): _*)
    q.processAllAvailable()
    q.stop()
    assert(snap(out) == wantBatch(corpus))
  }
}
