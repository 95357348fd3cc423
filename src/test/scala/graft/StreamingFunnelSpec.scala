package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{Conversion, Event}

class StreamingFunnelSpec extends SparkSpecBase {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("conversions emit across micro-batches; order and window enforced") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamingFunnel.conversions(input.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()

    input.addData(
      // user 1: view + click in batch 1, purchase arrives in batch 2
      Event(1L, "view", ts("2024-03-01 10:00:00")),
      Event(1L, "click", ts("2024-03-01 10:05:00")),
      // user 2: click BEFORE any view — never converts
      Event(2L, "click", ts("2024-03-01 10:00:00")),
      Event(2L, "view", ts("2024-03-01 10:05:00")),
      Event(2L, "purchase", ts("2024-03-01 10:09:00")),
      // user 3: full journey in one batch
      Event(3L, "view", ts("2024-03-01 09:00:00")),
      Event(3L, "click", ts("2024-03-01 09:30:00")),
      Event(3L, "purchase", ts("2024-03-01 09:45:00")))
    query.processAllAvailable()
    input.addData(Event(1L, "purchase", ts("2024-03-01 11:00:00")))
    query.processAllAvailable()
    // user 4: purchase window expired (>1 day after click)
    input.addData(
      Event(4L, "view", ts("2024-03-02 10:00:00")),
      Event(4L, "click", ts("2024-03-02 10:30:00")),
      Event(4L, "purchase", ts("2024-03-03 11:00:00")))
    query.processAllAvailable()

    val got = spark.table("funnel_out").as[Conversion].collect()
    query.stop()
    assert(got.map(_.user_id).sorted.sameElements(Array(1L, 3L)))
    val u1 = got.find(_.user_id == 1L).get
    assert(u1.purchase_epoch - u1.view_epoch == 3600)
  }

  test("funnel re-arms after a conversion; one row per completed journey") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamingFunnel.conversions(input.toDS())
      .writeStream.format("memory").queryName("funnel_rearm_out")
      .outputMode("append").start()

    input.addData(
      Event(7L, "view", ts("2024-03-01 10:00:00")),
      Event(7L, "click", ts("2024-03-01 10:10:00")),
      Event(7L, "purchase", ts("2024-03-01 10:20:00")),
      // second journey, same batch, later in event time
      Event(7L, "view", ts("2024-03-01 12:00:00")),
      Event(7L, "click", ts("2024-03-01 12:10:00")))
    query.processAllAvailable()
    input.addData(Event(7L, "purchase", ts("2024-03-01 12:20:00")))
    query.processAllAvailable()

    val got = spark.table("funnel_rearm_out").as[Conversion].collect()
    query.stop()
    assert(got.length == 2)
    assert(got.map(_.view_epoch).toSet.size == 2)
  }

  test("state for an unreachable funnel is dropped via event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = StreamingFunnel.conversions(input.toDS())
      .writeStream.format("memory").queryName("funnel_timeout_out")
      .outputMode("append").start()

    // user 5 views then goes silent; user 6 advances the watermark two
    // days — 5's conversion deadline passes, state drops, and a LATER
    // click (well inside what WOULD have been the window had state been
    // kept wrongly alive... here: outside it anyway) starts nothing
    input.addData(
      Event(5L, "view", ts("2024-03-01 10:00:00")),
      Event(6L, "view", ts("2024-03-01 10:00:00")))
    query.processAllAvailable()
    input.addData(Event(6L, "view", ts("2024-03-03 12:00:00")))
    query.processAllAvailable()
    input.addData(Event(6L, "view", ts("2024-03-03 12:01:00")))
    query.processAllAvailable()
    // a fresh view for 5 must START a NEW funnel (old state gone), and a
    // click right after it qualifies relative to the NEW view only
    input.addData(
      Event(5L, "view", ts("2024-03-03 13:00:00")),
      Event(5L, "click", ts("2024-03-03 13:05:00")),
      Event(5L, "purchase", ts("2024-03-03 13:10:00")))
    query.processAllAvailable()

    val got = spark.table("funnel_timeout_out").as[Conversion].collect()
    query.stop()
    val u5 = got.filter(_.user_id == 5L)
    assert(u5.length == 1)
    // epochs prove the conversion used the 2024-03-03 journey, not the
    // stale 03-01 view
    assert(u5.head.view_epoch ==
      ts("2024-03-03 13:00:00").getTime / 1000)
  }
}
