package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event

class SessionizeSpec extends SparkSpecBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-03-01 10:$minute%02d:00")

  test("flatMapGroupsWithState closes sessions on gap, carries custom state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = Sessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()

    // user 1: two events 5min apart (one session), then a 40min gap opens
    // a new session -> first closes
    input.addData(
      Event(1L, ts(0), 1.0), Event(1L, ts(5), 2.0),
      Event(2L, ts(0), 5.0))
    query.processAllAvailable()
    input.addData(Event(1L, Timestamp.valueOf("2024-03-01 10:45:00"), 3.0))
    query.processAllAvailable()

    val closed = spark.table("sessions_out")
      .as[Sessionize.ClosedSession].collect()
    query.stop()

    assert(closed.length == 1)
    val s = closed.head
    assert(s.user_id == 1L)
    assert(s.n_events == 2 && s.sum_value == 3.0)
    assert(s.duration_seconds == 300)
  }

  test("idle user's open session flushes via event-time timeout, no further events needed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = Sessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("sessions_idle_out")
      .outputMode("append").start()

    // user 9 sends two events and goes silent; user 8 keeps the stream
    // alive and advances the watermark past 9's gap timeout
    input.addData(Event(9L, ts(0), 1.0), Event(9L, ts(10), 2.0),
      Event(8L, ts(0), 1.0))
    query.processAllAvailable()
    // watermark after this batch: 12:00 - 30min = 11:30 > 10:40 timeout
    input.addData(Event(8L, Timestamp.valueOf("2024-03-01 12:00:00"), 1.0))
    query.processAllAvailable()
    // one more batch so the timeout is evaluated against the new watermark
    input.addData(Event(8L, Timestamp.valueOf("2024-03-01 12:01:00"), 1.0))
    query.processAllAvailable()

    val closed = spark.table("sessions_idle_out")
      .as[Sessionize.ClosedSession].collect()
    query.stop()
    val nine = closed.filter(_.user_id == 9L)
    assert(nine.length == 1, s"idle session not flushed: ${closed.toSeq}")
    assert(nine.head.n_events == 2 && nine.head.sum_value == 3.0)
    assert(nine.head.duration_seconds == 600)
  }
}
