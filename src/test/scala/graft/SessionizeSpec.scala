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
}
