package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: per-user sessionization with
  * `flatMapGroupsWithState` — arbitrary state beyond what
  * `session_window` expresses (running value sum, event count, explicit
  * session close on gap timeout).
  *
  * State is one small record per active user key, partitioned by the
  * group key — at 100 TB of events the state store scales with distinct
  * active users, not event volume, and the RocksDB state backend handles
  * spill.
  */
object Sessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(
      start: Long, // epoch ms
      lastTs: Long,
      nEvents: Long,
      sumValue: Double)

  case class ClosedSession(
      user_id: Long,
      session_start_epoch: Long, // seconds
      n_events: Long,
      sum_value: Double,
      duration_seconds: Long)

  val GapMs: Long = 30 * 60 * 1000L

  /** Flat-map group logic: fold this batch's events into per-user session
    * state; emit a closed session whenever a gap ≥ 30min appears. The
    * open session stays in state across batches (a production deployment
    * would additionally arm an event-time timeout to flush idle users —
    * kept out here so micro-batch scheduling stays data-driven). */
  def update(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    var out = Vector.empty[ClosedSession]
    var cur = state.getOption
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.lastTs < GapMs =>
          cur = Some(s.copy(lastTs = t, nEvents = s.nEvents + 1,
            sumValue = s.sumValue + e.value))
        case Some(s) =>
          out :+= close(userId, s)
          cur = Some(SessionState(t, t, 1, e.value))
        case None =>
          cur = Some(SessionState(t, t, 1, e.value))
      }
    }
    cur.foreach(state.update)
    out.iterator
  }

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, s.start / 1000L, s.nEvents, s.sumValue,
      (s.lastTs - s.start) / 1000L)

  /** Wire the stateful operator over a (streaming or batch) event
    * Dataset. */
  def sessions(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
