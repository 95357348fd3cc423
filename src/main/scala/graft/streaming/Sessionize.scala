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
    * open session stays in state across batches, guarded by an EVENT-TIME
    * TIMEOUT armed at lastTs+gap: when the watermark passes it, Spark
    * invokes this function with hasTimedOut=true and the idle user's
    * session flushes — without it, a user who stops sending events holds
    * state (and their final session) forever. */
  def update(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val flushed = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return flushed
    }
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
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.lastTs + GapMs)
    }
    out.iterator
  }

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, s.start / 1000L, s.nEvents, s.sumValue,
      (s.lastTs - s.start) / 1000L)

  /** Wire the stateful operator over a (streaming or batch) event
    * Dataset. The watermark both bounds late data and drives the
    * event-time timeout that flushes idle users' open sessions; in batch
    * execution it is a no-op and timeouts never fire (state is discarded
    * at the end anyway). */
  def sessions(events: Dataset[Event],
      watermark: String = "30 minutes"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
