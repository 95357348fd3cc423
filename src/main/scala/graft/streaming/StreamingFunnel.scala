package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel: the micro-batch twin of the batch q85
  * (view → click → purchase, each step strictly after the previous and
  * within a conversion window), run as a per-user state machine with
  * `flatMapGroupsWithState` so conversions emit the moment the final
  * step arrives instead of at end-of-day batch.
  *
  * State per active user is TWO LONGS (first view ts, first qualifying
  * click ts) — at 100 TB/day of events the state store scales with
  * users currently inside an open funnel window, never with event
  * volume. An EVENT-TIME TIMEOUT is armed at the open step's conversion
  * deadline: when the watermark passes it the funnel can no longer
  * complete (any qualifying event would be late beyond the watermark)
  * and the state is dropped — without it, every user who ever viewed
  * would hold state forever.
  *
  * Same semantics as q85's conditional-min cascade for in-order data:
  * FIRST view arms the funnel, FIRST qualifying click advances it, the
  * first qualifying purchase converts; the funnel then re-arms on the
  * next view (one conversion per completed journey). Events inside a
  * micro-batch are processed in event-time order; cross-batch disorder
  * is bounded by the source watermark, as in [[Sessionize]].
  */
object StreamingFunnel {

  case class Event(user_id: Long, event_type: String, ts: Timestamp)

  /** t1/t2 in epoch ms; −1 = step not reached. */
  case class FunnelState(t1: Long, t2: Long)

  case class Conversion(
      user_id: Long,
      view_epoch: Long, // seconds
      click_epoch: Long,
      purchase_epoch: Long)

  val WindowMs: Long = 24 * 3600 * 1000L

  private[streaming] def update(userId: Long, events: Iterator[Event],
      state: GroupState[FunnelState]): Iterator[Conversion] = {
    if (state.hasTimedOut) {
      // the open step's window has passed the watermark — unreachable
      state.remove()
      return Iterator.empty
    }
    var (t1, t2) = state.getOption
      .map(s => (s.t1, s.t2)).getOrElse((-1L, -1L))
    var out = Vector.empty[Conversion]
    events.toSeq.sortBy(_.ts.getTime).foreach { e =>
      val t = e.ts.getTime
      e.event_type match {
        case "view" if t1 < 0 =>
          t1 = t
        case "click" if t1 >= 0 && t2 < 0 && t > t1 && t <= t1 + WindowMs =>
          t2 = t
        case "purchase" if t2 >= 0 && t > t2 && t <= t2 + WindowMs =>
          out :+= Conversion(userId, t1 / 1000, t2 / 1000, t / 1000)
          t1 = -1; t2 = -1 // journey complete; re-arm on the next view
        case _ => // step out of order, window expired, or other event type
      }
    }
    if (t1 < 0) state.remove()
    else {
      state.update(FunnelState(t1, t2))
      // deadline of whichever step is currently open
      state.setTimeoutTimestamp((if (t2 >= 0) t2 else t1) + WindowMs)
    }
    out.iterator
  }

  /** Wire the state machine over a (possibly streaming) event Dataset;
    * watermark bounds both late data and state lifetime.
    *
    * `watermarkDelay` must stay well under the 24 h conversion window:
    * non-late events then satisfy ts + WindowMs > watermark, so the
    * timeout timestamp armed below is always ahead of the watermark
    * (Spark rejects timeouts at or behind it). */
  def conversions(events: Dataset[Event],
      watermarkDelay: String = "1 hour"): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
