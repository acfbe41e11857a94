package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming (ST5 extension surface): gap-based
  * sessionization of the `events` stream via `flatMapGroupsWithState` —
  * the pattern for any per-key state Spark's built-in windows can't
  * express. State is one small record per live key; an EVENT-TIME
  * timeout (watermark-driven) closes idle sessions, bounding state at
  * scale and keeping tests deterministic (a processing-time timeout
  * would fire wall-clock batches forever under ProcessingTime(0)).
  */
object Sessionize {

  case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  case class SessionState(start: Long, last: Long, n: Int)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int,
      closed_by: String)

  val GapMs: Long = 30 * 60 * 1000L

  def update(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start, s.last, s.n, "timeout"))
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var cur = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= GapMs =>
          cur = Some(s.copy(last = t, n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.start, s.last, s.n, "gap")
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      state.setTimeoutTimestamp(s.last + GapMs) // fires when watermark passes
    }
    closed.result().iterator
  }

  /** Wire the stateful op over a typed event stream; the watermark both
    * bounds late data and drives session-timeout eviction.
    */
  def sessions(events: Dataset[Event], watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
