package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of cdc3_scd2 — the SCD Type-2 history built AT
  * INGEST via `flatMapGroupsWithState` (ST5 surface): per key, state
  * holds exactly the OPEN run (segment, valid_from, version, event
  * count); an attribute change CLOSES the run — the closed interval
  * row is emitted with `valid_to` = the new run's `valid_from`, the
  * exact chaining cdc3's batch lead() produces — and opens the next.
  * The dimension history is therefore queryable the moment the change
  * is ingested, instead of after tonight's batch rebuild; the emitted
  * rows ∪ the open state ARE the type-2 table.
  *
  * Ordering contract: events must arrive PER-KEY IN ORDER across
  * micro-batches (what a key-partitioned Kafka topic delivers);
  * in-batch disorder is absorbed by the per-key sort. A cross-batch
  * regression — an event older than the open run's start — FAILS THE
  * QUERY loudly rather than silently writing a corrupt interval
  * (valid_to before valid_from): a true late correction is a history
  * REBUILD (cdc3 over the corrected log), not an append, and an
  * engine that quietly absorbs one manufactures evidence. The spec
  * drives both the equivalence and the loud failure.
  *
  * Scale shape: state is ONE small record per live key (the open
  * run), independent of history length — the closed rows live in the
  * sink, not in state; per-batch cost is the per-key fold over that
  * batch's rows only.
  */
object StreamScd2 {

  case class Change(user_id: Long, ts: java.sql.Timestamp, event_id: Long,
      event_type: String)
  case class OpenRun(version: Long, segment: String, validFromMs: Long, n: Long)
  case class Closed(user_id: Long, version: Long, segment: String,
      valid_from_ms: Long, valid_to_ms: Long, n_events: Long)

  def update(userId: Long, changes: Iterator[Change],
      state: GroupState[OpenRun]): Iterator[Closed] = {
    val sorted = changes.toSeq.sortBy(c => (c.ts.getTime, c.event_id))
    var cur = state.getOption
    val out = Seq.newBuilder[Closed]
    sorted.foreach { c =>
      val t = c.ts.getTime
      cur match {
        case Some(r) =>
          if (t < r.validFromMs)
            throw new IllegalStateException(
              s"SCD2 ordering contract violated for key $userId: event at $t " +
                s"precedes the open run's valid_from ${r.validFromMs} — " +
                "late corrections are a batch rebuild (cdc3), not an append")
          if (r.segment == c.event_type) cur = Some(r.copy(n = r.n + 1))
          else {
            out += Closed(userId, r.version, r.segment, r.validFromMs, t, r.n)
            cur = Some(OpenRun(r.version + 1, c.event_type, t, 1))
          }
        case None => cur = Some(OpenRun(1, c.event_type, t, 1))
      }
    }
    cur.foreach(state.update)
    out.result().iterator
  }

  /** The stateful history builder over a typed change stream. */
  def intervals(changes: Dataset[Change]): Dataset[Closed] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
