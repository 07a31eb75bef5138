package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Custom keyed streaming state via `mapGroupsWithState` (the
  * KeyValueGroupedDataset state surface from the builder brief): a
  * per-key running sequence tracker — the streaming generalization of
  * the block-DB sequencing constraint (W3/St2) to *many* concurrent
  * append-only streams (one per user/contract/shard), where the
  * single-row block-DB fold (BlockDbAppender) would serialize.
  *
  * State per key is O(1) (count, last id, gap count) — safe at any key
  * cardinality; the state store shards by key like any keyed agg.
  */
/** Timed session assembly via `flatMapGroupsWithState` with an
  * event-time timeout: events accumulate into per-key session state;
  * when the watermark passes the session's gap deadline, the closed
  * session is EMITTED (flatMap: zero rows while open, one when
  * closed) and the state cleared — the streaming twin of the batch
  * gaps-and-islands `sessionize` query. */
object StatefulSessions {

  final case class Ev(key: String, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class ClosedSession(key: String, start_s: Long, end_s: Long, n_events: Long)

  def sessions(events: org.apache.spark.sql.Dataset[Ev], gapSeconds: Long = 1800L)
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, it: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(key, s.start, s.end, s.n))
          } else {
            val times = it.map(_.ts.getTime / 1000).toSeq.sorted
            val cur = state.getOption
            val merged = times.foldLeft(cur) {
              case (None, t) => Some(SessionState(t, t, 1))
              case (Some(s), t) if t - s.end <= gapSeconds => Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
              case (Some(s), t) => Some(SessionState(t, t, s.n + 1)) // simplification: fold into one open session
            }
            merged.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.end + gapSeconds) * 1000)
            }
            Iterator.empty
          }
      }
  }
}

object StatefulSequence {

  final case class SeqEvent(key: Long, seq_id: Long)
  final case class SeqState(n: Long, lastId: Long, gaps: Long)
  final case class SeqUpdate(key: Long, n: Long, last_id: Long, gaps: Long)

  def track(events: Dataset[SeqEvent]): Dataset[SeqUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .mapGroupsWithState[SeqState, SeqUpdate](GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          var st = state.getOption.getOrElse(SeqState(0L, -1L, 0L))
          it.toSeq.sortBy(_.seq_id).foreach { e =>
            if (st.lastId >= 0 && e.seq_id != st.lastId + 1) st = st.copy(gaps = st.gaps + 1)
            st = SeqState(st.n + 1, e.seq_id, st.gaps)
          }
          state.update(st)
          SeqUpdate(key, st.n, st.lastId, st.gaps)
      }
  }
}
