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
