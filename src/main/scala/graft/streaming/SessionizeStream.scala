package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming time-gap sessionization — the stateful-streaming twin of
  * `ops/Conversations.sessionize`, built on
  * `KeyValueGroupedDataset.flatMapGroupsWithState` with an EVENT-TIME
  * timeout so per-key state is bounded by activity, not key cardinality.
  *
  * Semantics per key: events are processed in (ts, event_id) order within
  * each micro-batch; a gap > `gapSec` to the previous event opens a new
  * 0-based session. State = one (session counter, last event micros) pair
  * per ACTIVE key; once the watermark passes `last event + gapSec` the
  * session can never be extended, the timeout fires and the state is
  * removed (GC). A key that reappears after GC restarts its numbering at
  * 0 — with the batch recompute as the equality path, the same documented
  * divergence contract as the rollup (SURVEY.md O32): within the watermark
  * horizon, stream ≡ batch exactly (StreamingSpec proves it across
  * multi-trigger runs); beyond it the stream is the low-latency
  * approximation.
  *
  * Scale posture: one shuffle on the key per micro-batch; state is
  * constant-width per active key and self-evicting, so a 10^12-turn run
  * holds state only for keys active inside the horizon.
  */
object SessionizeStream {

  /** Input event (rename columns upstream via `.as[Ev]` selection). */
  final case class Ev(event_id: Long, key: Long, ts: java.sql.Timestamp)

  /** Per-key running state: current session index + last event micros. */
  final case class SessState(sessionIdx: Long, lastUs: Long)

  /** Output: the per-event session assignment. */
  final case class Assign(event_id: Long, key: Long, session_idx: Long)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime / 1000L * 1000000L + t.getNanos / 1000L

  /** Sessionize a (possibly streaming) Dataset[Ev]. `horizon` is the
    * watermark delay (how much event-time disorder is tolerated before
    * state GC becomes visible).
    */
  def assign(events: Dataset[Ev], gapSec: Long,
             horizon: String): Dataset[Assign] = {
    import events.sparkSession.implicits._
    require(gapSec >= 0, "gapSec must be >= 0")
    val gapUs = gapSec * 1000000L
    events
      .withWatermark("ts", horizon)
      .groupByKey(_.key)
      .flatMapGroupsWithState[SessState, Assign](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, it: Iterator[Ev], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed last event + gap: no event can join or
            // follow this session inside the horizon — drop the state
            state.remove()
            Iterator.empty
          } else {
            // within-batch disorder is sorted away; disorder ACROSS
            // batches (a late event after its successor was already
            // assigned) is the documented divergence vs batch
            val evs = it.toArray.sortInPlaceBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.getOrElse(SessState(-1L, Long.MinValue))
            val out = evs.map { e =>
              val us = micros(e.ts)
              val idx =
                if (st.lastUs == Long.MinValue || us - st.lastUs > gapUs)
                  st.sessionIdx + 1
                else st.sessionIdx
              st = SessState(idx, us)
              Assign(e.event_id, key, idx)
            }
            state.update(st)
            val timeoutMs = st.lastUs / 1000L + gapSec * 1000L + 1L
            state.setTimeoutTimestamp(
              math.max(timeoutMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }
}
