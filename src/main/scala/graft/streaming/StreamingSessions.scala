package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the stateful-streaming form of
  * [[graft.ops.Sessions]]: per-key session intervals accumulate in
  * executor state and a session is emitted exactly when the event-time
  * watermark passes its end + gap, i.e. when NO admissible future event
  * can still extend or merge into it (Spark's late-row filter drops
  * events behind the watermark before they reach the state function).
  * That watermark-gated emission is what makes the parity claim exact:
  * if the watermark delay covers the source's disorder, the emitted
  * session set EQUALS the batch computation's — an eager form that
  * emits as soon as a later event exceeds the gap cannot promise that,
  * because an out-of-order event between two already-split sessions
  * would arrive after the first had been irrevocably emitted.
  *
  * Scale posture: state per key is the list of sessions still inside
  * the watermark horizon — bounded by delay/gap intervals, NOT by
  * history — and sessions leave state the moment they finalize. The
  * output carries no per-key `session_idx`: a forever-monotonic counter
  * would be state that could never be dropped for a key that might
  * return; closed sessions emit in event-time order per key, so
  * downstream can renumber cheaply.
  *
  * Within-watermark disorder is handled by interval merging: each event
  * is a [t, t] interval, and a key's intervals are re-merged (closure
  * under "starts within gap of the previous end") on every batch, so
  * session contents are independent of arrival order.
  */
object StreamingSessions {

  /** One input event. `tNs` is event-time in epoch-nanos (the session
    * arithmetic domain); the watermark runs on its microsecond
    * truncation. */
  case class SessionEvent(key: Long, tNs: Long, value: Double)

  /** A session interval not yet finalized by the watermark. */
  case class OpenSession(startNs: Long, endNs: Long, n: Long,
                         valueSum: Double)

  /** Per-key state: undecided sessions, kept sorted by start. */
  case class Pending(sessions: List[OpenSession])

  /** One finalized session. */
  case class ClosedSession(key: Long, startNs: Long, endNs: Long,
                           durationNs: Long, n: Long, valueSum: Double)

  private def close(key: Long, s: OpenSession): ClosedSession =
    ClosedSession(key, s.startNs, s.endNs, s.endNs - s.startNs, s.n,
      s.valueSum)

  /** Merge-closure over intervals: any session starting within `gapNs`
    * of the previous session's end joins it. Input order irrelevant. */
  private[streaming] def mergeAll(ss: Seq[OpenSession],
                                  gapNs: Long): List[OpenSession] =
    ss.sortBy(s => (s.startNs, s.endNs))
      .foldLeft(List.empty[OpenSession]) {
        case (h :: t, s) if s.startNs - h.endNs <= gapNs =>
          OpenSession(h.startNs, math.max(h.endNs, s.endNs), h.n + s.n,
            h.valueSum + s.valueSum) :: t
        case (acc, s) => s :: acc
      }.reverse

  /** The state-update function, factored out so the unit spec can drive
    * it directly. Folds the batch's events into the pending intervals,
    * emits every session the current watermark has finalized, and arms
    * the timeout for the earliest still-pending finalization (so idle
    * keys flush without new events). */
  private[streaming] def update(gapNs: Long)(
      key: Long, events: Iterator[SessionEvent],
      state: GroupState[Pending]): Iterator[ClosedSession] = {
    val existing = state.getOption.map(_.sessions).getOrElse(Nil)
    val merged = mergeAll(
      existing ++ events.map(e => OpenSession(e.tNs, e.tNs, 1L, e.value)),
      gapNs)
    val wmMs = state.getCurrentWatermarkMs()
    // final iff end+gap sits strictly below the watermark: any admitted
    // future event has t >= wm (in ns: wmMs * 1e6), and integer-division
    // truncation only makes this MORE conservative
    val (done, keep) = merged.partition(s =>
      (s.endNs + gapNs) / 1000000L < wmMs)
    if (keep.isEmpty) { if (state.exists) state.remove() }
    else {
      state.update(Pending(keep))
      val nextMs = keep.map(s => (s.endNs + gapNs) / 1000000L).min
      // epoch-millis; must exceed the current watermark or the engine
      // rejects it — an early firing is harmless (re-evaluates, re-arms)
      state.setTimeoutTimestamp(math.max(nextMs, wmMs) + 1)
    }
    done.map(close(key, _)).iterator
  }

  /** Wire the sessionizer onto a streaming Dataset of events. The
    * returned stream is Append-mode: rows are finalized sessions only.
    *
    * @param watermarkDelay max tolerated event disorder, e.g. "10 minutes"
    */
  def closedSessions(spark: SparkSession, events: Dataset[SessionEvent],
                     gapNs: Long,
                     watermarkDelay: String): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withColumn("_et", timestamp_micros(expr("tNs DIV 1000")))
      .withWatermark("_et", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update(gapNs))
  }
}
