package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the stateful-streaming form of
  * [[graft.ops.Sessions]]: one open session per key held in executor
  * state, closed either by an event that arrives more than `gapNs` after
  * the session's end (the gap rule) or by the event-time watermark
  * passing end + gap (the timeout rule, which is what finalizes the last
  * session of an idle key — a batch job gets this for free by running
  * out of input; a stream must get it from the watermark).
  *
  * Scale posture: state per key is ONE fixed-size [[OpenSession]] —
  * bounded by live-key cardinality, not by history — and closed state is
  * removed immediately. That is also why the streaming output carries no
  * per-key `session_idx`: a forever-monotonic counter would mean state
  * that can never be dropped for a key that might return; downstream can
  * renumber closed sessions cheaply (they emit in event-time order per
  * key).
  *
  * Disorder semantics: events are sorted inside each micro-batch, and an
  * out-of-order event landing inside (or within `gapNs` before) the open
  * session merges into it, extending both bounds. Events later than the
  * watermark delay are dropped by the engine before reaching the state
  * function — choose the watermark ≥ the source's max disorder and the
  * closed sessions equal the batch computation's.
  */
object StreamingSessions {

  /** One input event. `tNs` is event-time in epoch-nanos (the session
    * arithmetic domain); the watermark runs on its microsecond
    * truncation. */
  case class SessionEvent(key: Long, tNs: Long, value: Double)

  /** The per-key state: the currently-open session. */
  case class OpenSession(startNs: Long, endNs: Long, n: Long,
                         valueSum: Double)

  /** One closed session. */
  case class ClosedSession(key: Long, startNs: Long, endNs: Long,
                           durationNs: Long, n: Long, valueSum: Double)

  private def close(key: Long, s: OpenSession): ClosedSession =
    ClosedSession(key, s.startNs, s.endNs, s.endNs - s.startNs, s.n,
      s.valueSum)

  private def absorb(s: OpenSession, e: SessionEvent): OpenSession =
    OpenSession(math.min(s.startNs, e.tNs), math.max(s.endNs, e.tNs),
      s.n + 1, s.valueSum + e.value)

  /** The state-update function, factored out so the batch-parity spec
    * can drive it directly. Emits sessions closed by this batch's
    * events (or by timeout); leaves the newest session open in state. */
  private[streaming] def update(gapNs: Long)(
      key: Long, events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val closed = close(key, state.get)
      state.remove()
      Iterator.single(closed)
    } else {
      val sorted = events.toArray.sortBy(e => (e.tNs, e.value))
      val out = Seq.newBuilder[ClosedSession]
      var open = state.getOption
      sorted.foreach { e =>
        open = open match {
          case Some(s) if e.tNs - s.endNs <= gapNs => Some(absorb(s, e))
          case Some(s) =>
            out += close(key, s)
            Some(OpenSession(e.tNs, e.tNs, 1L, e.value))
          case None => Some(OpenSession(e.tNs, e.tNs, 1L, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // finalize via watermark: fire once no in-order event can extend
        // this session (gap after its end), in watermark microseconds
        state.setTimeoutTimestamp((s.endNs + gapNs) / 1000000L)
      }
      out.result().iterator
    }
  }

  /** Wire the sessionizer onto a streaming Dataset of events. The
    * returned stream is Append-mode: rows are CLOSED sessions only.
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
