package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

/** Event for stateful sessionization (matches the events table). */
final case class SessionEvent(user_id: Long, ts: Timestamp,
    event_id: Long, value: Double)

/** Open-session state: everything needed to extend or close. */
final case class SessionState(startMicros: Long, lastMicros: Long,
    nEvents: Long, totalValueE4: Long)

/** A closed session — same fields as the batch operator's output
  * ([[graft.operators.Sessionize.batchGapSessions]]).
  */
final case class ClosedSession(user_id: Long, session_start: Timestamp,
    session_end: Timestamp, n_events: Long, total_value: Double)

/** Stateful streaming sessionization (SURVEY.md §2 F7):
  * `flatMapGroupsWithState` with event-time timeout — the streaming
  * twin of the batch gap-session operator, closing a user's session
  * when `gapMinutes` of event time pass without activity.
  *
  * Semantics parity with batch: the gap test compares exact integer
  * microseconds, and the value total accumulates in fixed-point 1e-4
  * units (a long), the stateful equivalent of the batch decimal
  * routing — no FP accumulation-order drift between the twins.
  *
  * Scale notes: state per key is O(1) (four longs — no event buffer);
  * the watermark advances the timeout clock, so abandoned sessions are
  * flushed and state stays bounded by the number of live users inside
  * the gap horizon.
  */
object StatefulSessions extends Serializable {

  private def micros(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  private def ts(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000)
    t.setNanos(((us % 1_000_000) * 1000).toInt)
    t
  }

  private def e4(v: Double): Long = math.round(v * 10000.0)

  def sessionize(events: Dataset[SessionEvent], gapMinutes: Int,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    val gapMicros = gapMinutes * 60_000_000L
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[ClosedSession]

    def close(user: Long, s: SessionState): ClosedSession =
      ClosedSession(user, ts(s.startMicros), ts(s.lastMicros),
        s.nEvents, s.totalValueE4 / 10000.0)

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[SessionEvent],
            state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed start+gap with no activity: flush
            val out = state.getOption.map(close(user, _)).toList
            state.remove()
            out.iterator
          } else {
            // micro-batch arrival order is not event order
            val evs = batch.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.orNull
            val closed = List.newBuilder[ClosedSession]
            evs.foreach { e =>
              val m = micros(e.ts)
              if (st == null) {
                st = SessionState(m, m, 1L, e4(e.value))
              } else if (m - st.lastMicros > gapMicros) {
                closed += close(user, st)
                st = SessionState(m, m, 1L, e4(e.value))
              } else {
                st = SessionState(st.startMicros, math.max(st.lastMicros, m),
                  st.nEvents + 1, st.totalValueE4 + e4(e.value))
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp((st.lastMicros + gapMicros) / 1000 + 1)
            }
            closed.result().iterator
          }
      }
  }

  /** The same gap-sessionizer on the CURRENT-generation arbitrary
    * stateful API (`transformWithState`, Spark 4.x — typed state
    * variables + first-class event-time timers; requires the RocksDB
    * state store provider, which supports the multiple column
    * families the operator's state/timer layout needs). Semantics are
    * IDENTICAL to [[sessionize]] — same integer-micros gap test, same
    * fixed-point value accumulation — with the timeout expressed as a
    * registered timer per open session (re-registered forward when
    * the session extends) instead of the GroupState timeout clock.
    * Parity is spec-gated against both the flatMapGroupsWithState
    * twin and the batch operator.
    */
  def sessionizeTWS(events: Dataset[SessionEvent], gapMinutes: Int,
      watermark: String = "2 hours"): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new GapSessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[sessionizeTWS]]'s processor: one ValueState (four longs per
    * live user, no event buffer) + one timer at lastEvent+gap — the
    * timer fires when the WATERMARK passes it, flushing the abandoned
    * session, so state stays bounded by users active inside the gap
    * horizon, exactly the flatMapGroupsWithState twin's contract.
    */
  private final class GapSessionProcessor(gapMinutes: Int)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    private val gapMicros = gapMinutes * 60_000_000L
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    private def close(user: Long, s: SessionState): ClosedSession =
      ClosedSession(user, ts(s.startMicros), ts(s.lastMicros),
        s.nEvents, s.totalValueE4 / 10000.0)

    private def expiryMs(s: SessionState): Long =
      (s.lastMicros + gapMicros) / 1000 + 1

    override def handleInputRows(user: Long,
        rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val evs = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      var st = if (session.exists()) session.get() else null
      if (st != null) getHandle.deleteTimer(expiryMs(st))
      val closed = List.newBuilder[ClosedSession]
      evs.foreach { e =>
        val m = micros(e.ts)
        if (st == null) {
          st = SessionState(m, m, 1L, e4(e.value))
        } else if (m - st.lastMicros > gapMicros) {
          closed += close(user, st)
          st = SessionState(m, m, 1L, e4(e.value))
        } else {
          st = SessionState(st.startMicros, math.max(st.lastMicros, m),
            st.nEvents + 1, st.totalValueE4 + e4(e.value))
        }
      }
      if (st != null) {
        session.update(st)
        getHandle.registerTimer(expiryMs(st))
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] =
      if (session.exists()) {
        val out = close(user, session.get())
        session.clear()
        Iterator.single(out)
      } else Iterator.empty
  }
}
