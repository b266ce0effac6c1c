package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An input event for sessionization (keyed, event-timed). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** One candidate session: [start, end] event-time extent and event count. */
case class SessionState(start: Long, end: Long, n: Long)

/** Per-key state: ALL sessions not yet sealed by the watermark, open or
  * provisionally closed — a session is only emitted once no valid event can
  * ever extend or merge it. */
case class SessionsState(open: List[SessionState])

/** A completed session emitted when the inactivity gap elapses. */
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/**
 * Custom stateful sessionization via `flatMapGroupsWithState` — the engine's
 * arbitrary-state surface (SURVEY.md §2.9 T7 names Spark's built-in windowed
 * agg as the reference's only stateful op; this is the general mechanism a
 * user reaches for when `session_window` can't express the state machine,
 * e.g. per-session derived metrics or cross-event invariants).
 *
 * Semantics match the built-in `session_window(ts, gap)` count aggregation,
 * INCLUDING out-of-order arrivals: a session is emitted only once the
 * watermark passes its end + gap, so a late-but-valid event (t above the
 * watermark but within gap of an earlier session) still merges into it —
 * even an event that bridges two provisionally-separate sessions into one
 * (the eager-emit divergence flagged in round-2 ADVICE is gone). State per
 * key is the list of not-yet-sealed sessions — bounded by the watermark
 * (every session older than wm - gap seals and leaves), so at 100 TB state
 * scales with ACTIVE keys only, not history.
 */
object Sessionize {

  /** Merge-normalize: sort by start and coalesce any sessions within `gapMs`
    * of each other (an event bridging two sessions merges them — the
    * built-in's merging-session-window rule). */
  private[streaming] def normalize(ss: List[SessionState], gapMs: Long): List[SessionState] =
    ss.sortBy(s => (s.start, s.end)).foldLeft(List.empty[SessionState]) {
      case (cur :: done, s) if s.start <= cur.end + gapMs =>
        SessionState(cur.start, math.max(cur.end, s.end), cur.n + s.n) :: done
      case (acc, s) => s :: acc
    }.reverse

  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // millisecond-precision delay: integer-dividing to seconds would turn
      // sub-second gaps into zero lateness tolerance (round-2 ADVICE)
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionsState]) =>
          // One uniform body for both the event path and the timeout path
          // (timeout = empty `rows`): fold incoming events into the session
          // list, seal and emit everything the watermark has passed, keep
          // the rest. Late rows below the watermark never reach here (the
          // exec's event-time filter drops them), so a sealed session is
          // final by construction.
          val prior = state.getOption.map(_.open).getOrElse(Nil)
          val incoming = rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L)).toList
          val merged = normalize(prior ++ incoming, gapMs)
          val wm = state.getCurrentWatermarkMs()
          val (ripe, open) = merged.partition(_.end + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionsState(open))
            // wake when the earliest open session seals; clamp above the
            // current watermark — GroupState rejects timestamps in the past
            state.setTimeoutTimestamp(
              math.max(open.map(_.end + gapMs).min, wm + 1))
          }
          ripe.iterator.map(s => SessionOut(
            userId, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.end + gapMs), s.n))
      }
  }

  /**
   * The same sessionization on Spark 4's `transformWithState` — the
   * successor stateful API (SPARK-40434, "arbitrary stateful processing v2"):
   * typed named state (`ValueState`) instead of one opaque blob, explicit
   * per-key timers instead of a single timeout slot, and a RocksDB-backed
   * store requirement that matches how large deployments run stateful
   * streams anyway. Semantics are identical to [[sessions]] (same
   * normalize/seal logic, law-tested); keeping both surfaces mirrors what a
   * migrating user needs — flatMapGroupsWithState today, transformWithState
   * going forward.
   */
  def sessionsTws(events: Dataset[SessionEvent], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", s"$gapMs milliseconds")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[sessionsTws]]'s processor: one ValueState slot holding the open
    * session list, one live timer per key at the earliest seal time. */
  private final class SessionProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, SessionEvent, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode => OM, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var state: ValueState[SessionsState] = _

    override def init(outputMode: OM, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionsState](
        "sessions", Encoders.product[SessionsState], TTLConfig.NONE)

    /** Shared by the event and timer paths (timer = no new events). */
    private def advance(userId: Long, incoming: List[SessionState],
        wm: Long): Iterator[SessionOut] = {
      val prior = if (state.exists()) state.get().open else Nil
      val merged = normalize(prior ++ incoming, gapMs)
      val (ripe, open) = merged.partition(_.end + gapMs <= wm)
      getHandle.listTimers().foreach(getHandle.deleteTimer) // one live timer per key
      if (open.isEmpty) state.clear()
      else {
        state.update(SessionsState(open))
        getHandle.registerTimer(math.max(open.map(_.end + gapMs).min, wm + 1))
      }
      ripe.iterator.map(s => SessionOut(
        userId, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end + gapMs), s.n))
    }

    override def handleInputRows(userId: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[SessionOut] =
      advance(userId,
        rows.map(e => SessionState(e.ts.getTime, e.ts.getTime, 1L)).toList,
        timerValues.getCurrentWatermarkInMs())

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
      advance(userId, Nil, timerValues.getCurrentWatermarkInMs())
  }

  /** Built-in variant for comparison/specs: `session_window` count agg. */
  def sessionsBuiltin(events: DataFrame, tsCol: String, keyCol: String,
      gap: String): DataFrame =
    events
      .withWatermark(tsCol, gap)
      .groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
