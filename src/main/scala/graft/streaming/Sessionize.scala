package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** An input event for sessionization (keyed, event-timed). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Accumulating per-key session state. */
case class SessionState(start: Long, end: Long, n: Long)

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
 * Semantics match the built-in `session_window(ts, gap)` count aggregation:
 * a session closes after `gapMs` of event-time inactivity (watermark-driven
 * EventTimeTimeout) and is emitted as one row. State per key is one
 * [[SessionState]] — bounded, watermark-evicted; at 100 TB state scales with
 * ACTIVE keys only, not history.
 */
object Sessionize {

  def sessions(events: Dataset[SessionEvent], gapMs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(
              userId, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.end + gapMs), s.n))
          } else {
            // Fold sorted event times into the open session, SPLITTING when
            // an event lands more than `gap` after the session end — a new
            // event for the key can arrive before the watermark timeout
            // fires, so the split cannot be left to the timeout path alone.
            val times = rows.map(_.ts.getTime).toSeq.sorted
            val completed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t <= s.end + gapMs =>
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t), s.n + 1))
                case Some(s) =>
                  completed += SessionOut(userId, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.end + gapMs), s.n)
                  cur = Some(SessionState(t, t, 1L))
                case None =>
                  cur = Some(SessionState(t, t, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes end + gap; clamp
              // above the current watermark — a late-but-not-dropped event
              // could otherwise request a timeout already in the past, which
              // GroupState rejects at runtime
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            completed.iterator
          }
      }
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
