package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-series regularization: bucket an event stream onto a fixed grid,
 * fill the gaps, and carry the last observation forward (LOCF) — the
 * standard densification step before windowed feature extraction or
 * charting, where a missing hour must read as "0 events, value unchanged"
 * rather than silently vanish.
 *
 * Scale shape: the hourly rollup is one (key, hour)-keyed aggregate with
 * map-side combine; the grid generator explodes a per-key `sequence`
 * between that key's own min/max hour (grid rows ≈ span-hours per key, no
 * global cross join); the LOCF window partitions by key — no global sort.
 * Gap volume is bounded per key by its own activity span.
 */
object TimeSeries {

  /** Hourly grid per key with gap rows (n=0) and last-observed hourly
    * total carried forward. `valueCol` should be exact (integer) units —
    * the query layer converts money to cents first so sums are
    * order-independent. Output: (keyCol, hour, n, v_locf). */
  def gapFillLocf(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = events
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("v"))
    val spans = hourly.groupBy(col(keyCol))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(hourly, Seq(keyCol, "hour"), "left")
      .select(col(keyCol), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("v"), ignoreNulls = true).over(w).as("v_locf"))
  }

  /**
   * Batch sessionization: the gaps-and-islands assignment (a new session
   * starts when the gap since the previous event REACHES `gapSeconds`,
   * i.e. gap >= gapSeconds breaks the session — matching the q88 oracle) —
   * the batch twin of the streaming session window (q32), but emitting a
   * session id PER EVENT so downstream joins can attribute rows to
   * sessions. One per-key window; `tieCol` breaks equal-timestamp ties so
   * the assignment is total-order deterministic. Output: input columns +
   * session_seq (0-based per key) + session_id.
   */
  def sessionIds(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val brk = when(prev.isNull
      .or(unix_micros(col(tsCol)) - prev >= gapSeconds * 1000000L), 1L)
      .otherwise(0L)
    events
      .withColumn("session_seq",
        (sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) - 1L)
          .cast("long"))
      .withColumn("session_id",
        concat(col(keyCol).cast("string"), lit("#"), col("session_seq").cast("string")))
  }

  /**
   * Retention cohort matrix: users grouped by their first-activity week
   * (the cohort), counted in each later week they return — the classic
   * retention triangle. Two aggregates and one broadcastable join of the
   * per-user cohort frame back to events; week offsets in exact integer
   * arithmetic on epoch seconds (both engines truncate weeks to Monday).
   */
  def retentionCohorts(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(keyCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("activity_week"))
      .join(firstWeek, Seq(keyCol))
      .groupBy(col("cohort_week"),
        expr("(unix_seconds(activity_week) - unix_seconds(cohort_week)) div 604800")
          .as("week_offset"))
      .agg(countDistinct(col(keyCol)).as("n_users"))
  }
}
