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
}
