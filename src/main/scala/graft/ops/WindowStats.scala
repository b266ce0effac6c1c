package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/**
 * Event-time tumbling-window aggregation with a watermark.
 *
 * Capability re-derivation of the reference's `transform_tumbling_window`
 * (`/root/reference/bexley_spark_stream_msk_es.py:441-458`):
 * `withWatermark(ts, 2 min)` → `groupBy(window(ts, 2 min), fufilment_type)`
 * → `count(ship_method) as total_orders` → `orderBy(window)`.
 *
 * The same plan works batch or streaming (Structured Streaming's unification);
 * `tumblingCounts` is the reference-shaped streaming form, and
 * `tumblingCountsBatch` is the batch/oracle-friendly form that surfaces
 * window start/end as plain timestamp columns.
 */
object WindowStats {

  /** Reference-shaped: watermarked tumbling count.
    *
    * Note the reference also tacks `.orderBy("window")` onto this plan
    * (`:448`), which forces complete output mode and therefore unbounded
    * state (the watermark never evicts in complete mode). We deliberately
    * drop the sort from the streaming form so the watermarked aggregation
    * runs in append/update mode with bounded state — the 100 TB-safe shape;
    * sort at the sink or in the batch form if presentation order matters. */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      countCol: String,
      width: String = "2 minutes"): DataFrame =
    df.withColumn(tsCol, col(tsCol).cast(TimestampType))
      .withWatermark(tsCol, width)
      .groupBy(window(col(tsCol), width), col(groupCol))
      .agg(count(col(countCol)).as("total_orders"))

  /** Batch form: window struct flattened to (window_start, window_end) columns. */
  def tumblingCountsBatch(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      countCol: String,
      width: String = "2 minutes"): DataFrame =
    df.groupBy(window(col(tsCol), width), col(groupCol))
      .agg(count(col(countCol)).as("total_orders"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(groupCol),
        col("total_orders"))
}
