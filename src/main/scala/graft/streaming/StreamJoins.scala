package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Stream-stream joins with watermark-bounded state.
 *
 * The reference only joins stream-to-static (SURVEY.md §2.4 J1); a complete
 * engine also needs stream-stream correlation — e.g. enriching an order
 * stream with the payment stream. Spark requires BOTH sides watermarked plus
 * an event-time range condition so each side's join state is evictable;
 * without the range bound the state store grows forever (the same 100 TB
 * state-boundedness rule as the windowed agg).
 */
object StreamJoins {

  /**
   * Watermarked interval equi-join: rows match when keys are equal and
   * `right.ts ∈ [left.ts, left.ts + within]`.
   *
   * @param within  SQL interval string, e.g. "10 minutes"
   */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      within: String,
      watermark: String,
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    val cond: Column =
      l(leftKey) === r(rightKey) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $within")
    l.join(r, cond, joinType)
  }
}
