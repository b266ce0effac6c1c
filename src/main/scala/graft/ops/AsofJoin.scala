package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join: for every left row (key, t), attach the most recent right row
 * with the same key and right.t <= t — the standard point-in-time lookup
 * (enrich an order with the customer's last activity, a trade with the
 * prevailing quote).
 *
 * Spark has no built-in as-of join; the preference-order choice here is
 * composition (SURVEY.md §7.2(a)): a UNION of both sides sorted per key by
 * (time, side-marker, tiebreak) with a last_value(ignoreNulls) carry-forward
 * window. One shuffle on the key, no range-join explosion, no per-key
 * driver loop — the plan is shuffle + sort + window, which scales linearly
 * and partitions cleanly at 100 TB (same shape Flink/kdb as-of joins
 * lower to).
 *
 * Ties (right.t == left.t) take the right row — "as of now" includes now —
 * and among equal right timestamps the largest tiebreak column wins,
 * making the result deterministic and oracle-reproducible.
 */
object AsofJoin {

  /**
   * @param left      left frame
   * @param right     right frame
   * @param keyCols   (leftKey, rightKey) equi-key column names
   * @param tsCols    (leftTs, rightTs) event-time column names (same type)
   * @param tieCol    right column giving a total order among equal right
   *                  timestamps (e.g. an event id)
   * @param rightVals right columns to carry onto the left rows
   */
  def asof(
      left: DataFrame, right: DataFrame,
      keyCols: (String, String),
      tsCols: (String, String),
      tieCol: String,
      rightVals: Seq[String]): DataFrame = {
    val (lk, rk) = keyCols
    val (lt, rt) = tsCols
    val leftCols = left.columns.toSeq
    require(rightVals.forall(!leftCols.contains(_)),
      s"rightVals ${rightVals.filter(leftCols.contains)} collide with left column names — " +
        "alias the right-side payload columns before the as-of join")

    val l = left
      .withColumn("__k", col(lk))
      .withColumn("__t", col(lt))
      .withColumn("__side", lit(1)) // left sorts after right at equal time
      .withColumn("__tie", lit(null).cast(right.schema(tieCol).dataType))
    val rPayload = struct((tieCol +: rightVals).distinct.map(col): _*)
    val r = right.select(
      col(rk).as("__k"),
      col(rt).as("__t"),
      lit(0).as("__side"),
      col(tieCol).as("__tie"),
      rPayload.as("__payload"))

    val lAligned = l.select(
      col("__k") +: col("__t") +: col("__side") +: col("__tie") +:
        lit(null).cast(r.schema("__payload").dataType).as("__payload") +:
        leftCols.map(col): _*)
    val rAligned = r.select(
      col("__k") +: col("__t") +: col("__side") +: col("__tie") +: col("__payload") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lAligned.unionByName(rAligned)
      .withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightVals.map(v => col(s"__carried.$v").as(v)): _*)
  }

  /** Convenience overload carrying one value column. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      tieCol: String, value: String): DataFrame =
    asof(left, right, (key, key), (ts, ts), tieCol, Seq(value))
}
