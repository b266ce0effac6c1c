package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Slowly-changing-dimension type 2 (Kimball): turn a stream of dimension
 * snapshots/changes into VERSIONED rows with validity intervals — the
 * lakehouse MERGE pattern for dimensions whose history must survive
 * (what was this customer's segment when the order shipped?).
 *
 * Input: one row per (key, effective_ts) state observation — the base
 * snapshot unioned with any number of change records. Output: every
 * observation becomes a version row with `valid_from` = its effective
 * timestamp, `valid_to` = the NEXT observation's timestamp (null while
 * current), `version` 1-based, `is_current` on the last row.
 *
 * One per-key window over observation counts (versions per key are few by
 * definition of "slowly changing") — no self-join, no driver state; at
 * 100 TB the shuffle is keyed by the dimension key and each group is
 * tiny, the shape AQE handles without skew concern.
 */
object Scd2 {

  /** Version the observation stream. `tsCol` must be unique per key
    * (an upstream dedup owns conflicting same-instant writes). */
  def versions(observations: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    observations
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }

  /** CDC compaction (the SCD1 companion to [[versions]]): keep only the
    * LATEST observation per key, ordered by (orderCol, tieCol) — turns a
    * change log into current state. A per-key rank-1 window, which
    * Spark's WindowGroupLimit pushes down so each partition keeps one
    * candidate row per key before the exchange. */
  def latestByKey(changes: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(orderCol).desc, col(tieCol).desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
