package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental view maintenance for algebraic aggregates: merge a
 * previously MATERIALIZED per-key aggregate with a fresh data increment
 * instead of recomputing from all of history — the pattern that keeps a
 * 100 TB rolling aggregate affordable (each refresh touches only the new
 * partition, and the merge input is aggregate-sized, not history-sized).
 *
 * Sound only for algebraic/commutative aggregates (count, sum, min, max):
 * merged(count) = Σ counts, merged(sum) = Σ sums. The law — merge(prev,
 * delta) row-equals the full recompute over (history ∪ delta) — is
 * exactly what the q92 oracle asserts against the full GROUP BY.
 */
object Incremental {

  /** Merge a (key, n, total) aggregate state with raw delta rows.
    * Output has the same (key, n, total) shape, ready to be stored as the
    * next state. */
  def mergeCountSum(prevState: DataFrame, delta: DataFrame,
      keyCol: String, valueCol: String): DataFrame = {
    val deltaAgg = delta.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
    prevState.select(col(keyCol), col("n"), col("total"))
      .unionByName(deltaAgg)
      .groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
  }
}
