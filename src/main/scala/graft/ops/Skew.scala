package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation for heavy-hitter keys.
 *
 * AQE's skew-join splitting handles JOIN skew at runtime, but a skewed
 * AGGREGATION key still funnels one reducer unless the plan pre-splits it.
 * [[saltedAgg]] is the classic two-phase rewrite: group on (key, salt) with
 * salt = hash(entire row) % n — uniform, deterministic, no RNG — then
 * re-aggregate the partials on the bare key. Any algebraic aggregate
 * (sum/count/min/max) distributes over the two phases; the law spec asserts
 * equality with the direct groupBy.
 *
 * At 100 TB: phase 1 spreads a hot key over `salts` reducers; phase 2's
 * input is only (distinct keys × salts) rows — negligible. The cost is one
 * extra (tiny) shuffle, so use it for keys known to be heavy-tailed (the
 * engine leaves uniform keys on the single-shuffle path).
 */
object Skew {

  /** Deterministic row-salt in [0, salts): hash of all columns, no RNG —
    * replays and retries land every row in the same salt bucket. Edge: rows
    * IDENTICAL in every column share a salt and do not spread; if the skew
    * source is fully-duplicate rows, salt on a per-partition sequence
    * (spark_partition_id + a monotonic id) instead. */
  def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(salts))

  /**
   * Two-phase salted aggregation: `sum`s and `count`s distribute; the result
   * equals `df.groupBy(key).agg(count, sum(valueCol))` row-for-row.
   */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      salts: Int = 16): DataFrame =
    df
      .withColumn("__salt", rowSalt(df, salts))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
}
