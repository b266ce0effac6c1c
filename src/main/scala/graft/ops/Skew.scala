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

  /**
   * Salted replicate join: the shuffle-join rewrite for a fact side whose
   * join key is too skewed for one reducer AND a dim side too large to
   * broadcast (the case AQE's skew split handles only per-detected
   * partition, and `broadcast()` can't handle at all).
   *
   * Fact rows get a deterministic salt in [0, salts); every dim row is
   * replicated to ALL `salts` values (one `explode(sequence(...))` — no
   * shuffle on the dim side beyond the join's own). The equi-join then runs
   * on (key, salt), so a key with 10⁹ fact rows spreads over `salts`
   * reducers instead of one. Inner-join semantics are untouched: each fact
   * row meets exactly the dim rows of its key, at its own salt (law-tested
   * against the plain join in SkewSpec).
   *
   * At 100 TB: cost = dim side inflated `salts`× through the shuffle —
   * pick `salts` ≈ hot-key partition count, not hundreds. Dim-side
   * duplicate keys are fine (each fact row still sees every match once);
   * use left/right variants only after thinking through null-extension
   * (unmatched FACT rows never duplicate — their salt is single — so
   * `left_outer` is also safe; unmatched DIM rows would appear `salts`
   * times, so right/full outer are deliberately not offered).
   */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      s"saltedJoin supports inner/left joins only, got $joinType")
    val saltedFact = fact.withColumn("__fsalt", rowSalt(fact, salts))
    val saltedDim = dim.withColumn("__dsalt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          col("__fsalt") === col("__dsalt"), joinType)
      .drop("__fsalt", "__dsalt")
  }
}
