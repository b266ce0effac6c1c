package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join without a cartesian product.
 *
 * A naive `t0 <= p AND p < t1` theta join has no equi-key, so Spark plans
 * BroadcastNestedLoopJoin — O(points × intervals) compares, a
 * scale-killer. The standard fix (the shape behind Databricks' RANGE_JOIN
 * hint and PostGIS tiling): quantize time into fixed-width COARSE BUCKETS,
 * emit each interval once per bucket it overlaps, key each point by its
 * own bucket, equi-join on the bucket, and keep the exact range predicate
 * as a post-filter. The join becomes a plain shuffle/broadcast HASH join
 * on the bucket key; per-pair work is bounded by bucket width ÷ interval
 * density, tunable via `bucketSeconds` (match it to the typical interval
 * length: each interval then lands in ≤ 2 buckets).
 *
 * A point lies in exactly ONE bucket, and an interval emits each bucket at
 * most once — so no dedup pass is needed; the exact filter alone makes the
 * output equal the theta join (the q93 oracle's law).
 */
object RangeJoin {

  /** Rows of `points` × `intervals` with startCol <= ptCol < endCol,
    * joined through bucketSeconds-wide equi-buckets. Both frames keep all
    * their columns (names must not collide). */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 604800L): DataFrame = {
    require(bucketSeconds > 0, s"bucket width must be positive, got $bucketSeconds")
    // Empty/inverted intervals (end <= start) match nothing under theta
    // semantics — drop them BEFORE the explode: Spark's sequence(a, b)
    // steps BACKWARDS when b < a, so a corrupted sentinel end would
    // otherwise emit a huge descending bucket list (or exceed the array
    // limit) instead of the theta join's empty result.
    // CAST(... AS TIMESTAMP) tolerates TIMESTAMP_NTZ inputs (parquet
    // writers without timezone metadata); the session zone is UTC
    val iv = intervals.filter(col(endCol) > col(startCol)).withColumn("__bucket",
      explode(sequence(
        expr(s"unix_seconds(CAST($startCol AS TIMESTAMP)) div $bucketSeconds"),
        expr(s"(unix_seconds(CAST($endCol AS TIMESTAMP)) - 1) div $bucketSeconds"))))
    val pt = points.withColumn("__bucket",
      expr(s"unix_seconds(CAST($ptCol AS TIMESTAMP)) div $bucketSeconds"))
    pt.join(iv, Seq("__bucket"))
      .filter(col(startCol) <= col(ptCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
