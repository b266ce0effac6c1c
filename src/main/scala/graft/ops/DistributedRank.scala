package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed total-order ranking WITHOUT a single-partition window.
 *
 * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves every row
 * to one partition (Spark warns "No Partition Defined for Window
 * operation") — fine for tiny frames, fatal for a 100 TB rank. The
 * scalable idiom, packaged once here:
 *
 *   1. range-repartition + sort locally on the key columns,
 *   2. per-partition `row_number` (window PARTITIONed by the physical
 *      partition id, so nothing moves globally),
 *   3. per-partition row counts → prefix-sum offsets (a #partitions-sized
 *      frame, window'd on the driver-scale side and broadcast back),
 *   4. global rank = partition offset + local row number.
 *
 * Determinism: with a TOTAL-order key set the result is exactly
 * `row_number` regardless of partition count or boundaries. With ties in
 * the keys, individual row numbers within a tie group depend on physical
 * placement — but `min(rank)` per tie group does NOT (it is always
 * 1 + the count of strictly-smaller rows), which is what
 * [[denseGroupRank]] exposes: an order-preserving, tie-preserving,
 * partition-layout-independent group rank (values have gaps; order and
 * tie structure are exact). Both shapes are the building blocks of the
 * suffix-array prefix-doubling pipeline ([[graft.text.SuffixIndex]]) and
 * the exact-decile assignment in the t-closeness query.
 */
object DistributedRank {

  /** Append a global 1-based `row_number` over `ORDER BY sortCols` as
    * `out`, computed with the range-partition + offset technique above.
    * Pass a total-order key set for a canonical result. */
  def withRowNumber(df: DataFrame, out: String, sortCols: Column*): DataFrame = {
    // EAGER cut before branching, not an optimization: `local` is read by
    // TWO plan branches (offsets + join-back). Without pinning the
    // physical layout, AQE may coalesce the range shuffle differently per
    // branch, spark_partition_id() disagrees between them, and the join
    // on __pid silently drops every row whose pid exists on one side only
    // (observed: half the corpus vanished at 16 cores; invisible at
    // local[4] test scale). Same bug class as the iterative-loop
    // double-reference, in partition-determinism costume.
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = IterativeLoop.cut(sorted.withColumn("__lrn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(sortCols: _*))
        .cast("long")))
    // #shuffle-partitions rows: the ONLY single-partition window in the
    // pipeline runs over this bounded frame, then broadcasts back.
    val offs = local.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum(col("__c")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn(out, col("__off") + col("__lrn"))
      .drop("__pid", "__lrn")
  }

  /** Append an order-preserving dense-ish group rank over `keys` as
    * `out`: every row in a tie group gets 1 + count(strictly smaller
    * rows) — equal keys ⇒ equal rank, smaller keys ⇒ smaller rank,
    * independent of partition layout (values are sparse: gaps equal the
    * tie-group sizes, which is exactly what order-comparison consumers
    * like prefix doubling need). */
  def denseGroupRank(df: DataFrame, keys: Seq[String], out: String): DataFrame =
    withRowNumber(df, "__rn", keys.map(col): _*)
      .withColumn(out, min(col("__rn")).over(
        Window.partitionBy(keys.map(col): _*)))
      .drop("__rn")
}
