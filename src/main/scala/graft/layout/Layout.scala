package graft.layout

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-dimensional data layout: Z-order (Morton) clustering keys.
 *
 * At 100 TB the dominant cost of a selective two-dimensional predicate is
 * the scan, and the scan cost is set by LAYOUT: parquet row-group min/max
 * skipping only prunes when rows with nearby key values sit in the same
 * file. A single-column sort clusters one dimension and scatters the other;
 * interleaving the bits of both dimensions (Morton 1966's space-filling
 * curve, the technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`) bounds
 * BOTH value ranges inside every key interval, so min/max pruning works for
 * predicates on either (or both) dimensions.
 *
 * Everything here is a narrow deterministic projection: scale each
 * dimension to 16 bits against its global min/max (one tiny one-row
 * aggregate, broadcast by construction), interleave to a 32-bit key,
 * `repartitionByRange` + sortWithinPartitions on that key at write time.
 * The bit arithmetic is plain integer ops any engine reproduces — the
 * DuckDB oracle replays scale + interleave + bucket stats exactly.
 */
object Layout {

  /** Scale a numeric column to [0, 65535] against inclusive bounds.
    * `floor((x-min)*65535/span)` in IEEE double — identical across engines.
    * A constant dimension (span 0) maps everything to 0 via the
    * `greatest(span, 1)` guard. */
  def scale16(c: Column, min: Column, max: Column): Column =
    floor((c - min).cast("double") * lit(65535.0) /
      greatest((max - min).cast("double"), lit(1.0))).cast("long")

  /** Morton interleave of two 16-bit values: bit i of `xs` lands at z-bit
    * 2i, bit i of `ys` at 2i+1. Pure codegen'd integer expression (16
    * unrolled shift/mask terms — no UDF, no loop at runtime). */
  def zOrder16(xs: Column, ys: Column): Column =
    (0 until 16).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(2L << (2 * i))
    }.reduce(_ + _)

  /** Append a `zval` Z-order key over two numeric dimensions. The bounds
    * aggregate is one row; the crossJoin is the scalar-subquery shape (the
    * q70 pattern) — the fact side pays zero shuffle to be keyed. */
  def withZOrderKey(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val b = df.agg(
      min(col(xCol)).as("__minx"), max(col(xCol)).as("__maxx"),
      min(col(yCol)).as("__miny"), max(col(yCol)).as("__maxy"))
    df.crossJoin(broadcast(graft.ops.Guards.scalar(b)))
      .withColumn("zval", zOrder16(
        scale16(col(xCol), col("__minx"), col("__maxx")),
        scale16(col(yCol), col("__miny"), col("__maxy"))))
      .drop("__minx", "__maxx", "__miny", "__maxy")
  }

  /** Per-z-bucket layout audit: row count + min/max of both dimensions.
    * With `bucketShift` = 24 each bucket keeps the top 4 bits of each
    * scaled dimension — i.e. every bucket is confined to a 1/16 × 1/16
    * rectangle of the key space, which is exactly the min/max skipping
    * guarantee a reader gets per file after a z-ordered write. */
  def zOrderStats(df: DataFrame, xCol: String, yCol: String,
      bucketShift: Int = 24): DataFrame =
    withZOrderKey(df, xCol, yCol)
      .groupBy(shiftright(col("zval"), bucketShift).as("z_bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col(xCol)).cast("long").as("min_x"),
        max(col(xCol)).cast("long").as("max_x"),
        min(col(yCol)).cast("long").as("min_y"),
        max(col(yCol)).cast("long").as("max_y"))

  /** Write-path composition: range-partition on the z key (each output
    * file covers one contiguous z interval ⇒ one small rectangle of both
    * dimensions), sort within partitions so row groups inside a file are
    * tight too. Returned frame is what `.write.parquet(...)` should see. */
  def zOrderLayout(df: DataFrame, xCol: String, yCol: String,
      numFiles: Int): DataFrame = {
    val keyed = withZOrderKey(df, xCol, yCol)
    keyed.repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
  }
}
