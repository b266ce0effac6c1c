package graft.layout

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Laws for the Z-order layout key: interleave correctness, locality of the
  * bucketed stats, and the write-path file/rectangle guarantee. */
class LayoutSpec extends SparkSpec {

  test("zOrder16 interleaves bits: known values") {
    val s = spark
    import s.implicits._
    // z(x, y): bit i of x -> 2i, bit i of y -> 2i+1
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (65535L, 0L), (0L, 65535L))
      .toDF("x", "y")
      .select(Layout.zOrder16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    val expected = Seq(
      0L, 1L, 2L, 15L,
      0x55555555L, // x=all ones -> even bits
      0xAAAAAAAAL) // y=all ones -> odd bits
    assert(got === expected)
  }

  test("zOrderStats buckets confine both dims to 1/16 of their range") {
    val stats = Layout.zOrderStats(
      Tables.lineitem(spark, "/root/testdata/sf0.001"), "l_partkey", "l_suppkey")
      .collect()
    assert(stats.nonEmpty)
    val (loX, hiX) = (stats.map(_.getLong(2)).min, stats.map(_.getLong(3)).max)
    val (loY, hiY) = (stats.map(_.getLong(4)).min, stats.map(_.getLong(5)).max)
    // top 8 z-bits = top 4 bits of each scaled dim: every bucket's span is
    // at most 1/16 of the global span (+1 for the floor-scaling boundary)
    stats.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= (hiX - loX) / 16 + 1,
        s"bucket ${r.getLong(0)} x-span too wide")
      assert(r.getLong(5) - r.getLong(4) <= (hiY - loY) / 16 + 1,
        s"bucket ${r.getLong(0)} y-span too wide")
    }
    // partition of the table: bucket counts sum to the row count
    val total = Tables.lineitem(spark, "/root/testdata/sf0.001").count()
    assert(stats.map(_.getLong(1)).sum === total)
  }

  test("zOrderLayout write path: each output partition covers a contiguous z range") {
    val laid = Layout.zOrderLayout(
      Tables.lineitem(spark, "/root/testdata/sf0.001"), "l_partkey", "l_suppkey",
      numFiles = 8)
    val perPart = laid
      .select(spark_partition_id().as("pid"), col("zval"))
      .groupBy("pid").agg(min("zval").as("lo"), max("zval").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // range partitioning: partitions' [lo, hi] intervals do not overlap
    perPart.toSeq.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA <= loB)
      case _                       => ()
    }
  }
}
