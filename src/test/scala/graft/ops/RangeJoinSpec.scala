package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Range-join laws: equality with the theta join, boundary semantics,
  * multi-bucket intervals, and the hash-join (never nested-loop) plan. */
class RangeJoinSpec extends SparkSpec {

  private def ts(d: Int, h: Int = 0) = Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  test("boundary semantics: start inclusive, end exclusive; multi-bucket intervals") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, ts(1)),        // == start: included
      (2L, ts(3, 12)),    // inside
      (3L, ts(8)),        // == end: excluded
      (4L, ts(20)))       // outside
      .toDF("pid", "p")
    // interval 200 is INVERTED (corrupted sentinel end): must contribute
    // nothing — and must not blow up the bucket explode
    val intervals = Seq((100L, ts(1), ts(8)), (200L, ts(8), ts(1)))
      .toDF("iid", "s", "e")
    // tiny bucket (1h): the 7-day interval spans ~168 buckets — dedup-free
    // by construction even when an interval emits many buckets
    val got = RangeJoin.pointInInterval(points, "p", intervals, "s", "e",
      bucketSeconds = 3600L)
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq === Seq((1L, 100L), (2L, 100L)))
  }

  test("equals the theta join on real data; plans as a hash join, not BNLJ") {
    val sfDir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    val iv = graft.Tables.orders(spark, sfDir).filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"), col("o_orderdate").as("w_start"),
        (col("o_orderdate") + expr("INTERVAL 7 DAYS")).as("w_end"))
    val bucketed = RangeJoin.pointInInterval(li, "l_shipdate", iv, "w_start", "w_end")
    val got = bucketed.select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue())).toSet
    val theta = li.join(iv,
      col("l_shipdate") >= col("w_start") && col("l_shipdate") < col("w_end"))
      .select(col("o_orderkey"), col("l_orderkey"), col("l_linenumber"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue())).toSet
    assert(got === theta)
    assert(got.nonEmpty)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "range join fell back to BNLJ")
    assert(plan.contains("HashJoin"), "expected a hash join on the bucket key")
  }
}
