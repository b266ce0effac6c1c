package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Bucketed-table co-located joins: pre-shuffling both sides into the same
  * bucket layout at WRITE time removes the join-time exchange entirely —
  * the 100 TB technique for repeated large-large joins (each executor joins
  * its own buckets; nothing moves at query time). */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem plans with ZERO exchanges on the join key") {
    val s = spark
    val wh = tmpDir("bucket-wh")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Tables.orders(s, "/root/testdata/sf0.001")
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(s, "/root/testdata/sf0.001")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = s.table("orders_b")
        .join(s.table("lineitem_b"), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_items"))
      val plan = joined.queryExecution.executedPlan.toString
      // bucket layout satisfies the join's distribution requirement: the
      // only acceptable plan has no shuffle before the SortMergeJoin
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))

      // and the result matches the unbucketed join
      val expected = Tables.orders(s, "/root/testdata/sf0.001")
        .join(Tables.lineitem(s, "/root/testdata/sf0.001"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n_items"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      s.sql("DROP TABLE IF EXISTS orders_b")
      s.sql("DROP TABLE IF EXISTS lineitem_b")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
