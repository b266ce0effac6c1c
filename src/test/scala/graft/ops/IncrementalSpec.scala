package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The maintenance law: merge(state, delta) == full recompute. */
class IncrementalSpec extends SparkSpec {

  test("mergeCountSum equals full recompute at several split points") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("cents", round(col("value") * 100).cast("long"))
    val full = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (cut <- Seq("2024-01-03", "2024-01-10", "1990-01-01", "2100-01-01")) {
      val c = to_timestamp(lit(s"$cut 00:00:00"))
      val prev = ev.filter(col("ts") < c).groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
      val merged = Incremental.mergeCountSum(prev, ev.filter(col("ts") >= c),
        "user_id", "cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(merged === full, s"split at $cut diverged")
    }
  }
}
