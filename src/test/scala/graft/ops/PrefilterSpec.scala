package graft.ops

import graft.{SparkSpec, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** The runtime-filter law: the sorted-array predicate equals the planner's
  * own left-semi join, including the empty-key-set edge. */
class PrefilterSpec extends SparkSpec {

  test("semiJoinBySortedKeys equals left_semi on real data") {
    val sfDir = "/root/testdata/sf0.001"
    val fact = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"))
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val viaFilter = Prefilter.semiJoinBySortedKeys(fact, "l_orderkey", keys, "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    val viaJoin = fact.join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue())).toSet
    assert(viaFilter === viaJoin)
    assert(viaFilter.nonEmpty)
  }

  test("empty key set filters everything; sorted_contains probes exact membership") {
    val s = spark
    import s.implicits._
    val fact = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val noKeys = Seq.empty[Long].toDF("o")
    assert(Prefilter.semiJoinBySortedKeys(fact, "k", noKeys, "o").count() === 0L)
    GraftFunctions.ensureRegistered(s)
    val probes = Seq(Long.MinValue, -7L, 0L, 3L, 41L, 43L, Long.MaxValue)
      .toDF("v")
      .select(col("v"), GraftFunctions.sortedContains(col("v"),
        array(Seq(Long.MinValue, -7L, 3L, 42L, Long.MaxValue).map(lit): _*)).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probes(Long.MinValue) && probes(-7L) && probes(3L) && probes(Long.MaxValue))
    assert(!probes(0L) && !probes(41L) && !probes(43L))
  }
}
