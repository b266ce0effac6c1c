package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FrameMemo protection scope: only the FINAL cut's blocks stay pinned
  * for the session; blocks persisted INSIDE the build (a cut-per-round
  * loop's intermediates) are unpersisted once the final lineage cut has
  * materialized — they are unreachable after it, and pinning them would
  * exempt dead blocks from every bench sweep. */
class FrameMemoSpec extends SparkSpec {

  test("intermediate build-time blocks are released; only the final cut is protected; build runs once") {
    FrameMemo.invalidate()
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var builds = 0
    def build = {
      builds += 1
      // a build with its own internal cut-per-round loop: two rounds of
      // eager cuts whose blocks are dead once the memo's final cut lands
      val r0 = IterativeLoop.cut(spark.range(100).toDF("id"))
      IterativeLoop.cut(r0.withColumn("id", col("id") + 1))
    }
    val out = FrameMemo.cached(spark, "memo-spec")(build)
    assert(out.count() === 100)
    assert(builds === 1)
    val prot = FrameMemo.protectedIds -- before
    assert(prot.size === 1, s"exactly the final cut should be protected, got $prot")
    // every build-time intermediate was unpersisted (async — poll briefly)
    def live = sc.getPersistentRDDs.keySet -- before
    val deadline = System.nanoTime() + 10000000000L
    while ((live -- prot).nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert((live -- prot).isEmpty, s"intermediate blocks still pinned: ${live -- prot}")
    // second call: memo hit, no rebuild, frame still readable
    assert(FrameMemo.cached(spark, "memo-spec")(build).count() === 100)
    assert(builds === 1)
    FrameMemo.invalidate()
    sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!before.contains(id)) rdd.unpersist(blocking = false)
    }
  }
}
