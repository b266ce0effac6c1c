package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Selector law for [[Graph.ccAuto]]: the auto-CC equals BOTH component
  * algorithms on their home regimes — min-label CC on shallow graphs
  * (where it converges, and ccAuto takes the cheap path), hookComponents
  * on the high-diameter scrambled path (where min-label CC throws at the
  * very cap ccAuto probes with, and ccAuto restarts on the hook CC). The
  * switch can never change the answer: both compute the canonical
  * component-minimum labeling. */
class CcAutoSpec extends SparkSpec {

  import spark.implicits._

  test("shallow regime: ccAuto == Dedup.connectedComponents == hookComponents on the co-order graph") {
    val edges = graft.queries.CatalogAlg.partEdges(spark, "/root/testdata/sf0.001")
    val auto = Graph.ccAuto(edges, "x", "y").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val minLabel = graft.dedup.Dedup.connectedComponents(edges, "x", "y")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hook = Graph.hookComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(auto === minLabel)
    assert(auto === hook)
  }

  test("deep regime: on a 5003-node scrambled path ccAuto falls back to the hook CC and returns the ground truth min-label CC cannot reach inside its cap") {
    def id(i: Long): Long = (i * 2654435761L) % 5003L
    val edges = (0L until 5002L).map(i => (id(i), id(i + 1))).toDF("x", "y")
    // the probe cap ccAuto uses IS where the min-label CC fails loudly
    intercept[IllegalStateException] {
      graft.dedup.Dedup.connectedComponents(edges, "x", "y", maxIter = 10).collect()
    }
    val auto = Graph.ccAuto(edges, "x", "y", stallRounds = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(auto.length === 5003)
    // ground truth: one component, labeled by the global minimum (0)
    assert(auto.map(_._2).distinct.toSeq === Seq(0L))
  }
}
