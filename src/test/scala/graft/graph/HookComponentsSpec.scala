package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the Borůvka-style hook+flatten connected components — the
  * structurally O(log n)-round CC added after the round-11 percolation
  * finding. The headline law is the one that motivated it: a
  * 5000-node scrambled-id PATH (diameter ~5000, local minima
  * everywhere) resolves in ≤20 hook rounds, where min-label
  * propagation provably needs ~diameter rounds and throws at its cap. */
class HookComponentsSpec extends SparkSpec {

  import spark.implicits._

  /** Path over a scrambled id permutation: id(i) = (i·2654435761) mod p
    * for prime p — a bijection, so consecutive path positions get
    * wildly unordered ids (local-minimum basins everywhere). */
  private def scrambledPath(p: Long): Seq[(Long, Long)] = {
    def id(i: Long): Long = (i * 2654435761L) % p
    (0L until p - 1).map(i => (id(i), id(i + 1)))
  }

  test("a 5003-node scrambled path (diameter ~5000) resolves to ONE " +
      "component labeled by its minimum inside the log-round cap — the " +
      "graph shape that defeats min-label propagation") {
    val edges = scrambledPath(5003L).toDF("x", "y")
    val lbl = Graph.hookComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(lbl.length === 5003)
    assert(lbl.map(_._2).distinct.toSeq === Seq(0L))
    // and the O(diameter) algorithm genuinely cannot do this within its
    // cap — the boundary the hook CC exists for
    val e = intercept[IllegalStateException] {
      graft.dedup.Dedup.connectedComponents(edges, "x", "y").collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("hook CC equals Dedup.connectedComponents on the real co-order " +
      "graph (both converge there), including the component-minimum " +
      "label contract") {
    val edges = graft.queries.CatalogAlg.partEdges(spark, "/root/testdata/sf0.001")
    val a = Graph.hookComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = graft.dedup.Dedup.connectedComponents(edges, "x", "y").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("max-hub star — the amortized-argument pathology: only the hub " +
      "hooks in round one (k -> k-1), its contraction is a MIN-hub star " +
      "that collapses next round; converges well inside the cap") {
    // hub 1000 is the label MAXIMUM; every leaf 0..499 is a local
    // minimum of the label graph, so round 1 removes exactly one label —
    // the case that falsifies the naive per-round halving claim
    val edges = (0L until 500L).map(i => (i, 1000L)).toDF("x", "y")
    val lbl = Graph.hookComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(lbl.length === 501)
    assert(lbl.map(_._2).distinct.toSeq === Seq(0L))
  }

  test("disjoint components get their own minima; isolated edges work") {
    val edges = Seq((10L, 7L), (7L, 9L), (100L, 42L), (3L, 3L), (55L, 56L))
      .toDF("x", "y")
    val lbl = Graph.hookComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the (3,3) self-loop mentions node 3 → singleton component (the
    // Dedup.connectedComponents contract)
    assert(lbl === Map(10L -> 7L, 7L -> 7L, 9L -> 7L, 3L -> 3L,
      100L -> 42L, 42L -> 42L, 55L -> 55L, 56L -> 55L))
  }
}
