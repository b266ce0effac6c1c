package graft.graph

import graft.SparkSpec

/** PageRank laws: symmetry, hub dominance, mass bound, partition
  * independence (fixed-point arithmetic must be bit-stable). */
class GraphSpec extends SparkSpec {

  private def ranksOf(edges: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.pageRankFixedPoint(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two-node cycle: exactly symmetric ranks, mass within teleport rounding") {
    val got = ranksOf(Seq((1L, 2L), (2L, 1L)))
    assert(got(1L) === got(2L))
    val scale = 1L << 40
    // total mass stays near scale: integer floors only ever LOSE mass, and
    // per round at most a few units per node
    assert(got.values.sum <= scale)
    assert(got.values.sum > scale - 1000L)
  }

  test("star graph: the hub outranks every leaf; leaves are symmetric") {
    // hub 0 <-> leaves 1..10
    val edges = (1L to 10L).flatMap(l => Seq((0L, l), (l, 0L)))
    val got = ranksOf(edges)
    val leafRanks = (1L to 10L).map(got)
    assert(leafRanks.distinct.size === 1) // identical by symmetry, bit-exact
    assert(got(0L) > leafRanks.head * 5, s"hub ${got(0L)} vs leaf ${leafRanks.head}")
  }

  test("dangling sink drains mass but never gains out-contribution") {
    // 1 -> 2 (2 has no out-edges): 2 accumulates, total mass decays
    val got = ranksOf(Seq((1L, 2L)))
    assert(got(2L) > got(1L))
    assert(got.values.sum < (1L << 40)) // drained
  }

  test("fixed-point ranks are independent of edge partitioning (bit-equal)") {
    val s = spark
    import s.implicits._
    val edges = (for (i <- 1L to 30L; j <- 1L to 30L if (i + j) % 7 == 0)
      yield (i, j)).toDF("src", "dst")
    val a = Graph.pageRankFixedPoint(edges.repartition(1), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRankFixedPoint(edges.repartition(13), "src", "dst", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }
}
