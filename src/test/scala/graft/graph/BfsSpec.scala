package graft.graph

import graft.SparkSpec

/** BFS hop-count laws: level correctness on a path, shortest-wins on a
  * shortcut, round cutoff, multi-source min, unreachable absence. */
class BfsSpec extends SparkSpec {

  private def hops(edges: Seq[(Long, Long)], seeds: Seq[Long],
      rounds: Int): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    Graph.bfsHops(edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("id"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph: hop k for node k, cutoff at rounds") {
    // 0 -> 1 -> 2 -> 3 -> 4 -> 5
    val e = (0L to 4L).map(i => (i, i + 1))
    val got = hops(e, Seq(0L), rounds = 3)
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("shortcut wins: direct edge beats the long way around") {
    // 0 -> 1 -> 2 -> 3 and 0 -> 3
    val got = hops(Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 3L)), Seq(0L), 5)
    assert(got(3L) === 1L)
    assert(got(2L) === 2L)
  }

  test("multi-source: each node takes the nearest seed's distance") {
    // line 0-1-2-3-4 undirected, seeds at both ends
    val und = (0L to 3L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val got = hops(und, Seq(0L, 4L), 5)
    assert(got(2L) === 2L)
    assert(got(1L) === 1L && got(3L) === 1L)
    assert(got(0L) === 0L && got(4L) === 0L)
  }

  test("unreachable nodes are absent; isolated seed still reports 0") {
    val got = hops(Seq((1L, 2L), (3L, 4L)), Seq(1L, 9L), 4)
    assert(got === Map(1L -> 0L, 2L -> 1L, 9L -> 0L))
  }

  test("cycle terminates: no node rediscovered with a larger distance") {
    val got = hops(Seq((0L, 1L), (1L, 2L), (2L, 0L)), Seq(0L), 10)
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }
}
