package graft.graph

import graft.SparkSpec

/** Laws for exact per-node triangle counting. */
class TriangleSpec extends SparkSpec {

  private def edges(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("a_id", "b_id")
  }

  test("known graph: K4 minus one edge") {
    // K4 on {1,2,3,4} without (3,4): triangles {1,2,3} and {1,2,4}
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L)
    val out = Graph.triangleCounts(e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("orientation, duplicates and self-loops do not change counts") {
    val messy = edges(2L -> 1L, 1L -> 2L, 3L -> 1L, 2L -> 3L, 3L -> 3L, 1L -> 2L)
    val out = Graph.triangleCounts(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle-free graph: all zeros, every node present") {
    val star = edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L)
    val out = Graph.triangleCounts(star).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L, 5L -> 0L))
  }
}
