package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the fixed-point HITS recursion (q113 hash-proves the exact
  * round replay; these pin the structural properties). */
class HitsSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    pairs.toDF("src", "dst")
  }

  test("authority concentrates on the pointed-at node of a star") {
    // 1→0, 2→0, 3→0 plus a side edge 1→4: node 0 must dominate authority,
    // node 4 (one weak in-link) must score below it; pure sources have
    // authority 0
    val out = Graph.hitsFixedPoint(edges(1L -> 0L, 2L -> 0L, 3L -> 0L, 1L -> 4L),
      "src", "dst", iterations = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val auth0 = out(0L)._2
    val auth4 = out(4L)._2
    assert(auth0 > auth4, s"star center must out-rank the side sink: $out")
    assert(out(2L)._2 === 0L && out(3L)._2 === 0L,
      "pure sources have no in-links, so zero authority")
    // hubs: node 1 points at both sinks, 2 and 3 at one — 1 is the top hub
    assert(out(1L)._1 > out(2L)._1, s"two-sink hub must out-rank one-sink: $out")
  }

  test("L1 mass stays bounded by scale and scores are non-negative") {
    val scale = 1L << 30
    val out = Graph.hitsFixedPoint(
      edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L), "src", "dst",
      iterations = 6, scale = scale)
    val sums = out.agg(sum(col("hub")), sum(col("auth")),
      min(col("hub")), min(col("auth"))).collect()(0)
    assert(sums.getLong(0) <= scale && sums.getLong(1) <= scale,
      "every normalization re-caps the column sum at <= scale")
    assert(sums.getLong(2) >= 0L && sums.getLong(3) >= 0L)
  }

  test("deterministic: same edge set, any input order, bit-equal result") {
    val e1 = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 1L -> 3L)
    val e2 = edges(1L -> 3L, 3L -> 1L, 2L -> 3L, 1L -> 2L).repartition(3)
    val a = Graph.hitsFixedPoint(e1, "src", "dst", iterations = 5)
      .orderBy("node").collect().toSeq
    val b = Graph.hitsFixedPoint(e2, "src", "dst", iterations = 5)
      .orderBy("node").collect().toSeq
    assert(a === b)
  }
}
