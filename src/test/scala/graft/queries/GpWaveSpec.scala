package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-11 convergence/statistics wave (CatalogGp):
  * each loop's result is replayed by an INDEPENDENT driver-side
  * algorithm (Dijkstra vs Bellman–Ford, topological DP vs relaxation,
  * queue-BFS vs min-propagation), the early-exit round counts are
  * asserted well inside their caps (the margin the fixed oracles
  * depend on), and the quantile/surprisal outputs are checked against
  * their defining inequalities rather than any implementation. */
class GpWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def collectedGraph(): (Array[(Long, Long, Long)], Array[Long]) = {
    val e = CatalogAlg.partEdges(spark, sf)
      .select(col("x"), col("y"),
        conv(substring(md5(concat(lit("sp:"), col("x"), lit(","), col("y"))),
          1, 12), 16, 10).cast("long").as("wt"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = e.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    (e, nodes)
  }

  test("q421 SSSP equals a driver-side Dijkstra, and the relaxation " +
      "converges well inside its round cap") {
    val res = CatalogGp.ssspResult(spark, sf)
    assert(res.converged && res.rounds <= CatalogGp.SsspRounds / 2,
      s"rounds=${res.rounds} of cap ${CatalogGp.SsspRounds}")
    val got = res.df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (e, nodes) = collectedGraph()
    val adj = (e.map(t => (t._1, (t._2, t._3))) ++ e.map(t => (t._2, (t._1, t._3))))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val src = nodes.min
    val dist = scala.collection.mutable.Map(src -> 0L)
    val pq = scala.collection.mutable.PriorityQueue((0L, src))(
      Ordering.by[(Long, Long), Long](-_._1))
    while (pq.nonEmpty) {
      val (d, v) = pq.dequeue()
      if (dist(v) == d)
        adj.getOrElse(v, Array.empty[(Long, Long)]).foreach { case (w, c) =>
          if (dist.get(w).forall(_ > d + c)) { dist(w) = d + c; pq.enqueue((d + c, w)) }
        }
    }
    assert(got === dist.toMap)
    // the hop-bounded contract, unconditionally: dist after the cap
    // equals a driver-side Bellman–Ford run for exactly cap rounds
    // (equal to Dijkstra here because the loop converged, but this is
    // the semantics the ×10 denser graph falls back to)
    var bf = Map(src -> 0L)
    (1 to CatalogGp.SsspRounds).foreach { _ =>
      val cand = bf.toSeq.flatMap { case (v, d) =>
        adj.getOrElse(v, Array.empty[(Long, Long)]).map { case (w, c) => w -> (d + c) }
      }
      bf = (bf.toSeq ++ cand).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    }
    assert(got === bf)
  }

  test("q422 critical path equals a driver-side topological DP, the DAG " +
      "is layer-acyclic, and the loop exits inside the level bound") {
    val out = CatalogGp.q422CriticalPath(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def h(tag: String, n: Long, m: Long, off: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag$n".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % m + off
    }
    val (e, nodes) = collectedGraph()
    val lvl = nodes.map(n => n -> h("lvl:", n, 8, 0)).toMap
    val dur = nodes.map(n => n -> h("dur:", n, 1000, 1)).toMap
    // every emitted (lvl, dur) matches the md5 definition
    out.foreach { case (n, l, d, _) =>
      assert(l === lvl(n) && d === dur(n), s"node $n")
    }
    val dag = e.flatMap(t => Seq((t._1, t._2), (t._2, t._1)))
      .filter { case (u, v) => lvl(u) < lvl(v) }
    val preds = dag.groupBy(_._2).map { case (k, v) => k -> v.map(_._1) }
    val ect = scala.collection.mutable.Map.empty[Long, Long]
    nodes.sortBy(lvl).foreach { v =>
      val p = preds.getOrElse(v, Array.empty[Long])
      ect(v) = dur(v) + (if (p.isEmpty) 0L else p.map(ect).max)
    }
    assert(out.map(t => t._1 -> t._4).toMap === ect.toMap)
  }

  test("q423 closeness equals 8 driver-side queue-BFS runs") {
    val got = CatalogGp.q423Closeness(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (e, nodes) = collectedGraph()
    val adj = e.flatMap(t => Seq((t._1, t._2), (t._2, t._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val expect = nodes.sorted.take(CatalogGp.CentSources).map { s0 =>
      val dist = scala.collection.mutable.Map(s0 -> 0L)
      val q = scala.collection.mutable.Queue(s0)
      while (q.nonEmpty) {
        val v = q.dequeue()
        adj.getOrElse(v, Array.empty[Long]).foreach { w =>
          if (!dist.contains(w)) { dist(w) = dist(v) + 1L; q.enqueue(w) }
        }
      }
      s0 -> (dist.size.toLong, dist.values.max, dist.values.sum)
    }.toMap
    assert(got === expect)
  }

  test("q424 exact quantiles satisfy the defining inequality " +
      "count(< v) < k ≤ count(≤ v) on the real column") {
    val out = CatalogGp.q424ExactQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cents = graft.Tables.lineitem(spark, sf)
      .select(round(col("l_extendedprice") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    assert(out.map(_._1).toSeq === Seq("p50", "p90", "p99"))
    out.foreach { case (q, k, nOut, v) =>
      assert(nOut === n, q)
      val below = cents.count(_ < v).toLong
      val atOrBelow = cents.count(_ <= v).toLong
      assert(below < k && k <= atOrBelow, s"$q: k=$k v=$v")
      // and k is the ceil(p·n) the name claims
      val expectK = q match {
        case "p50" => (n + 1L) / 2L
        case "p90" => (9L * n + 9L) / 10L
        case "p99" => (99L * n + 99L) / 100L
      }
      assert(k === expectK, q)
    }
  }

  test("q425 bigram surprisal: per-doc totals match a driver-side " +
      "recount with exact bit-length log2") {
    val out = CatalogGp.q425BigramSurprisal(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.length >= 2)
    val grams = docs.flatMap { case (id, t) =>
      (0 until t.length - 1).map(i => id -> t.substring(i, i + 2))
    }
    val dict = grams.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val total = dict.values.sum
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val expect = grams.groupBy(_._1).map { case (id, g) =>
      id -> (g.length.toLong,
        g.map(p => bitlen(total) - bitlen(dict(p._2))).sum)
    }
    assert(out === expect)
  }
}
