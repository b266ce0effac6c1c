package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-12 graph-extensions wave (q437–q441).
  *
  * q437: the peel profile is replayed driver-side (exact (n, m) per
  * round) and the STRUCTURAL round bound is asserted executable —
  * survivors of every round number < n∕2 (Markov on Σdeg = 2m against
  * the deg·n > 4m keep rule), which is why ⌈log₂ n⌉ rounds always
  * suffice. q438: the fixpoint of local-dominance matching IS greedy
  * sequential matching by ascending weight (replayed driver-side),
  * plus matching/maximality laws and the round-budget margin. q439:
  * exact driver recount, plus the side-symmetry identity (butterflies
  * counted from the part side equal the customer side). q440: the
  * mutual-k graph has degree ≤ 4 by construction, the coloring is
  * proper with colors ≤ 4, and the full JP fixpoint is replayed
  * driver-side. q441: each trajectory is a valid walk replayed exactly
  * driver-side from the identical md5 draws. */
class GxWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def edgeList(dir: String): Array[(Long, Long)] =
    CatalogAlg.partEdges(spark, dir)
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))

  // ---------------------------------------------------------------- q437

  test("densest peel: driver replay matches and survivors strictly halve") {
    val edges = edgeList(sf)
    val out = CatalogGx.q437DensestPeel(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_edges"), r.getAs[Boolean]("is_best")))
      .sortBy(_._1)
    // driver replay of the peel
    var live = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 1L
    while (live.nonEmpty) {
      val le = edges.filter(e => live(e._1) && live(e._2))
      val nn = live.size.toLong; val mm = le.length.toLong
      stats += ((r, nn, mm))
      val deg = le.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (k, v) => k -> v.length.toLong }
      val surv = live.filter(n => deg.getOrElse(n, 0L) * nn > 4L * mm)
      // the structural bound, executable: Markov on Σdeg = 2m
      assert(surv.size * 2 < live.size || live.size <= 1,
        s"round $r survivors ${surv.size} did not halve from ${live.size}")
      live = surv; r += 1
    }
    assert(out.map(t => (t._1, t._2, t._3)).toSeq === stats.toSeq)
    // exactly one best round; it dominates every round by cross-multiply
    val best = out.filter(_._4)
    assert(best.length === 1)
    val (_, bn, bm, _) = best.head
    out.foreach { case (_, n, m, _) => assert(m * bn <= bm * n) }
    // the cap has ≥ 2x margin at this scale
    assert(stats.length <= CatalogGx.PeelRounds / 2)
  }

  // ---------------------------------------------------------------- q438

  test("maximal matching: equals greedy-by-weight, is maximal, converges early") {
    val edges = edgeList(sf)
    def wt(x: Long, y: Long): Long =
      java.lang.Long.parseLong(md5hex(s"mm:$x,$y").take(12), 16)
    val out = CatalogGx.q438MaximalMatching(spark, sf).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"),
        r.getAs[Long]("wt"), r.getAs[Long]("round")))
    // weights recompute exactly
    out.foreach { case (x, y, w, _) => assert(w === wt(x, y)) }
    // it is a matching: endpoints are pairwise distinct
    val ends = out.flatMap(t => Seq(t._1, t._2))
    assert(ends.distinct.length === ends.length)
    // maximality: every original edge touches a matched node
    val matched = ends.toSet
    assert(edges.forall(e => matched(e._1) || matched(e._2)))
    // the fixpoint equals GREEDY sequential matching by ascending weight
    var free = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val greedy = scala.collection.mutable.Set.empty[(Long, Long)]
    edges.sortBy(e => wt(e._1, e._2)).foreach { case (x, y) =>
      if (free(x) && free(y)) { greedy += ((x, y)); free -= x; free -= y }
    }
    assert(out.map(t => (t._1, t._2)).toSet === greedy.toSet)
    // round-budget margin: converged at ≤ half the cap
    assert(out.map(_._4).max <= CatalogGx.MatchRounds / 2)
  }

  // ---------------------------------------------------------------- q439

  test("butterflies: exact driver recount and side-symmetry identity") {
    val cp = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        "o_orderkey")
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("p")))
    def choose2(n: Long): Long = n * (n - 1) / 2
    // wedges from the customer side (the engine's shape)
    val byC = cp.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val partPairs = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byC.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        partPairs((ps(i), ps(j))) = partPairs.getOrElse((ps(i), ps(j)), 0L) + 1L
    }
    val row = CatalogGx.q439Butterflies(spark, sf).collect().head
    assert(row.getAs[Long]("n_copairs") === partPairs.size.toLong)
    assert(row.getAs[Long]("n_wedges") === partPairs.values.sum)
    assert(row.getAs[Long]("n_butterflies") ===
      partPairs.values.map(choose2).sum)
    // side symmetry: counting customer pairs through shared parts gives
    // the identical butterfly total (both count the 4-cycles once)
    val byP = cp.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val custPairs = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byP.values.foreach { cs =>
      for (i <- cs.indices; j <- (i + 1) until cs.length)
        custPairs((cs(i), cs(j))) = custPairs.getOrElse((cs(i), cs(j)), 0L) + 1L
    }
    assert(custPairs.values.map(choose2).sum ===
      partPairs.values.map(choose2).sum)
  }

  // ---------------------------------------------------------------- q440

  test("JP coloring: bounded-degree mutual graph, proper, equals driver JP") {
    val edges = edgeList(sf)
    val nbrAll = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // mutual top-4 sparsification with the identical md5 draws
    val picks = nbrAll.map { case (a, bs) =>
      a -> bs.sortBy(b => (md5hex(s"mk:$a,$b"), b)).take(CatalogGx.MutualK).toSet
    }
    val muk = edges.filter { case (x, y) =>
      picks(x).contains(y) && picks(y).contains(x) }
    val mnbr = (muk ++ muk.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // degree bound BY CONSTRUCTION
    assert(mnbr.values.forall(_.size <= CatalogGx.MutualK))
    val out = CatalogGx.q440JpColoring(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("color"))).toMap
    assert(out.keySet === mnbr.keySet)
    // proper and ≤ Δ+1 colors
    muk.foreach { case (x, y) => assert(out(x) !== out(y)) }
    assert(out.values.forall(c => c >= 0 && c <= CatalogGx.MutualK))
    // full driver-side JP replay with the identical priorities
    def pr(a: Long): Long =
      java.lang.Long.parseLong(md5hex(s"jp:$a").take(10), 16) * 1048576L + a
    val color = scala.collection.mutable.Map.empty[Long, Long]
    var unc = mnbr.keySet
    var rounds = 0
    while (unc.nonEmpty) {
      rounds += 1
      val cand = unc.filter(a => (mnbr(a) & unc).forall(b => pr(a) > pr(b)))
      cand.foreach { a =>
        val used = mnbr(a).flatMap(color.get)
        color(a) = Iterator.from(0).map(_.toLong).filterNot(used).next()
      }
      unc = unc -- cand
    }
    assert(out === color.toMap)
    // round-budget margin: ≤ half the cap at this scale
    assert(rounds <= CatalogGx.JpRounds / 2)
  }

  // ---------------------------------------------------------------- q441

  test("det walks: trajectories replay exactly and are valid walks") {
    val edges = edgeList(sf)
    val nbrAll = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val out = CatalogGx.q441DetWalks(spark, sf).collect()
      .map(r => (r.getAs[Long]("seed"), r.getAs[Long]("step"),
        r.getAs[Long]("node")))
    val seeds = nbrAll.keySet.filter(_ % 50 == 0)
    val bySeed = out.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(bySeed.keySet === seeds)
    bySeed.foreach { case (seed, traj) =>
      assert(traj.length === CatalogGx.WalkSteps + 1)
      assert(traj.head === seed)
      // valid walk + exact replay of the min-md5 step rule
      (1 to CatalogGx.WalkSteps).foreach { r =>
        val cur = traj(r - 1)
        assert(nbrAll(cur).contains(traj(r)))
        val want = nbrAll(cur).toSeq
          .minBy(b => (md5hex(s"wk:$r:$cur,$b"), b))
        assert(traj(r) === want)
      }
    }
  }
}
