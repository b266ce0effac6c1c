package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-13 waves (q448–q456).
  *
  * q448: an AMS product sketch on a single shared key is exact up to
  * the ±cross-term swing computed in closed form; the real-data exact
  * join size recounts driver-side from the two frequency maps. q449:
  * the curve replays driver-side from a literal 63-source BFS on the
  * collected edge set, and is monotone with saturation ≤ 63·|nodes|. */
class W13WaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).take(8), 16)

  // ---------------------------------------------------------------- q448

  test("ams join size: single-shared-key sketch is exact; real exact recounts") {
    val s = spark
    import s.implicits._
    // one shared key v=7 with fa=2, fb=3: est_j = sign(j,7)²·6 = 6 ∀j
    val fa = Seq((7L, 2L)).toDF("v", "f")
    val fb = Seq((7L, 3L), (9L, 5L)).toDF("v", "f")
    val sa = CatalogRx.amsSums(fa, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sb = CatalogRx.amsSums(fb, 16).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // |A join B| = 2·3 = 6 exactly, but only estimators where the sign
    // draws of 7 and 9 AGREE on side B keep the cross term... the
    // product S_a·S_b = sign(7)·2 · (sign(7)·3 + sign(9)·5)
    // = 6 + sign(7)sign(9)·10 — the expectation over j is 6; assert the
    // empirical mean over the 16 estimators lands within the ±10 swing
    val ests = (0 until 16).map(j => sa(j) * sb(j))
    assert(ests.forall(e => e == 16L || e == -4L),
      s"each estimator is 6±10 by construction, got $ests")
    // real data: exact join size recounts from the two frequency maps
    val out = CatalogW13.q448AmsJoinSize(spark, sf).collect()
    val faR = graft.Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1))).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fbR = graft.Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(count(lit(1))).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = faR.map { case (k, f) => f * fbR.getOrElse(k, 0L) }.sum
    assert(out.forall(_.getAs[Long]("join_exact") == exact))
    assert(out.length === 16)
  }

  // ---------------------------------------------------------------- q449

  test("multi-source bfs: curve replays from a driver BFS; monotone; saturates") {
    val out = CatalogW13.q449MultiSourceBfs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // driver replay
    val e = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.Tables.orders(spark, sf)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val nodes = adj.keys.toSeq
    val srcs = nodes.sortBy(n => (md5hex(s"bfs:$n"), n)).take(63)
    var reach: Map[Long, Set[Int]] = srcs.zipWithIndex
      .map { case (n, j) => n -> Set(j) }.toMap
    val replay = scala.collection.mutable.ArrayBuffer(
      (0L, reach.size.toLong, reach.values.map(_.size.toLong).sum))
    for (h <- 1 to CatalogW13.BfsRounds) {
      reach = (reach.toSeq ++ reach.toSeq.flatMap { case (n, s) =>
        adj.getOrElse(n, Set.empty).map(_ -> s) })
        .groupBy(_._1).view.mapValues(_.map(_._2).reduce(_ ++ _)).toMap
      replay += ((h.toLong, reach.size.toLong,
        reach.values.map(_.size.toLong).sum))
    }
    assert(out.toSeq === replay.toSeq)
    // monotone + saturation bound
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2 && b._3 >= a._3)
    }
    assert(out.last._3 <= 63L * nodes.size)
  }

  // ---------------------------------------------------------------- q450

  test("stable matching: a matching, acceptor-saturating, and NO blocking pair") {
    val out = CatalogW13.q450StableMatching(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(out.length === CatalogW13.GsProposers)
    val matched = out.collect { case (p, Some(a)) => p -> a }
    // a matching: acceptors pairwise distinct; with P > A every acceptor
    // is matched (an unmatched acceptor would have accepted anyone)
    assert(matched.map(_._2).distinct.length === matched.length)
    assert(matched.length === CatalogW13.GsAcceptors)
    // stability: no (p, a) where p prefers a over p's match AND a
    // prefers p over a's match — checked over ALL P×A pairs
    val ps = out.map(_._1)
    val as = matched.map(_._2)
    def pScore(p: Long, a: Long) = u32(s"gsp:$p:$a")
    def aScore(p: Long, a: Long) = u32(s"gsa:$p:$a")
    val matchOfP = matched.toMap
    val matchOfA = matched.map(_.swap).toMap
    val blocking = for {
      p <- ps; a <- as
      pPrefers = matchOfP.get(p) match {
        case None => true // unmatched proposer prefers anyone
        case Some(cur) => pScore(p, a) > pScore(p, cur) ||
          (pScore(p, a) == pScore(p, cur) && a < cur)
      }
      q = matchOfA(a)
      aPrefers = aScore(p, a) > aScore(q, a) ||
        (aScore(p, a) == aScore(q, a) && p < q)
      if pPrefers && aPrefers
    } yield (p, a)
    assert(blocking.isEmpty, s"blocking pairs: $blocking")
  }

  // ---------------------------------------------------------------- q451

  test("allen relations: exhaustive partition of all same-customer pairs; inverse symmetry") {
    val out = CatalogW13.q451AllenRelations(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val allowed = Set("precedes", "meets", "overlaps", "finished_by",
      "contains", "starts", "equals", "started_by", "during", "finishes",
      "overlapped_by", "met_by", "preceded_by")
    assert(out.keySet.subsetOf(allowed), out.keySet -- allowed)
    // exhaustiveness: histogram total = number of same-customer pairs of
    // orders that HAVE a fulfillment window (≥ 1 lineitem)
    val iv = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey")), Seq("o_orderkey"),
        "left_semi")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .select(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)
    assert(out.values.sum === iv)
  }

  // ---------------------------------------------------------------- q452

  test("dod compression: bit accounting recounts driver-side; regular cadence compresses") {
    val out = CatalogW13.q452DodCompression(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def bitlen(z: Long): Long = java.lang.Long.toBinaryString(z).length.toLong
    val byUser = ev.groupBy(_._1).map { case (u, rows) =>
      val ts = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val deltas = ts.sliding(2).map(w => w(1) - w(0)).toSeq
      val dods = if (deltas.isEmpty) Seq.empty[Long]
        else deltas.head +: deltas.sliding(2).map(w => w(1) - w(0)).toSeq
      val enc = 64L + dods.map { d =>
        val zz = if (d >= 0) 2 * d else -2 * d - 1; bitlen(zz) + 6
      }.sum
      u -> (ts.length.toLong, 64L * ts.length, enc)
    }
    out.foreach { case (u, n, raw, encBits) =>
      val (en, eraw, eenc) = byUser(u)
      assert((n, raw, encBits) === (en, eraw, eenc), s"user $u")
    }
    // events are second-ish cadence streams: encoding must beat raw
    assert(out.forall(r => r._4 < r._3))
  }

  // ---------------------------------------------------------------- q453

  test("linear counting: bitmap recounts driver-side; estimate tracks exact in-regime") {
    val out = CatalogW13.q453LinearCounting(spark, sf).collect()
    val tu = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    out.foreach { r =>
      val t = r.getString(0)
      val users = tu.filter(_._1 == t).map(_._2).toSet
      val positions = users.map(u => u32(s"lc:$u") % CatalogW13.LcBits)
      assert(r.getAs[Long]("set_bits") === positions.size.toLong)
      assert(r.getAs[Long]("n_exact") === users.size.toLong)
      // in-regime (load « 1 here): the estimate lands within 40% of exact
      val est = r.getAs[Double]("est_lc")
      val exact = users.size.toDouble
      assert(est > 0.6 * exact && est < 1.4 * exact,
        s"$t: est $est vs exact $exact")
    }
  }

  // ---------------------------------------------------------------- q454

  test("misra-gries: the MG guarantees hold and the kernel replays driver-side") {
    val out = CatalogW13.q454MisraGries(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // rebuild the panel driver-side
    val panel = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (md5hex(s"mg:${r._1}"), r._1)).take(CatalogW13.MgPanel)
    val bySeries = panel.groupBy(_._2).view.mapValues(_.sortBy(_._1)
      .map(r => s"u${r._3 % 13}").toSeq)
    bySeries.foreach { case (series, items) =>
      val (c, n) = graft.streaming.StreamingHeavyHitters
        .mgRun(Map.empty, 0L, items, CatalogW13.MgK)
      val got = out.filter(_._1 == series)
      // exact kernel equivalence
      assert(got.map(t => t._2 -> t._3).toMap === c)
      assert(got.forall(_._4 == n.toLong))
      // MG guarantees on TRUE panel frequencies: every counter
      // underestimates by <= N/(k+1), and every item with true
      // frequency > N/(k+1) survives
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
      val bound = n / (CatalogW13.MgK + 1)
      c.foreach { case (item, est) =>
        assert(est <= truth(item) && truth(item) - est <= bound, item)
      }
      truth.foreach { case (item, f) =>
        if (f > bound) assert(c.contains(item),
          s"$series: heavy item $item (f=$f > $bound) missing")
      }
    }
  }

  // ---------------------------------------------------------------- q455

  test("peak concurrency: the sweep equals a literal day-by-day interval count") {
    val out = CatalogW13.q455PeakConcurrency(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val iv = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("sd"))
      .join(graft.Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .join(graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"),
          datediff(col("l_shipdate"), lit("1970-01-01")).cast("long")
            .as("shd")), "o_orderkey")
      .groupBy(col("c_mktsegment"), col("o_orderkey"), col("sd"))
      .agg(greatest(max(col("shd")), col("sd")).as("ed"))
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    out.foreach { case (seg, peak, firstDay) =>
      val ivs = iv.filter(_._1 == seg).map(t => (t._2, t._3))
      val days = ivs.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      // literal per-day containment count — the definition, not the sweep
      def conc(d: Long) = ivs.count(t => t._1 <= d && d <= t._2).toLong
      val byDay = days.map(d => d -> conc(d))
      assert(peak === byDay.map(_._2).max, seg)
      assert(firstDay === byDay.filter(_._2 == peak).map(_._1).min, seg)
    }
  }

  // ---------------------------------------------------------------- q456

  test("weighted intervals: DP beats greedy, is bounded by total, exact on brute force") {
    val out = CatalogW13.q456WeightedIntervals(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // rebuild each panel driver-side; compare DP against (a) exhaustive
    // optimum on the md5-first 16 intervals (2^16 subsets), (b) the
    // greedy-by-weight lower bound on the full panel, (c) the trivial
    // total-weight upper bound
    val iv = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("sd"),
        round(col("o_totalprice") * 100).cast("long").as("w"))
      .join(graft.Tables.customer(spark, sf)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .join(graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("o_orderkey"),
          datediff(col("l_shipdate"), lit("1970-01-01")).cast("long")
            .as("shd")), "o_orderkey")
      .groupBy(col("c_mktsegment"), col("o_orderkey"), col("sd"), col("w"))
      .agg(greatest(max(col("shd")), col("sd")).as("ed"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4),
        r.getLong(3)))
    def compat(a: (Long, Long), b: (Long, Long)) = a._2 < b._1 || b._2 < a._1
    out.foreach { case (seg, n, total, best) =>
      val panel = iv.filter(_._1 == seg)
        .sortBy(r => (md5hex(s"wis:${r._2}"), r._2)).take(CatalogW13.WisPanel)
        .map(r => (r._3, r._4, r._5)) // sd, ed, w
      assert(n === panel.length.toLong)
      assert(total === panel.map(_._3).sum)
      assert(best <= total)
      // greedy by weight desc is a valid (suboptimal) schedule
      var chosen = List.empty[(Long, Long)]
      var greedy = 0L
      panel.sortBy(r => (-r._3, r._1, r._2)).foreach { case (s0, e0, w) =>
        if (chosen.forall(c => compat(c, (s0, e0)))) {
          chosen ::= ((s0, e0)); greedy += w
        }
      }
      assert(best >= greedy, s"$seg: DP $best below greedy $greedy")
      // exhaustive optimum on the first 16 panel intervals
      val sub = panel.take(16)
      var opt = 0L
      for (mask <- 0 until (1 << sub.length)) {
        val sel = sub.zipWithIndex.collect {
          case (r, i) if (mask & (1 << i)) != 0 => r }
        val valid = sel.combinations(2).forall(p =>
          compat((p(0)._1, p(0)._2), (p(1)._1, p(1)._2)))
        if (valid) opt = math.max(opt, sel.map(_._3).sum)
      }
      val dp16 = {
        val rows = sub.sortBy(r => (r._2, r._1))
        val dp = Array.fill(rows.length + 1)(0L)
        for (i <- 1 to rows.length) {
          var p = 0; var j = i - 1
          while (j >= 1 && p == 0) { if (rows(j - 1)._2 < rows(i - 1)._1) p = j; j -= 1 }
          dp(i) = math.max(dp(i - 1), rows(i - 1)._3 + dp(p))
        }
        dp(rows.length)
      }
      assert(dp16 === opt, s"$seg: 16-interval DP $dp16 != exhaustive $opt")
    }
  }
}
