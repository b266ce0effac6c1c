package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-14 waves (q457–q459).
  *
  * q457: the stab set replays driver-side from the literal greedy; it
  * COVERS (every panel window contains a chosen day); and its size
  * equals the maximum number of pairwise-disjoint windows — the
  * piercing = packing duality that makes the greedy provably minimum
  * (any k disjoint windows force ≥ k probes; exhaustive search
  * certifies the packing side on a 16-window sub-panel).
  *
  * q458: the DGIM bucket state satisfies the textbook invariants (≤ 2
  * buckets per size, power-of-2 sizes, distinct in-window timestamps,
  * sizes non-decreasing with age); with NO expiry the buckets conserve
  * the exact ones count (merging never loses mass — so the window
  * estimate's only error source is halving the oldest bucket, which is
  * the ≤50% theorem); and the emitted estimate/exact/bound columns
  * replay from the independently recomputed panel bits. */
class W14WaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("interval stabbing: driver replay, cover property, and stab count " +
      "equals the max-disjoint packing (exhaustive on 16)") {
    val out = CatalogW14.q457IntervalStabbing(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    val iv = CatalogW13.fulfillmentWindows(spark, sf, bySegment = true)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4))) // seg, okey, sd, ed
    out.foreach { case (seg, n, nPts, first, last, sum) =>
      val panel = iv.filter(_._1 == seg)
        .sortBy(r => (md5hex(s"stab:${r._2}"), r._2)).take(CatalogW14.StabPanel)
        .map(r => (r._2, r._3, r._4)) // okey, sd, ed
      assert(n === panel.length.toLong)
      // literal greedy replay
      val pts = scala.collection.mutable.ArrayBuffer.empty[Long]
      panel.sortBy(r => (r._3, r._2, r._1)).foreach { case (_, sd, ed) =>
        if (pts.isEmpty || sd > pts.last) pts += ed
      }
      assert(nPts === pts.length.toLong, seg)
      assert((first, last, sum) === ((pts.head, pts.last, pts.sum)), seg)
      // cover: every window contains >= 1 chosen day
      panel.foreach { case (okey, sd, ed) =>
        assert(pts.exists(p => sd <= p && p <= ed),
          s"$seg: window $okey [$sd,$ed] not stabbed")
      }
      // duality on a 16-window sub-panel: greedy stab count there equals
      // the exhaustively-certified maximum disjoint packing
      val sub = panel.take(16)
      val subPts = {
        val b = scala.collection.mutable.ArrayBuffer.empty[Long]
        sub.sortBy(r => (r._3, r._2, r._1)).foreach { case (_, sd, ed) =>
          if (b.isEmpty || sd > b.last) b += ed
        }
        b.length
      }
      var pack = 0
      for (mask <- 0 until (1 << sub.length)) {
        val sel = sub.zipWithIndex.collect {
          case (r, i) if (mask & (1 << i)) != 0 => r }
        val disjoint = sel.combinations(2).forall(p =>
          p(0)._3 < p(1)._2 || p(1)._3 < p(0)._2)
        if (disjoint) pack = math.max(pack, sel.length)
      }
      assert(subPts === pack,
        s"$seg: stab count $subPts != max disjoint packing $pack")
    }
  }

  test("dgim: bucket invariants, no-expiry mass conservation, and the " +
      "emitted columns replay from independently recomputed panel bits") {
    val out = CatalogW14.q458DgimWindow(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(out.nonEmpty)
    // independent panel recomputation: md5-rank bottom 2000, bits in
    // event_id order per series
    val panel = graft.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(r => (md5hex(s"dgim:${r._1}"), r._1)).take(CatalogW14.DgimPanel)
    val bys = panel.groupBy(_._2).view
      .mapValues(_.sortBy(_._1).map(r => if (r._3 % 3 == 0) 1 else 0).toSeq)
    out.foreach { case (series, nSeen, exact, est, nB, maxB, bound) =>
      val bits = bys(series)
      assert(nSeen === bits.length.toLong, series)
      assert(exact === bits.takeRight(CatalogW14.DgimN).sum.toLong, series)
      assert(bound, s"$series: the 50% bound column must be TRUE")
      assert((est - exact).abs * 2 <= exact || est === exact, series)
      // bucket invariants on the final state
      val bks = CatalogW14.dgimRun(bits, CatalogW14.DgimN)
      assert(nB === bks.length.toLong && maxB === bks.map(_._2).max, series)
      bks.groupBy(_._2).foreach { case (sz, g) =>
        assert((sz & (sz - 1)) === 0L, s"$series: size $sz not a power of 2")
        assert(g.size <= 2, s"$series: ${g.size} buckets of size $sz")
      }
      assert(bks.map(_._1).distinct.size === bks.size,
        s"$series: bucket timestamps must be distinct")
      assert(bks.forall(_._1 > bits.length - CatalogW14.DgimN),
        s"$series: expired bucket survived")
      // older buckets are never smaller than newer ones (the DGIM
      // size-monotone-with-age invariant)
      val byAge = bks.sortBy(-_._1).map(_._2)
      assert(byAge.zip(byAge.tail).forall { case (newer, older) =>
        newer <= older }, s"$series: sizes not monotone with age: $byAge")
      // no-expiry conservation: merges never lose mass
      val noExp = CatalogW14.dgimRun(bits, Int.MaxValue)
      assert(noExp.map(_._2).sum === bits.sum.toLong,
        s"$series: no-expiry bucket mass must equal the ones count")
    }
  }

  test("tree lca: the string-prefix answer equals the literal div-10 " +
      "ancestor-chain intersection, and distance is the tree metric") {
    val out = CatalogW14.q459TreeLca(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.length === CatalogW14.LcaPanel * (CatalogW14.LcaPanel - 1) / 2)
    // independent arithmetic model: ancestors-or-self via repeated div 10
    def chain(v: Long): List[Long] =
      if (v < 10) List(v) else v :: chain(v / 10)
    def depth(v: Long): Long = v.toString.length.toLong
    out.foreach { case (u, v, lca, lcaDepth, dist) =>
      val cu = chain(u).toSet
      val common = chain(v).filter(cu) // ordered deepest-first from v's side
      common.headOption match {
        case Some(deepest) =>
          assert(lca === Some(deepest), s"($u,$v)")
          assert(lcaDepth === depth(deepest), s"($u,$v)")
          assert(dist === Some(depth(u) + depth(v) - 2 * depth(deepest)),
            s"($u,$v): distance must be the tree metric through the LCA")
        case None =>
          assert(lca.isEmpty && lcaDepth === 0L && dist.isEmpty,
            s"($u,$v): cross-root pairs have no LCA and no path")
      }
    }
    assert(out.exists(_._3.nonEmpty), "panel must contain same-tree pairs")
    assert(out.exists(_._3.isEmpty), "panel must contain cross-root pairs")
  }
}
