package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-14 waves (q457).
  *
  * q457: the stab set replays driver-side from the literal greedy; it
  * COVERS (every panel window contains a chosen day); and its size
  * equals the maximum number of pairwise-disjoint windows — the
  * piercing = packing duality that makes the greedy provably minimum
  * (any k disjoint windows force ≥ k probes; exhaustive search
  * certifies the packing side on a 16-window sub-panel). */
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
}
