package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-11 reconciliation wave (CatalogRe): the Merkle
  * drill-down must equal a FULL driver-side snapshot diff (bucket
  * pruning is an optimization, never a coverage cut), with the row-count
  * conservation identity on top; the MAD gate must match a plain sorted
  * median/deviation computation; and the quantile primitive's endpoints
  * are pinned. */
class ReWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5mod(tag: String, k: Long, m: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag$k".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("q430 equals a full driver-side diff (Merkle pruning is lossless) " +
      "and satisfies row-count conservation") {
    val got = CatalogRe.q430MerkleDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val a = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100)
        .cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay the mutations
    val del = a.keySet.filter(k => md5mod("del:", k, 100) == 0)
    val upd = a.keySet.filter(k => md5mod("upd:", k, 100) == 0)
    val ins = a.keySet.filter(k => md5mod("ins:", k, 1000) == 0)
    val b = (a -- del).map { case (k, c) =>
      k -> (if (upd(k)) c + 1000L else c) } ++
      ins.map(k => (k + 1000000000L) -> a(k))
    // full diff, no bucketing: classify every key
    val delK = a.keySet -- b.keySet
    val insK = b.keySet -- a.keySet
    val updK = (a.keySet intersect b.keySet).filter(k => a(k) != b(k))
    def byBucket(ks: Set[Long]) =
      ks.groupBy(_ / CatalogRe.RcBucket).view.mapValues(_.size.toLong).toMap
    val (dB, iB, uB) = (byBucket(delK), byBucket(insK), byBucket(updK))
    val expect = (dB.keySet ++ iB.keySet ++ uB.keySet).map { bk =>
      bk -> (dB.getOrElse(bk, 0L), iB.getOrElse(bk, 0L), uB.getOrElse(bk, 0L))
    }.toMap
    assert(got === expect)
    // conservation: |B| − |A| = inserts − deletes (updates preserve count)
    assert(b.size - a.size === insK.size - delK.size)
    assert(got.values.map(_._1).sum === delK.size.toLong)
    assert(got.values.map(_._2).sum === insK.size.toLong)
    assert(got.values.map(_._3).sum === updK.size.toLong)
  }

  test("q431 matches plain sorted median/MAD and direct tail counts") {
    val out = CatalogRe.q431MadOutliers(spark, sf).collect()(0)
    val cs = graft.Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("c"))
      .collect().map(_.getLong(0)).sorted
    val n = cs.length
    val med = cs((n + 1) / 2 - 1)
    val devs = cs.map(c => math.abs(c - med)).sorted
    val mad = devs((n + 1) / 2 - 1)
    assert(out.getAs[Long]("median_cents") === med)
    assert(out.getAs[Long]("mad_cents") === mad)
    assert(out.getAs[Long]("threshold") === 5L * mad)
    assert(out.getAs[Long]("n") === n.toLong)
    assert(out.getAs[Long]("n_low") === cs.count(_ < med - 5L * mad).toLong)
    assert(out.getAs[Long]("n_high") === cs.count(_ > med + 5L * mad).toLong)
  }

  test("q435 coordinated sample preserves FK closure (every sampled order " +
      "keeps ALL its lineitems) and the totals match a driver recount") {
    val out = CatalogRe.q435CoordSample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    def md5mod100(k: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cs:$k".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 100L
    }
    val orders = graft.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val lines = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey")).collect().map(_.getLong(0))
    val keptO = orders.filter(t => md5mod100(t._1) < CatalogRe.CoordPct)
    val keptOKeys = keptO.map(_._1).toSet
    val keptL = lines.filter(k => md5mod100(k) < CatalogRe.CoordPct)
    // FK closure both ways: the key predicate is identical, so the
    // sampled lines are EXACTLY the sampled orders' lines
    val linesByOrder = lines.groupBy(identity).view.mapValues(_.length).toMap
    keptOKeys.foreach { k =>
      assert(keptL.count(_ == k) === linesByOrder.getOrElse(k, 0), s"order $k")
    }
    assert(keptL.forall(keptOKeys.contains), "orphan sampled line")
    val expect = keptO.groupBy(_._2).map { case (p, os) =>
      p -> (os.length.toLong, os.map(o => linesByOrder.getOrElse(o._1, 0))
        .sum.toLong)
    }
    assert(out === expect)
  }

  test("Quantiles.kthSmallest pins the endpoints: k=1 is min, k=n is max, " +
      "and interior ks match the sorted array") {
    import spark.implicits._
    val xs = Seq(7L, -3L, 42L, 0L, 7L, 1000000L, -3L, 5L)
    val df = xs.toDF("c")
    val sorted = xs.sorted
    val got = graft.ops.Quantiles.kthSmallest(df, "c",
      Seq(("a", 1L), ("b", 3L), ("c", xs.length.toLong)))
    assert(got === Seq(("a", 1L, sorted.head), ("b", 3L, sorted(2)),
      ("c", xs.length.toLong, sorted.last)))
  }
}
