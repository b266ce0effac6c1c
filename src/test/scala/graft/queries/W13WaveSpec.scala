package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-13 first wave (q448–q449).
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
}
