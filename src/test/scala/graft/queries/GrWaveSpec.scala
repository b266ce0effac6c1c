package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-10e graph/embedding wave (q418–q420): dim-recall
  * is exact at the full dimension and scored over a constant query set;
  * Luby's output is independent AND maximal on the real graph (together
  * these also prove every node was decided within the round budget) and
  * exact on a crafted path graph; Borůvka's edge set equals a
  * driver-side Kruskal under the identical md5 weights — the MST is
  * unique because distinct-string edges get distinct 48-bit weights. */
class GrWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("dim-recall: full-dim recall is exactly 1 and the query set is constant") {
    val rows = CatalogGr.q418DimRecall(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("d")).toSeq === Seq(4L, 8L, 16L, 32L, 64L))
    val full = rows.find(_.getAs[Long]("d") == 64L).get
    assert(full.getAs[Long]("n_match") === full.getAs[Long]("n_queries"))
    assert(full.getAs[Double]("recall1") === 1.0)
    assert(rows.map(_.getAs[Long]("n_queries")).distinct.length === 1)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall1")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("n_match") <= r.getAs[Long]("n_queries"))
    }
  }

  private def misEdges(dir: String): Array[(Long, Long)] =
    CatalogAlg.partEdges(spark, dir)
      .collect().map(r => (r.getAs[Long]("x"), r.getAs[Long]("y")))

  test("Luby MIS: independent and maximal on the real graph") {
    val mis = CatalogGr.q419LubyMis(spark, sf).collect()
      .map(_.getAs[Long]("node")).toSet
    val edges = misEdges(sf)
    // independence: no edge internal to the MIS
    assert(!edges.exists { case (x, y) => mis(x) && mis(y) })
    // maximality: every non-MIS node has a MIS neighbor. A node left
    // undecided by the round budget would violate this, so the check is
    // also the all-decided margin law for MisRounds.
    val nbr = (edges ++ edges.map { case (x, y) => (y, x) })
      .groupBy(_._1).map { case (a, es) => a -> es.map(_._2).toSet }
    val nodes = nbr.keySet
    val uncovered = (nodes -- mis).filterNot(a => nbr(a).exists(mis))
    assert(uncovered.isEmpty, s"non-MIS nodes without a MIS neighbor: " +
      s"${uncovered.take(5)} (round budget too small?)")
  }

  test("Luby MIS: path graph P5 selects exactly the md5-priority solution") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val out = CatalogGr.lubyOf(edges, CatalogGr.MisRounds).collect()
      .map(_.getAs[Long]("node")).toSet
    // brute-force replay with the identical priority
    val md = java.security.MessageDigest.getInstance("MD5")
    def pr(a: Long): Long = {
      val hex = md.digest(s"mis:$a".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(10)
      java.lang.Long.parseLong(hex, 16) * 1048576L + a
    }
    val nbr = Map(1L -> Set(2L), 2L -> Set(1L, 3L), 3L -> Set(2L, 4L),
      4L -> Set(3L, 5L), 5L -> Set(4L))
    var und = nbr.keySet; var sel = Set.empty[Long]
    while (und.nonEmpty) {
      val s = und.filter(a => (nbr(a) & und).forall(b => pr(a) < pr(b)))
      val drop = s.flatMap(nbr) & und
      sel ++= s; und = und -- s -- drop
    }
    assert(out === sel)
    // structural: a P5 MIS has 2 or 3 nodes, never adjacent ones
    assert(out.size >= 2 && out.size <= 3)
    assert(!nbr.exists { case (a, bs) => out(a) && (bs & out).nonEmpty })
  }

  test("Borůvka MST equals driver-side Kruskal under the same weights") {
    val out = CatalogGr.q420BoruvkaMst(spark, sf).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"), r.getAs[Long]("wt")))
      .toSet
    val edges = misEdges(sf)
    val md = java.security.MessageDigest.getInstance("MD5")
    def wt(x: Long, y: Long): Long = {
      val hex = md.digest(s"mst:$x,$y".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val weighted = edges.map { case (x, y) => (x, y, wt(x, y)) }
    assert(weighted.map(_._3).distinct.length === weighted.length,
      "distinct weights are the uniqueness precondition")
    // Kruskal with union-find
    val par = scala.collection.mutable.Map[Long, Long]()
    def find(a: Long): Long = {
      var x = a
      while (par.getOrElse(x, x) != x) { par(x) = par.getOrElse(par(x), par(x)); x = par(x) }
      x
    }
    val kruskal = scala.collection.mutable.Set[(Long, Long, Long)]()
    weighted.sortBy(_._3).foreach { case (x, y, w) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) { par(rx) = ry; kruskal += ((x, y, w)) }
    }
    assert(out === kruskal.toSet)
    // forest size: |MST| = n_nodes − n_components
    val nodes = edges.flatMap { case (x, y) => Seq(x, y) }.distinct
    val nComp = nodes.map(find).distinct.length
    assert(out.size === nodes.length - nComp)
  }
}
