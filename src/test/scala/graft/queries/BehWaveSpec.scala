package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-10 behavioral/graph queries (q371-q380):
  * sample-quantile error bounds, weighted-sampling bias direction, ridge
  * normal-equation stationarity, the 3-core closure property, polygon
  * containment ground truths, bitemporal correction semantics, interval
  * overlap vs brute force, and funnel/sequence state-machine replays. */
class BehWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("sample quantiles: a 256-doc sample keeps rank error under 10 points") {
    val out = CatalogBeh.q371SampleQuantiles(spark, sf).collect()
    assert(out.length === 3)
    out.foreach(r => assert(r.getAs[Double]("rank_error") < 0.10))
  }

  test("weighted sample: mean sampled weight exceeds the population mean") {
    val r = CatalogBeh.q372WeightedSample(spark, sf).collect().head
    assert(r.getAs[Double]("mean_w_sample") > r.getAs[Double]("mean_w_pop"))
    assert(r.getAs[Long]("k") === 32L)
  }

  test("ridge: coefficients satisfy the regularized normal equations") {
    val r = CatalogBeh.q373Ridge(spark, sf).collect().head
    val b1 = r.getAs[Double]("beta1"); val b2 = r.getAs[Double]("beta2")
    val d = graft.Tables.documents(spark, sf)
      .select(col("n_chars").as("x1"),
        size(split(col("text"), " ")).cast("long").as("x2"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val s11 = d.map(v => v._1 * v._1).sum + 1000L
    val s12 = d.map(v => v._1 * v._2).sum
    val s22 = d.map(v => v._2 * v._2).sum + 1000L
    val c1 = d.map(v => v._1 * v._3).sum
    val c2 = d.map(v => v._2 * v._3).sum
    // (XtX + lambda I) beta = Xty, relative residual ~ 0
    assert(math.abs(s11 * b1 + s12 * b2 - c1) / math.abs(c1.toDouble) < 1e-9)
    assert(math.abs(s12 * b1 + s22 * b2 - c2) / math.abs(c2.toDouble) < 1e-9)
  }

  test("3-core: closure — every surviving node keeps degree >= 3 inside the core") {
    val out = CatalogBeh.q374ThreeCore(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("core_degree") >= 3L))
  }

  test("point-in-polygon: known inside/outside points classify correctly") {
    // driver-side ray cast replay on a few lattice probes
    val verts = Seq((0L, 0L), (1000000L, 400000L), (2000000L, 0L),
      (2000000L, 1200000L), (1000000L, 800000L), (0L, 1200000L))
    def inside(px: Long, py: Long): Boolean = {
      var c = 0
      verts.indices.foreach { i =>
        val (x1, y1) = verts(i); val (x2, y2) = verts((i + 1) % verts.size)
        val straddles = (y1 <= py && py < y2) || (y2 <= py && py < y1)
        if (straddles) {
          val cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
          if (cross * math.signum((y2 - y1).toDouble).toLong > 0) c += 1
        }
      }
      c % 2 == 1
    }
    assert(inside(1000000L, 600000L))   // center of the arrowhead
    assert(!inside(1000000L, 100000L))  // in the bottom notch
    assert(!inside(1000000L, 1100000L)) // in the top notch
    val r = CatalogBeh.q375PointInPolygon(spark, sf).collect().head
    assert(r.getAs[Long]("n_inside") > 0L)
    assert(r.getAs[Double]("share_inside") < 1.0)
  }

  test("bitemporal: corrections only surface for k % 5 == 0 customers with early tx days") {
    val r = CatalogBeh.q376Bitemporal(spark, sf).collect().head
    assert(r.getAs[Long]("n_cust") > 0L)
    assert(r.getAs[Long]("n_from_v2") <= r.getAs[Long]("n_cust"))
  }

  test("interval overlap: bucketed join equals the brute-force theta join") {
    val out = CatalogBeh.q377IntervalOverlap(spark, sf).collect().head
    val spans = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("d"))
      .agg(unix_seconds(min(col("ts"))).as("s1"),
        (unix_seconds(max(col("ts"))) + 1L).as("e1")).collect()
      .map(x => (x.getLong(2), x.getLong(3)))
    val wins = (0 until 40).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mw:$i".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(
        h.take(4).map("%02x".format(_)).mkString, 16)
      val s2 = u % 2592000L + 1704067200L
      (s2, s2 + 21600L)
    }
    val brute = spans.flatMap { case (s1, e1) =>
      wins.filter { case (s2, e2) => s1 < e2 && s2 < e1 } }.length
    assert(out.getAs[Long]("n_pairs") === brute.toLong)
  }

  test("window funnel: levels partition all active users; monotone counts down-funnel") {
    val out = CatalogBeh.q378WindowFunnel(spark, sf).collect()
    val total = out.map(_.getAs[Long]("n_users")).sum
    val active = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "view", "click", "purchase"))
      .select(col("user_id")).distinct().count()
    assert(total === active)
    out.foreach(r => assert(r.getAs[Long]("lvl") >= 0L &&
      r.getAs[Long]("lvl") <= 4L))
  }

  test("sequence match: driver-side state-machine replay agrees") {
    val r = CatalogBeh.q379SequenceMatch(spark, sf).collect().head
    val rows = graft.Tables.events(spark, sf)
      .filter(col("event_type").isin("error", "signup", "purchase"))
      .select(col("user_id"), unix_micros(col("ts")).as("tm"),
        col("event_type")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val byU = rows.groupBy(_._1)
    var matched = 0L; var total = 0L
    byU.values.foreach { evs =>
      var armed = false; var m = 0L
      evs.sortBy(_._2).foreach {
        case (_, _, "error") => armed = true
        case (_, _, "signup") => armed = false
        case (_, _, "purchase") => if (armed) { m += 1; armed = false }
        case _ =>
      }
      if (m > 0) matched += 1
      total += m
    }
    assert(r.getAs[Long]("n_matched_users") === matched)
    assert(r.getAs[Long]("total_matches") === total)
  }

  test("clustering coefficient: in [0,1]; triangle nodes have degree >= 2") {
    val out = CatalogBeh.q380ClusteringCoeff(spark, sf).collect()
    assert(out.length === 20)
    out.foreach { r =>
      val cc = r.getAs[Double]("cc")
      assert(cc >= 0.0 && cc <= 1.0 + 1e-12)
      if (r.getAs[Long]("n_triangles") > 0)
        assert(r.getAs[Long]("deg") >= 2L)
    }
  }
}
