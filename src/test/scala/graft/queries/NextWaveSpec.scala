package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-3 inference queries (q301-q310): statistical
  * identities (known closed forms on degenerate inputs, invariances,
  * textbook bounds) checked at sf0.001/sf0.01 — complementary to the
  * DuckDB hash gate, these pin the SEMANTICS, not just reproducibility. */
class NextWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("log-rank: O1 bounded by total deaths; E1 positive; chi2 finite") {
    // The statistic itself: O1 within [0, total deaths]; E1 positive;
    // chi2 finite and non-negative.
    val r = CatalogNext.q301LogRank(spark, sf).collect().head
    val o1 = r.getAs[Long]("o1")
    val e1 = r.getAs[Double]("e1")
    val chi2 = r.getAs[Double]("chi2")
    assert(o1 >= 0 && e1 > 0.0)
    assert(chi2 >= 0.0 && !chi2.isNaN)
    // arms partition the users: total deaths across arms = KM's deaths
    val life = Tables_survDeaths(sf)
    assert(o1 <= life)
  }

  private def Tables_survDeaths(dir: String): Long =
    graft.Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(col("event_type") === "purchase" && col("value") > 150.0)
        .as("conv"))
      .filter(col("conv")).count()

  test("Nelson-Aalen: hazards in (0,1], cumulative sums nondecreasing and consistent") {
    val rows = CatalogNext.q302NelsonAalen(spark, sf)
      .orderBy(col("t")).collect()
    assert(rows.nonEmpty)
    val na = rows.map(_.getAs[Double]("na_cum"))
    assert(na.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // each hazard in (0, 1]; variance cumulative also nondecreasing
    assert(rows.forall { r =>
      val h = r.getAs[Double]("hazard"); h > 0.0 && h <= 1.0
    })
    // defined identity: na_cum == running sum of hazard
    val run = na.indices.map(i => rows.take(i + 1)
      .map(_.getAs[Double]("hazard")).sum)
    na.zip(run).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
  }

  test("Mantel-Haenszel: OR_MH is within the range of stratum ORs (collapsibility bound)") {
    val r = CatalogNext.q303MantelHaenszel(spark, sf).collect().head
    val or = r.getAs[Double]("or_mh")
    assert(or > 0.0 && !or.isNaN)
    // MH weights are convex-ish: OR_MH lies within [min, max] stratum OR
    // over strata with all four cells nonzero.
    val tab = graft.Tables.customer(spark, sf)
      .groupBy(col("c_nationkey"))
      .agg(
        sum(when(col("c_mktsegment") === "AUTOMOBILE" && col("c_acctbal") > 5000.0, 1L).otherwise(0L)).as("a"),
        sum(when(col("c_mktsegment") === "AUTOMOBILE" && !(col("c_acctbal") > 5000.0), 1L).otherwise(0L)).as("b"),
        sum(when(!(col("c_mktsegment") === "AUTOMOBILE") && col("c_acctbal") > 5000.0, 1L).otherwise(0L)).as("c"),
        sum(when(!(col("c_mktsegment") === "AUTOMOBILE") && !(col("c_acctbal") > 5000.0), 1L).otherwise(0L)).as("d"))
      .collect()
      .filter(r => Seq("a", "b", "c", "d").forall(f => r.getAs[Long](f) > 0))
      .map(r => (r.getAs[Long]("a").toDouble * r.getAs[Long]("d")) /
        (r.getAs[Long]("b").toDouble * r.getAs[Long]("c")))
    assert(or >= tab.min - 1e-12 && or <= tab.max + 1e-12)
  }

  test("Fleiss kappa: bounded by 1, and near-1 because raters rarely flip") {
    val r = CatalogNext.q304FleissKappa(spark, sf).collect().head
    val k = r.getAs[Double]("kappa")
    val pbar = r.getAs[Double]("p_bar")
    val pe = r.getAs[Double]("p_e")
    assert(k <= 1.0 + 1e-12)
    assert(pbar >= 0.0 && pbar <= 1.0 && pe > 0.0 && pe < 1.0)
    // 1/20 flip rate per rater: observed agreement must stay high
    assert(pbar > 0.8 && k > 0.5)
  }

  test("Jarque-Bera: skew/kurt/JB match a central-moment driver recompute") {
    // JB is computed from central moments, so it only depends on the
    // daily-count series' shape. Recompute driver-side and compare.
    val r = CatalogNext.q305JarqueBera(spark, sf).collect().head
    val cs = graft.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
      .agg(count(lit(1)).as("c")).collect().map(_.getAs[Long]("c").toDouble)
    val n = cs.length.toDouble
    val m = cs.sum / n
    val m2 = cs.map(x => (x - m) * (x - m)).sum / n
    val m3 = cs.map(x => math.pow(x - m, 3)).sum / n
    val m4 = cs.map(x => math.pow(x - m, 4)).sum / n
    val skew = m3 / (m2 * math.sqrt(m2))
    val kurt = m4 / (m2 * m2)
    assert(math.abs(r.getAs[Double]("skew") - skew) < 1e-6)
    assert(math.abs(r.getAs[Double]("kurt") - kurt) < 1e-6)
    val jb = n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0)
    assert(math.abs(r.getAs[Double]("jb") - jb) < 1e-6)
  }

  test("Levene/BF: F >= 0 and SS decomposition is consistent") {
    val r = CatalogNext.q306LeveneBf(spark, sf).collect().head
    assert(r.getAs[Long]("k") === 5L)
    val ssb = r.getAs[Double]("ss_between")
    val ssw = r.getAs[Double]("ss_within")
    assert(ssb >= 0.0 && ssw > 0.0)
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("Durbin-Watson: statistic lies in [0, 4] and residuals sum to ~0") {
    val r = CatalogNext.q307DurbinWatson(spark, sf).collect().head
    val dw = r.getAs[Double]("dw")
    assert(dw >= 0.0 && dw <= 4.0)
    // OLS with intercept: residuals sum to 0 — recompute driver-side
    val daily = graft.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("ds")).collect().map(_.getAs[Long]("y").toDouble)
    val beta = r.getAs[Double]("beta"); val alpha = r.getAs[Double]("alpha")
    val resSum = daily.zipWithIndex
      .map { case (y, i) => y - (alpha + beta * (i + 1)) }.sum
    assert(math.abs(resSum) < 1e-4 * daily.length)
  }

  test("Grubbs: G matches a driver-side recompute; outlier is the true argmax") {
    val r = CatalogNext.q308Grubbs(spark, sf).collect().head
    val xs = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"), round(col("c_acctbal") * 100).cast("long").as("x"))
      .collect().map(row => (row.getLong(0), row.getLong(1)))
    val n = xs.length.toDouble
    val mean = xs.map(_._2).sum / n
    val s = math.sqrt(xs.map(t => (t._2 - mean) * (t._2 - mean)).sum / (n - 1))
    val (bk, bx) = xs.maxBy(t => (math.abs(t._2 - mean), -t._1))
    assert(r.getAs[Long]("outlier_custkey") === bk)
    assert(math.abs(r.getAs[Double]("g_stat") - math.abs(bx - mean) / s) < 1e-9)
  }

  test("Friedman: Q within [0, b(k-1)]; tie correction only inflates") {
    val r = CatalogNext.q309Friedman(spark, sf).collect().head
    val b = r.getAs[Long]("n_blocks"); val k = r.getAs[Long]("n_treatments")
    assert(k === 5L && b > 0L)
    val q = r.getAs[Double]("q_stat")
    // Friedman Q maxes at b*(k-1) * ... the chi2 cap: Q <= b(k-1)
    assert(q >= -1e-9 && q <= b.toDouble * (k - 1) + 1e-9)
    val qc = r.getAs[Double]("q_tie_corrected")
    assert(!qc.isNaN && qc >= q - 1e-9) // tie correction inflates
  }

  test("Cronbach alpha: matches a driver-side recompute on the dense grid") {
    val r = CatalogNext.q310Cronbach(spark, sf).collect().head
    val types = Seq("click", "error", "purchase", "signup", "view")
    val byUser = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("c"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rows) =>
        val m = rows.map(x => x.getAs[String]("event_type") -> x.getAs[Long]("c")).toMap
        types.map(t => m.getOrElse(t, 0L).toDouble)
      }.toArray
    val nU = byUser.length.toDouble
    def varOf(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
    }
    val itemVars = types.indices.map(i => varOf(byUser.map(_(i)))).sum
    val totVar = varOf(byUser.map(_.sum))
    val alpha = 5.0 / 4.0 * (1.0 - itemVars / totVar)
    assert(r.getAs[Long]("n_users") === nU.toLong)
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-9)
  }
}
