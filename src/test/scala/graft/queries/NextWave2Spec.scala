package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-4 queries (q311-q320): exact driver-side
  * recomputes for the integer-arithmetic statistics, blocking-completeness
  * for the geo join, and training-improvement laws for the in-engine
  * models. */
class NextWave2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def dailyRevenueCents(dir: String): Array[Long] =
    graft.Tables.orders(spark, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("y"))
      .orderBy(col("ds")).collect().map(_.getAs[Long]("y"))

  test("max drawdown: matches a driver-side recompute of the scaled equity curve") {
    val r = CatalogNext.q311MaxDrawdown(spark, sf).collect().head
    val ys = dailyRevenueCents(sf)
    val n = ys.length.toLong
    val sy = ys.sum
    var cum = 0L; var runmax = Long.MinValue; var best = 0L
    ys.zipWithIndex.foreach { case (y, i) =>
      cum += y
      val e = n * cum - (i + 1) * sy
      runmax = math.max(runmax, e)
      best = math.max(best, runmax - e)
    }
    assert(r.getAs[Long]("n_days") === n)
    assert(math.abs(r.getAs[Double]("max_drawdown") - best.toDouble / (n * 100.0)) < 1e-9)
    assert(r.getAs[String]("peak_ds") <= r.getAs[String]("trough_ds"))
  }

  test("VaR/CVaR: tail picks match a driver-side sort; CVaR loss >= VaR loss") {
    val r = CatalogNext.q312VarCvar(spark, sf).collect().head
    val ys = dailyRevenueCents(sf)
    val diffs = ys.sliding(2).map(p => p(1) - p(0)).toArray
    val n = diffs.length
    val k = (n + 19) / 20
    val tail = diffs.sorted.take(k)
    assert(r.getAs[Long]("n_changes") === n.toLong)
    assert(r.getAs[Long]("k_tail") === k.toLong)
    assert(math.abs(r.getAs[Double]("var95_loss") - (-tail.max / 100.0)) < 1e-9)
    assert(math.abs(r.getAs[Double]("cvar95_loss")
      - (-tail.sum.toDouble / (k * 100.0))) < 1e-9)
    assert(r.getAs[Double]("cvar95_loss") >= r.getAs[Double]("var95_loss") - 1e-12)
  }

  test("Holt-Winters: first period sees zero seasonal; level tracks Holt until then") {
    val rows = CatalogNext.q313HoltWinters(spark, sf)
      .orderBy(col("i")).collect()
    assert(rows.length >= 8)
    // seasonal state starts at zeros: the first 8 steps use seasonal 0
    // (slot i consumed at step i+1; 7 zero slots + the i=1 non-rotation)
    rows.take(8).foreach(r => assert(r.getAs[Double]("seasonal") === 0.0))
    assert(rows.head.getAs[Any]("fcst") == null)
    // with s=0, the forecast is level+trend — check step 2 explicitly
    val r1 = rows(0); val r2 = rows(1)
    val fcst2 = r1.getAs[Double]("level") + r1.getAs[Double]("trend")
    assert(math.abs(r2.getAs[Double]("fcst") - fcst2) < 1e-12)
  }

  test("PACF: lag-1 equals ACF; lag-2 matches the closed form") {
    val rows = CatalogNext.q314Pacf(spark, sf).orderBy(col("lag")).collect()
    assert(rows.length === 5)
    val acf = rows.map(_.getAs[Double]("acf"))
    val pacf = rows.map(_.getAs[Double]("pacf"))
    assert(math.abs(pacf(0) - acf(0)) < 1e-15)
    val p22 = (acf(1) - acf(0) * acf(0)) / (1.0 - acf(0) * acf(0))
    assert(math.abs(pacf(1) - p22) < 1e-12)
    pacf.foreach(p => assert(math.abs(p) <= 1.0 + 1e-9))
  }

  test("changepoint: split SSE <= full SSE and matches a brute-force sweep") {
    val r = CatalogNext.q315Changepoint(spark, sf).collect().head
    assert(r.getAs[Double]("sse_split") <= r.getAs[Double]("sse_full") + 1e-9)
    val ys = graft.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"))
      .agg(sum(round(col("o_totalprice")).cast("long")).as("y"))
      .orderBy(col("ds")).collect().map(_.getAs[Long]("y"))
    val n = ys.length
    def sse(a: Int, b: Int): Double = { // [a, b) 0-based
      val s = ys.slice(a, b).sum.toDouble
      val q = ys.slice(a, b).map(v => v.toDouble * v).sum
      q - s * s / (b - a)
    }
    val best = (2 to n - 2).map(t => (sse(0, t) + sse(t, n), t)).min
    assert(r.getAs[Long]("split_i") === best._2.toLong)
    assert(math.abs(r.getAs[Double]("sse_split") - best._1) < math.abs(best._1) * 1e-9)
  }

  test("geo radius: blocked top-10 is the TRUE global top-10 (cell bound holds)") {
    val out = CatalogNext.q316GeoRadiusJoin(spark, sf).collect()
    assert(out.length === 10)
    // brute force over all pairs
    val pts = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        (conv(substring(md5(concat(lit("glat:"), col("c_custkey"))), 1, 8), 16, 10)
          .cast("long") % 2000000L).as("ilat"),
        (conv(substring(md5(concat(lit("glon:"), col("c_custkey"))), 1, 8), 16, 10)
          .cast("long") % 2000000L).as("ilon"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = for {
      i <- pts.indices.iterator; j <- (i + 1) until pts.length
      a = pts(i); b = pts(j)
      (lo, hi) = if (a._1 < b._1) (a, b) else (b, a)
      d2 = (lo._2 - hi._2) * (lo._2 - hi._2) + (lo._3 - hi._3) * (lo._3 - hi._3)
    } yield (d2, lo._1, hi._1)
    val top = all.toArray.sortBy(t => (t._1, t._2, t._3)).take(10)
    // precondition making blocking complete for the top-10:
    assert(top.last._1 < 20000L * 20000L)
    out.zip(top).foreach { case (row, (d2, a, b)) =>
      assert(row.getAs[Long]("a_key") === a)
      assert(row.getAs[Long]("b_key") === b)
      assert(row.getAs[Long]("d2") === d2)
    }
  }

  test("naive Bayes: confusion conserves docs; degenerate features fall back to the prior") {
    val out = CatalogNext.q317NaiveBayes(spark, sf).collect()
    val perLang = graft.Tables.documents(spark, sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rowSums = out.groupBy(_.getAs[String]("lang"))
      .map { case (l, rs) => l -> rs.map(_.getAs[Long]("n_docs")).sum }
    rowSums.foreach { case (l, n) => assert(perLang(l) === n) }
    // The synthetic corpus shares one vocabulary across langs (no lexical
    // signal), so a CORRECT generative classifier must do at least as well
    // as the prior-only baseline — and in practice collapses to it.
    val correct = out.filter(r => r.getAs[String]("lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    val majority = perLang.values.max
    assert(correct >= (majority * 9) / 10)
  }

  test("MAP@10: in (0, 1]; 10 queries scored") {
    val r = CatalogNext.q318MapRetrieval(spark, sf).collect().head
    assert(r.getAs[Long]("n_queries") === 10L)
    val m = r.getAs[Double]("map10")
    assert(m > 0.0 && m <= 1.0)
  }

  test("item cosine: Cauchy-Schwarz bound and per-item top-5 shape") {
    val out = CatalogNext.q319ItemCosine(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c > 0.0 && c <= 1.0 + 1e-12)
    }
    out.groupBy(_.getAs[Long]("item")).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val ranks = rs.map(_.getAs[Long]("rk")).sorted
      assert(ranks === (1L to rs.length).toArray.toSeq)
    }
  }

  test("ALS rank-1: training beats the zero predictor; scores positive") {
    val out = CatalogNext.q320AlsRank1(spark, sf).collect()
    assert(out.length === 10)
    val rmse = out.head.getAs[Double]("rmse")
    assert(rmse >= 0.0)
    // zero predictor baseline: sqrt(mean(r^2))
    val rs = graft.Tables.events(spark, sf)
      .select(col("user_id").as("u"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("item"))
      .filter(col("item").isNotNull)
      .groupBy(col("u"), col("item")).agg(count(lit(1)).as("c"))
      .collect().map(_.getAs[Long]("c").toDouble)
    val zeroRmse = math.sqrt(rs.map(r => r * r).sum / rs.length)
    assert(rmse < zeroRmse)
    out.foreach(r => assert(r.getAs[Double]("v_score") > 0.0))
  }
}
