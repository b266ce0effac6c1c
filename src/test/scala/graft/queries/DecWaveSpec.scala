package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-9 decision/causal queries (q361-q370):
  * estimator cross-checks (Cox score at θ=1 == log-rank O−E, Newton
  * stationarity), the newsvendor optimality sandwich, Lindley recursion
  * equivalence, isotonic mass conservation + monotonicity, and the
  * removal-effect/share identities. */
class DecWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("cox: score at theta=1 is the log-rank O-E; Newton landed on a stationary point") {
    val r = CatalogDec.q361CoxPh(spark, sf).collect().head
    val theta = r.getAs[Double]("hazard_ratio")
    assert(theta > 0.0)
    val lr = CatalogNext.q301LogRank(spark, sf).collect().head
    // q301 scores arm g=0; Cox scores arm g=1 — the same statistic, negated
    val oMinusE = lr.getAs[Long]("o1").toDouble - lr.getAs[Double]("e1")
    assert(math.abs(r.getAs[Double]("score_at_1") + oMinusE) < 1e-9)
    // stationarity: recompute g(theta) from the risk table driver-side
    val life = graft.Tables.events(spark, sf)
    val rows = CatalogNext.survivalFrame(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val times = rows.filter(_._3 == 1L).map(_._2).distinct.sorted
    val g = times.map { t =>
      val s1 = rows.count(x => x._1 == 1L && x._2 == t && x._3 == 1L)
      val d = rows.count(x => x._2 == t && x._3 == 1L)
      val n1 = rows.count(x => x._1 == 1L && x._2 >= t)
      val n0 = rows.count(x => x._1 == 0L && x._2 >= t)
      s1 / theta - d * (n1 / (n0 + n1 * theta))
    }.sum
    assert(math.abs(g) < 1e-6, s"score at fitted theta: $g")
  }

  test("permutation test: p in [1/65, 1]") {
    val r = CatalogDec.q362PermTest(spark, sf).collect().head
    val p = r.getAs[Double]("p_value")
    assert(p >= 1.0 / 65.0 - 1e-12 && p <= 1.0)
    assert(r.getAs[Long]("n_reps") === 64L)
  }

  test("lindley: closed form equals the sequential recursion replayed driver-side") {
    val r = CatalogDec.q363LindleyQueue(spark, sf).collect().head
    val daily = graft.Tables.events(spark, sf)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("ds"))
      .agg(count(lit(1)).as("a")).orderBy(col("ds")).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val c = daily.map(_._2).sum / daily.length
    var b = 0L; var mx = 0L; var mxDay = ""; var congested = 0L
    daily.foreach { case (ds, a) =>
      b = math.max(0L, b + a - c)
      if (b > mx) { mx = b; mxDay = ds }
      if (b > 0) congested += 1
    }
    assert(r.getAs[Long]("capacity") === c)
    assert(r.getAs[Long]("max_backlog") === mx)
    assert(r.getAs[String]("peak_day") === mxDay)
    assert(r.getAs[Long]("n_congested") === congested)
  }

  test("newsvendor: the critical fractile is optimal against both neighbors") {
    val r = CatalogDec.q364Newsvendor(spark, sf).collect().head
    assert(r.getAs[Long]("cost_at_q") <= r.getAs[Long]("cost_minus"))
    assert(r.getAs[Long]("cost_at_q") <= r.getAs[Long]("cost_plus"))
  }

  test("cohort LTV: retention in [0,1]; projection dominates ARPU when defined") {
    val out = CatalogDec.q365CohortLtv(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val ret = r.getAs[Double]("retention")
      assert(ret >= 0.0 && ret <= 1.0)
      if (!r.isNullAt(r.fieldIndex("ltv_proj_dollars")))
        assert(r.getAs[Double]("ltv_proj_dollars") >=
          r.getAs[Double]("arpu_dollars") - 1e-9)
    }
  }

  test("brier decomposition: REL - RES + UNC equals the directly computed Brier score") {
    val r = CatalogDec.q366BrierDecomp(spark, sf).collect().head
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        (col("lang") === "en").cast("long").as("y"),
        (conv(substring(md5(concat(lit("bt:"), col("doc_id"))), 1, 8),
          16, 10).cast("long") % 2).as("h")).collect()
      .map(x => (x.getLong(3), x.getString(1), x.getLong(2)))
    val f = docs.filter(_._1 == 0L).groupBy(_._2)
      .map { case (s, xs) => s -> xs.map(_._3).sum.toDouble / xs.length }
    // the engine's inner join drops eval docs whose source never appears
    // in the training half — mirror that here
    val ev = docs.filter(x => x._1 == 1L && f.contains(x._2))
    val bs = ev.map { case (_, s, y) =>
      val d = f(s) - y; d * d }.sum / ev.length
    assert(math.abs(r.getAs[Double]("brier") - bs) < 1e-9)
    assert(r.getAs[Double]("rel") >= 0.0 && r.getAs[Double]("res") >= 0.0)
  }

  test("position attribution: each credit scheme distributes exactly one unit per journey") {
    val out = CatalogDec.q367PositionAttribution(spark, sf).collect()
    val nJourneys = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct().alias("c")
      .join(graft.Tables.events(spark, sf)
        .filter(col("event_type") =!= "purchase").select(col("user_id"))
        .distinct().alias("t"), Seq("user_id"))
      .count()
    // journeys = converted users with >=1 pre-conversion touch; every
    // scheme hands out exactly 1.0 credit per such journey
    val ft = out.map(_.getAs[Long]("first_touch")).sum
    val lt = out.map(_.getAs[Long]("last_touch")).sum
    val lin = out.map(_.getAs[Double]("linear_credit")).sum
    val ub = out.map(_.getAs[Double]("ushape_credit")).sum
    assert(ft === lt)
    assert(math.abs(lin - ft.toDouble) < 1e-6)
    assert(math.abs(ub - ft.toDouble) < 1e-6)
    assert(ft <= nJourneys)
  }

  test("markov attribution: shares sum to 1, removal effects nonnegative") {
    val out = CatalogDec.q368MarkovAttribution(spark, sf).collect()
    assert(out.length === 4)
    val shares = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9)
    out.foreach { r =>
      assert(r.getAs[Double]("removal_effect") >= -1e-12)
      val p = r.getAs[Double]("p_conv_full")
      assert(p > 0.0 && p <= 1.0)
    }
  }

  test("SPRT: the 20% purchase rate decides for H0 at the lower boundary") {
    val r = CatalogDec.q369Sprt(spark, sf).collect().head
    assert(r.getAs[String]("decision") === "accept_h0")
    assert(r.getAs[Double]("llr_at_cross") <= -4.1875)
    assert(r.getAs[Long]("n_days") > 0L)
  }

  test("isotonic: fit is monotone and conserves total mass") {
    val out = CatalogDec.q370Isotonic(spark, sf).orderBy(col("bin")).collect()
    val iso = out.map(_.getAs[Double]("iso_rate"))
    assert(iso.sliding(2).forall(p => p(0) <= p(1) + 1e-12))
    val mass = out.map(r => r.getAs[Long]("n_docs") * r.getAs[Double]("iso_rate")).sum
    val pos = out.map(r => r.getAs[Long]("n_docs") * r.getAs[Double]("raw_rate")).sum
    assert(math.abs(mass - pos) < 1e-6)
  }
}
