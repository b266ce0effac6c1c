package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-12 evaluation/allocation queries
  * (q386-q395): planted-truth recall guarantees, bandit regret
  * identities, water-filling conservation + clipping, shift-share
  * conservation, the Fisher-index mean-value property, and bound checks
  * on C-index/RMST/tail dependence. */
class PlanWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("blocking quality: prefix and segment schemes have perfect recall on the planted pairs") {
    val out = CatalogPlan.q386BlockingQuality(spark, sf).collect()
      .map(r => r.getAs[String]("scheme") -> r).toMap
    assert(out("name_suffix4").getAs[Double]("recall") === 1.0)
    assert(out("segment").getAs[Double]("recall") === 1.0)
    out.values.foreach { r =>
      assert(r.getAs[Double]("reduction_ratio") < 1.0)
      assert(r.getAs[Double]("recall") >= 0.0 &&
        r.getAs[Double]("recall") <= 1.0)
    }
    // tighter blocks = better reduction: suffix beats segment
    assert(out("name_suffix4").getAs[Double]("reduction_ratio") <
      out("segment").getAs[Double]("reduction_ratio"))
  }

  test("bandit: regret identity holds and the policy never beats the oracle") {
    val r = CatalogPlan.q387BanditReplay(spark, sf).collect().head
    assert(r.getAs[Long]("regret_cents") ===
      r.getAs[Long]("best_fixed_arm_cents") - r.getAs[Long]("policy_reward_cents"))
    assert(r.getAs[Long]("regret_cents") >= 0L)
    val nd = r.getAs[Long]("n_days")
    val ne = r.getAs[Long]("n_explore")
    // ~10% md5 exploration, generously banded
    assert(ne > nd / 20 && ne < nd / 5, s"explore=$ne of $nd")
  }

  test("forecast combo: combined MAE does not exceed the worst component") {
    val r = CatalogPlan.q388ForecastCombo(spark, sf).collect().head
    val maes = Seq(r.getAs[Double]("mae_persist"),
      r.getAs[Double]("mae_weekly"), r.getAs[Double]("mae_ma7"))
    assert(r.getAs[Double]("mae_combined") <= maes.max)
    assert(r.getAs[Double]("mae_combined") > 0.0)
  }

  test("tail dependence: joint count bounded by the margins") {
    val r = CatalogPlan.q389TailDependence(spark, sf).collect().head
    assert(r.getAs[Long]("nboth") <= math.min(r.getAs[Long]("nx"),
      r.getAs[Long]("ny")))
    val l = r.getAs[Double]("lambda_u")
    assert(l >= 0.0 && l <= 1.0)
  }

  test("RMST: both arms in (0, 60], and the diff is their gap") {
    val r = CatalogPlan.q390Rmst(spark, sf).collect().head
    val a0 = r.getAs[Double]("rmst_ctrl_days")
    val a1 = r.getAs[Double]("rmst_treat_days")
    assert(a0 > 0.0 && a0 <= 60.0)
    assert(a1 > 0.0 && a1 <= 60.0)
    assert(math.abs(r.getAs[Double]("rmst_diff_days") - (a1 - a0)) < 1e-12)
  }

  test("waterfill: allocations conserve 60% of demand; rationed queues sit at the level") {
    val out = CatalogPlan.q391Waterfill(spark, sf).collect()
    assert(out.length === 5)
    val totalDemand = out.map(_.getAs[Long]("demand")).sum.toDouble
    val totalAlloc = out.map(_.getAs[Double]("allocation")).sum
    assert(math.abs(totalAlloc - totalDemand * 0.6) < 1e-6 * totalDemand)
    out.foreach { r =>
      assert(r.getAs[Double]("allocation") <=
        r.getAs[Long]("demand").toDouble + 1e-9)
    }
    val rationedAllocs = out.filter(_.getAs[Boolean]("rationed"))
      .map(_.getAs[Double]("allocation")).distinct
    assert(rationedAllocs.length <= 1, "rationed queues share one level")
  }

  test("shift-share: components conserve the total delta") {
    val out = CatalogPlan.q392ShiftShare(spark, sf).collect()
    val parts = out.map(r => r.getAs[Double]("national_part") +
      r.getAs[Double]("competitive_part")).sum
    val delta = out.map(_.getAs[Double]("delta")).sum
    assert(math.abs(parts - delta) < 1e-6 * math.abs(delta))
  }

  test("price index: Fisher lies between Laspeyres and Paasche") {
    val r = CatalogPlan.q393PriceIndex(spark, sf).collect().head
    val l = r.getAs[Double]("laspeyres"); val p = r.getAs[Double]("paasche")
    val f = r.getAs[Double]("fisher")
    assert(f >= math.min(l, p) - 1e-12 && f <= math.max(l, p) + 1e-12)
    assert(l > 0.0 && p > 0.0)
  }

  test("Harrell C: in [0,1], pair count bounded by the sample size") {
    val r = CatalogPlan.q394HarrellC(spark, sf).collect().head
    val c = r.getAs[Double]("c_index")
    assert(c >= 0.0 && c <= 1.0)
    assert(r.getAs[Long]("n_permissible") <= 400L * 399L / 2L)
  }

  test("ABC/XYZ: cells partition the parts and the revenue") {
    val out = CatalogPlan.q395AbcXyz(spark, sf).collect()
    val share = out.map(_.getAs[Double]("revenue_share")).sum
    assert(math.abs(share - 1.0) < 1e-9)
    val nParts = out.map(_.getAs[Long]("n_parts")).sum
    val distinct = graft.Tables.lineitem(spark, sf)
      .select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    assert(nParts === distinct)
  }
}
