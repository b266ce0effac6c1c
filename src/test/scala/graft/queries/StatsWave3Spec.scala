package graft.queries

import graft.SparkSpec

/** Laws for the late stats/eval wave (q220-q230) — bounds and internal
  * consistencies each statistic must satisfy on sf0.001 data. The
  * primary correctness gate is the DuckDB hash-match; these laws pin
  * the mathematical shape so a future refactor that still hashes
  * differently fails loudly here first. */
class StatsWave3Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fertility: pieces cover words (>=1 piece per word) per language") {
    val out = CatalogStats.q220Fertility(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("pieces")) >=
        r.getLong(r.fieldIndex("words")), r)
      assert(r.getDouble(r.fieldIndex("fertility")) >= 1.0, r)
    }
  }

  test("burstiness: fano >= 0 and document frequency <= total count") {
    val out = CatalogStats.q221Burstiness(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("fano")) >= 0.0, r)
      assert(r.getLong(r.fieldIndex("df")) <= r.getLong(r.fieldIndex("count")), r)
    }
  }

  test("diversity: simpson in [0,1], shannon in [0, lg(n_sources)]") {
    val out = CatalogStats.q222Diversity(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val s = r.getDouble(r.fieldIndex("simpson"))
      val h = r.getDouble(r.fieldIndex("shannon_lg2"))
      val k = r.getLong(r.fieldIndex("n_sources")).toDouble
      assert(s >= 0.0 && s <= 1.0 + 1e-12, r)
      assert(h >= -1e-12 && h <= math.log(k) / math.log(2.0) + 1e-9, r)
    }
  }

  test("ndcg: in [0,1] with at most k relevant in the top-k") {
    val out = CatalogStats.q223Ndcg(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getDouble(r.fieldIndex("ndcg"))
      assert(n >= -1e-12 && n <= 1.0 + 1e-9, r)
      assert(r.getLong(r.fieldIndex("n_rel_topk")) <= 10, r)
      assert(r.getDouble(r.fieldIndex("dcg")) <=
        r.getDouble(r.fieldIndex("idcg")) + 1e-9, r)
    }
  }

  test("label noise: every suspect has positive margin and a different label") {
    val out = CatalogStats.q224LabelNoise(spark, sf).collect()
    out.foreach { r =>
      assert(r.getInt(r.fieldIndex("pred_label")) !=
        r.getInt(r.fieldIndex("label")), r)
      assert(r.getDouble(r.fieldIndex("margin")) > 0.0, r)
      Seq("cos_own", "cos_pred").foreach { c =>
        val v = r.getDouble(r.fieldIndex(c))
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, r)
      }
    }
  }

  test("stratified ate: a rate difference, so bounded by [-1, 1]") {
    val r = CatalogStats.q225StratifiedAte(spark, sf).collect()(0)
    val ate = r.getDouble(r.fieldIndex("ate"))
    assert(ate >= -1.0 - 1e-12 && ate <= 1.0 + 1e-12, r)
    assert(r.getLong(r.fieldIndex("n_strata")) >= 1)
  }

  test("wilson: interval is inside [0,1] and contains the MLE p_hat") {
    val out = CatalogStats.q226WilsonCi(spark, sf).collect()
    assert(out.length == 2)
    out.foreach { r =>
      val lo = r.getDouble(r.fieldIndex("wilson_lo"))
      val hi = r.getDouble(r.fieldIndex("wilson_hi"))
      val p = r.getDouble(r.fieldIndex("p_hat"))
      assert(lo >= -1e-12 && hi <= 1.0 + 1e-12 && lo <= hi, r)
      assert(lo <= p + 1e-12 && p <= hi + 1e-12, r)
    }
  }

  test("kendall: tau_b in [-1,1]; non-tied pairs split into C and D") {
    val r = CatalogStats.q227KendallTau(spark, sf).collect()(0)
    val tau = r.getDouble(r.fieldIndex("tau_b"))
    assert(tau >= -1.0 - 1e-12 && tau <= 1.0 + 1e-12, r)
    val n0 = r.getLong(r.fieldIndex("n0"))
    val c = r.getLong(r.fieldIndex("concordant"))
    val d = r.getLong(r.fieldIndex("discordant"))
    val tx = r.getLong(r.fieldIndex("ties_x"))
    val ty = r.getLong(r.fieldIndex("ties_y"))
    assert(c + d <= n0, r)
    // a pair that is neither concordant nor discordant is tied in x or y
    assert(c + d + tx + ty >= n0, r)
  }

  test("cuped: rho2 in [0,1] and the adjustment shifts by theta*(covariate gap)") {
    val r = CatalogStats.q228Cuped(spark, sf).collect()(0)
    val rho2 = r.getDouble(r.fieldIndex("rho2"))
    assert(rho2 >= -1e-12 && rho2 <= 1.0 + 1e-12, r)
    assert(r.getLong(r.fieldIndex("n_users")) > 0)
    assert(!r.getDouble(r.fieldIndex("diff_cuped")).isNaN, r)
  }

  test("kappa: in [-1,1], never exceeds raw agreement po; counts partition") {
    val r = CatalogStats.q229Kappa(spark, sf).collect()(0)
    val po = r.getDouble(r.fieldIndex("po"))
    val k = r.getDouble(r.fieldIndex("kappa"))
    assert(po >= 0.0 && po <= 1.0, r)
    assert(k >= -1.0 - 1e-12 && k <= po + 1e-12, r)
    val total = Seq("both_pass", "only_a", "only_b", "neither")
      .map(c => r.getLong(r.fieldIndex(c))).sum
    val docs = graft.Tables.documents(spark, sf).count()
    assert(total == docs, s"confusion counts $total != $docs docs")
  }

  test("jsd: every source pair's divergence lies in [0, 1] bit up to lg-chord error") {
    // The exact-lg is the chord between adjacent powers of two, which
    // sits below true log2 by at most max_t (log2(1+t) - t) ~= 0.0861
    // bits; Jensen's JSD >= 0 holds for true logs, so the computed
    // value may dip below zero by at most that chord gap.
    val chord = 0.0862
    val out = CatalogStats.q230Jsd(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val j = r.getDouble(r.fieldIndex("jsd_bits"))
      assert(j >= -chord && j <= 1.0 + chord, r)
    }
  }
}
