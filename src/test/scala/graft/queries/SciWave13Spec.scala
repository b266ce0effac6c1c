package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q272-q274 on sf0.001. */
class SciWave13Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("anova: SSB + SSW = SST decomposition; F >= 0; groups <= 7") {
    val r = CatalogSci.q272AnovaF(spark, sf).collect()(0)
    val ssb = r.getDouble(r.fieldIndex("ssb"))
    val ssw = r.getDouble(r.fieldIndex("ssw"))
    assert(ssb >= -1e-9 && ssw >= -1e-9, r)
    assert(r.getDouble(r.fieldIndex("f_stat")) >= 0.0, r)
    val k = r.getLong(r.fieldIndex("n_groups"))
    assert(k >= 2 && k <= 7, r)
  }

  test("runs test: run count within [1, n]; z2 consistent with E and Var") {
    val r = CatalogSci.q273RunsTest(spark, sf).collect()(0)
    val runs = r.getLong(r.fieldIndex("n_runs"))
    val n = r.getLong(r.fieldIndex("n1")) + r.getLong(r.fieldIndex("n0"))
    assert(runs >= 1 && runs <= n, r)
    val e = r.getDouble(r.fieldIndex("e_r"))
    val v = r.getDouble(r.fieldIndex("var_r"))
    assert(v > 0.0)
    assert(math.abs(r.getDouble(r.fieldIndex("z2")) -
      (runs - e) * (runs - e) / v) < 1e-12)
  }

  test("ljung-box: Q >= 0 and bounded by n(n+2) * sum(1/(n-k))") {
    val r = CatalogSci.q274LjungBox(spark, sf).collect()(0)
    val q = r.getDouble(r.fieldIndex("q_stat"))
    val n = r.getLong(r.fieldIndex("n_days")).toDouble
    assert(q >= 0.0, r)
    // each |r_k| <= 1 so Q <= n(n+2) * sum_k 1/(n-k)
    val bound = n * (n + 2) * (1 to 7).map(k => 1.0 / (n - k)).sum
    assert(q <= bound + 1e-9, s"Q $q above bound $bound")
    assert(r.getLong(r.fieldIndex("n_lags")) == 7L)
  }
}
