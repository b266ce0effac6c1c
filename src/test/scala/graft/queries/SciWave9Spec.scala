package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q261-q263 on sf0.001. */
class SciWave9Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("cart stump: best gain >= 0; children partition; gini in [0, 1/2]") {
    val r = CatalogSci.q261CartStump(spark, sf).collect()(0)
    assert(r.getDouble(r.fieldIndex("gain")) >= -1e-12, r)
    Seq("parent_gini", "child_gini").foreach { c =>
      val g = r.getDouble(r.fieldIndex(c))
      assert(g >= 0.0 && g <= 0.5 + 1e-12, s"$c=$g")
    }
    val docs = graft.Tables.documents(spark, sf)
    assert(r.getLong(r.fieldIndex("n_left")) +
      r.getLong(r.fieldIndex("n_right")) == docs.count())
    val posCnt = docs.select(
      (size(array_distinct(split(col("text"), " "))) * 2 >=
        size(split(col("text"), " "))).cast("long").as("p"))
      .agg(sum(col("p"))).collect()(0).getLong(0)
    assert(r.getLong(r.fieldIndex("pos_left")) +
      r.getLong(r.fieldIndex("pos_right")) == posCnt)
  }

  test("power mde: positive, consistent ratio, pooled rate in [0,1]") {
    val r = CatalogSci.q262PowerMde(spark, sf).collect()(0)
    val p = r.getDouble(r.fieldIndex("p_pool"))
    val mde = r.getDouble(r.fieldIndex("mde_abs"))
    assert(p >= 0.0 && p <= 1.0)
    assert(mde > 0.0)
    assert(math.abs(r.getDouble(r.fieldIndex("mde_rel")) - mde / p) < 1e-15)
  }

  test("mase backtest: 14 test days; both MAEs non-negative; ratio consistent") {
    val r = CatalogSci.q263MaseBacktest(spark, sf).collect()(0)
    assert(r.getLong(r.fieldIndex("n_test")) == 14L)
    val mn = r.getDouble(r.fieldIndex("mae_naive"))
    val ml = r.getDouble(r.fieldIndex("mae_line"))
    assert(mn >= 0.0 && ml >= 0.0)
    assert(math.abs(r.getDouble(r.fieldIndex("mase")) - ml / mn) < 1e-12)
  }
}
