package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the science/eval wave (q235-q238) on sf0.001. */
class SciWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("modularity: Q in [-1/2, 1) and community count bounded by nations") {
    val r = CatalogSci.q235Modularity(spark, sf).collect()(0)
    val q = r.getDouble(r.fieldIndex("modularity"))
    assert(q >= -0.5 - 1e-12 && q < 1.0, r)
    assert(r.getLong(r.fieldIndex("n_communities")) <= 25)
    assert(r.getLong(r.fieldIndex("m_weight")) > 0)
  }

  test("bottom-k jaccard: estimates and exacts in [0,1]; identical-set sanity") {
    val out = CatalogSci.q236BottomkJaccard(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("j_est", "j_exact").foreach { c =>
        val v = r.getDouble(r.fieldIndex(c))
        assert(v >= 0.0 && v <= 1.0 + 1e-12, r)
      }
      assert(r.getDouble(r.fieldIndex("abs_err")) >= 0.0)
    }
    // KMV with k=64 on heavily-overlapping vocabularies should track the
    // exact value within the coarse sketch resolution on average
    val meanErr = out.map(r => r.getDouble(r.fieldIndex("abs_err"))).sum / out.length
    assert(meanErr <= 0.25, s"mean KMV error $meanErr implausibly large")
  }

  test("theil-sen: median slope is bracketed by the extreme pairwise slopes") {
    val r = CatalogSci.q237TheilSen(spark, sf).collect()(0)
    val nDays = r.getLong(r.fieldIndex("n_days"))
    val nPairs = r.getLong(r.fieldIndex("n_pairs"))
    assert(nPairs == nDays * (nDays - 1) / 2, r)
    val slope = r.getDouble(r.fieldIndex("slope"))
    assert(!slope.isNaN && !slope.isInfinite)
    // robust bound: |slope| can't exceed the total count range per day step
    val daily = graft.Tables.events(spark, sf)
      .groupBy(to_date(col("ts"))).agg(count(lit(1)).as("y"))
      .agg(max(col("y")).as("mx"), min(col("y")).as("mn")).collect()(0)
    assert(math.abs(slope) <= (daily.getLong(0) - daily.getLong(1)).toDouble)
  }

  test("conformal: q90 pick is a calibration residual; coverage near nominal") {
    val r = CatalogSci.q238Conformal(spark, sf).collect()(0)
    val cov = r.getDouble(r.fieldIndex("coverage"))
    assert(r.getDouble(r.fieldIndex("q90")) >= 0.0)
    // distribution-free guarantee is >= 0.9 on exchangeable data up to
    // finite-sample wobble; allow +-0.1 at sf0.001's test-fold size
    assert(cov >= 0.80 && cov <= 1.0, s"coverage $cov outside [0.80, 1]")
    assert(r.getLong(r.fieldIndex("n_train")) > 0 &&
      r.getLong(r.fieldIndex("n_cal")) > 0 &&
      r.getLong(r.fieldIndex("n_test")) > 0)
  }
}
