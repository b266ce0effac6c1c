package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q243-q245 on sf0.001. */
class SciWave3Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("capture-recapture: m <= min(n1,n2); Chapman estimate >= m") {
    val r = CatalogSci.q243CaptureRecapture(spark, sf).collect()(0)
    val n1 = r.getLong(r.fieldIndex("n1"))
    val n2 = r.getLong(r.fieldIndex("n2"))
    val m = r.getLong(r.fieldIndex("m"))
    val nHat = r.getDouble(r.fieldIndex("n_hat"))
    val truth = r.getLong(r.fieldIndex("true_distinct"))
    assert(m <= math.min(n1, n2), r)
    assert(nHat >= m.toDouble - 1e-9, r)
    assert(n1 <= truth && n2 <= truth, r)
    // with ~half-samples of a deduplicated universe the estimate should
    // land within 50% of truth on this fixture
    assert(r.getDouble(r.fieldIndex("rel_err")) <= 0.5, r)
  }

  test("isotonic: fitted is non-decreasing, within [0,1], preserves weighted mean") {
    val out = CatalogSci.q244Isotonic(spark, sf)
      .orderBy(col("level")).collect()
    assert(out.nonEmpty)
    var prev = -1.0
    var wSum = 0L; var rawW = 0.0; var fitW = 0.0
    out.foreach { r =>
      val f = r.getDouble(r.fieldIndex("fitted"))
      assert(f >= prev - 1e-12, s"fitted decreased at $r")
      assert(f >= -1e-12 && f <= 1.0 + 1e-12, r)
      prev = f
      val w = r.getLong(r.fieldIndex("w"))
      wSum += w
      rawW += w * r.getDouble(r.fieldIndex("raw_rate"))
      fitW += w * f
    }
    // PAV preserves the weighted mean (block averages)
    assert(math.abs(rawW - fitW) / wSum <= 1e-9,
      s"weighted mean moved: raw $rawW fitted $fitW")
  }

  test("silhouette: per-label mean in [-1, 1]") {
    val out = CatalogSci.q245Silhouette(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val sil = r.getDouble(r.fieldIndex("mean_sil"))
      assert(sil >= -1.0 - 1e-9 && sil <= 1.0 + 1e-9, r)
      assert(r.getLong(r.fieldIndex("n")) > 0)
    }
  }
}
