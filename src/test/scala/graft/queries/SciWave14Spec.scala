package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q275-q277 on sf0.001. */
class SciWave14Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mann-kendall: |S| bounded by pair count; variance positive") {
    val r = CatalogSci.q275MannKendall(spark, sf).collect()(0)
    val s0 = r.getLong(r.fieldIndex("s"))
    val n = r.getLong(r.fieldIndex("n_days"))
    assert(math.abs(s0) <= n * (n - 1) / 2, r)
    assert(r.getDouble(r.fieldIndex("var_s")) > 0.0, r)
    assert(r.getDouble(r.fieldIndex("z2")) >= 0.0, r)
  }

  test("cv kfold: three folds, positive test MSE, folds partition the corpus") {
    val out = CatalogSci.q276CvKfold(spark, sf).collect()
    assert(out.length == 3)
    val total = out.map(r => r.getLong(r.fieldIndex("n_test"))).sum
    assert(total == graft.Tables.documents(spark, sf).count())
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("mse")) >= 0.0, r)
      assert(r.getDouble(r.fieldIndex("slope")) > 0.0,
        "chars-per-token slope should be positive")
    }
  }

  test("vocab coverage: monotone in k, reaching 1.0 once k >= vocab size") {
    val out = CatalogSci.q277VocabCoverage(spark, sf)
      .orderBy(col("k")).collect()
    assert(out.length == 4)
    var prev = 0.0
    out.foreach { r =>
      val cov = r.getDouble(r.fieldIndex("coverage"))
      assert(cov >= prev - 1e-12 && cov <= 1.0 + 1e-12, r); prev = cov
      val k = r.getLong(r.fieldIndex("k"))
      if (k >= r.getLong(r.fieldIndex("vocab_size")))
        assert(math.abs(cov - 1.0) < 1e-12, s"k=$k should cover all: $r")
    }
  }
}
