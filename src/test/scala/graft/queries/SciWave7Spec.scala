package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q255-q257 on sf0.001. */
class SciWave7Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("obrien-fleming: boundaries decrease across looks; z2 >= 0; n grows") {
    val out = CatalogSci.q255ObrienFleming(spark, sf)
      .orderBy(col("look")).collect()
    assert(out.length == 5)
    var prevB = Double.MaxValue
    var prevN = 0L
    out.foreach { r =>
      val b = r.getDouble(r.fieldIndex("boundary2"))
      assert(b < prevB, s"boundary must shrink: $r"); prevB = b
      assert(r.getDouble(r.fieldIndex("z2")) >= 0.0, r)
      val n = r.getLong(r.fieldIndex("n"))
      assert(n >= prevN, s"cumulative n shrank: $r"); prevN = n
      assert(r.getBoolean(r.fieldIndex("crossed")) ==
        (r.getDouble(r.fieldIndex("z2")) > b))
    }
  }

  test("bh fdr: step-up consistency — rejected is a prefix of the ranking") {
    val out = CatalogSci.q256BhFdr(spark, sf).orderBy(col("rank")).collect()
    assert(out.nonEmpty)
    // rejected flags form a prefix (all true then all false)
    val flags = out.map(_.getBoolean(out.head.fieldIndex("rejected")))
    val firstFalse = flags.indexOf(false)
    if (firstFalse >= 0)
      assert(flags.drop(firstFalse).forall(!_), "rejections not a prefix")
    // every rejected rank k has some k' >= k with chi2_(k') >= crit_(k')
    var prevChi = Double.MaxValue
    out.foreach { r =>
      val chi2 = r.getDouble(r.fieldIndex("chi2"))
      assert(chi2 <= prevChi + 1e-12, "ranking not descending"); prevChi = chi2
      assert(chi2 >= 0.0)
    }
  }

  test("entropy rate: in [0, lg(n_states)]") {
    val r = CatalogSci.q257EntropyRate(spark, sf).collect()(0)
    val h = r.getDouble(r.fieldIndex("entropy_rate_bits"))
    val k = r.getLong(r.fieldIndex("n_states")).toDouble
    assert(h >= -0.087, s"entropy $h below the lg-chord floor")
    assert(h <= math.log(k) / math.log(2.0) + 0.087,
      s"entropy $h above lg($k) + chord")
    assert(r.getLong(r.fieldIndex("n_transitions")) > 0)
  }
}
