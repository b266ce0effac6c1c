package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q258-q260 on sf0.001. */
class SciWave8Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("wasserstein: non-negative, bounded by the domain span in chars") {
    val r = CatalogSci.q258Wasserstein(spark, sf).collect()(0)
    val w1 = r.getDouble(r.fieldIndex("w1_chars"))
    assert(w1 >= 0.0, r)
    val span = graft.Tables.documents(spark, sf)
      .agg(max(col("n_chars")) - min(col("n_chars"))).collect()(0).getLong(0)
    assert(w1 <= span + 20.0, s"W1 $w1 exceeds domain span $span")
    assert(r.getLong(r.fieldIndex("n_en")) > 0 &&
      r.getLong(r.fieldIndex("n_other")) > 0)
  }

  test("cooks distance: non-negative, descending, leverage in (0, 1)") {
    val out = CatalogSci.q259CooksDistance(spark, sf).collect()
    assert(out.length == 20)
    var prev = Double.MaxValue
    out.foreach { r =>
      val d = r.getDouble(r.fieldIndex("cooks_d"))
      assert(d >= 0.0 && d <= prev + 1e-12, r); prev = d
      val h = r.getDouble(r.fieldIndex("h"))
      assert(h > 0.0 && h < 1.0, s"leverage $h out of range")
    }
  }

  test("auc: in [0,1]; equals brute-force tie-corrected pair count") {
    val r = CatalogSci.q260Auc(spark, sf).collect()(0)
    val auc = r.getDouble(r.fieldIndex("auc"))
    assert(auc >= 0.0 && auc <= 1.0, r)
    // brute force on the collected (v, pos) pairs
    val rows = graft.Tables.documents(spark, sf)
      .select(col("n_chars"),
        (size(array_distinct(split(col("text"), " "))) * 2 >=
          size(split(col("text"), " "))).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val pos = rows.filter(_._2 == 1L).map(_._1)
    val neg = rows.filter(_._2 == 0L).map(_._1)
    var u2 = 0L
    for (p <- pos; n <- neg) {
      if (p > n) u2 += 2 else if (p == n) u2 += 1
    }
    val brute = u2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(auc - brute) < 1e-12, s"auc $auc != brute $brute")
  }
}
