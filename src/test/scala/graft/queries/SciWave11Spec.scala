package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q266-q268 on sf0.001. */
class SciWave11Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("markov removal: probabilities in [0,1]; removal never raises P(conv)") {
    val out = CatalogSci.q266MarkovRemoval(spark, sf).collect()
    assert(out.length == 5)
    val byName = out.map(r => r.getString(r.fieldIndex("removed_channel")) ->
      (r.getDouble(r.fieldIndex("p_conv")),
        r.getDouble(r.fieldIndex("removal_effect")))).toMap
    val (pBase, effBase) = byName("(none)")
    assert(effBase == 0.0)
    assert(pBase >= 0.0 && pBase <= 1.0 + 1e-9)
    byName.filterKeys(_ != "(none)").foreach { case (c, (p, eff)) =>
      assert(p >= 0.0 && p <= pBase + 1e-12,
        s"removing $c raised P(conv): $p > $pBase")
      assert(math.abs(eff - (pBase - p) / pBase) < 1e-12)
      assert(eff >= -1e-12 && eff <= 1.0 + 1e-12)
    }
  }

  test("ltv triangle: cumulative is non-decreasing within each cohort") {
    val out = CatalogSci.q267LtvTriangle(spark, sf).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(rows.head.fieldIndex("age_weeks")))
      var prev = 0L
      sorted.foreach { r =>
        val c = r.getLong(r.fieldIndex("cum_cents"))
        assert(c >= prev, s"cumulative dropped: $r"); prev = c
        assert(r.getLong(r.fieldIndex("n_users")) > 0)
      }
    }
  }

  test("chao1: estimate >= observed vocabulary; unseen fraction in [0,1)") {
    val r = CatalogSci.q268Chao1(spark, sf).collect()(0)
    val v = r.getLong(r.fieldIndex("v_obs"))
    val chao1 = r.getDouble(r.fieldIndex("chao1"))
    assert(chao1 >= v.toDouble - 1e-9, s"chao1 $chao1 < observed $v")
    val uf = r.getDouble(r.fieldIndex("unseen_frac"))
    assert(uf >= -1e-12 && uf < 1.0)
    assert(r.getLong(r.fieldIndex("f1")) >= 0 &&
      r.getLong(r.fieldIndex("f2")) >= 0)
  }
}
