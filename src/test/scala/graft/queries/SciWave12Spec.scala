package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q269-q271 on sf0.001. */
class SciWave12Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("interevent burstiness: B in (-1, 1); bins consistent with their bounds") {
    val out = CatalogSci.q269IntereventBurstiness(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val mn = r.getDouble(r.fieldIndex("min_b"))
      val mx = r.getDouble(r.fieldIndex("max_b"))
      assert(mn > -1.0 && mx < 1.0, r)
      assert(mn <= mx, r)
      val bin = r.getLong(r.fieldIndex("bin"))
      assert(math.floor((mn + 1.0) * 4).toLong == bin, r)
      assert(math.floor((mx + 1.0) * 4).toLong == bin, r)
    }
  }

  test("pareto 80/20: k* is the smallest prefix reaching 80% of revenue") {
    val r = CatalogSci.q270Pareto8020(spark, sf).collect()(0)
    val share = r.getDouble(r.fieldIndex("revenue_share"))
    assert(share >= 0.8, s"picked prefix below 80%: $share")
    val k = r.getLong(r.fieldIndex("k_star"))
    val n = r.getLong(r.fieldIndex("n_users"))
    assert(k >= 1 && k <= n)
    assert(math.abs(r.getDouble(r.fieldIndex("user_share")) -
      k.toDouble / n.toDouble) < 1e-15)
  }

  test("rfm: every user lands in exactly one cell; codes in 1..5") {
    val out = CatalogSci.q271RfmSegments(spark, sf).collect()
    val total = out.map(r => r.getLong(r.fieldIndex("n_users"))).sum
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(total == users)
    out.foreach { r =>
      Seq("r_code", "f_code", "m_code").foreach { c =>
        val v = r.getLong(r.fieldIndex(c))
        assert(v >= 1 && v <= 5, r)
      }
    }
  }
}
