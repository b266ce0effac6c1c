package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q264-q265 on sf0.001. */
class SciWave10Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("grid dbscan: clusters + noise conserve every point; ranks ordered") {
    val out = CatalogSci.q264GridDbscan(spark, sf).collect()
    assert(out.nonEmpty)
    val totalPts = out.map(r => r.getLong(r.fieldIndex("n_points"))).sum
    val nEmb = graft.Tables.embeddings(spark, sf).count()
    // top-10 cut may drop small clusters; conservation holds as <=,
    // and with equality when <= 10 clusters exist (true on sf0.001)
    assert(totalPts <= nEmb)
    val ranks = out.map(r => r.getLong(r.fieldIndex("cluster_rank"))).sorted
    assert(ranks.head == 0L, "noise row missing")
    // cluster sizes descending in rank order
    val sizes = out.filter(_.getLong(0) > 0)
      .sortBy(_.getLong(0)).map(r => r.getLong(r.fieldIndex("n_points")))
    assert(sizes.sameElements(sizes.sorted.reverse))
  }

  test("gumbel: sigma/beta positive; return level above the mean max") {
    val r = CatalogSci.q265GumbelExtremes(spark, sf).collect()(0)
    val sigma = r.getDouble(r.fieldIndex("sigma"))
    val beta = r.getDouble(r.fieldIndex("beta"))
    val mu = r.getDouble(r.fieldIndex("mu"))
    val rl = r.getDouble(r.fieldIndex("return_level_30d"))
    assert(sigma > 0.0 && beta > 0.0)
    assert(mu < r.getDouble(r.fieldIndex("mean_max")),
      "Gumbel location must sit below the mean (gamma shift)")
    assert(rl > r.getDouble(r.fieldIndex("mean_max")),
      "30-day return level must exceed the average daily max")
    assert(r.getLong(r.fieldIndex("n_days")) > 1)
  }
}
