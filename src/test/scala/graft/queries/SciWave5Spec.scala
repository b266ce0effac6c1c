package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q249-q251 on sf0.001. */
class SciWave5Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("shapley: efficiency — attributions sum to v(full) - v(empty)") {
    val out = CatalogSci.q249Shapley(spark, sf).collect()
    assert(out.length == 4)
    val phiSum = out.map(r => r.getDouble(r.fieldIndex("phi"))).sum
    // v(full) = all conversions of users with any touched channels;
    // v(empty) = conversions of users whose touch set is empty
    val users = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
        .as("touched"),
        max(when(col("event_type") === "purchase" && col("value") > 150.0, 1L)
          .otherwise(0L)).as("conv"))
    val vFull = users.agg(sum(col("conv"))).collect()(0).getLong(0)
    val vEmpty = users.filter(col("touched") === 0)
      .agg(coalesce(sum(col("conv")), lit(0L))).collect()(0).getLong(0)
    assert(math.abs(phiSum - (vFull - vEmpty).toDouble) < 1e-9,
      s"efficiency violated: $phiSum vs ${vFull - vEmpty}")
  }

  test("pmi-svd: unit-norm loading vector, positive eigenvalue") {
    val out = CatalogSci.q250PmiSvd(spark, sf).collect()
    assert(out.nonEmpty)
    val fullV = out.map(r => r.getDouble(r.fieldIndex("loading")))
    // the returned rows cover only the realized vocabulary; the full
    // 64-dim vector has unit norm, so the visible part has norm <= 1
    val visNorm = math.sqrt(fullV.map(x => x * x).sum)
    assert(visNorm <= 1.0 + 1e-9, s"visible norm $visNorm > 1")
    val eig = out.head.getDouble(out.head.fieldIndex("eigval"))
    assert(eig > 0.0)
    // PPMI is entrywise non-negative, v0 is positive, so the Perron
    // iterate stays non-negative
    fullV.foreach(x => assert(x >= -1e-12, s"negative loading $x"))
  }

  test("hill: spread sum positive, alpha consistent with xi, xk1 positive") {
    val r = CatalogSci.q251HillTail(spark, sf).collect()(0)
    val xi = r.getDouble(r.fieldIndex("xi_bits"))
    val alpha = r.getDouble(r.fieldIndex("alpha"))
    assert(xi >= 0.0)
    assert(r.getLong(r.fieldIndex("xk1")) > 0)
    assert(math.abs(alpha - 1.0 / (xi * 0.6931471805599453)) < 1e-12)
  }
}
