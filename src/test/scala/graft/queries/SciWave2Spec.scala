package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for q239-q242 on sf0.001. */
class SciWave2Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("l-diversity: l <= group size, l <= distinct sources, pass iff l>=3") {
    val out = CatalogSci.q239LDiversity(spark, sf).collect()
    assert(out.nonEmpty)
    val nSources = graft.Tables.documents(spark, sf)
      .select(col("source")).distinct().count()
    out.foreach { r =>
      val l = r.getLong(r.fieldIndex("l_div"))
      assert(l >= 1 && l <= r.getLong(r.fieldIndex("n")), r)
      assert(l <= nSources, r)
      assert(r.getBoolean(r.fieldIndex("pass")) == (l >= 3), r)
    }
  }

  test("rbo: in [0,1]; identical rankings would give 1 at full overlap") {
    val out = CatalogSci.q240Rbo(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rbo = r.getDouble(r.fieldIndex("rbo"))
      assert(rbo >= 0.0 && rbo <= 1.0 + 1e-12, r)
      val o10 = r.getLong(r.fieldIndex("overlap_10"))
      assert(o10 >= 0 && o10 <= 10, r)
      // truncated-RBO upper bound given the depth-10 overlap
      if (o10 == 10) assert(rbo >= 0.6, s"full overlap but rbo $rbo")
    }
  }

  test("geo median: 64 coords per label, each within the label's bounding box") {
    val out = CatalogSci.q241GeoMedian(spark, sf).collect()
    val byLabel = out.groupBy(_.getInt(0))
    byLabel.foreach { case (_, rows) => assert(rows.length == 64) }
    // the geometric median lies in the convex hull, so per-dimension
    // it is within [min, max] of that label's coordinates
    val bounds = graft.Tables.embeddings(spark, sf)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getFloat(2).toDouble, r.getFloat(3).toDouble))).toMap
    out.foreach { r =>
      val key = (r.getInt(r.fieldIndex("label")),
        r.getLong(r.fieldIndex("pos")).toInt)
      val c = r.getDouble(r.fieldIndex("coord"))
      val (mn, mx) = bounds(key)
      // fixed-point quantization of weights adds sub-1/2^20 wobble
      assert(c >= mn - 1e-5 && c <= mx + 1e-5, s"$key coord $c outside [$mn,$mx]")
    }
  }

  test("neyman: allocation sums exactly to the budget, one unit minimum sanity") {
    val out = CatalogSci.q242NeymanAlloc(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(r => r.getLong(r.fieldIndex("n_alloc"))).sum
    assert(total == 1000L, s"allocated $total != 1000")
    out.foreach { r =>
      assert(r.getDouble(r.fieldIndex("s2")) >= 0.0, r)
      val a = r.getDouble(r.fieldIndex("alloc_frac"))
      val n = r.getLong(r.fieldIndex("n_alloc"))
      assert(math.abs(n - a) <= 1.0 + 1e-9, s"rounding moved $a to $n")
    }
  }
}
