package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the infrastructure wave (q231-q234): conservation,
  * bound, and mechanism-shape properties on sf0.001. */
class InfraWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("poisson bootstrap: interval is ordered and brackets the point mean") {
    val r = CatalogInfra.q231PoissonBoot(spark, sf).collect()(0)
    val lo = r.getDouble(r.fieldIndex("boot_lo"))
    val hi = r.getDouble(r.fieldIndex("boot_hi"))
    val p = r.getDouble(r.fieldIndex("point_mean"))
    assert(lo <= hi, r)
    // replicate means concentrate around the point mean; the ~88% CI
    // bracketing it on fixed data is the sanity check, not a theorem
    assert(lo <= p && p <= hi, r)
    assert(r.getLong(r.fieldIndex("n_reps")) == 32L)
  }

  test("compaction: bytes and files are conserved; next-fit bound holds") {
    val files = graft.Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang"))
      .agg(sum(col("n_chars")).as("bytes"))
    val totalBytes = files.agg(sum(col("bytes"))).collect()(0).getLong(0)
    val nFiles = files.count()
    val maxFile = files.agg(max(col("bytes"))).collect()(0).getLong(0)
    val out = CatalogInfra.q232CompactionPlan(spark, sf).collect()
    assert(out.map(r => r.getLong(r.fieldIndex("total_bytes"))).sum == totalBytes)
    assert(out.map(r => r.getLong(r.fieldIndex("n_files"))).sum == nFiles)
    // next-fit: a bin can exceed target only by the file that crossed it
    val target = 65536L
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("total_bytes")) <= target + maxFile, r)
    }
    // bins are contiguous from 0
    val bins = out.map(r => r.getLong(r.fieldIndex("bin"))).sorted
    assert(bins.head == 0L && bins.last == bins.length - 1L)
  }

  test("shard assign: docs conserved, ratios average to 1 across 16 shards") {
    val out = CatalogInfra.q233ShardAssign(spark, sf).collect()
    assert(out.length == 16)
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(out.map(r => r.getLong(r.fieldIndex("n_docs"))).sum == nDocs)
    val ratios = out.map(r => r.getDouble(r.fieldIndex("load_ratio")))
    assert(math.abs(ratios.sum - 16.0) < 1e-9)
    ratios.foreach(x => assert(x > 0.0 && x < 16.0))
  }

  test("dp counts: noisy = true + noise exactly; |noise| within the lg tail bound") {
    val out = CatalogInfra.q234DpCounts(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val t = r.getLong(r.fieldIndex("true_count")).toDouble
      val n = r.getDouble(r.fieldIndex("noise"))
      val ny = r.getDouble(r.fieldIndex("noisy_count"))
      assert(ny == t + n, r)
      // |noise| <= (32 bits) * ln2 / eps — the u32 tail bound
      assert(math.abs(n) <= 32.0 * 0.6931471805599453 + 1e-9, r)
      assert(r.getDouble(r.fieldIndex("epsilon")) == 1.0)
    }
  }
}
