package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-11 curation-planning queries (q381-q385). */
class CurWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("dedup savings: monotone nonincreasing in threshold, bounded by 1") {
    val rows = CatalogCur.q381DedupSavings(spark, sf)
      .orderBy(col("threshold_pct")).collect()
    assert(rows.length === 5)
    val shares = rows.map(_.getAs[Double]("savings_share"))
    assert(shares.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    shares.foreach(s0 => assert(s0 >= 0.0 && s0 <= 1.0))
  }

  test("importance resample: never creates rows; under-target sources keep everything") {
    val out = CatalogCur.q382ImportanceResample(spark, sf).collect()
    out.foreach { r =>
      assert(r.getAs[Long]("n_after") <= r.getAs[Long]("n_before"))
      if (r.getAs[Long]("n_before") <= r.getAs[Long]("n_target"))
        assert(r.getAs[Long]("n_after") === r.getAs[Long]("n_before"))
    }
  }

  test("freshness decay: decayed count in (0, n_events]") {
    val out = CatalogCur.q383FreshnessDecay(spark, sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      val dc = r.getAs[Double]("decayed_count")
      assert(dc > 0.0 && dc <= r.getAs[Long]("n_events").toDouble)
    }
  }

  test("partition advisor: ranks are a permutation; skew ratio >= 1") {
    val out = CatalogCur.q384PartitionAdvisor(spark, sf).collect()
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L))
    out.foreach(r => assert(r.getAs[Double]("skew_ratio") >= 1.0 - 1e-12))
  }

  test("fertility: token shares partition the corpus") {
    val out = CatalogCur.q385Fertility(spark, sf).collect()
    val total = out.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(total - 1.0) < 1e-12)
    out.foreach(r => assert(r.getAs[Double]("chars_per_token") > 0.0))
  }
}
