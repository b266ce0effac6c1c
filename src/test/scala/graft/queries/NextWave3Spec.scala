package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-5 queries (q321-q330): optimality bounds
  * (Viterbi vs fixed paths, DTW vs the diagonal), conservation laws
  * (competing-risks partition, confusion-matrix totals), and structural
  * invariants of the spectral/centrality outputs. */
class NextWave3Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("spectral: scores normalized to [-1,1] with the max attained; both signs present") {
    val out = CatalogNext.q321SpectralPartition(spark, sf).collect()
    assert(out.nonEmpty)
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.forall(v => v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12))
    assert(scores.map(math.abs).max > 1.0 - 1e-9) // inf-norm rescale attained
    val comm = out.map(_.getAs[Long]("community")).toSet
    assert(comm.subsetOf(Set(0L, 1L)))
  }

  test("Kneser-Ney: bigram count matches sum(len-1); entropy positive") {
    val r = CatalogNext.q322KneserNey(spark, sf).collect().head
    val expected = graft.Tables.documents(spark, sf)
      .select((size(split(col("text"), " ")) - 1).cast("long").as("nb"))
      .agg(sum(when(col("nb") > 0, col("nb")).otherwise(0L))).collect()
      .head.getLong(0)
    assert(r.getAs[Long]("n_bigrams") === expected)
    assert(r.getAs[Double]("cross_entropy_bits") > 0.0)
  }

  test("competing risks: CIFs nondecreasing, S nonincreasing, CIF_A+CIF_B <= 1") {
    val rows = CatalogNext.q323CompetingRisks(spark, sf)
      .orderBy(col("t")).collect()
    assert(rows.nonEmpty)
    var lastA = 0.0; var lastB = 0.0; var lastS = 1.0 + 1e-12
    rows.foreach { r =>
      val a = r.getAs[Double]("cif_a"); val b = r.getAs[Double]("cif_b")
      val s = r.getAs[Double]("s_before")
      assert(a >= lastA - 1e-12 && b >= lastB - 1e-12)
      assert(s <= lastS + 1e-12)
      assert(a + b <= 1.0 + 1e-9)
      lastA = a; lastB = b; lastS = s
    }
  }

  test("Tukey HSD: 10 ordered pairs, q >= 0, means match driver recompute") {
    val out = CatalogNext.q324TukeyHsd(spark, sf).collect()
    assert(out.length === 10)
    out.foreach(r => assert(r.getAs[Double]("q_stat") >= 0.0))
    val means = graft.Tables.customer(spark, sf)
      .groupBy(col("c_mktsegment"))
      .agg((sum(round(col("c_acctbal") * 100).cast("long")).cast("double")
        / count(lit(1)).cast("double") / lit(100.0)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val want = means(r.getAs[String]("seg_a")) - means(r.getAs[String]("seg_b"))
      assert(math.abs(r.getAs[Double]("diff_bal") - want) < 1e-6)
    }
  }

  test("Viterbi: path score dominates the all-low and all-high paths") {
    val rows = CatalogNext.q325HmmViterbi(spark, sf).orderBy(col("i")).collect()
    val n = rows.length
    assert(n >= 14)
    assert(rows.forall(r => Set(0L, 1L)(r.getAs[Long]("state"))))
    def lgL(x: Long): Double = {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val p = 1L << (len - 1)
      (len - 1).toDouble + (x - p).toDouble / p.toDouble
    }
    val lg55 = lgL(55); val lg5 = lgL(5); val lg4 = lgL(4); val lg2 = lgL(2)
    def pathScore(states: Seq[Int]): Double = {
      var s = 0.0
      rows.zip(states).zipWithIndex.foreach { case ((r, st), i0) =>
        val b = r.getAs[Long]("bucket")
        val emit = if (st == 0) lgL(10 - b) - lg55 else lgL(b + 1) - lg55
        if (i0 == 0) s += (0.0 - lg2) + emit
        else {
          val trans = if (states(i0 - 1) == st) lg4 - lg5 else 0.0 - lg5
          s += trans + emit
        }
      }
      s
    }
    val vScore = math.max(rows.last.getAs[Double]("d_low"),
      rows.last.getAs[Double]("d_high"))
    assert(vScore >= pathScore(Seq.fill(n)(0)) - 1e-9)
    assert(vScore >= pathScore(Seq.fill(n)(1)) - 1e-9)
    // and it should equal the score of the decoded path itself
    val decoded = rows.map(_.getAs[Long]("state").toInt).toSeq
    assert(math.abs(vScore - pathScore(decoded)) < 1e-9)
  }

  test("kNN LOO: confusion conserves the query count") {
    val out = CatalogNext.q326KnnLoo(spark, sf).collect()
    val nq = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 10 === 0).count()
    assert(out.map(_.getAs[Long]("n")).sum === nq)
    out.foreach { r =>
      assert(r.getAs[Long]("label") >= 0 && r.getAs[Long]("label") <= 9)
      assert(r.getAs[Long]("pred_label") >= 0 && r.getAs[Long]("pred_label") <= 9)
    }
  }

  test("pLSA: 5 ranked words per topic, probabilities in (0,1)") {
    val out = CatalogNext.q327PlsaEm(spark, sf).collect()
    assert(out.length === 10)
    Seq(0L, 1L).foreach { t =>
      val rs = out.filter(_.getAs[Long]("topic") == t)
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      rs.foreach(r => assert(r.getAs[Double]("phi") > 0.0
        && r.getAs[Double]("phi") < 1.0))
    }
  }

  test("centrality: harmonic <= n_reached, closeness <= 1, 10 seeds") {
    val out = CatalogNext.q328Centrality(spark, sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val nr = r.getAs[Long]("n_reached")
      assert(r.getAs[Double]("harmonic") <= nr + 1e-9)
      assert(r.getAs[Double]("closeness") <= 1.0 + 1e-12)
      assert(r.getAs[Long]("sum_dist") >= nr) // every d >= 1
    }
  }

  test("DTW: bounded above by the diagonal path; path length in [7, 13]") {
    val r = CatalogNext.q329Dtw(spark, sf).collect().head
    val daily = graft.Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("ds"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("ds")).collect().map(_.getAs[Long]("c"))
    val diag = (0 until 7).map(i => math.abs(daily(i) - daily(i + 7))).sum
    assert(r.getAs[Long]("dtw_dist") <= diag)
    val pl = r.getAs[Long]("path_len")
    assert(pl >= 7L && pl <= 13L)
  }

  test("dow anomaly: 5 rows in |z|-descending order") {
    val out = CatalogNext.q330DowAnomaly(spark, sf).collect()
    assert(out.length === 5)
    val zs = out.map(r => math.abs(r.getAs[Double]("z")))
    assert(zs.sliding(2).forall(p => p.length < 2 || p(0) >= p(1) - 1e-12))
  }
}
