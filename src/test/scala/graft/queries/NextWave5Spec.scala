package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-9 wave-7 queries (q341-q350): survivorship picks stay
  * inside the observed duplicate set, the cost sweep is a true argmin, the
  * DP dominates the greedy it's contrasted with, MERGE audit counts satisfy
  * the changelog identities, and the factorial ANOVA's sums of squares
  * conserve the total. */
class NextWave5Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("survivorship: every golden record merges exactly 2 sources; segment survives unchanged") {
    val out = CatalogNext.q341Survivorship(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n_records") == 2L))
    // seg is identical across the pair, so min() must return the base value
    val segs = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(r.getAs[String]("seg_surv") ===
      segs(r.getAs[Long]("custkey"))))
  }

  test("cost threshold: the pick is the argmin over the full 32-cutoff sweep") {
    val r = CatalogNext.q342CostThreshold(spark, sf).collect().head
    val cost = r.getAs[Long]("cost")
    assert(r.getAs[Long]("fn") >= 0L && r.getAs[Long]("fp") >= 0L)
    // degenerate thresholds bound the argmin: thr=0 predicts everything
    // positive (cost = all negatives), a rebuilt full sweep can't beat it
    val d = graft.Tables.documents(spark, sf)
      .select(col("n_chars"), (col("lang") === "en").cast("long").as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val lo = d.map(_._1).min; val hi = d.map(_._1).max
    val bins = d.map { case (c, y) =>
      (math.min((c - lo) * 32 / (hi - lo + 1), 31L), y) }
    val pt = d.map(_._2).sum; val nt = d.length.toLong
    val best = (0L to 31L).map { t =>
      val fn = bins.filter(_._1 < t).map(_._2).sum
      val below = bins.count(_._1 < t).toLong
      val fp = (nt - below) - (pt - fn)
      (fn * 5 + fp, t)
    }.min
    assert(cost === best._1 && r.getAs[Long]("thr") === best._2)
  }

  test("average precision: matches a driver-side replay of the ranking") {
    val r = CatalogNext.q343AvgPrecision(spark, sf).collect().head
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"), (col("lang") === "en").as("rel"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2)))
      .sortBy { case (id, c, _) => (-c, id) }
    var hits = 0L; var apsum = 0.0
    d.zipWithIndex.foreach { case ((_, _, rel), i) =>
      if (rel) { hits += 1; apsum += hits.toDouble / (i + 1).toDouble }
    }
    val nRel = d.count(_._3).toLong
    assert(r.getAs[Long]("n_rel") === nRel)
    assert(math.abs(r.getAs[Double]("avg_precision") - apsum / nRel) < 1e-12)
    assert(r.getAs[Double]("avg_precision") >= 0.0 &&
      r.getAs[Double]("avg_precision") <= 1.0)
  }

  test("interleave: 10 distinct picks, 5 per team, strict team alternation") {
    val out = CatalogNext.q344Interleave(spark, sf).collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length === 10)
    assert(out.map(_.getAs[Long]("pos")).toSeq === (1L to 10L))
    out.foreach { r =>
      val expected = if (r.getAs[Long]("pos") % 2 == 1) 0L else 1L
      assert(r.getAs[Long]("team") === expected)
    }
    assert(out.count(_.getAs[Long]("team") == 0L) === 5)
  }

  test("knapsack: DP dominates the density greedy and any single item") {
    val r = CatalogNext.q345KnapsackDp(spark, sf).collect().head
    val best = r.getAs[Long]("best_value")
    assert(best >= r.getAs[Long]("greedy_value"))
    val items = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") < 35)
      .select((expr("n_chars div 50") + 1).as("w"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // any single item that fits is a feasible solution
    items.filter(_._1 <= 60).foreach { case (_, v) => assert(best >= v) }
    assert(best <= items.map(_._2).sum)
  }

  test("merge apply: audit counts satisfy the changelog identities") {
    val r = CatalogNext.q346MergeApply(spark, sf).collect().head
    assert(r.getAs[Long]("n_inserted") === 50L)
    assert(r.getAs[Long]("n_final") === r.getAs[Long]("n_unchanged") +
      r.getAs[Long]("n_updated") + r.getAs[Long]("n_inserted"))
    val keys = graft.Tables.customer(spark, sf)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    assert(r.getAs[Long]("n_deleted") === keys.count(_ % 11 == 0).toLong)
    assert(r.getAs[Long]("n_updated") ===
      keys.count(k => k % 7 == 0 && k % 11 != 0).toLong)
  }

  test("two-way ANOVA: the sequential SS decomposition conserves total SS") {
    val r = CatalogNext.q347TwoWayAnova(spark, sf).collect().head
    val parts = r.getAs[Double]("ss_a") + r.getAs[Double]("ss_b") +
      r.getAs[Double]("ss_ab") + r.getAs[Double]("ss_err")
    val d = graft.Tables.customer(spark, sf)
      .select(round(col("c_acctbal") * 100).cast("long").as("y")).collect()
      .map(_.getLong(0))
    val n = d.length.toDouble
    val sst = d.map(y => y.toDouble * y.toDouble).sum -
      d.map(_.toDouble).sum * d.map(_.toDouble).sum / n
    assert(math.abs(parts - sst) / sst < 1e-9)
    assert(r.getAs[Double]("ss_err") > 0.0)
  }

  test("textrank: 15 keywords, scores strictly above the teleport floor, sorted") {
    val out = CatalogNext.q348Textrank(spark, sf).collect()
    assert(out.length === 15)
    val scores = out.map(_.getAs[Double]("textrank"))
    assert(scores.toSeq === scores.sortBy(-_).toSeq)
    assert(scores.forall(_ > 0.0))
  }

  test("simpson audit: direction partition covers every stratum when the aggregate is signed") {
    val r = CatalogNext.q349SimpsonAudit(spark, sf).collect().head
    val dir = r.getAs[Long]("aggregate_direction")
    assert(Set(-1L, 0L, 1L).contains(dir))
    if (dir != 0L)
      assert(r.getAs[Long]("n_agree") + r.getAs[Long]("n_reversed") +
        r.getAs[Long]("n_null") === r.getAs[Long]("n_strata"))
  }

  test("QTE: nine deciles, per-arm quantiles monotone, qte is their gap") {
    val out = CatalogNext.q350Qte(spark, sf).collect()
    assert(out.map(_.getAs[Long]("decile")).toSeq === (1L to 9L))
    out.foreach(r => assert(math.abs(r.getAs[Double]("qte") -
      (r.getAs[Double]("y_treat") - r.getAs[Double]("y_ctrl"))) < 1e-12))
    val yt = out.map(_.getAs[Double]("y_treat"))
    val yc = out.map(_.getAs[Double]("y_ctrl"))
    assert(yt.sliding(2).forall(p => p(0) <= p(1)))
    assert(yc.sliding(2).forall(p => p(0) <= p(1)))
  }
}
