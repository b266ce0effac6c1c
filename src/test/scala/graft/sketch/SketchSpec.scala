package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-min sketch laws: one-sided error, collision behavior at a tiny
  * width (non-vacuous overestimates), and merge determinism. */
class SketchSpec extends SparkSpec {

  private def tokenDf(rows: Seq[String]) = {
    val s = spark
    import s.implicits._
    rows.toDF("token")
  }

  test("estimates never under-count (one-sided error law)") {
    val toks = tokenDf(Seq.tabulate(500)(i => s"tok${i % 37}"))
    val got = Sketch.cmsEstimates(toks, "token", depth = 4, width = 256)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 37)
    got.foreach { case (t, tf, est) => assert(est >= tf, s"$t: est $est < tf $tf") }
  }

  test("width=1 degenerates to the grand total: overestimates are non-vacuous") {
    val toks = tokenDf(Seq.fill(30)("a") ++ Seq.fill(12)("b"))
    val got = Sketch.cmsEstimates(toks, "token", depth = 2, width = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every token shares the single bucket in every row: est = N for all
    assert(got("a") === ((30L, 42L)))
    assert(got("b") === ((12L, 42L)))
  }

  test("estimate is independent of input partitioning (merge determinism)") {
    val toks = tokenDf(Seq.tabulate(400)(i => s"w${i % 23}"))
    val one = Sketch.cmsEstimates(toks.repartition(1), "token", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val many = Sketch.cmsEstimates(toks.repartition(16), "token", 4, 64)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(one === many)
  }
}
