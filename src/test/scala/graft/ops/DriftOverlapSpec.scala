package graft.ops

import graft.SparkSpec
import graft.curation.Curation
import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** Laws for seasonal residuals (q145), source overlap (q146) and PSI
  * drift (q147). */
class DriftOverlapSpec extends SparkSpec {

  test("seasonal residuals: per-hod means subtract out; residuals sum to 0") {
    val s = spark
    import s.implicits._
    // two days: type 'a' fires 2 then 4 events at hour 09 -> mu 3
    val rows =
      Seq.fill(2)(("a", "2026-01-01 09:05:00")) ++
        Seq.fill(4)(("a", "2026-01-02 09:05:00"))
    val out = TimeSeries.seasonalResiduals(
      rows.toDF("event_type", "tss")
        .select(col("event_type"), col("tss").cast("timestamp").as("ts")),
      "event_type", "ts").orderBy("hour").collect()
    assert(out.map(_.getAs[Double]("seasonal_mu")).toSeq === Seq(3.0, 3.0))
    assert(out.map(_.getAs[Double]("residual")).toSeq === Seq(-1.0, 1.0))
  }

  test("source overlap: a planted mirror shows high directional containment") {
    val s = spark
    import s.implicits._
    val body = (1 to 40).map(i => s"tk$i").mkString(" ")
    val docs = Seq(
      (1L, body + " " + (41 to 80).map(i => s"tk$i").mkString(" "), "orig"),
      (2L, body, "mirror"), // mirror carries only the shared half
      (3L, (100 to 140).map(i => s"zz$i").mkString(" "), "other"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(docs, "text", "source").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("containment"))
      .toMap
    assert(out(("mirror", "orig")) === 1.0) // fully contained in orig
    assert(out(("orig", "mirror")) < 0.6)   // orig only half-mirrored
    assert(!out.keySet.exists(p => p._1 == "other" || p._2 == "other"))
  }

  test("PSI: identical cohorts score ~0, a shifted cohort scores higher") {
    val s = spark
    import s.implicits._
    def rows(shift: Long, grp: String) =
      (1L to 200L).map(i => (i, grp, 100L + (i % 50) + shift))
    val same = (rows(0, "a") ++ rows(0, "b").map { case (i, g, v) => (i + 500, g, v) })
      .toDF("doc_id", "split", "n_chars")
    val shifted = (rows(0, "a") ++ rows(40, "b").map { case (i, g, v) => (i + 500, g, v) })
      .toDF("doc_id", "split", "n_chars")
    def psi(df: org.apache.spark.sql.DataFrame) =
      Curation.psiDrift(df, "n_chars", "split", "a", "b", bins = 8)
        .collect().head.getAs[Double]("psi_bits")
    assert(math.abs(psi(same)) < 1e-9)
    // a 40/50 offset measures 0.27 bits here — above the classic 0.25
    // "population changed" line
    assert(psi(shifted) > 0.25)
  }
}
