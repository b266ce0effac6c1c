package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-8 scoring verbs: bigramLogProb (exact-lg algebra)
  * and thresholdSweep (conservation + monotonicity + boundary bins). */
class ScoringSpec extends SparkSpec {

  test("bigramLogProb: branch bigrams cost exactly 1 bit under exact lg") {
    val s = spark
    import s.implicits._
    // corpus {"a b", "a c"}: c1(a)=2, c12=1 each -> contrib = lg(1)-lg(2)
    // = -1 EXACTLY (lg is exact on powers of two)
    val d = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val m = Curation.bigramLogProb(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) === ((1L, -1.0)) && m(2L) === ((1L, -1.0)), s"got $m")
  }

  test("bigramLogProb: deterministic repetition scores 0 bits") {
    val s = spark
    import s.implicits._
    // single doc "a a a": both bigrams are (a,a); c12 = c1 = 2 -> 0 bits
    val d = Seq((1L, "a a a")).toDF("doc_id", "text")
    val row = Curation.bigramLogProb(d, "doc_id", "text").collect()(0)
    assert(row.getLong(1) === 2L && row.getDouble(2) === 0.0)
  }

  test("bigramLogProb drops docs with fewer than 2 tokens") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "solo"), (2L, "two tokens")).toDF("doc_id", "text")
    val ids = Curation.bigramLogProb(d, "doc_id", "text")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }

  test("thresholdSweep: conservation, boundary bins, rate monotonicity") {
    val s = spark
    import s.implicits._
    val d = (0 until 10).map(i => (i.toDouble, i >= 5)).toDF("score", "label")
    val rows = Curation.thresholdSweep(d, "score", "label", bins = 10)
      .orderBy("bin").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) === 10L,
        s"confusion cells must sum to n: $r")
    }
    // bin 0 threshold = min: everything predicted positive
    assert(rows(0).getLong(2) === 5L && rows(0).getLong(3) === 5L)
    assert(rows(0).getDouble(6) === 1.0 && rows(0).getDouble(7) === 1.0)
    // rates never increase as the threshold rises
    val tprs = rows.map(_.getDouble(6)).toSeq
    val fprs = rows.map(_.getDouble(7)).toSeq
    assert(tprs.zip(tprs.tail).forall { case (a, b) => b <= a }, s"tpr $tprs")
    assert(fprs.zip(fprs.tail).forall { case (a, b) => b <= a }, s"fpr $fprs")
    // the max score lands in the top bin (clamp law): top bin keeps tp >= 1
    assert(rows(9).getLong(2) >= 1L)
  }

  test("thresholdSweep: constant score collapses to the top bin") {
    val s = spark
    import s.implicits._
    val d = Seq((3.0, true), (3.0, false), (3.0, true)).toDF("score", "label")
    val rows = Curation.thresholdSweep(d, "score", "label", bins = 4)
      .orderBy("bin").collect()
    // all rows in bin 3; every threshold row still conserves n
    rows.foreach(r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5) === 3L))
    assert(rows(3).getLong(2) === 2L && rows(3).getLong(3) === 1L)
  }
}
