package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the fixed-point logistic-regression quality classifier. */
class QualityLrSpec extends SparkSpec {

  private def featRows(rows: (Long, Long, Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "x1", "x2", "x3", "y")
      .select(col("doc_id"), lit(1L).as("x0"), col("x1"), col("x2"),
        col("x3"), col("y"))
  }

  test("separable data: training learns the margin exactly") {
    // y = 1 iff the deviation feature is zero — linearly separable with a
    // small bias (the fixed 1/1024 step reaches it within the round budget)
    val feat = featRows(
      (1L to 10L).map(i => (i, 0L, 0L, 0L, 1L)) ++
        (11L to 20L).map(i => (i, 40L + (i % 5) * 5, 0L, 0L, 0L)): _*)
    val out = QualityLr.score(feat, QualityLr.train(feat, rounds = 24))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("y"), r.getAs[Boolean]("pred"))).toMap
    assert(out.forall { case (_, (y, pred)) => (y == 1L) == pred },
      s"misclassified: ${out.filter { case (_, (y, p)) => (y == 1L) != p }}")
  }

  test("integer gradients are order-free: repartition cannot change the model") {
    val feat = featRows(
      (1L to 30L).map(i => (i, i % 7, i % 3, (i * 13) % 50,
        if (i % 7 < 3) 1L else 0L)): _*)
    def run(f: org.apache.spark.sql.DataFrame) =
      QualityLr.train(f, rounds = 8).collect().head.toSeq
    assert(run(feat) === run(feat.repartition(7)))
  }

  test("scores are the clamped hard sigmoid of z, pred is strict majority") {
    val feat = featRows((1L, 1L, 0L, 0L, 1L))
    val w = featRows((1L, 1L, 0L, 0L, 1L)).sparkSession.range(1)
      .select(lit(100000L).as("w0"), lit(0L).as("w1"), lit(0L).as("w2"),
        lit(0L).as("w3"), lit(1L).as("n"))
    val r = QualityLr.score(feat, w).collect().head
    assert(r.getAs[Long]("z") === 100000L)
    // floor(100000/4) + 32768 = 57768 < 65536 -> unclamped
    assert(r.getAs[Long]("p") === 57768L)
    assert(r.getAs[Boolean]("pred"))
    val w2 = w.select(lit(-400000L).as("w0"), col("w1"), col("w2"), col("w3"), col("n"))
    val r2 = QualityLr.score(feat, w2).collect().head
    assert(r2.getAs[Long]("p") === 0L) // clamped at 0
    assert(!r2.getAs[Boolean]("pred"))
  }

  test("features: deviation coding and the gate label") {
    val s = spark
    import s.implicits._
    // 55 distinct 4-char tokens + 'the a' -> x1 = |55-55| = 0
    val txt = (1 to 53).map(i => f"w$i%03d").mkString(" ") + " the a"
    val d = Seq((7L, txt)).toDF("doc_id", "text")
    val f = QualityLr.features(d, "doc_id", "text").collect().head
    assert(f.getAs[Long]("x1") === 0L)   // |55 - 55|
    assert(f.getAs[Long]("x2") === 2L)   // 'the', 'a'
    // tot_len = 53*4 + 3 + 1 = 216; |2*216 - 11*55| = |432 - 605| = 173
    assert(f.getAs[Long]("x3") === 173L)
    assert(f.getAs[Long]("y") === 1L)    // in-band, stopworded, repeat-free
  }
}
