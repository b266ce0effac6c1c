package graft.sim

import graft.{SparkSpec, Tables}

/** Laws for greedy k-center (farthest-point) coreset selection. */
class KCenterSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("farthest-point traversal picks the known sequence on a line") {
    // points at x = 0, 1, 10, 4 (padded to 4 dims)
    val d = vecs(
      0L -> Seq(0f, 0f, 0f, 0f),
      1L -> Seq(1f, 0f, 0f, 0f),
      2L -> Seq(10f, 0f, 0f, 0f),
      3L -> Seq(4f, 0f, 0f, 0f))
    val out = Similarity.kCenterCoreset(d, "vec_id", "embedding", k = 3, dims = 4)
      .orderBy("round").collect()
    // seed = id 0; farthest from {0} is x=10 (id 2, d2=100);
    // then x=4 (min(16, 36) = 16) beats x=1 (min(1, 81) = 1)
    assert(out.map(_.getLong(1)).toSeq === Seq(0L, 2L, 3L))
    assert(out.map(_.getDouble(2)).toSeq === Seq(0.0, 100.0, 16.0))
  }

  test("exact ties break on ascending id") {
    val d = vecs(
      5L -> Seq(0f, 0f), 7L -> Seq(3f, 4f), 6L -> Seq(-3f, -4f))
    val out = Similarity.kCenterCoreset(d, "vec_id", "embedding", k = 2, dims = 2)
      .orderBy("round").collect()
    // both id 6 and 7 are at d2 = 25 from the seed -> id 6 wins
    assert(out.map(_.getLong(1)).toSeq === Seq(5L, 6L))
  }

  test("selection distances are non-increasing and centers distinct on real data") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.kCenterCoreset(emb, "vec_id", "embedding", k = 6)
      .orderBy("round").collect()
    val ds = out.map(_.getDouble(2)).drop(1) // seed's 0.0 excluded
    assert(ds.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)),
      s"covering radii must shrink: ${ds.toSeq}")
    assert(out.map(_.getLong(1)).distinct.length === 6)
  }
}
