package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for PQ-ADC (q118 hash-proves the exact replay at stride 40). */
class PqSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  // 8-dim corpus, m=2 subspaces of 4 dims
  private lazy val corpus = vecs(
    0L -> Seq(1f, 0f, 0f, 0f, 0f, 1f, 0f, 0f),
    1L -> Seq(1f, 0.1f, 0f, 0f, 0f, 1f, 0.1f, 0f),
    2L -> Seq(0f, 0f, 1f, 0f, 1f, 0f, 0f, 0f),
    3L -> Seq(0f, 0f, 1f, 0.1f, 1f, 0f, 0f, 0.1f),
    4L -> Seq(0.5f, 0.5f, 0f, 0f, 0f, 0f, 1f, 1f),
    5L -> Seq(0.5f, 0.4f, 0f, 0f, 0f, 0f, 1f, 0.9f))

  test("stride=1 degenerates to exact squared-L2 search") {
    // with the whole corpus as codebook every candidate encodes to itself
    // (zero sub-distance), so ADC = true L2² — compare against a direct
    // brute-force computation
    val q = corpus.filter(col("vec_id") === 0L)
    val got = Similarity.pqAdcKnn(q, corpus, "vec_id", "embedding",
      k = 5, m = 2, stride = 1)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val exact = corpus.filter(col("vec_id") =!= 0L)
      .crossJoin(q.select(col("embedding").as("qv")))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("qv"),
          (a, b) => (a.cast("double") - b.cast("double")) *
            (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, d) => acc + d).as("d2"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(p => (p._2, p._1))
    assert(got.toSeq === exact.toSeq)
  }

  test("coarse codebook still ranks the planted near-twin first") {
    // stride 2 -> codebook {0, 2, 4}; query 1 is a near-twin of 0 and must
    // retrieve it at rank 1 even through 2-subspace quantization
    val q = corpus.filter(col("vec_id") === 1L)
    val top = Similarity.pqAdcKnn(q, corpus, "vec_id", "embedding",
      k = 1, m = 2, stride = 2).collect()(0)
    assert(top.getLong(1) === 0L, s"expected near-twin 0 at rank 1, got $top")
  }

  test("deterministic under repartitioning") {
    val q = corpus.filter(col("vec_id") % 2 === 0)
    val a = Similarity.pqAdcKnn(q, corpus, "vec_id", "embedding",
      k = 3, m = 2, stride = 2).orderBy("q_id", "rnk").collect().toSeq
    val b = Similarity.pqAdcKnn(q.repartition(3), corpus.repartition(5),
      "vec_id", "embedding", k = 3, m = 2, stride = 2)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(a === b)
  }
}
