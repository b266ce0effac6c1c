package graft.sim

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Laws for MMR diverse re-ranking. */
class MmrSpec extends SparkSpec {

  private def vecs(rows: (Long, Seq[Float])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("lambda = 1 degenerates to relevance-only top-k (== cosineKnn)") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val qs = emb.filter(col("vec_id") % 50 === 0)
    val mmr = Similarity.mmrTopK(qs, emb, "vec_id", "embedding", k = 5, lambda = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val knn = Similarity.cosineKnn(qs, emb, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    assert(mmr === knn)
  }

  test("diversity: an exact duplicate of the top hit is deferred") {
    val d = vecs(
      0L -> Seq(1f, 0f, 0f),      // query
      1L -> Seq(0.9f, 0.1f, 0f),  // best hit
      2L -> Seq(0.9f, 0.1f, 0f),  // its exact duplicate
      3L -> Seq(0.7f, -0.7f, 0f)) // diverse alternative (anti-correlated)
    val out = Similarity.mmrTopK(d.filter(col("vec_id") === 0), d,
      "vec_id", "embedding", k = 2, lambda = 0.5)
      .orderBy("round").collect().map(_.getLong(2)).toSeq
    // relevance-only would take (1, 2); MMR takes the diverse 3 second
    assert(out === Seq(1L, 3L))
  }

  test("per query: k distinct picks, rounds dense 1..k") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.mmrTopK(emb.filter(col("vec_id") % 50 === 0), emb,
      "vec_id", "embedding", k = 4).collect()
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.toSeq === (1L to 4L))
      assert(rs.map(_.getLong(2)).distinct.length === 4)
    }
  }
}
