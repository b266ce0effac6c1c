package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the hashing-trick featurizer (q154/q155) and the catalog's
  * newest composition points. */
class HashedTfSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("vector sums to the token count; same text -> identical vectors") {
    val d = docs(1L -> "a b c a b a", 2L -> "a b c a b a", 3L -> "z z")
    val out = TextOps.hashedTfVectors(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("vector")).toMap
    assert(out(1L).sum === 6f)
    assert(out(3L).sum === 2f)
    assert(out(1L) === out(2L))
    assert(out.values.forall(_.length === 64))
  }

  test("cosine over hashed vectors: identical docs hit cosine 1 first") {
    val d = docs(
      100L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma delta",   // exact dup of the query doc
      2L -> "omega psi chi phi")
    val out = graft.sim.Similarity.cosineKnn(
      TextOps.hashedTfVectors(d, "doc_id", "text").filter(col("doc_id") === 100),
      TextOps.hashedTfVectors(d, "doc_id", "text"), "doc_id", "vector", 2)
      .orderBy("rnk").collect()
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getDouble(3) === 1.0) // integer dots: exactly 1.0
  }

  test("hashing is stateless: vectors are independent of corpus membership") {
    val alone = TextOps.hashedTfVectors(docs(7L -> "q w e r t"), "doc_id", "text")
      .collect().head.getAs[scala.collection.Seq[Float]]("vector")
    val together = TextOps.hashedTfVectors(
      docs(7L -> "q w e r t", 8L -> "other words entirely"), "doc_id", "text")
      .filter(col("doc_id") === 7).collect().head
      .getAs[scala.collection.Seq[Float]]("vector")
    assert(alone === together) // no fit step, no vocabulary coupling
  }
}
