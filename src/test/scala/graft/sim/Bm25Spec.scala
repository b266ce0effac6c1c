package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the BM25 retrieval operator. */
class Bm25Spec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("matching more query terms beats matching fewer (equal lengths)") {
    val d = docs(
      1L -> "spark join spark join",
      2L -> "spark table table row",
      3L -> "row table value part")
    val out = Bm25.bm25TopK(d, "doc_id", "text",
      Seq(1L -> Seq("spark", "join")), k = 10).collect()
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(byDoc.keySet === Set(1L, 2L))       // doc 3 matches nothing
    assert(byDoc(1L) > byDoc(2L))
    val rk = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk"))).toMap
    assert(rk(1L) === 1L && rk(2L) === 2L)
  }

  test("length normalization: same tf in a shorter doc scores higher") {
    val d = docs(
      1L -> "spark row",
      2L -> "spark row row row row row row row")
    val out = Bm25.bm25TopK(d, "doc_id", "text", Seq(1L -> Seq("spark")), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(out(1L) > out(2L))
  }

  test("idf: the rarer term dominates a common term at equal tf") {
    // "table" in every doc, "spark" only in one; doc 1 has both once
    val d = docs(
      1L -> "spark table aa bb",
      2L -> "table cc dd ee",
      3L -> "table ff gg hh")
    val out = Bm25.bm25TopK(d, "doc_id", "text",
      Seq(1L -> Seq("spark"), 2L -> Seq("table")), k = 10).collect()
    val score = out.map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) -> r.getAs[Double]("score")).toMap
    assert(score((1L, 1L)) > score((2L, 1L))) // rare term contributes more bits
  }

  test("rank contract: rk dense 1..n, scores non-increasing, id tiebreak") {
    val d = docs((1L to 20L).map(i => i -> "spark value"): _*)
    val out = Bm25.bm25TopK(d, "doc_id", "text", Seq(9L -> Seq("spark")), k = 5)
      .orderBy("rk").collect()
    assert(out.map(_.getAs[Long]("rk")).toSeq === (1L to 5L))
    val scores = out.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // all docs tie exactly (identical text) -> ascending doc_id wins
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === (1L to 5L))
    assert(out.forall(_.getAs[Long]("n_terms") === 1L))
  }
}
