package graft.text

import graft.SparkSpec

/** Laws for the deflate compression-ratio quality signal. */
class CompressionSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetition compresses far below varied text; ratios in (0, ~1]") {
    val rep = "spam ham " * 200
    val varied = (1 to 400).map(i => (i * 2654435761L % 99991).toString).mkString(" ")
    val out = TextOps.compressionRatio(
      docs(1L -> rep, 2L -> varied), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) < 0.1, s"repetitive text should crush: ${out(1L)}")
    assert(out(2L) > 3 * out(1L))
    assert(out.values.forall(r => r > 0.0 && r < 1.2))
  }

  test("deterministic across runs and partitionings; empty text well-shaped") {
    val d = docs((1L to 30L).map(i => i -> s"doc $i content ${i * i}") :+ (99L -> ""): _*)
    def run(df: org.apache.spark.sql.DataFrame) =
      TextOps.compressionRatio(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(d) === run(d.repartition(7)))
    val empty = run(d).find(_._1 == 99L).get
    assert(empty._2 === 0L)
  }
}
