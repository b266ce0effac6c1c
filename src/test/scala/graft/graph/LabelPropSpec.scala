package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for synchronous clamped-seed label propagation. */
class LabelPropSpec extends SparkSpec {

  private def nodes(rows: (Long, Option[Long])*) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "seed")
  }
  private def edges(rows: (Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("a_id", "b_id")
  }

  test("planted communities: one seed each relabels its whole component") {
    // two triangles bridged by nothing; seed one node per triangle
    val n = nodes(1L -> Some(10L), 2L -> None, 3L -> None,
      4L -> Some(20L), 5L -> None, 6L -> None)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 1L, 4L -> 5L, 5L -> 6L, 6L -> 4L)
    val out = Graph.labelPropagation(n, e, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("label")).toMap
    assert(Seq(1L, 2L, 3L).forall(out(_) === 10L))
    assert(Seq(4L, 5L, 6L).forall(out(_) === 20L))
  }

  test("seeds are clamped even when outvoted") {
    // node 1 seeded 10 but surrounded by three seeds of 20
    val n = nodes(1L -> Some(10L), 2L -> Some(20L), 3L -> Some(20L), 4L -> Some(20L))
    val e = edges(1L -> 2L, 1L -> 3L, 1L -> 4L)
    val out = Graph.labelPropagation(n, e, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("label")).toMap
    assert(out(1L) === 10L)
  }

  test("majority wins; exact vote ties resolve to the smaller label") {
    val n = nodes(1L -> Some(7L), 2L -> Some(3L), 3L -> None)
    val e = edges(1L -> 3L, 2L -> 3L)
    val out = Graph.labelPropagation(n, e, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("label")).toMap
    assert(out(3L) === 3L) // 1 vote each -> smaller label
  }

  test("synchronous rounds: label needs d rounds to travel distance d") {
    val n = nodes(1L -> Some(5L), 2L -> None, 3L -> None, 4L -> None)
    val e = edges(1L -> 2L, 2L -> 3L, 3L -> 4L)
    val after2 = Graph.labelPropagation(n, e, rounds = 2).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(after2(3L) === Some(5L))
    assert(after2(4L) === None) // distance 3 unreached in 2 rounds
    val after3 = Graph.labelPropagation(n, e, rounds = 3).collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(after3(4L) === Some(5L))
  }
}
