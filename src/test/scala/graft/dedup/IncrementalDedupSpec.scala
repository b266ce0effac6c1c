package graft.dedup

import graft.SparkSpec
import graft.ops.Reconcile
import org.apache.spark.sql.functions._

/** Laws for incremental delta-vs-corpus dedup (q139) and FK audits (q138). */
class IncrementalDedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("delta near-dups of corpus docs are found; corpus-internal pairs are not") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = docs(1L -> base, 2L -> base) // internal exact dup pair
    val delta = docs(10L -> (base + " extra"), 11L -> "totally different text here ok")
    val out = Dedup.incrementalNearDup(corpus, delta, "doc_id", "text",
      n = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((10L, 1L), (10L, 2L))) // 11 is novel; (1,2) never emitted
  }

  test("incremental result equals the delta-slice of the full-pair run") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
    val delta = d.filter(col("doc_id") % 10 === 0)
    val inc = Dedup.incrementalNearDup(corpus, delta, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.jaccardPairs(d, "doc_id", "text", 3, 0.5)
      .collect().flatMap { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        // keep only cross pairs, oriented delta -> corpus
        if (a % 10 == 0 && b % 10 != 0) Some((a, b))
        else if (b % 10 == 0 && a % 10 != 0) Some((b, a))
        else None
      }.toSet
    assert(inc === full)
  }

  test("fkOrphans: planted orphans and NULL fks are counted") {
    val s = spark
    import s.implicits._
    val child = Seq((1L, Option(10L)), (2L, Option(20L)), (3L, Option(99L)),
      (4L, None)).map { case (i, f) => (i, f.map(Long.box).orNull) }
      .toDF("id", "fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = Reconcile.fkOrphans(Seq(("child->parent", child, "fk", parent, "pk")))
      .collect().head
    assert(out.getString(0) === "child->parent")
    assert(out.getLong(1) === 4L)
    assert(out.getLong(2) === 2L) // 99 dangling + NULL fk
  }
}
