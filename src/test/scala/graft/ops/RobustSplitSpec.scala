package graft.ops

import graft.{SparkSpec, Tables}
import graft.curation.Curation
import graft.sketch.Sketch
import org.apache.spark.sql.functions._

/** Laws for group-integrity splits (q133), robust MAD outliers (q134) and
  * HLL vocabulary sketches (q135). */
class RobustSplitSpec extends SparkSpec {

  test("group split: every domain lands in exactly one split, cuts ~80/10/10") {
    val s = spark
    import s.implicits._
    val docs = (1L to 4000L).map(i => (i, s"dom${i % 400}")).toDF("doc_id", "source")
    val out = Curation.groupSplit(docs, "doc_id", "source")
    val perDomain = out.groupBy("domain")
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perDomain.forall(_.getLong(1) === 1L), "a domain spans splits")
    val frac = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1) / 4000.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9, frac.toString)
    assert(frac("val") > 0.03 && frac("test") > 0.03)
  }

  test("robust z: a planted spike is flagged, the bulk is not; MAD=0 -> NULL") {
    val s = spark
    import s.implicits._
    val rows = (1L to 20L).map(i => (i, "g", 100L + (i % 3))) :+ ((99L, "g", 100000L)) :+
      ((50L, "const", 7L)) :+ ((51L, "const", 7L))
    val out = Profile.robustOutliers(rows.toDF("doc_id", "source", "n_chars"),
      "doc_id", "source", "n_chars").collect()
      .map(r => r.getLong(0) -> Option(r.get(6)).map(_.asInstanceOf[Boolean])).toMap
    assert(out(99L) === Some(true))
    assert((1L to 20L).forall(i => out(i) === Some(false)))
    assert(out(50L) === None) // MAD = 0: undefined, not false
  }

  test("HLL vocabulary: per-source + union row all within tolerance on real data") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Sketch.hllVocabulary(docs, "text", "source").collect()
    assert(out.exists(_.getString(0) == "*"))
    assert(out.forall(_.getBoolean(2)),
      out.filterNot(_.getBoolean(2)).mkString(","))
  }
}
