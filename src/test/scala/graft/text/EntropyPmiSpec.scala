package graft.text

import graft.SparkSpec
import graft.curation.Curation
import graft.ops.Fingerprint
import org.apache.spark.sql.functions._

/** Laws for char entropy (q128), PMI collocations (q129) and dataset
  * fingerprints (q130). */
class EntropyPmiSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("s").as("source"))
  }

  test("entropy: constant text is 0 bits, balanced two-symbol is exactly 1") {
    val out = TextOps.charEntropy(docs(1L -> "aaaaaaaa", 2L -> "abababab"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === 0.0)
    assert(out(2L) === 1.0) // powers of two are exact under piecewise lg
  }

  test("entropy is invariant under character permutation") {
    val out = TextOps.charEntropy(docs(1L -> "aabbccdd", 2L -> "abcdabcd"),
      "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) === out(2L))
  }

  test("PMI: an exclusive pair scores above an independent pair") {
    // 'nw ye' adjacent in every doc; 'aa bb' adjacent in only 4 of 16
    // though both tokens are equally frequent -> strictly lower PMI
    val rows = (1L to 4L).map(i => i -> "nw ye aa bb pp") ++
      (5L to 16L).map(i => i -> "nw ye aa pp bb")
    val out = Curation.pmiCollocations(docs(rows: _*), "text",
      minCount = 4L, k = 50).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("pmi_bits")).toMap
    assert(out(("nw", "ye")) > out(("aa", "bb")))
    assert(!out.contains(("zz", "zz")))
  }

  test("fingerprint: removing a row XORs its digest out; '*' folds sources") {
    val d3 = docs(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
    def fpMap(df: org.apache.spark.sql.DataFrame) =
      Fingerprint.datasetFingerprint(df, "doc_id", "text", "source")
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val full = fpMap(d3)
    val minus = fpMap(d3.filter(col("doc_id") =!= 3L))
    val digest3 = fpMap(docs(3L -> "gamma"))
    assert((full("*") ^ minus("*")) === digest3("*"))
    // multi-source: total row equals XOR of the per-source fingerprints
    val s = spark
    import s.implicits._
    val multi = Seq((1L, "x", "a"), (2L, "y", "a"), (3L, "z", "b"))
      .toDF("doc_id", "text", "source")
    val m = fpMap(multi)
    assert(m("*") === (m("a") ^ m("b")))
  }

  test("fingerprint is repartition-invariant (order-free XOR)") {
    val d = docs((1L to 50L).map(i => i -> s"text number $i"): _*)
    def run(df: org.apache.spark.sql.DataFrame) =
      Fingerprint.datasetFingerprint(df, "doc_id", "text", "source")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(d) === run(d.repartition(13)))
  }
}
