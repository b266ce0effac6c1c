package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom membership laws: no false negatives ever; a saturated filter
  * answers true for everything; tiny filters do produce false positives. */
class BloomSpec extends SparkSpec {

  private def verdicts(corpus: Seq[String], probes: Seq[String],
      bits: Int): Map[String, (Boolean, Boolean)] = {
    val s = spark
    import s.implicits._
    Sketch.bloomMembership(corpus.toDF("t"), "t", probes.toDF("t"), "t",
        bits = bits, hashes = 3)
      .collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2)))
      .toMap
  }

  test("no false negatives: every present probe is a member") {
    val corpus = (1 to 200).map(i => s"tok$i")
    val got = verdicts(corpus, corpus.take(50) ++ Seq("absent1", "absent2"), 512)
    got.foreach { case (t, (present, member)) =>
      assert(!present || member, s"false negative on $t")
    }
    assert(got("tok1") === ((true, true)))
  }

  test("8-bit filter saturates: absent probes become false positives") {
    val corpus = (1 to 100).map(i => s"tok$i")
    val got = verdicts(corpus, Seq("definitely-not-in-corpus"), 8)
    assert(got("definitely-not-in-corpus") === ((false, true)))
  }

  test("empty-intersection probes on a roomy filter mostly miss") {
    val got = verdicts((1 to 5).map(i => s"tok$i"),
      (1 to 40).map(i => s"other$i"), 4096)
    // 15 set bits of 4096: P(false positive) ~ (15/4096)^3 per probe
    val fps = got.count { case (_, (p, m)) => !p && m }
    assert(fps === 0, s"expected no false positives at this density, got $fps")
  }
}
