package graft.curation

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the round-8 curation verbs: domainCap (heap ≡ window),
  * domainDivergence (identical distributions → exactly 0), weightedSample
  * (determinism + weight monotonicity), ngramNovelty (copy scores 0). */
class CurationNewSpec extends SparkSpec {

  private def docs(rows: (Long, String, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  test("domainCap ≡ the per-domain row_number over the same md5 order") {
    val d = docs((1L to 40L).map(i =>
      (i, s"dom${i % 3}", s"text $i")): _*)
    val got = Curation.domainCap(d, "doc_id", "source", cap = 5)
      .orderBy("domain", "rk").collect().toSeq
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("source")).orderBy(h.asc, col("doc_id").asc)
    val want = d.select(col("source").as("domain"), col("doc_id"),
      row_number().over(w).cast("long").as("rk"))
      .filter(col("rk") <= 5)
      .orderBy("domain", "rk").collect().toSeq
    assert(got === want)
  }

  test("domainCap keeps every row of an under-cap domain") {
    val d = docs((1L to 4L).map(i => (i, "only", "t")): _*)
    assert(Curation.domainCap(d, "doc_id", "source", cap = 10).count() === 4L)
  }

  test("domainDivergence is exactly 0 for identical distributions") {
    // two domains with the SAME text multiset: each domain's bucket
    // distribution equals the corpus margin, and lg(2x) = lg(x) + 1 holds
    // exactly in piecewise-linear log2, so every contribution cancels
    val d = docs(
      (1L, "a", "alpha beta gamma delta"), (2L, "a", "epsilon zeta eta"),
      (3L, "b", "alpha beta gamma delta"), (4L, "b", "epsilon zeta eta"))
    val kl = Curation.domainDivergence(d, "text", "source", buckets = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("a") === 0.0 && kl("b") === 0.0, s"got $kl")
  }

  test("domainDivergence flags the divergent domain") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, "normal", common), (2L, "normal", common), (3L, "normal", common),
      (4L, "spam", "buy buy buy buy buy buy buy buy buy buy buy buy"))
    val kl = Curation.domainDivergence(d, "text", "source", buckets = 16)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(kl("spam") > kl("normal"),
      s"the templated domain must diverge more: $kl")
  }

  test("weightedSample: deterministic, size-capped, weight-monotone key") {
    val d = docs((1L to 50L).map(i => (i, "s", "t" * i.toInt)): _*)
      .withColumn("n_chars", length(col("text")).cast("long"))
    val a = Curation.weightedSample(d, "doc_id", "n_chars", n = 10)
      .collect().toSeq
    val b = Curation.weightedSample(d.repartition(7), "doc_id", "n_chars", n = 10)
      .collect().toSeq
    assert(a === b && a.size === 10)
    // same doc id (same u) with a larger weight can only move UP: key =
    // negative/w is increasing in w
    val keyed = Curation.weightedSample(d, "doc_id", "n_chars", n = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val dBoost = d.withColumn("n_chars", col("n_chars") * 2)
    val boosted = Curation.weightedSample(dBoost, "doc_id", "n_chars", n = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    keyed.foreach { case (id, k) =>
      assert(boosted(id) >= k, s"doubling weight must not lower key for $id")
    }
  }

  test("ngramNovelty: a verbatim copy is 0-novel, fresh text is 1-novel") {
    val d = docs(
      (1L, "s", "one two three four five"),
      (2L, "s", "one two three four five"), // exact copy, higher id
      (3L, "s", "six seven eight nine ten"))
    val m = graft.dedup.Dedup.ngramNovelty(d, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m(1L) === ((3L, 3L, 1.0)), s"original owns all firsts: $m")
    assert(m(2L) === ((3L, 0L, 0.0)), s"copy owns none: $m")
    assert(m(3L) === ((3L, 3L, 1.0)))
  }

  test("ngramNovelty drops docs shorter than n tokens") {
    val d = docs((1L, "s", "too short"), (2L, "s", "just long enough here"))
    val ids = graft.dedup.Dedup.ngramNovelty(d, "doc_id", "text", n = 3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L))
  }
}
