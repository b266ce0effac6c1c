package graft.curation

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Curation operator contracts: reproducible sampling, exact vocabulary
  * counts, and the per-shard packing invariants. */
class CurationSpec extends SparkSpec {

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("stratifiedSample: deterministic, rate-accurate, narrow (no shuffle)") {
    val fractions = Map("en" -> 0.5, "de" -> 0.2)
    def run() = Curation.stratifiedSample(docs, "lang", "doc_id", fractions, 0.1)
    val a = run().collect().map(_.getAs[Long]("doc_id")).toSet
    val b = run().collect().map(_.getAs[Long]("doc_id")).toSet
    assert(a === b, "same input must sample identically across runs")
    // rates: binomial(n, p) within generous tolerance per stratum
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, n) =>
      val p = fractions.getOrElse(lang, 0.1)
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      assert(math.abs(rate - p) < 0.12, s"$lang: kept rate $rate vs target $p (n=$n)")
    }
    // a pure filter: zero exchanges in the plan
    assert(!run().queryExecution.executedPlan.toString.contains("Exchange"))
    // FP-hostile fractions survive: 0.57*100 is 56.999... in IEEE double —
    // an int truncation would sample at 56% — and a small default rate
    // (3%) must keep its strata populated rather than flooring toward zero
    val fp = Curation.stratifiedSample(docs, "lang", "doc_id",
      Map("en" -> 0.57), defaultFraction = 0.03)
    val fpKept = fp.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val en = byLang("en").toDouble
    assert(math.abs(fpKept("en") / en - 0.57) < 0.12)
    assert(fpKept.exists { case (l, n) => l != "en" && n > 0 },
      "small stratum rate must not floor to zero")
  }

  test("tokenFrequency: exact counts and deterministic top-k tiebreak") {
    val s = spark
    import s.implicits._
    val d = Seq("b a a", "c b a", "c b").toDF("text")
    val out = Curation.tokenFrequency(d, "text", k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // a and b both occur 3 times; token asc breaks the tie
    assert(out.toSeq === Seq(("a", 3L), ("b", 3L)))
  }

  test("contaminationFlags: n-gram overlap with the benchmark flags docs, short docs clean") {
    val s = spark
    import s.implicits._
    val shared = (1 to 8).map(i => s"b$i").mkString(" ") // the leaked 8-gram
    val corpus = Seq(
      1L -> s"intro words $shared and a tail",             // contains the benchmark 8-gram
      2L -> (1 to 20).map(i => s"c$i").mkString(" "),      // clean
      3L -> "too short to shingle"                          // < 8 tokens -> clean
    ).toDF("doc_id", "text")
    val benchmark = Seq(10L -> s"$shared plus benchmark framing").toDF("doc_id", "text")
    val flags = Curation.contaminationFlags(corpus, benchmark, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags === Map(1L -> true, 2L -> false, 3L -> false))
  }

  test("contaminationScores: ratio semantics, consistent with the boolean flags") {
    val s = spark
    import s.implicits._
    val shared = (1 to 8).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      1L -> s"$shared tail words here",                 // some shingles hit
      2L -> (1 to 20).map(i => s"c$i").mkString(" "),   // clean
      3L -> "too short"                                  // no shingles
    ).toDF("doc_id", "text")
    val benchmark = Seq(10L -> s"$shared framing words").toDF("doc_id", "text")
    val scores = Curation.contaminationScores(corpus, benchmark, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(scores(1L)._1 > 0 && scores(1L)._2 > 0 && scores(1L)._3 > 0.0)
    assert(scores(1L)._3 <= 1.0)
    assert(scores(2L)._2 === 0L && scores(2L)._3 === 0.0)
    assert(scores(3L) === ((0L, 0L, 0.0)))
    // law vs the boolean operator: overlap > 0 <=> contaminated
    val flags = Curation.contaminationFlags(corpus, benchmark, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    scores.foreach { case (id, (_, _, ov)) => assert((ov > 0.0) === flags(id)) }
    // fixture corpus: every hit count is bounded by the doc's shingle count
    val docs0 = docs
    val fs = Curation.contaminationScores(docs0,
      docs0.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 8).collect()
    assert(fs.length === docs0.count())
    fs.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("curateCorpus: composed pipeline laws (quality, dedup, decontamination, subset)") {
    import graft.dedup.Dedup
    import graft.text.TextOps
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val out = Curation.curateCorpus(docs, bench, "doc_id", "text", "lang",
      Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
    val outIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val inIds = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outIds.nonEmpty, "curation emptied the corpus")
    assert(outIds.subsetOf(inIds))
    assert(outIds.size < inIds.size, "nothing was curated away")
    // every survivor clears the quality gate
    assert(out.filter(TextOps.qualityScoreOf(col("text")) < 0.5).count() === 0L)
    // no surviving pair at or above the near-dup threshold (implies exact
    // dups are gone too: identical texts have Jaccard 1.0)
    assert(Dedup.jaccardPairs(out, "doc_id", "text").count() === 0L)
    // nothing contaminated by the benchmark survives
    assert(Curation.contaminationFlags(out, bench, "doc_id", "text", n = 8)
      .filter(col("contaminated")).count() === 0L)
    // deterministic end to end
    val again = Curation.curateCorpus(docs, bench, "doc_id", "text", "lang",
      Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === outIds)
  }

  test("packSequences: per-doc assignment, contiguous bins, overflow-by-last-doc only") {
    val s = spark
    import s.implicits._
    // shard 0 (ids 0-2): 300+300+300 tokens at budget 512 -> bins [0,0,1]
    // (doc 1 straddles the 512 line: its prior is 300 < 512, so it joins
    // bin 0, overflowing it to 600 — the documented last-doc overflow)
    // shard 1 (ids 100-101): 600+1 -> bins [0,1] (oversized doc owns bin 0)
    def text(n: Int) = (1 to n).map(_ => "w").mkString(" ")
    val d = Seq(
      0L -> text(300), 1L -> text(300), 2L -> text(300),
      100L -> text(600), 101L -> text(1)
    ).toDF("doc_id", "text")
    val assign = Curation.packSequences(d, "doc_id", "text", budgetTokens = 512L,
      shardSize = 100L)
    val byDoc = assign.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byDoc === Map(
      0L -> (0L, 0L, 300L), 1L -> (0L, 0L, 300L), 2L -> (0L, 1L, 300L),
      100L -> (1L, 0L, 600L), 101L -> (1L, 1L, 1L)))
    // the audit view aggregates the mapping exactly
    val stats = Curation.packStats(assign).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(stats === Map(
      (0L, 0L) -> (2L, 600L), (0L, 1L) -> (1L, 300L),
      (1L, 0L) -> (1L, 600L), (1L, 1L) -> (1L, 1L)))
    // invariants on the real corpus: every doc assigned exactly once, token
    // totals preserved, and each bin's pre-overflow mass is under budget
    // (total minus its last doc < budget — the overflow-by-one-doc bound)
    val packed = Curation.packSequences(docs, "doc_id", "text", 512L, 100L)
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    val agg = Curation.packStats(packed).agg(sum("n_docs"), sum("n_tokens")).head()
    val src = docs.select(size(graft.text.TextOps.tokens(col("text")))
      .cast("long").as("t")).agg(count(lit(1)), sum("t")).head()
    assert(agg.getLong(0) === src.getLong(0))
    assert(agg.getLong(1) === src.getLong(1))
    val overflowViolations = packed
      .withColumn("last_id", max("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("shard", "bin_in_shard")))
      .groupBy("shard", "bin_in_shard")
      .agg(sum(when(col("doc_id") =!= col("last_id"), col("n_tokens"))
        .otherwise(lit(0L))).as("pre_overflow"))
      .filter(col("pre_overflow") >= 512L)
      .count()
    assert(overflowViolations === 0L, "a bin exceeded budget before its last doc")
  }

  test("assignSplits: total, exclusive, deterministic, rate-accurate, narrow") {
    val out = Curation.assignSplits(docs, "doc_id")
    // total + exclusive: every doc gets exactly one split
    assert(out.count() === docs.count())
    assert(out.filter(!col("split").isInCollection(Seq("train", "val", "test")))
      .count() === 0L)
    // deterministic: a doc's split is a pure function of its id
    val a = out.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Curation.assignSplits(docs.repartition(7), "doc_id")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b, "split assignment must not depend on partitioning")
    // rates: 90/5/5 within binomial tolerance
    val n = docs.count().toDouble
    val byScheme = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byScheme("train") / n - 0.90) < 0.1)
    assert(byScheme("val") > 0 && byScheme("test") > 0)
    // a pure projection: zero exchanges
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    // band layout: splits partition [0,100) in order — consistent with the
    // stratifiedSample hash, so split and sample decisions are correlated
    // by design (same id hash), never contradictory
    val withPct = docs.select(col("doc_id"),
      Curation.hashPct(col("doc_id")).as("pct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.foreach { case (id, split) =>
      val pct = withPct(id)
      val expect = if (pct < 90) "train" else if (pct < 95) "val" else "test"
      assert(split === expect, s"doc $id pct $pct")
    }
    // malformed fractions rejected
    intercept[IllegalArgumentException] {
      Curation.assignSplits(docs, "doc_id", Seq("train" -> 0.5, "val" -> 0.1))
    }
  }

  test("mixtureWeights: sums to ~1, monotone in counts, partition-order independent") {
    val out = Curation.mixtureWeights(docs, "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.length === docs.select("source").distinct().count().toInt)
    val totalW = out.map(_._3).sum
    assert(math.abs(totalW - 1.0) < 1e-9, s"weights sum to $totalW")
    // √-tempering: weight order follows count order, but ratios are damped
    // (a domain with 4x the docs gets only ~2x the weight)
    val sorted = out.sortBy(_._2)
    sorted.sliding(2).foreach { case Array((_, n1, w1), (_, n2, w2)) =>
      if (n1 < n2) assert(w1 <= w2, s"weight must be monotone in count")
    }
    val (_, nLo, wLo) = sorted.head
    val (_, nHi, wHi) = sorted.last
    if (nHi > nLo) {
      assert(wHi / wLo <= nHi.toDouble / nLo + 1e-9,
        "tempering must damp the count ratio")
    }
    // partition-order independence (the fixed-point denominator): identical
    // weights bit-for-bit under a different partitioning
    val again = Curation.mixtureWeights(docs.repartition(13), "source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(again.toSeq === out.sortBy(_._1).toSeq)
    // scan-once law: the denominator must come from the aggregated domain
    // table (a global window), never a second pass over the corpus
    val plan = Curation.mixtureWeights(docs, "source").queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 1, s"corpus scanned more than once:\n$plan")
  }

  test("ruleGate: per-rule audit semantics, pass is the conjunction, planted failures fire every rule") {
    val s = spark
    import s.implicits._
    def words(n: Int, w: String = "tok") = (1 to n).map(i => s"$w$i").mkString(" ")
    val planted = Seq(
      // passes everything: 30 varied tokens incl. stopwords, low repetition
      1L -> ("the a data " + words(27)),
      2L -> words(5),                                  // too short -> r_len false
      3L -> ("the a " + words(200)),                   // too long -> r_len false
      4L -> ("the a " + (1 to 28).map(_ => "x").mkString(" ")),  // avg token len 1.2 -> r_tok_len false
      5L -> ("the a " + (1 to 28).map(_ => "extraordinarily").mkString(" ")), // avg len ~14 -> r_tok_len false
      6L -> words(30),                                 // zero stopwords -> r_stop false
      7L -> ("the a " + Seq.fill(10)("p q r").mkString(" "))  // repeated 3-gram -> r_rep false
    ).toDF("doc_id", "text")
    val got = Curation.ruleGate(planted, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    assert(got(1L) === ((true, true, true, true, true)))
    assert(!got(2L)._1 && !got(2L)._5)
    assert(!got(3L)._1)
    assert(!got(4L)._2)
    assert(!got(5L)._2)
    assert(!got(6L)._3)
    assert(!got(7L)._4, s"repetition rule must fire: ${got(7L)}")
    // conjunction law on the real corpus + a narrow plan (zero exchanges)
    val corpus = Curation.ruleGate(docs, "doc_id", "text")
    assert(corpus.filter(col("pass") =!=
      (col("r_len") && col("r_tok_len") && col("r_stop") && col("r_rep"))).count() === 0L)
    assert(!corpus.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("rarityScores: exact handcrafted frequencies; every doc covered; mean_tf >= 1") {
    val s = spark
    import s.implicits._
    val d = Seq(1L -> "x x y", 2L -> "y z").toDF("doc_id", "text")
    val got = Curation.rarityScores(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // tf: x=2, y=2, z=1 -> doc1 = (2+2+2)/3, doc2 = (2+1)/2
    assert(got(1L) === ((3L, 6L, 2.0)))
    assert(got(2L) === ((2L, 3L, 1.5)))
    // corpus: total coverage, and every token occurs at least once by
    // definition so no mean can dip under 1
    val full = Curation.rarityScores(docs, "doc_id", "text")
    assert(full.count() === docs.count())
    assert(full.filter(col("mean_tf") < 1.0).count() === 0L)
  }

  test("bpeMerges: handcrafted merge sequence, greedy left-to-right overlap, early stop") {
    val s = spark
    import s.implicits._
    // vocab {abab: 2, ab: 1}: round 1 merges (a,b) with count 2*2+1 = 5;
    // round 2 merges (ab,ab) with count 2; then no pairs remain
    val d = Seq("abab abab ab").toDF("text")
    val got = Curation.bpeMerges(d, "text", nMerges = 5).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1L, "a", "b", "ab", 5L),
      (2L, "ab", "ab", "abab", 2L)), "and training must stop when no pairs remain")
    // greedy overlap semantics: "aaa" merges its FIRST adjacent pair, so
    // round 2 sees (aa, a) — the left-to-right BPE order, not (a, aa)
    val aaa = Curation.bpeMerges(Seq("aaa").toDF("text"), "text", nMerges = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(aaa.toSeq === Seq((1L, "a", "a", 2L), (2L, "aa", "a", 1L)))
    // corpus run: ranks are 1..k, counts non-increasing (a merge can never
    // create a pair more frequent than the one just taken... it can create
    // ties, so non-strict), every merged symbol is left||right
    val corpus = Curation.bpeMerges(docs, "text", nMerges = 8).collect()
    assert(corpus.length === 8)
    assert(corpus.map(_.getLong(0)).toSeq === (1L to 8L))
    corpus.foreach(r => assert(r.getString(3) === r.getString(1) + r.getString(2)))
    corpus.map(_.getLong(4)).sliding(2).foreach {
      case Array(a, b) => assert(a >= b, "merge counts must be non-increasing")
      case _ =>
    }
  }

  test("bpeMerges batching law: batchK=16 equals the batchK=1 sequential loop exactly") {
    val s = spark
    import s.implicits._
    def table(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    // adversarial fixture 1: the second-ranked ORIGINAL pair shares a
    // symbol with the best — naive batching would merge (b,c) before the
    // created (ab,c) that sequential training actually takes next
    val chain = Seq.fill(10)("abc").toDF("text")
    val chainBatched = table(Curation.bpeMerges(chain, "text", 3))
    assert(chainBatched === table(Curation.bpeMerges(chain, "text", 3, batchK = 1)))
    assert(chainBatched.map(m => (m._2, m._3)) === Seq(("a", "b"), ("ab", "c")),
      "sequential order is merge (a,b) then the CREATED pair (ab,c) - never (b,c)")
    // adversarial fixture 2: a created pair ((z,ab), count 10) ties a
    // disjoint original pair ((c,d), count 10) and the strict bound must
    // stop the batch so the lex tiebreak replays sequentially
    val tie = (Seq.fill(10)("zab") ++ Seq.fill(10)("cd")).toDF("text")
    assert(table(Curation.bpeMerges(tie, "text", 4)) ===
      table(Curation.bpeMerges(tie, "text", 4, batchK = 1)))
    // batchable fixture: fully disjoint pairs with no triples — one round
    // takes them all, still equal to sequential
    val flat = (Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++ Seq.fill(8)("ef")).toDF("text")
    assert(table(Curation.bpeMerges(flat, "text", 3)) ===
      table(Curation.bpeMerges(flat, "text", 3, batchK = 1)))
    // the real corpus, the q75 shape (8 merges), plus a deeper run
    val corpus = docs
    assert(table(Curation.bpeMerges(corpus, "text", 8)) ===
      table(Curation.bpeMerges(corpus, "text", 8, batchK = 1)))
    assert(table(Curation.bpeMerges(corpus, "text", 16)) ===
      table(Curation.bpeMerges(corpus, "text", 16, batchK = 1)))
  }

  test("bpeEncode: greedy segmentation by merge rank, edge words, corpus bounds") {
    val s = spark
    import s.implicits._
    val train = Seq("aa aa ab").toDF("text").withColumn("doc_id", lit(1L))
    // training learns exactly [(a,a)] (count 2 beats (a,b) count 1 — and
    // after merging (a,a), no pair reaches count 2)
    val merges = Curation.bpeMerges(train, "text", nMerges = 1)
    val enc = Curation.bpeEncode(train, "text", "doc_id", merges).collect().head
    // "aa"→[aa], "aa"→[aa], "ab"→[a,b] in document order
    assert(enc.getAs[String]("encoded") === "aa aa a b")
    assert(enc.getAs[Long]("n_tokens") === 3L)
    assert(enc.getAs[Long]("n_pieces") === 4L)
    // merge RANK order is the greedy priority: with merges [(a,b),(ab,c)]
    // the word "abc" becomes one piece; with only [(b,c)] it stays "a bc"
    val abc = Seq("abc").toDF("text").withColumn("doc_id", lit(1L))
    val m2 = Curation.bpeMerges(Seq.fill(10)("abc").toDF("text"), "text", 2)
    assert(Curation.bpeEncode(abc, "text", "doc_id", m2)
      .collect().head.getAs[String]("encoded") === "abc")
    // empty merge table = pure character segmentation
    val m0 = merges.filter(lit(false))
    assert(Curation.bpeEncode(abc, "text", "doc_id", m0)
      .collect().head.getAs[String]("encoded") === "a b c")
    // corpus bounds: one piece per token at least, one per character at
    // most; ratio column consistent
    val corpus = Curation.bpeEncode(docs, "text", "doc_id",
      Curation.bpeMerges(docs, "text", 8))
    assert(corpus.filter(col("n_pieces") < col("n_tokens")).count() === 0L)
    assert(corpus.filter(
      col("pieces_per_token") =!=
        col("n_pieces").cast("double") / col("n_tokens").cast("double")).count() === 0L)
  }

  test("bpeMerges batching: measurably fewer Spark jobs than one-merge rounds") {
    // job ids are globally monotone, so the id delta over a body IS its job
    // count (tests run single-threaded; no listener-bus race to wait out)
    def maxJobId(): Int = {
      val ids = spark.sparkContext.statusTracker.getJobIdsForGroup(null)
      if (ids.isEmpty) -1 else ids.max
    }
    def countJobs(body: => Unit): Int = {
      val before = maxJobId(); body; maxJobId() - before
    }
    val s = spark
    import s.implicits._
    // disjoint-pair corpus: the whole merge table fits one batched round
    val flat = (Seq.fill(10)("ab") ++ Seq.fill(9)("cd") ++ Seq.fill(8)("ef")
      ++ Seq.fill(7)("gh") ++ Seq.fill(6)("ij") ++ Seq.fill(5)("kl")).toDF("text")
    val seqJobs = countJobs(Curation.bpeMerges(flat, "text", 6, batchK = 1).collect())
    val batJobs = countJobs(Curation.bpeMerges(flat, "text", 6).collect())
    assert(batJobs < seqJobs,
      s"batched rounds must cut driver round trips: $batJobs vs sequential $seqJobs")
    // natural text rarely batches in early rounds (candidates share common
    // letters): the optimistic pre-scan must keep the machinery near-free
    val seqReal = countJobs(Curation.bpeMerges(docs, "text", 8, batchK = 1).collect())
    val batReal = countJobs(Curation.bpeMerges(docs, "text", 8).collect())
    assert(batReal <= seqReal + 2,
      s"non-batchable corpus must not pay for batching: $batReal vs $seqReal")
  }

  test("split-leakage audit composition: exactly the test split is audited, overlap in [0,1]") {
    val split = Curation.assignSplits(docs, "doc_id")
    val testIds = split.filter(col("split") === "test")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = Curation.contaminationScores(
      split.filter(col("split") === "test"),
      split.filter(col("split") === "train"), "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSet === testIds, "one audit row per test doc, none extra")
    got.foreach { case (id, n, hits, ov) =>
      assert(hits <= n, s"doc $id: hits $hits > n_ngrams $n")
      assert(ov >= 0.0 && ov <= 1.0, s"doc $id: overlap $ov out of range")
    }
  }

  test("bigramModel: handcrafted counts; conditionals sum to 1 per context") {
    val s = spark
    import s.implicits._
    val docs = Seq("a b a b c", "b c", "x").toDF("text") // "x": no bigrams
    val got = Curation.bigramModel(docs, "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // bigrams: (a,b)x2 (b,a)x1 (b,c)x2
    assert(got(("a", "b")) === ((2L, 2L, 1.0)))
    assert(got(("b", "a")) === ((1L, 3L, 1.0 / 3)))
    assert(got(("b", "c")) === ((2L, 3L, 2.0 / 3)))
    assert(!got.keySet.exists(_._1 == "x"))
    // per-context probabilities sum to 1 (exactly, for these denominators)
    got.keys.map(_._1).toSeq.distinct.foreach { w1 =>
      val tot = got.filter(_._1._1 == w1).values.map(_._3).sum
      assert(math.abs(tot - 1.0) < 1e-12, s"context $w1 sums to $tot")
    }
  }

  test("tfidfKeywords: rare tokens outrank common ones; k bounds per doc") {
    val s = spark
    import s.implicits._
    // 'common' is in every doc (df=3); 'rare' only in doc 1 (df=1)
    val docs = Seq(
      (1L, "common rare common other"),
      (2L, "common other filler words here"),
      (3L, "common filler filler filler"))
      .toDF("doc_id", "text")
    val got = Curation.tfidfKeywords(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(4), r.getLong(5)))
    assert(got.count(_._1 == 1L) === 2)
    val d1 = got.filter(_._1 == 1L).sortBy(_._4)
    // doc 1: rare (tf=1, df=1, score 3.0) beats common (tf=2, df=3, score 2.0)
    assert(d1.head._2 === "rare" && d1.head._3 === 3.0)
    assert(d1(1)._2 === "common" && d1(1)._3 === 2.0)
    // every doc has at most k keywords
    got.groupBy(_._1).values.foreach(v => assert(v.length <= 2))
  }

  test("rareBigramGate: gibberish rejected, templated text kept, short docs pass") {
    val s = spark
    import s.implicits._
    val template = (1L to 20L).map(i => (i, "the quick brown fox jumps"))
    val corpus = (template ++ Seq(
      (100L, "zxq wvu poi lkj mnb"), // every bigram unique in the corpus
      (101L, "hello")))              // no bigrams at all
      .toDF("doc_id", "text")
    val out = Curation.rareBigramGate(corpus, "doc_id", "text",
      minCount = 2, maxRareNum = 1, maxRareDen = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // the template's bigrams appear 20x -> zero rare, kept
    (1L to 20L).foreach { i =>
      assert(out(i) === ((4L, 0L, true)), s"doc $i: ${out(i)}")
    }
    // gibberish: all 4 bigrams have corpus count 1 < 2 -> ratio 1 > 1/10
    assert(out(100L) === ((4L, 4L, false)))
    // a doc with fewer than two tokens carries no bigrams and passes
    assert(out(101L) === ((0L, 0L, true)))
  }
}
