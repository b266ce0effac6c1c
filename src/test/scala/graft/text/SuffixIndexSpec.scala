package graft.text

import graft.SparkSpec
import graft.queries.CatalogIdx
import org.apache.spark.sql.functions._

/** Laws for the round-10 indexing wave: suffix ranks against a literal
  * brute-force sort, BWT against the textbook example, skyline against
  * the O(n²) dominance definition, winnowing's coverage guarantee, and
  * the Haar synopsis's conservation laws. */
class SuffixIndexSpec extends SparkSpec {

  import spark.implicits._

  test("globalRanks equals brute-force suffix sort (multi-doc, with ties and prefixes)") {
    val docs = Seq(
      (1L, "abracadabra"),
      (2L, "banana"),
      (3L, "aba"),       // shares suffixes "a"/"ba"/"aba"-prefix structure with doc 1
      (4L, "banana")     // exact duplicate of doc 2: every suffix ties cross-doc
    ).toDF("doc_id", "text")
    val got = SuffixIndex.globalRanks(docs, "doc_id", "text")
      .orderBy("suffix_rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = Seq((1L, "abracadabra"), (2L, "banana"), (3L, "aba"), (4L, "banana"))
      .flatMap { case (id, t) => (1 to t.length).map(p => (id, p.toLong, t.substring(p - 1))) }
      .sortBy { case (id, p, suf) => (suf, id, p) }
      .zipWithIndex
      .map { case ((id, p, _), i) => (id, p, (i + 1).toLong) }
    assert(got.toSeq === expected)
  }

  test("perDocBwt reproduces the textbook banana BWT and run count") {
    // "banana"+TAB: suffix order TAB, a TAB, ana TAB, anana TAB, banana TAB,
    // na TAB, nana TAB -> BWT of cyclic predecessors = a n n b TAB a a
    val docs = Seq((7L, "banana")).toDF("doc_id", "text")
    val row = SuffixIndex.perDocBwt(docs, "doc_id", "text").collect()(0)
    assert(row.getAs[Long]("n") === 7L)
    assert(row.getAs[String]("bwt_head") === "annb\taa")
    assert(row.getAs[Long]("bwt_runs") === 5L)
  }

  test("bwt run count drops for repetitive text (the compressibility signal)") {
    val rep = "spark " * 40
    val rnd = new scala.util.Random(42)
    val rand = (1 to 239).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val df = Seq((1L, rep.trim), (2L, rand)).toDF("doc_id", "text")
    val out = SuffixIndex.perDocBwt(df, "doc_id", "text")
      .select("doc_id", "bwt_runs").as[(Long, Long)].collect().toMap
    assert(out(1L) < out(2L) / 2,
      s"repetitive text should have far fewer BWT runs: $out")
  }

  test("skyline equals the O(n^2) dominance definition") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i =>
      (i.toLong, rnd.nextInt(1000).toLong, rnd.nextInt(300).toLong))
    val df = rows.toDF("o_orderkey", "p", "dd")
    val got = CatalogIdx.skylineOf(df)
      .select("o_orderkey").as[Long].collect().toSet
    val expected = rows.filter { case (_, p, d) =>
      !rows.exists { case (_, p2, d2) =>
        p2 >= p && d2 >= d && (p2 > p || d2 > d) }
    }.map(_._1).toSet
    assert(got === expected)
  }

  test("winnowing guarantees one print per full window and respects rightmost-min ties") {
    val rnd = new scala.util.Random(11)
    val text = (1 to 500).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val sel = CatalogIdx.winnowingPrints(docs, "doc_id", "text")
      .select("pos").as[Long].collect().toSet
    val g = text.length - (CatalogIdx.WinnowK - 1)
    val w = CatalogIdx.WinnowW
    (1 to g - w + 1).foreach { i =>
      assert((i until i + w).exists(p => sel.contains(p.toLong)),
        s"window at $i has no selected fingerprint")
    }
    // density sanity: selections are a small fraction, not everything
    assert(sel.size < g / 2)
  }

  test("t-closeness: one group == global gives 0; bounds hold; uniform-vs-skewed ordering") {
    val rows = (1 to 400).map(i => (i.toLong, "all", "x", (i * 37 % 1000).toLong))
    val one = CatalogIdx.tclosenessOf(
      rows.toDF("id", "segment", "region", "bal"), Seq("segment", "region"))
      .collect()(0)
    assert(one.getAs[Long]("t_num") === 0L)
    // two groups: one drawn from the low half, one from the high half —
    // both must have positive distance, bounded by 1
    val split = (1 to 400).map { i =>
      val g = if (i <= 200) "lo" else "hi"
      (i.toLong, g, "x", i.toLong)
    }
    val out = CatalogIdx.tclosenessOf(
      split.toDF("id", "segment", "region", "bal"), Seq("segment", "region"))
      .collect()
    out.foreach { r =>
      val t = r.getAs[Double]("t_close")
      assert(t > 0.0 && t <= 1.0, s"t out of bounds: $r")
      assert(r.getAs[Long]("t_num") <= r.getAs[Long]("t_den"))
    }
  }

  test("haar synopsis conserves the total (top coefficient) and Parseval energy") {
    val rnd = new scala.util.Random(3)
    val series = (0 until 300).map(i => (i.toLong, rnd.nextInt(10000).toLong))
    val day = series.toDF("i", "v")
    val top = CatalogIdx.haarTop(day, spark, topK = 8192).collect()
    val total = series.map(_._2).sum
    val approx = top.filter(r => r.getAs[String]("kind") == "a")
    assert(approx.length === 1)
    assert(approx(0).getAs[Long]("coeff") === total)
    // Parseval: sum of ALL energies == sum of squares of the series
    val energySum = top.map(_.getAs[Double]("energy")).sum
    val sq = series.map(v => v._2.toDouble * v._2.toDouble).sum
    assert(math.abs(energySum - sq) / sq < 1e-9,
      s"Parseval violated: $energySum vs $sq")
  }
}
