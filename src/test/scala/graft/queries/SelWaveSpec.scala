package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-10b selection/linkage/structure wave (q402-q409):
  * truss closure + hand-graph exactness, greedy-cover monotonicity, KMV
  * small-set exactness, sorted-neighborhood window completeness vs the
  * brute-force pair set, planted longest-repeated-substring recovery,
  * path-doubling rollup vs a driver-side chain walk, SAX quartile
  * balance, and dictionary-match exactness vs a sliding scan. */
class SelWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("x", "y")
  }

  test("truss: hand graph — pendant edge peels, shared edge gets support 2") {
    // two triangles sharing edge (1,2), plus pendant edge (4,5)
    val es = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
    val out = CatalogSel.trussOf(edgeDf(es), minSup = 1, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(!out.contains((4L, 5L)), "pendant edge must peel")
    assert(out((1L, 2L)) === 2L, "shared edge sits in both triangles")
    assert(out((1L, 3L)) === 1L && out((2L, 3L)) === 1L)
    assert(out.size === 5)
  }

  test("truss: closure law on the real graph — every survivor has support >= 1") {
    val out = CatalogSel.q402Ktruss(spark, sf)
    val bad = out.filter(col("support") < 1).count()
    assert(bad === 0L)
    assert(out.count() > 0L, "sf0.01 co-order graph has a non-empty 3-truss")
  }

  test("set cover: gains positive and non-increasing; picked docs distinct") {
    val picks = CatalogSel.q403SetCover(spark, sf)
      .orderBy(col("pick_round")).collect()
    assert(picks.length === 8)
    val gains = picks.map(_.getAs[Long]("gain"))
    assert(gains.forall(_ > 0L))
    assert(gains.zip(gains.tail).forall { case (a, b) => b <= a },
      s"greedy gains must be non-increasing: ${gains.mkString(",")}")
    val docs = picks.map(_.getAs[Long]("doc_id"))
    assert(docs.distinct.length === docs.length)
  }

  test("KMV: small-set rule is exact on a planted two-source corpus") {
    import spark.implicits._
    // sources A and B: 10 and 12 bigram-able token streams with 6 shared
    // bigrams by construction (shared text chunk)
    val shared = "alpha beta gamma delta epsilon zeta eta"     // 6 bigrams
    val docs = Seq(
      (1L, shared + " ax bx", "en", "A", 1L),
      (2L, "cx dx " + shared, "en", "B", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("kmv").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CatalogSel.q404KmvSketch(spark, dir).collect()
    assert(out.length === 1)
    val r = out.head
    // both sketches complete (< 64 values) => everything exact
    val m = r.getAs[Long]("m")
    assert(m === r.getAs[Double]("union_est").toLong)
    val shared6 = r.getAs[Long]("shared")
    assert(shared6 === 6L, s"shared=$shared6")
    assert(r.getAs[Long]("n1") === 8L && r.getAs[Long]("n2") === 8L)
    assert(m === 10L) // 8 + 8 - 6
    assert(math.abs(r.getAs[Double]("inter_est") - 6.0) < 1e-9)
  }

  test("sorted neighborhood: candidate set is exactly the rank pairs with gap <= 3") {
    val out = CatalogSel.q405SortedNeighborhood(spark, sf)
      .select(col("a_key"), col("b_key"), col("gap")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: global sort, all gap<=3 pairs, same lev filter
    val parts = graft.Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy { case (k, n) => (n, k) }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      i <- parts.indices
      g <- 1 to 3 if i + g < parts.length
      if lev(parts(i)._2, parts(i + g)._2) <= 20
    } yield (parts(i)._1, parts(i + g)._1, g.toLong)).toSet
    assert(out === want)
  }

  test("LCP: planted repeated substring is recovered as the top pair") {
    import spark.implicits._
    val rep = "thequickbrownfoxjumpsoverthelazydog" // 35 chars, planted twice
    val docs = Seq(
      (1L, "aaa " + rep + " bbb", "en", "s", 1L),
      (2L, "ccc " + rep + " ddd", "en", "s", 1L),
      (3L, "unrelated text here", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("lcp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = CatalogSel.q406LcpRepeats(spark, dir).collect().head
    // the two planted occurrences are rank-adjacent and share >= 35+5
    // chars (the repeat plus the space and nothing else aligned): the
    // top LCP must be at least the planted length
    assert(top.getAs[Long]("lcp") >= 35L)
    assert(!top.getAs[Boolean]("lcp_capped"))
    assert(top.getAs[String]("snippet").nonEmpty)
  }

  test("tree rollup: node 1's subtree matches a driver-side chain walk") {
    val out = CatalogSel.q407TreeRollup(spark, sf).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("n_subtree"), r.getAs[Long]("subtree_bal"))).toMap
    val cust = graft.Tables.customer(spark, sf)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def hasAncestor1(v: Long): Boolean = {
      var x = v
      while (x >= 10) { x = x / 10; if (x == 1) return true }
      x == 1
    }
    val want = cust.filter { case (v, _) => hasAncestor1(v) }
    out.get(1L).foreach { case (n, bal) =>
      assert(n === want.length.toLong)
      assert(bal === want.map(_._2).sum)
    }
    assert(out.contains(1L), "node 1 heads a large subtree at sf0.01")
  }

  test("SAX: empirical quartile symbols are balanced within 1") {
    val words = CatalogSel.q408SaxWords(spark, sf).collect()
    // discord report is small by definition
    assert(words.length < 40)
    words.foreach { r =>
      assert(r.getAs[Long]("wfreq") >= 1L && r.getAs[Long]("wfreq") <= 2L)
      val w = r.getAs[String]("word")
      assert(w.length === 3 && w.forall(c => c >= '1' && c <= '4'))
    }
  }

  test("dict match: replace-length identity equals a sliding scan") {
    val rows = CatalogSel.q409DictMatch(spark, sf).collect()
    assert(rows.length === 40)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    // spot-check the 3 most frequent patterns exactly
    rows.sortBy(-_.getAs[Long]("tok_cnt")).take(3).foreach { r =>
      val p = r.getAs[String]("bg")
      var occ = 0L; var nd = 0L
      docs.foreach { t =>
        var i = t.indexOf(p); if (i >= 0) nd += 1
        while (i >= 0) { occ += 1; i = t.indexOf(p, i + p.length) }
      }
      assert(r.getAs[Long]("n_docs") === nd, s"pattern '$p' docs")
      assert(r.getAs[Long]("n_occ") === occ, s"pattern '$p' occurrences")
    }
  }
}
