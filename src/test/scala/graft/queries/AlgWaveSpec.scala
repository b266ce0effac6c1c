package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-10c named-algorithms wave (q410-q414):
  * WL color refinement respects graph symmetry, the SA+LCP
  * distinct-substring identity matches brute force, AMS estimators obey
  * their integer invariants, the double sweep is exact on a path graph,
  * and HRW sharding moves ONLY the removed node's documents. */
class AlgWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("x", "y")
  }

  test("WL: path-graph symmetry — mirror nodes share colors, ends differ from middles") {
    // path 1-2-3-4: {1,4} symmetric, {2,3} symmetric, ends != middles
    val colors = CatalogAlg.wlColors(edgeDf(Seq((1L, 2L), (2L, 3L), (3L, 4L))), 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(colors(1L) === colors(4L))
    assert(colors(2L) === colors(3L))
    assert(colors(1L) !== colors(2L))
  }

  test("WL: refinement only splits classes — round-3 class count >= degree classes") {
    val hist = CatalogAlg.q410WlRefinement(spark, sf).collect()
    val nNodes = hist.map(_.getAs[Long]("n_nodes")).sum
    val e = CatalogAlg.partEdges(spark, sf)
    val degs = e.select(col("x").as("a")).unionAll(e.select(col("y").as("a")))
      .groupBy("a").count().select(col("count")).distinct().count()
    assert(hist.length >= degs.toInt, "WL refines the degree partition")
    val nodes = e.select(col("x").as("a")).unionAll(e.select(col("y").as("a")))
      .distinct().count()
    assert(nNodes === nodes)
  }

  test("distinct substrings: identity matches brute force on crafted docs") {
    import spark.implicits._
    val texts = Seq("abab", "aaaa", "abcde", "mississippi")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dsub").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = CatalogAlg.q411DistinctSubstrings(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_distinct")).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val brute = (for {
        a <- 0 until t.length; b <- a + 1 to t.length
      } yield t.substring(a, b)).toSet.size.toLong
      assert(out(i.toLong) === brute, s"doc '$t'")
    }
  }

  test("AMS F2: exact moment matches brute force; estimators obey |S| <= N") {
    val rows = CatalogAlg.q412AmsF2(spark, sf).collect()
    assert(rows.length === 8)
    val counts = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(_.getAs[Long]("count"))
    val f2 = counts.map(c => c * c).sum
    val n = counts.sum
    rows.foreach { r =>
      assert(r.getAs[Long]("f2_exact") === f2)
      assert(math.abs(r.getAs[Long]("s_sum")) <= n)
      assert(r.getAs[Long]("est") ===
        r.getAs[Long]("s_sum") * r.getAs[Long]("s_sum"))
    }
    val ests = rows.map(_.getAs[Long]("est")).sorted
    assert(rows.head.getAs[Double]("est_median") ===
      (ests(3) + ests(4)).toDouble / 2.0)
  }

  test("double sweep: exact diameter on a path graph") {
    val out = CatalogAlg.diameterOf(
      edgeDf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))).collect().head
    assert(out.getAs[Long]("seed") === 1L)
    assert(out.getAs[Long]("sweep1_far") === 5L)
    assert(out.getAs[Long]("sweep1_ecc") === 4L)
    assert(out.getAs[Long]("diameter_lb") === 4L)
    assert(out.getAs[Long]("n_reached") === 5L)
  }

  test("double sweep: real graph exhausted the 16-round cap") {
    val r = CatalogAlg.q413Diameter(spark, sf).collect().head
    assert(r.getAs[Long]("sweep1_ecc") < 16L,
      "eccentricity must sit strictly inside the BFS round cap")
    assert(r.getAs[Long]("diameter_lb") >= r.getAs[Long]("sweep1_ecc"),
      "second sweep cannot shrink the bound")
  }

  test("HRW: only the removed node's documents move") {
    val rows = CatalogAlg.q414HrwShards(spark, sf).collect()
      .map(r => r.getAs[String]("node") ->
        (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"),
          r.getAs[Long]("n_gained"))).toMap
    val (b0, a0, g0) = rows("node0")
    assert(a0 === 0L && g0 === 0L)
    // every moved doc came off node0, and every node0 doc moved
    assert(rows.values.map(_._3).sum === b0)
    // survivors keep their docs: after = before + gained
    rows.filterNot(_._1 == "node0").foreach { case (n, (b, a, g)) =>
      assert(a === b + g, s"node $n must keep its pre-removal docs")
    }
    val total = rows.values.map(_._1).sum
    assert(rows.values.map(_._2).sum === total)
  }
}
