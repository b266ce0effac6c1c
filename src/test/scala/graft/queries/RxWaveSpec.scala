package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-12 second wave (q442–q444).
  *
  * q442: the assignment is a matching (each doc in ≤ 1 link), covers
  * every candidate pair (maximality), and equals greedy
  * best-score-first 1:1 linkage replayed driver-side from the identical
  * fixed-point weights; a contended star fixture proves only the
  * strongest link survives. q443: a single-value stream estimates F2
  * EXACTLY for every estimator (sign² = 1); sketches merge by addition
  * (the 100 TB property); driver recount from the identical md5 parity.
  * q444: G² recounts exactly driver-side with the same piecewise lg; an
  * independent power-of-two corpus scores exactly 0 bits; evidence mass
  * dominates — a frequent exclusive pair beats a hapax pair that PMI
  * would tie or over-rank. */
class RxWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ---------------------------------------------------------------- q442

  private def pairWt(aId: Long, bId: Long, na: Long, nb: Long,
      inter: Long): Long =
    ((na + nb - 2 * inter) * 1048576L) / (na + nb) * 1099511627776L +
      java.lang.Long.parseLong(md5hex(s"as:$aId,$bId").take(10), 16)

  test("linkage assignment: matching, maximal, equals greedy best-first") {
    val pairs = CatalogExt.q119FuzzyPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("na"), r.getAs[Long]("nb"), r.getAs[Long]("inter")))
    val out = CatalogRx.q442LinkageAssignment(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Double]("dice")))
    // a matching: endpoints pairwise distinct; dice within the threshold
    val ends = out.flatMap(t => Seq(t._1, t._2))
    assert(ends.distinct.length === ends.length)
    out.foreach(t => assert(t._3 >= 0.75 && t._3 <= 1.0))
    // the output links are candidate pairs
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    assert(out.forall(t => pairSet((t._1, t._2))))
    // maximality: every candidate pair touches an assigned doc
    val matched = ends.toSet
    assert(pairs.forall(p => matched(p._1) || matched(p._2)))
    // equals greedy best-score-first (ascending fixed-point weight)
    var free = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val greedy = scala.collection.mutable.Set.empty[(Long, Long)]
    pairs.sortBy(p => pairWt(p._1, p._2, p._3, p._4, p._5))
      .foreach { case (a, b, _, _, _) =>
        if (free(a) && free(b)) { greedy += ((a, b)); free -= a; free -= b }
      }
    assert(out.map(t => (t._1, t._2)).toSet === greedy.toSet)
  }

  test("matching core: contended star keeps only the strongest link") {
    import spark.implicits._
    // star: doc 1 paired with 2, 3, 4 at increasing weight; 2-3 also
    // paired but heavier than 1-2 — greedy takes (1,2) then (3,4)
    val we = Seq((1L, 2L, 10L), (1L, 3L, 20L), (1L, 4L, 30L),
      (3L, 4L, 40L)).toDF("x", "y", "wt")
    val m = CatalogGx.matchingOf(we, 8).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSet
    assert(m === Set((1L, 2L), (3L, 4L)))
  }

  // ---------------------------------------------------------------- q443

  test("AMS F2: exact audit, per-j recount, single-value exactness, merge") {
    import spark.implicits._
    val rows = CatalogRx.q443AmsF2(spark, sf).collect()
    assert(rows.length === CatalogRx.AmsEstimators)
    val fv = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey").as("v")).agg(count(lit(1)).as("f"))
      .collect().map(r => (r.getAs[Long]("v"), r.getAs[Long]("f")))
    val f2 = fv.map(t => t._2 * t._2).sum
    def sign(j: Long, v: Long): Long =
      if (java.lang.Long.parseLong(md5hex(s"ams:$j:$v").take(1), 16) % 2 == 0)
        1L else -1L
    rows.foreach { r =>
      val j = r.getAs[Long]("j")
      val sj = fv.map { case (v, f) => sign(j, v) * f }.sum
      assert(r.getAs[Long]("s_j") === sj)
      assert(r.getAs[Long]("est_f2") === sj * sj)
      assert(r.getAs[Long]("f2_exact") === f2)
      assert(r.getAs[Double]("ratio") ===
        (sj * sj).toDouble / f2.toDouble)
    }
    // single-value stream: est = f² EXACTLY for every estimator
    val one = Seq((42L, 7L)).toDF("v", "f")
    CatalogRx.amsSums(one, 16).collect().foreach { r =>
      val s = r.getAs[Long]("s_j"); assert(s * s === 49L)
    }
    // mergeability: S_j adds across arbitrary splits of the stream
    val a = Seq((1L, 3L), (2L, 5L)).toDF("v", "f")
    val b = Seq((2L, 4L), (9L, 1L)).toDF("v", "f")
    val whole = Seq((1L, 3L), (2L, 9L), (9L, 1L)).toDF("v", "f")
    def sums(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      CatalogRx.amsSums(df, 16).collect()
        .map(r => r.getAs[Long]("j") -> r.getAs[Long]("s_j")).toMap
    val (sa, sb, sw) = (sums(a), sums(b), sums(whole))
    (0L until 16L).foreach(j => assert(sa(j) + sb(j) === sw(j)))
  }

  // ---------------------------------------------------------------- q444

  private def lgD(x: Long): Double = {
    val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val p = 1L << (len - 1)
    (len - 1).toDouble + (x - p).toDouble / p.toDouble
  }

  test("G² collocations: exact driver recount from the bigram margins") {
    val rows = CatalogRx.q444G2Collocations(spark, sf).collect()
    assert(rows.length === 20)
    val toks = graft.Tables.documents(spark, sf)
      .select(graft.text.TextOps.tokens(col("text")).as("w")).collect()
      .map(_.getSeq[String](0))
    val bi = toks.flatMap(w => w.dropRight(1).zip(w.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r1 = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val k1 = bi.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = bi.values.sum
    def term(o: Long, rt: Long, ct: Long): Double =
      if (o > 0) o.toDouble * (((lgD(o) + lgD(n)) - lgD(rt)) - lgD(ct))
      else 0.0
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      val c12 = bi((w1, w2)); val rr = r1(w1); val kk = k1(w2)
      assert(r.getAs[Long]("c12") === c12)
      assert(r.getAs[Long]("r1") === rr)
      assert(r.getAs[Long]("k1") === kk)
      val g2 = (((term(c12, rr, kk)
        + term(rr - c12, rr, n - kk))
        + term(kk - c12, n - rr, kk))
        + term((n - rr) - (kk - c12), n - rr, n - kk)) * 2.0
      assert(r.getAs[Double]("g2_bits") === g2)
    }
  }

  test("G²: independent power-of-two corpus is exactly 0 bits") {
    import spark.implicits._
    val docs = Seq("a x", "a y", "b x", "b y").toDF("text")
    val out = CatalogRx.g2Of(docs, minCount = 1L, k = 10).collect()
    assert(out.length === 4)
    out.foreach(r => assert(r.getAs[Double]("g2_bits") === 0.0))
  }

  // ---------------------------------------------------------------- q445

  test("grid DBSCAN: equals a full driver-side DBSCAN on the panel") {
    val out = CatalogRx.q445GridDbscan(spark, sf).collect()
      .map(r => (r.getAs[Long]("id"), (r.getAs[Long]("x"), r.getAs[Long]("y"),
        r.getAs[String]("role"),
        Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong))))
      .toMap
    // rebuild the identical md5-rank panel driver-side
    val feats = out.map { case (id, (x, y, _, _)) => (id, x, y) }.toSeq
    val eps2 = CatalogRx.DbEps * CatalogRx.DbEps
    val nbr = feats.map { case (id, x, y) =>
      id -> feats.filter { case (j, bx, by) =>
        j != id && (x - bx) * (x - bx) + (y - by) * (y - by) <= eps2
      }.map(_._1).toSet
    }.toMap
    val core = nbr.filter(_._2.size >= CatalogRx.DbMinPts).keySet
    // union-find over core-core edges
    val par = scala.collection.mutable.Map.empty[Long, Long]
    def find(a: Long): Long = {
      var x = a
      while (par.getOrElse(x, x) != x) { par(x) = par.getOrElse(par(x), par(x)); x = par(x) }
      x
    }
    core.foreach { a => (nbr(a) & core).foreach { b =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) par(math.max(ra, rb)) = math.min(ra, rb)
    }}
    val cluster = core.map(a => a -> find(a)).toMap
    out.foreach { case (id, (_, _, role, cl)) =>
      if (core(id)) {
        assert(role === "core"); assert(cl === Some(cluster(id)))
      } else {
        val coreNbrs = nbr.getOrElse(id, Set.empty) & core
        if (coreNbrs.nonEmpty) {
          assert(role === "border")
          assert(cl === Some(coreNbrs.map(cluster).min))
        } else { assert(role === "noise"); assert(cl === None) }
      }
    }
  }

  test("grid DBSCAN core: two blobs + a sparse bridge point") {
    import spark.implicits._
    // blob A around (0,0), blob B around (100,100), one isolated point,
    // one border point within eps of blob A but with too few neighbors
    val a = Seq((1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (5L, 2L, 1L))
    val b = Seq((11L, 100L, 100L), (12L, 101L, 100L), (13L, 100L, 101L),
      (14L, 101L, 101L), (15L, 102L, 101L))
    val border = Seq((21L, 6L, 1L))  // within eps=5 of (1,1)/(2,1) only
    val noise = Seq((31L, 50L, 50L))
    val f = (a ++ b ++ border ++ noise).toDF("id", "x", "y")
    val out = CatalogRx.dbscanOf(f, 5L, 4L).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[String]("role"),
        Option(r.getAs[java.lang.Long]("cluster")).map(_.toLong))).toMap
    a.foreach { case (id, _, _) => assert(out(id) === ("core", Some(1L))) }
    b.foreach { case (id, _, _) => assert(out(id) === ("core", Some(11L))) }
    assert(out(21L) === ("border", Some(1L)))
    assert(out(31L) === ("noise", None))
  }

  // ---------------------------------------------------------------- q446

  test("incremental CC: equals a FULL hookComponents recompute") {
    import org.apache.spark.sql.DataFrame
    val s = spark
    // rebuild the q446 construction's base/delta from the ranked docs
    val docs = graft.Tables.documents(s, sf).select(col("doc_id"))
    val r = graft.ops.IterativeLoop.cutLazy(
      graft.ops.DistributedRank.withRowNumber(docs, "rnk",
        md5(concat(lit("ci:"), col("doc_id").cast("string"))), col("doc_id")))
    val consec = r.select(col("doc_id").as("x"), col("rnk"))
      .join(r.select(col("doc_id").as("y"), (col("rnk") - 1).as("rnk")), "rnk")
    val base = consec.filter(col("rnk") % CatalogRx.CiSegLen =!= 0)
      .select(col("x"), col("y"))
    val delta = consec.filter(col("rnk") % CatalogRx.CiSegLen === 0 &&
      expr(s"(rnk div ${CatalogRx.CiSegLen}) % 8") === 1)
      .select(col("x"), col("y"))
    def labelsOf(df: DataFrame): Map[Long, Long] = df.collect()
      .map(x => (x.getAs[Long]("id"), x.getAs[Long]("component"))).toMap
    val inc = labelsOf(CatalogRx.q446IncrementalCc(s, sf))
    val full = labelsOf(
      graft.graph.Graph.hookComponents(base.unionAll(delta), "x", "y"))
    assert(inc === full)
  }

  test("incremental CC: touches only delta'd components; empty delta is id") {
    import spark.implicits._
    val base = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("x", "y")
    val labels0 = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L),
      (6L, 5L)).toDF("id", "component")
    val delta = Seq((2L, 3L)).toDF("x", "y")
    val out = CatalogRx.incrementalCc(labels0, base, delta).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"))).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L))
    // empty delta: nothing recomputes, stored labels pass through
    val none = CatalogRx.incrementalCc(labels0, base,
      Seq.empty[(Long, Long)].toDF("x", "y")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"))).toMap
    assert(none === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L))
    // brand-new delta nodes (the daily-ingest case): node 7 attaches to
    // {5,6}; node 0 attaches to {1,2} AND becomes its new minimum label
    val grown = CatalogRx.incrementalCc(labels0, base,
      Seq((6L, 7L), (2L, 0L)).toDF("x", "y")).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("component"))).toMap
    assert(grown === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 3L,
      4L -> 3L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
  }

  // ---------------------------------------------------------------- q447

  test("bitmap overlap: exact set recount, bounds, inclusion-exclusion") {
    val tu = graft.Tables.events(spark, sf)
      .select(col("event_type").as("t"), col("user_id").as("u"))
      .distinct().collect()
      .map(r => (r.getAs[String]("t"), r.getAs[Long]("u")))
    val aud = tu.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = CatalogRx.q447BitmapOverlap(spark, sf).collect()
    val types = aud.keySet.toSeq.sorted
    assert(rows.length === types.combinations(2).length)
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val (sa, sb) = (aud(a), aud(b))
      assert(r.getAs[Long]("n_a") === sa.size.toLong)
      assert(r.getAs[Long]("n_b") === sb.size.toLong)
      assert(r.getAs[Long]("n_inter") === (sa & sb).size.toLong)
      assert(r.getAs[Long]("n_union") === (sa | sb).size.toLong)
      assert(r.getAs[Long]("n_inter") <= math.min(sa.size, sb.size).toLong)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("G²: evidence mass dominates — frequent exclusive beats hapax") {
    import spark.implicits._
    // (s t) co-occurs 8 times exclusively; (p q) once exclusively;
    // filler bigrams keep the margins honest
    val docs = (Seq.fill(8)("s t") ++ Seq("p q") ++
      Seq.fill(7)("f1 f2")).toDF("text")
    val out = CatalogRx.g2Of(docs, minCount = 1L, k = 10).collect()
      .map(r => ((r.getAs[String]("w1"), r.getAs[String]("w2")),
        r.getAs[Double]("g2_bits"))).toMap
    assert(out(("s", "t")) > out(("p", "q")))
    assert(out(("p", "q")) > 0.0)
  }
}
