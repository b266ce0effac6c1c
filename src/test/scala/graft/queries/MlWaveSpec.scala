package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-11 ML-kernel wave (CatalogMl): exhaustive
  * driver-side replays (all-splits Gini argmax in BigInteger, direct
  * per-user subsequence tests, full pair-lift recount) plus the family
  * inequalities (gain non-negativity, shrinkage bounds). */
class MlWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q426 best split equals the exhaustive BigInteger argmax over all " +
      "bin thresholds, and splitting never increases impurity") {
    val out = CatalogGpHelpers.one(CatalogMl.q426BestSplit(spark, sf))
    val rows = graft.Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("c"),
        (col("event_type") === "purchase").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (mn, mx) = (rows.map(_._1).min, rows.map(_._1).max)
    val w = (mx - mn) / CatalogMl.SplitBins + 1L
    val n = rows.length.toLong
    val p = rows.map(_._2).sum
    val byBin = rows.groupBy { case (c, _) => (c - mn) / w }
      .map { case (b, v) => b -> (v.length.toLong, v.map(_._2).sum) }
    import java.math.BigInteger
    def bi(x: Long) = BigInteger.valueOf(x)
    val cands = byBin.keys.toSeq.sorted.map { k =>
      val (nl, pl) = byBin.filter(_._1 <= k).values
        .foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
      val (nr, pr) = (n - nl, p - pl)
      val score = bi(pl).multiply(bi(pl))
        .add(bi(nl - pl).multiply(bi(nl - pl))).multiply(bi(nr))
        .add(bi(pr).multiply(bi(pr))
          .add(bi(nr - pr).multiply(bi(nr - pr))).multiply(bi(nl)))
      (k, nl, pl, nr, pr, score)
    }.filter(_._2 < n)
    val best = cands.maxBy(c => (c._6, -c._1))(
      Ordering.Tuple2(Ordering.ordered[BigInteger], Ordering.Long))
    assert(out.getLong(0) === best._1)
    assert((out.getLong(2), out.getLong(3), out.getLong(4), out.getLong(5))
      === ((best._2, best._3, best._4, best._5)))
    // gain ≥ 0: weighted child impurity ≤ parent impurity. Cross-multiplied
    // by n·nl·nr (all positive): n·[(pl²+ql²)nr + (pr²+qr²)nl] ≥ (p²+q²)·nl·nr
    val lhs = bi(n).multiply(best._6)
    val rhs = bi(p).multiply(bi(p)).add(bi(n - p).multiply(bi(n - p)))
      .multiply(bi(best._2)).multiply(bi(best._4))
    assert(lhs.compareTo(rhs) >= 0, "split increased impurity")
  }

  test("q427 pattern supports equal direct per-user subsequence tests") {
    val got = CatalogMl.q427SeqPatterns(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3))
      .toMap
    val ev = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        (r.getAs[java.sql.Timestamp](2).getTime, r.getLong(3))))
      .groupBy(_._1)
      .map { case (u, v) => u -> v.sortBy(_._3).map(_._2).toList }
    val types = Seq("click", "error", "purchase", "signup", "view")
    def hasSub(stream: List[String], pat: Seq[String]): Boolean =
      pat.foldLeft(Option(stream)) {
        case (Some(rest), t) =>
          val i = rest.indexOf(t)
          if (i < 0) None else Some(rest.drop(i + 1))
        case (None, _) => None
      }.isDefined
    val expect = (for {
      a <- types; b <- types; c <- types
      s = ev.values.count(st => hasSub(st, Seq(a, b, c))).toLong
      if s > 0
    } yield (a, b, c) -> s).toMap
    assert(got === expect)
  }

  test("q428 lift is symmetric and the top-5 matches a full driver recount") {
    val got = CatalogMl.q428CovisitLift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(1), r.getLong(3),
        r.getDouble(4))).toMap
    val baskets = graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = baskets.map(_._1).distinct.length.toLong
    val cx = baskets.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val pairs = baskets.groupBy(_._1).values.toSeq.flatMap { b =>
      val ps = b.map(_._2).toSeq
      for (x <- ps; y <- ps if x != y) yield (x, y)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    // symmetry
    pairs.keys.foreach { case (x, y) => assert(pairs((x, y)) === pairs((y, x))) }
    val top = pairs.groupBy(_._1._1).flatMap { case (x, m) =>
      m.toSeq.map { case ((_, y), cxy) =>
        (x, y, cxy, (n * cxy).toDouble / (cx(x) * cx(y)).toDouble)
      }.sortBy(t => (-t._4, t._2)).take(5).zipWithIndex
        .map { case ((_, y, cxy, lift), i) =>
          (x, i + 1L) -> (y, cxy, lift) }
    }
    assert(got === top)
  }

  test("q434 WOE/IV matches a driver recount through the same piecewise " +
      "lg, including the integer-Laplace smoothing and the fold order") {
    def lgL(x: Long): Double = {
      val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
      val p = 1L << (len - 1)
      (len - 1).toDouble + (x - p).toDouble / p.toDouble
    }
    val got = CatalogMl.q434WoeIv(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val rows = graft.Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("c"),
        (col("event_type") === "purchase").cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val (mn, mx) = (rows.map(_._1).min, rows.map(_._1).max)
    val w = (mx - mn) / CatalogMl.WoeBins + 1L
    val (tp, tn) = (rows.map(_._2).sum, rows.length.toLong - rows.map(_._2).sum)
    val byBin = rows.groupBy { case (c, _) => (c - mn) / w }
    val woe = byBin.map { case (b, v) =>
      val p = v.map(_._2).sum
      val n = v.length.toLong - p
      b -> (p, n,
        (lgL(2 * p + 1) - lgL(2 * tp + CatalogMl.WoeBins)) -
          (lgL(2 * n + 1) - lgL(2 * tn + CatalogMl.WoeBins)))
    }
    val iv = woe.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, (p, n, wv))) =>
      acc + (p.toDouble / tp.toDouble - n.toDouble / tn.toDouble) * wv
    }
    assert(got.keySet === woe.keySet)
    woe.foreach { case (b, (p, n, wv)) =>
      val (gp, gn, gw, gi) = got(b)
      assert(gp === p && gn === n, s"bin $b counts")
      assert(gw === wv, s"bin $b woe")
      assert(gi === iv, s"bin $b iv")
    }
  }

  test("q429 encoding shrinks toward the global mean and matches a " +
      "driver recount bit for bit") {
    val got = CatalogMl.q429TargetEncode(spark, sf).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val rows = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"), round(col("o_totalprice") * 100)
        .cast("long").as("cents"))
      .join(graft.Tables.customer(spark, sf)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("cents"))
      .collect().map(r =>
        ((r.getAs[Number](0).longValue(), r.getString(1)), r.getLong(2)))
    val gs = rows.map(_._2).sum
    val gn = rows.length.toLong
    val gmean = gs.toDouble / gn.toDouble
    rows.groupBy(_._1).foreach { case (cat, v) =>
      val (nc, sc) = (v.length.toLong, v.map(_._2).sum)
      val enc = (sc.toDouble + 100.0 * (gs.toDouble / gn.toDouble)) /
        (nc + 100L).toDouble
      val (gn2, gs2, ge) = got(cat)
      assert(gn2 === nc && gs2 === sc && ge === enc, cat)
      // shrinkage: enc lies between the category mean and the global mean
      val cmean = sc.toDouble / nc.toDouble
      assert(ge >= math.min(cmean, gmean) - 1e-9 &&
        ge <= math.max(cmean, gmean) + 1e-9, cat)
    }
  }
}

/** Tiny shared helper: single-row collect with a clear failure. */
private object CatalogGpHelpers {
  def one(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.Row = {
    val rows = df.collect()
    assert(rows.length == 1, s"expected 1 row, got ${rows.length}")
    rows(0)
  }
}
