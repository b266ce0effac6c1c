package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the TPC-H completion wave (q157-q173): brute-force recomputes
  * at sf0.001 for the arithmetic queries, conservation laws for the
  * double-aggregates, and plan-shape guards (no cartesian product anywhere;
  * nested-loop joins only as one-row scalar broadcasts). */
class TpchWaveSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("Q6: engine revenue equals a driver-side decimal recompute") {
    val got = CatalogTpch.q157TpchQ6(spark, sf).collect().head.getDouble(0)
    val rows = graft.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date").cast("string"),
        col("l_discount"), col("l_quantity"), col("l_extendedprice"))
      .collect()
    val want = rows.iterator.filter { r =>
      val d = r.getString(0)
      d >= "1996-01-01" && d < "1997-01-01" &&
        r.getDouble(1) >= 0.05 && r.getDouble(1) <= 0.07 && r.getDouble(2) < 24
    }.map(r => BigDecimal(r.getDouble(3) * r.getDouble(1)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _)
    assert(math.abs(got - want.toDouble) < 1e-6)
  }

  test("Q7: only the two named nations appear, in both directions") {
    // sf0.001 has no NATION_1↔NATION_2 trade at all; use sf0.01
    val out = CatalogTpch.q158TpchQ7(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
    assert(out.forall(r => r.getLong(2) == 1996L || r.getLong(2) == 1997L))
  }

  test("Q8: market share is a proper fraction per year") {
    val out = CatalogTpch.q159TpchQ8(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 2)
    assert(out.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("Q13: the distribution conserves customers and orders") {
    val out = CatalogTpch.q160TpchQ13(spark, sf).collect()
    val nCust = graft.Tables.customer(spark, sf).count()
    val nOrd = graft.Tables.orders(spark, sf).count()
    assert(out.map(_.getLong(1)).sum === nCust)
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum === nOrd)
  }

  test("Q14 promo share in [0,100]; Q15 winners all at the exact max") {
    val promo = CatalogTpch.q161TpchQ14(spark, sf).collect().head.getDouble(0)
    assert(promo >= 0.0 && promo <= 100.0)
    val winners = CatalogTpch.q162TpchQ15(spark, sf).collect()
    assert(winners.nonEmpty)
    assert(winners.map(_.getDouble(2)).distinct.length === 1)
  }

  test("Q17: the integer-exact predicate equals the 0.2*avg predicate") {
    val li = graft.Tables.lineitem(spark, sf)
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
    val byPart = li.groupBy(_.getLong(0))
    val avg = byPart.map { case (k, rs) => k -> rs.map(_.getDouble(1)).sum / rs.length }
    val brandParts = graft.Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#11").select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val want = li.iterator
      .filter(r => brandParts(r.getLong(0)) && r.getDouble(1) < 0.2 * avg(r.getLong(0)))
      .map(r => BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
      .foldLeft(BigDecimal(0))(_ + _).toDouble / 7.0
    val got = CatalogTpch.q163TpchQ17(spark, sf).collect().head
    if (got.isNullAt(0)) assert(want === 0.0)
    else assert(math.abs(got.getDouble(0) - want) < 1e-6)
  }

  test("Q18: every reported order really exceeds the quantity threshold") {
    val out = CatalogTpch.q164TpchQ18(spark, sf)
    val check = out.join(graft.Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("sum_qty"))
      .agg(sum(col("l_quantity").cast("long")).as("re_qty"))
      .filter(col("sum_qty") =!= col("re_qty") || col("re_qty") <= 150)
    assert(check.count() === 0L)
  }

  test("Q4/Q12: late-line order counts conserve against a direct recompute") {
    val q4 = CatalogTpch.q167TpchQ4(spark, sf).collect()
    val direct = graft.Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-10-01"))
      .join(graft.Tables.lineitem(spark, sf),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select("o_orderkey").distinct().count()
    assert(q4.map(_.getLong(1)).sum === direct)
    val q12 = CatalogTpch.q173TpchQ12(spark, sf).collect()
    assert(q12.forall(r => r.getLong(1) >= 0 && r.getLong(2) >= 0))
  }

  test("Q21: every waiting supplier was the sole late supplier on a multi-supplier F order") {
    val out = CatalogTpch.q168TpchQ21(spark, sf).collect()
    if (out.nonEmpty) {
      // brute-force recompute at sf0.001
      val li = graft.Tables.lineitem(spark, sf)
        .select(col("l_orderkey"), col("l_suppkey"),
          unix_millis(col("l_shipdate").cast("timestamp")).as("ship_ms"))
        .collect()
      val ord = graft.Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"),
          unix_millis(col("o_orderdate").cast("timestamp")).as("ord_ms"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def late(shipMs: Long, ordMs: Long): Boolean =
        shipMs > ordMs + 60L * 86400000L
      val byOrder = li.filter(r => ord.contains(r.getLong(0))).groupBy(_.getLong(0))
      val waits = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((ok, rs) <- byOrder) {
        val supps = rs.map(_.getLong(1)).distinct
        val lateSupps = rs.filter(r => late(r.getLong(2), ord(ok))).map(_.getLong(1)).distinct
        if (supps.length >= 2 && lateSupps.length == 1)
          rs.filter(r => r.getLong(1) == lateSupps.head && late(r.getLong(2), ord(ok)))
            .foreach(_ => waits(lateSupps.head) += 1)
      }
      val names = graft.Tables.supplier(spark, sf)
        .select("s_suppkey", "s_name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = waits.map { case (k, v) => names(k) -> v }.toMap
      out.foreach(r => assert(want(r.getString(0)) === r.getLong(1)))
    }
  }

  test("Q2: each reported supplier holds the part's minimum balance") {
    val out = CatalogTpch.q170TpchQ2(spark, sf).collect()
    val byPart = out.groupBy(_.getLong(3))
    byPart.values.foreach { rs =>
      assert(rs.map(_.getDouble(0)).distinct.length === 1)
    }
  }

  test("Q11/Q16/Q22: output-side predicates hold") {
    val q11 = CatalogTpch.q171TpchQ11(spark, sf).collect()
    assert(q11.forall(_.getDouble(1) > 0))
    val q16 = CatalogTpch.q172TpchQ16(spark, sf).collect()
    assert(q16.nonEmpty)
    assert(q16.forall(r => r.getString(0) != "Brand#1" && r.getString(1) != "PROMO" &&
      Set(1L, 5L, 10L, 15L, 20L, 25L, 30L, 35L)(r.getLong(2))))
    val q22 = CatalogTpch.q166TpchQ22(spark, sf).collect()
    assert(q22.forall(r => Set(1L, 3L, 5L, 7L, 9L)(r.getLong(0)) && r.getLong(1) >= 1))
  }

  test("plan shapes: no cartesian product; BNLJ only as one-row scalar broadcasts") {
    val scalarBroadcast = Set("q162_tpch_q15", "q166_tpch_q22", "q171_tpch_q11")
    CatalogTpch.all.foreach { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name has a cartesian product")
      if (!scalarBroadcast(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name has a BNLJ")
    }
  }
}
