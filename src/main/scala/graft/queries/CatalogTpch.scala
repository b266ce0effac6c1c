package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * The TPC-H completion wave: the remaining classics beyond q01/q151-q153
 * (Q1/Q3/Q5/Q10), adapted where the reduced testdata schema lacks a column
 * (no partsupp table, no commit/receipt dates, no phone/container/shipmode).
 * Every adaptation keeps the query's SHAPE — the correlated subquery, the
 * EXISTS/NOT-EXISTS pair, the conditional aggregate — and swaps only the
 * predicate columns. Numeric discipline follows q151-q153: money sums pass
 * through DECIMAL(25,6) and surface as DOUBLE; quantity sums are integral
 * doubles (exact in any order); ratio outputs divide two exact values with
 * identical parenthesization in both engines.
 *
 * Scale notes: every dimension join is broadcast; the only shuffles are the
 * group-bys on lineitem/orders keys; the correlated-subquery classics
 * (Q2/Q15/Q17) are re-expressed as aggregate-then-join (part/supplier-sized
 * broadcast sides), never row-at-a-time subquery execution.
 */
object CatalogTpch {

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(25, 6))).cast("double")
  /** Decimal sum kept as decimal — for exact equality joins (Q15). */
  private def dsumDec(c: Column): Column = sum(c.cast(DecimalType(25, 6)))
  private def revenue: Column =
    col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** TPC-H Q6 (forecast-revenue change): the pure scan-and-sum — one year
    * of shipments, a discount band, small quantities; no join at all. The
    * plan is a single Scan → Filter → partial/final HashAggregate. */
  def q157TpchQ6(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01") &&
        col("l_discount") >= lit(0.05) && col("l_discount") <= lit(0.07) &&
        col("l_quantity") < lit(24))
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** TPC-H Q7 (volume shipping): bi-directional nation pair over two
    * ship years — supplier nation vs customer nation with the OR'd pair
    * predicate, grouped by both nations and the ship year. */
  def q158TpchQ7(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.nation(s, dir).select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir).select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") <= lit("1997-12-31"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(dsum(revenue).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 (national market share): NATION_3's share of AMERICA's
    * ECONOMY-part import volume per order year — the conditional-sum /
    * total-sum ratio with both sums decimal-stabilized. */
  def q159TpchQ8(s: SparkSession, dir: String): DataFrame = {
    val nCust = Tables.nation(s, dir).select(col("n_nationkey").as("c_nk"),
      col("n_regionkey").as("c_rk"))
    val nSupp = Tables.nation(s, dir).select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val amer = Tables.region(s, dir).filter(col("r_name") === "AMERICA")
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") <= lit("1997-12-31")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
      .join(broadcast(amer), col("c_rk") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((dsum(when(col("supp_nation") === "NATION_3", revenue).otherwise(lit(0))) /
        dsum(revenue)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 (product-type profit, adapted: no ps_supplycost → profit is
    * gross revenue): per supplier-nation per order-year over parts whose
    * name contains "red". */
  def q169TpchQ9(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").contains("red"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(dsum(revenue).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** TPC-H Q13 (customer order-count distribution): the left-outer +
    * double-aggregate — count orders per customer (0 for never-ordered),
    * then the histogram of those counts. */
  def q160TpchQ13(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q14 (promo revenue share): 100 * promo revenue / total revenue
    * for one ship month — both sums decimal-exact, the ratio one double
    * multiply and divide in fixed order. */
  def q161TpchQ14(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-03-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .agg(((lit(100.0) * dsum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0)))) /
        dsum(revenue)).as("promo_revenue"))

  /** TPC-H Q15 (top supplier): quarter revenue per supplier, then the
    * supplier(s) whose revenue equals the maximum — the classic
    * view-plus-scalar-subquery, re-expressed as an aggregate joined to its
    * own one-row max (exact DECIMAL equality, no double compare). */
  def q162TpchQ15(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(dsumDec(revenue).as("rev_dec"))
    val top = rev.agg(max(col("rev_dec")).as("max_rev"))
    rev.crossJoin(broadcast(graft.ops.Guards.scalar(top)))
      .filter(col("rev_dec") === col("max_rev"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("rev_dec").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q16 (supplier-count per part class, adapted: the part-supplier
    * relation comes from shipped lineitems, the complaints exclusion from
    * negative supplier balances): distinct suppliers per (brand, type,
    * size) over the selective size IN-list. */
  def q172TpchQ16(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir).filter(col("s_acctbal") >= 0)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("s_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    * below 20% of the part's average quantity. The correlated AVG is
    * re-expressed integer-exact: qty < 0.2*(sum/cnt) ⟺ 5*qty*cnt < sum
    * (quantities are integral), killing the float-division compare; the
    * per-part aggregate broadcasts. */
  def q163TpchQ17(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_sum"),
        count(lit(1)).as("qty_cnt"))
    li.join(broadcast(Tables.part(s, dir).filter(col("p_brand") === "Brand#11")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(perPart), col("l_partkey") === col("pk"))
      .filter(lit(5) * col("l_quantity").cast("long") * col("qty_cnt") < col("qty_sum"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * exceeds 150, with customer detail — the IN-aggregate rewritten as a
    * semi-joined aggregate; quantity sums are integral-exact. */
  def q164TpchQ18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey").as("big_ok"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 150)
    Tables.orders(s, dir)
      .join(big, col("o_orderkey") === col("big_ok"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 (discounted revenue, adapted OR-triples: brand × size-band
    * × quantity-band replace brand × container × quantity): the disjunctive
    * pushdown classic — one broadcast join, three OR'd predicate triples. */
  def q165TpchQ19(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30)))
      .agg(dsum(revenue).as("revenue"))

  /** TPC-H Q4 (order-priority checking, adapted: "received late" →
    * "shipped more than 30 days after ordering"): orders in a quarter with
    * at least one late line, counted per priority — the EXISTS classic as
    * a left-semi join with a non-equi condition. */
  def q167TpchQ4(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-10-01"))
    o.join(Tables.lineitem(s, dir),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q12 (shipmode priority mix, adapted: return-flag classes
    * replace ship modes): for late lines in 1996, count urgent/high vs
    * other order priorities per class — the two-branch conditional agg. */
  def q173TpchQ12(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS") &&
        col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1997-01-01"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
          col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
          col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))

  /** TPC-H Q21 (suppliers who kept orders waiting, adapted late =
    * shipped >60 days after ordering): the EXISTS / NOT-EXISTS pair
    * re-expressed as one per-order aggregate — multi-supplier orders where
    * exactly one supplier was late, counted per lineitem of that supplier.
    * One shuffle on orderkey instead of two correlated subquery scans. */
  def q168TpchQ21(s: SparkSession, dir: String): DataFrame = {
    val lo = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val perOrder = lo.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supps"))
    lo.join(perOrder, col("l_orderkey") === col("ok"))
      .filter(col("late") && col("n_supps") >= 2 && col("n_late_supps") === 1)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q22 (global sales opportunity, adapted: nation keys replace
    * phone country codes, and "never ordered" → "no orders since 1999" —
    * this data has every customer ordering at least once): customers from
    * an odd-key nation set with above-average positive balances and no
    * recent orders — scalar-subquery threshold + anti join, grouped by
    * country code. */
  def q166TpchQ22(s: SparkSession, dir: String): DataFrame = {
    val keys = Seq(1, 3, 5, 7, 9)
    val cust = Tables.customer(s, dir).filter(col("c_nationkey").isin(keys: _*))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal")) / count(lit(1)).cast("double")).as("avg_bal"))
    cust.crossJoin(broadcast(graft.ops.Guards.scalar(avgBal)))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, dir).filter(col("o_orderdate") >= lit("1999-01-01")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** TPC-H Q2 (minimum-cost supplier, adapted: min account balance
    * replaces min supply cost, shipped-the-part replaces partsupp): for
    * EUROPE suppliers of LARGE size-15 parts, the per-part minimum-balance
    * supplier — correlated MIN as an aggregate joined back on (part, min). */
  def q170TpchQ2(s: SparkSession, dir: String): DataFrame = {
    val europe = broadcast(Tables.nation(s, dir)
      .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey")))
    val ps = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(broadcast(Tables.part(s, dir)
          .filter(col("p_size") === 15 && col("p_type") === "LARGE")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(europe, col("s_nationkey") === col("n_nationkey"))
    val minBal = ps.groupBy(col("p_partkey").as("mpk"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    ps.join(broadcast(minBal),
        col("p_partkey") === col("mpk") && col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q11 (important stock, adapted: shipped value per part from
    * ASIA-nation suppliers replaces partsupp stock value): parts whose
    * accumulated value exceeds 1/10000 of the total — the scalar-subquery
    * HAVING, both sides exact decimals cast to double for the one compare. */
  def q171TpchQ11(s: SparkSession, dir: String): DataFrame = {
    val asia = broadcast(Tables.nation(s, dir).filter(col("n_regionkey") === 2))
    val pv = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(asia, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(dsumDec(col("l_extendedprice")).as("val_dec"))
    val total = pv.agg(sum(col("val_dec")).as("total_dec"))
    pv.crossJoin(broadcast(graft.ops.Guards.scalar(total)))
      .filter(col("val_dec").cast("double") > col("total_dec").cast("double") / lit(10000.0))
      .select(col("p_partkey"), col("val_dec").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  /** TPC-H Q20 (potential part promotion, adapted: no partsupp/availqty →
    * "supplier shipped more than half its lifetime quantity of a red part
    * during 1996"): the nested IN-IN-with-correlated-HAVING classic as one
    * per-(part, supplier) aggregate + semi join; the half compare is
    * integer-exact (2·qty_1996 > qty_life, quantities integral). */
  def q174TpchQ20(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val promo = li
      .join(broadcast(Tables.part(s, dir).filter(col("p_name").startsWith("red"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey").as("sk"))
      .agg(sum(col("l_quantity").cast("long")).as("qty_life"),
        sum(when(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"),
          col("l_quantity").cast("long")).otherwise(0L)).as("qty_96"))
      .filter(lit(2) * col("qty_96") > col("qty_life"))
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_1")),
        col("s_nationkey") === col("n_nationkey"))
      .join(promo.select(col("sk")).distinct(),
        col("s_suppkey") === col("sk"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q157_tpch_q6"  -> q157TpchQ6 _,
    "q158_tpch_q7"  -> q158TpchQ7 _,
    "q159_tpch_q8"  -> q159TpchQ8 _,
    "q160_tpch_q13" -> q160TpchQ13 _,
    "q161_tpch_q14" -> q161TpchQ14 _,
    "q162_tpch_q15" -> q162TpchQ15 _,
    "q163_tpch_q17" -> q163TpchQ17 _,
    "q164_tpch_q18" -> q164TpchQ18 _,
    "q165_tpch_q19" -> q165TpchQ19 _,
    "q166_tpch_q22" -> q166TpchQ22 _,
    "q167_tpch_q4"  -> q167TpchQ4 _,
    "q168_tpch_q21" -> q168TpchQ21 _,
    "q169_tpch_q9"  -> q169TpchQ9 _,
    "q170_tpch_q2"  -> q170TpchQ2 _,
    "q171_tpch_q11" -> q171TpchQ11 _,
    "q172_tpch_q16" -> q172TpchQ16 _,
    "q173_tpch_q12" -> q173TpchQ12 _,
    "q174_tpch_q20" -> q174TpchQ20 _)
}
