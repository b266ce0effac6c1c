package graft.queries

/**
 * DuckDB oracle SQL for [[CatalogTpch]] — the TPC-H completion wave.
 * Same determinism rules as [[Oracles]]: money sums via DECIMAL(25,6) cast
 * to DOUBLE, quantity sums as BIGINT, ratios dividing two exact values with
 * the engine-side parenthesization, years as BIGINT. Where the engine
 * re-expresses a correlated subquery as an aggregate-join (Q2/Q15/Q17/Q21),
 * the oracle keeps the CLASSIC subquery form — the hash match then proves
 * the rewrite's equivalence, not just the arithmetic.
 */
object OraclesTpch {

  private val dsum =
    (e: String) => s"CAST(sum(CAST($e AS DECIMAL(25,6))) AS DOUBLE)"
  private val rev = "l_extendedprice * (1 - l_discount)"

  val all: Map[String, String] = Map(
    "q157_tpch_q6" ->
      s"""SELECT ${dsum("l_extendedprice * l_discount")} AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q158_tpch_q7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  EXTRACT(year FROM l_shipdate) AS l_year,
        |  ${dsum(rev)} AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <= TIMESTAMP '1997-12-31'
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,

    "q159_tpch_q8" ->
      s"""SELECT EXTRACT(year FROM o_orderdate) AS o_year,
        |  ${dsum(s"CASE WHEN n1.n_name = 'NATION_3' THEN $rev ELSE 0 END")}
        |    / ${dsum(rev)} AS mkt_share
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |JOIN region ON n2.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <= TIMESTAMP '1997-12-31'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q160_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q161_tpch_q14" ->
      s"""SELECT CAST(100 AS DOUBLE)
        |    * ${dsum(s"CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END")}
        |    / ${dsum(rev)} AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,

    "q162_tpch_q15" ->
      s"""WITH revenue AS (
        |  SELECT l_suppkey, sum(CAST($rev AS DECIMAL(25,6))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM revenue JOIN supplier ON s_suppkey = l_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q163_tpch_q17" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE)
        |    / CAST(7 AS DOUBLE) AS avg_yearly
        |FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
        |WHERE p_brand = 'Brand#11'
        |  AND 5 * CAST(l1.l_quantity AS BIGINT)
        |        * (SELECT count(*) FROM lineitem l2
        |           WHERE l2.l_partkey = l1.l_partkey)
        |      < (SELECT CAST(sum(CAST(l2.l_quantity AS BIGINT)) AS BIGINT)
        |         FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin,

    "q164_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |HAVING sum(CAST(l_quantity AS BIGINT)) > 150
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q165_tpch_q19" ->
      s"""SELECT ${dsum(rev)} AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q166_tpch_q22" ->
      s"""SELECT CAST(c_nationkey AS BIGINT) AS cntrycode,
        |  count(*) AS numcust, ${dsum("c_acctbal")} AS totacctbal
        |FROM customer
        |WHERE c_nationkey IN (1, 3, 5, 7, 9)
        |  AND c_acctbal > (
        |    SELECT ${dsum("c_acctbal")} / CAST(count(*) AS DOUBLE)
        |    FROM customer
        |    WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY cntrycode""".stripMargin,

    "q167_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q168_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,

    "q169_tpch_q9" ->
      s"""SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
        |  ${dsum(rev)} AS sum_profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q170_tpch_q2" ->
      """WITH ps AS (
        |  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM ps p1
        |WHERE s_acctbal = (SELECT min(s_acctbal) FROM ps p2
        |                   WHERE p2.p_partkey = p1.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin,

    "q171_tpch_q11" ->
      """WITH pv AS (
        |  SELECT l_partkey AS p_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS val_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 2
        |  GROUP BY l_partkey)
        |SELECT p_partkey, CAST(val_dec AS DOUBLE) AS value
        |FROM pv
        |WHERE CAST(val_dec AS DOUBLE) >
        |  CAST((SELECT sum(val_dec) FROM pv) AS DOUBLE) / CAST(10000 AS DOUBLE)
        |ORDER BY value DESC, p_partkey""".stripMargin,

    "q172_tpch_q16" ->
      """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        |  count(DISTINCT s_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND s_acctbal >= 0
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q173_tpch_q12" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |      OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |      AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // Engine is aggregate + semi join; the oracle keeps the classic
    // nested IN / correlated-HAVING form — the match proves the rewrite.
    "q174_tpch_q20" ->
      """SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_1'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |    GROUP BY l_partkey, l_suppkey
        |    HAVING 2 * sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
        |        AND l_shipdate < TIMESTAMP '1997-01-01'
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
        |      > sum(CAST(l_quantity AS BIGINT)))
        |ORDER BY s_name""".stripMargin)
}
