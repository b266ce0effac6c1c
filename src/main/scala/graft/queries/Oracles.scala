package graft.queries

/**
 * DuckDB oracle SQL for every SQL-expressible entry in the catalog.
 * Table names are the bare parquet table names (the driver registers
 * region/nation/customer/supplier/part/orders/lineitem/events/documents/
 * embeddings over the same sf directory Verify ran on).
 *
 * Column names and value derivations mirror the Spark side exactly — see
 * Catalog's determinism rules (decimal-stabilized double sums, string-
 * formatted timestamps, BIGINT casts for DuckDB's HUGEINT sums).
 */
object Oracles {

  /** Shared SQL fragment: the synthesized order-event base (OrderSynth mapping). */
  private val synthOrders: String =
    """SELECT
      |  'BX' || lpad(CAST(o_orderkey AS VARCHAR), 7, '0')        AS order_number,
      |  o_totalprice                                             AS order_total,
      |  CAST(o_custkey % 30 AS INT)                              AS ship_to_city_id,
      |  CAST(o_custkey AS INT)                                   AS customer_id,
      |  o_orderpriority                                          AS ship_method,
      |  CAST(o_orderkey % 50 AS DOUBLE)                          AS discount_applied,
      |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')               AS order_date,
      |  o_orderkey
      |FROM orders
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)""".stripMargin

  private val curated: String =
    s"""SELECT
       |  order_number,
       |  order_total - (discount_applied / 100) * order_total    AS discounted_total,
       |  order_number || '-' || substr(order_date, 1, 10)        AS data_key,
       |  ship_to_city_id,
       |  order_date,
       |  ship_method,
       |  CASE WHEN substr(order_number, 6, 1) = '3'
       |       THEN 'Bexley' ELSE 'Merchant' END                  AS fufilment_type
       |FROM ($synthOrders)""".stripMargin

  val all: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    // json_extract_string (not a regex) so the oracle tracks from_json's
    // semantics for any props shape — extra fields, negatives, digit-bearing
    // keys (ADVICE round 1).
    "q02_json_decode_agg" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q03_curated_orders" -> curated,

    "q04_line_items" ->
      """SELECT
        |  CAST(o_custkey AS INT)                              AS customer_id,
        |  'BX' || lpad(CAST(o_orderkey AS VARCHAR), 7, '0')   AS order_number,
        |  CAST(l_partkey AS INT)                              AS product_id,
        |  CAST(l_quantity AS INT)                             AS order_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin,

    "q05_enriched" ->
      s"""SELECT c.*, n.n_name AS city
         |FROM ($curated) c
         |LEFT JOIN nation n ON c.ship_to_city_id = n.n_nationkey""".stripMargin,

    "q06_window_tumbling" ->
      """SELECT
        |  strftime(time_bucket(INTERVAL '2 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
        |  strftime(time_bucket(INTERVAL '2 minutes', ts) + INTERVAL '2 minutes', '%Y-%m-%d %H:%M:%S') AS window_end,
        |  event_type,
        |  count(event_type) AS total_orders
        |FROM events
        |GROUP BY 1, 2, 3""".stripMargin,

    "q07_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS net_price
        |FROM lineitem
        |WHERE l_quantity >= 30 AND l_discount > 0.02""".stripMargin,

    "q08_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "q10_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)""".stripMargin,

    "q11_set_ops" ->
      """SELECT k, 'both' AS tag FROM
        |  (SELECT DISTINCT o_custkey AS k FROM orders
        |   INTERSECT
        |   SELECT DISTINCT c_custkey AS k FROM customer)
        |UNION ALL
        |SELECT k, 'customer_only' AS tag FROM
        |  (SELECT DISTINCT c_custkey AS k FROM customer
        |   EXCEPT
        |   SELECT DISTINCT o_custkey AS k FROM orders)""".stripMargin,

    "q12_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q13_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_supps,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // q14's oracle is a tolerance LAW, not a mirror: Spark's HLL++ estimate
    // is engine-specific, but it is a deterministic order-independent
    // function of the data, so the 4*rsd-of-exact bound is a constant — the
    // oracle recomputes the exact count and asserts the bound holds (TRUE).
    "q14_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q15_string_funcs" ->
      """SELECT c_custkey,
        |  c_mktsegment || '-' || CAST(c_custkey AS VARCHAR) AS seg_key,
        |  substr(c_name, 1, 8) AS name_prefix,
        |  upper(c_mktsegment) AS seg_upper,
        |  lower(c_name) AS name_lower,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
        |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
        |  CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer""".stripMargin,

    "q16_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY y, q""".stripMargin,

    "q17_case_when_arith" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice >= 200000 THEN 'large'
        |       WHEN o_totalprice >= 50000 THEN 'medium'
        |       ELSE 'small' END AS size_band,
        |  CAST(CAST(o_totalprice - (o_totalprice / 100) * 2 AS DECIMAL(18,4)) AS DOUBLE) AS after_fee
        |FROM orders""".stripMargin,

    "q18_analytic_windows" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(row_number() OVER w AS BIGINT) AS order_seq,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(25,6))) OVER w AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q19_multi_join_agg" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q20_full_outer" ->
      """SELECT
        |  CAST(coalesce(n.n_nationkey, s.k2) AS BIGINT) AS nationkey,
        |  n.n_name,
        |  coalesce(s.n_supp, 0) AS n_supp
        |FROM nation n
        |FULL OUTER JOIN (SELECT s_nationkey AS k2, count(*) AS n_supp
        |                 FROM supplier GROUP BY s_nationkey) s
        |  ON n.n_nationkey = s.k2""".stripMargin
  )
}
