package graft.queries

/**
 * DuckDB oracle SQL for [[CatalogMore]]. The BFS oracle deliberately uses
 * the CLASSIC recursive-CTE form (all walks, min() over lengths) against
 * the engine's delta-frontier rewrite — the hash match proves the
 * level-order optimization preserves shortest distances; likewise the
 * join-size oracle states the Σ cntA·cntB identity in nested-subquery
 * form.
 */
object OraclesMore {

  val all: Map[String, String] = Map(
    "q175_bfs_hops" ->
      """WITH RECURSIVE
        |p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, sp AS dst FROM p
        |      UNION ALL SELECT sp, c FROM p),
        |seeds AS (SELECT s_suppkey * 2 + 1 AS id FROM supplier
        |          WHERE s_suppkey % 50 = 0),
        |bfs(id, hops) AS (
        |  SELECT id, CAST(0 AS BIGINT) FROM seeds
        |  UNION
        |  SELECT e.dst, bfs.hops + 1 FROM bfs JOIN e ON e.src = bfs.id
        |  WHERE bfs.hops < 6)
        |SELECT id, min(hops) AS hops FROM bfs
        |GROUP BY id
        |ORDER BY hops, id""".stripMargin,

    "q176_markov" ->
      """WITH seq AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        |      FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM t
        |ORDER BY from_type, to_type""".stripMargin,

    "q177_pareto" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS dt
        |  FROM documents),
        |b AS (SELECT n_chars, max(dt) AS bucket_max FROM d GROUP BY 1),
        |c AS (SELECT n_chars, bucket_max,
        |    max(bucket_max) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_smaller
        |  FROM b)
        |SELECT doc_id, d.n_chars, dt AS distinct_tokens
        |FROM d JOIN c USING (n_chars)
        |WHERE (best_smaller IS NULL OR best_smaller < dt) AND dt = bucket_max
        |ORDER BY n_chars, doc_id""".stripMargin,

    "q178_join_estimate" ->
      """SELECT 'customer_orders' AS join_name,
        |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) FROM
        |    (SELECT c_custkey AS k, count(*) AS ca FROM customer GROUP BY 1) a
        |    JOIN (SELECT o_custkey AS k, count(*) AS cb FROM orders GROUP BY 1) b
        |    USING (k)) AS predicted_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   JOIN orders ON c_custkey = o_custkey) AS actual_rows
        |UNION ALL
        |SELECT 'orders_lineitem',
        |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) FROM
        |    (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1) a
        |    JOIN (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) b
        |    USING (k)) AS predicted_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   JOIN lineitem ON o_orderkey = l_orderkey) AS actual_rows
        |ORDER BY join_name""".stripMargin)
}
