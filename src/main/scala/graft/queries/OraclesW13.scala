package graft.queries

/**
 * DuckDB oracles for the round-13 first wave. Mirror rules as ever:
 * identical md5 draws, integer arithmetic until stated divides, `//`
 * for Spark's `div` (all operands non-negative here), fixed-order
 * folds where doubles accumulate. q449 replays the bitset BFS as a
 * recursive CTE whose working table is the per-round mask frame —
 * bit_or/bit_count/shift semantics agree exactly on BIGINT.
 */
object OraclesW13 {

  private val amsSign =
    """CASE WHEN ('0x' || substr(md5('ams:' || CAST(j.j AS VARCHAR) ||
      |        ':' || CAST(fv.v AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
      |      THEN fv.f ELSE -fv.f END""".stripMargin

  val all: Map[String, String] = Map(

    "q448_ams_join_size" ->
      s"""WITH fa AS MATERIALIZED (
         |  SELECT user_id AS v, CAST(count(*) AS BIGINT) AS f
         |  FROM events GROUP BY 1),
         |fb AS MATERIALIZED (
         |  SELECT o_custkey AS v, CAST(count(*) AS BIGINT) AS f
         |  FROM orders GROUP BY 1),
         |js AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j),
         |sa AS MATERIALIZED (SELECT j, CAST(sum(sf) AS BIGINT) AS s_a FROM (
         |  SELECT j.j AS j, $amsSign AS sf FROM fa fv, js j) GROUP BY 1),
         |sb AS MATERIALIZED (SELECT j, CAST(sum(sf) AS BIGINT) AS s_b FROM (
         |  SELECT j.j AS j, $amsSign AS sf FROM fb fv, js j) GROUP BY 1),
         |ex AS (SELECT CAST(coalesce(sum(fa.f * fb.f), 0) AS BIGINT)
         |    AS join_exact
         |  FROM fa JOIN fb ON fa.v = fb.v)
         |SELECT sa.j, s_a, s_b, s_a * s_b AS est_join, join_exact,
         |  CAST(s_a * s_b AS DOUBLE) / CAST(join_exact AS DOUBLE) AS ratio
         |FROM sa JOIN sb ON sa.j = sb.j, ex ORDER BY sa.j""".stripMargin,

    "q449_multi_source_bfs" ->
      """WITH RECURSIVE und AS MATERIALIZED (
        |  SELECT u, v FROM (
        |    SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |  UNION ALL
        |  SELECT v, u FROM (
        |    SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)),
        |m(h, node, mask) AS (
        |  SELECT 0 AS h, node,
        |    CAST(1 AS BIGINT) << CAST(rn - 1 AS INT) AS mask
        |  FROM (
        |    SELECT node, row_number() OVER (
        |        ORDER BY md5('bfs:' || CAST(node AS VARCHAR)), node) AS rn
        |    FROM (SELECT DISTINCT u AS node FROM und))
        |  WHERE rn <= 63
        |  UNION ALL
        |  SELECT h + 1 AS h, node, bit_or(mask) AS mask FROM (
        |    SELECT m.h AS h, und.u AS node, m.mask AS mask
        |    FROM m JOIN und ON m.node = und.v
        |    UNION ALL
        |    SELECT h, node, mask FROM m
        |  ) WHERE h < 8
        |  GROUP BY h, node
        |)
        |SELECT CAST(h AS BIGINT) AS h,
        |  CAST(count(*) AS BIGINT) AS nodes_reached,
        |  CAST(sum(bit_count(mask)) AS BIGINT) AS pairs_reached
        |FROM m GROUP BY h ORDER BY h""".stripMargin)
}
