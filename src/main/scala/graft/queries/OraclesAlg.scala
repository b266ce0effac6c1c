package graft.queries

/**
 * DuckDB oracle SQL for the round-10c named-algorithms wave
 * ([[CatalogAlg]]). WL refinement unrolled round by round, the
 * distinct-substring identity via a per-doc window suffix sort + the
 * same two-tier LCP probe, AMS F2 by the identical md5 parity signs,
 * the double-BFS sweep as two recursive CTEs, and HRW sharding by the
 * identical per-doc window argmax. MATERIALIZED on every loop-carried or
 * reused CTE (the graft-oracle-determinism rule).
 */
object OraclesAlg {

  private[queries] val partEdgesSql =
    """pp AS MATERIALIZED (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |e0 AS MATERIALIZED (SELECT a.pk AS x, b.pk AS y
      |  FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2 HAVING count(*) >= 2)""".stripMargin

  /** One WL round: sorted neighbor colors, then the hash. */
  private def wlRound(k: Int): String =
    s"""n$k AS (SELECT nbr.a, string_agg(c${k - 1}.c, ',' ORDER BY c${k - 1}.c) AS ns
       |  FROM nbr JOIN c${k - 1} ON c${k - 1}.a = nbr.b GROUP BY nbr.a),
       |c$k AS MATERIALIZED (SELECT c${k - 1}.a,
       |    substr(md5(c${k - 1}.c || '|' || n$k.ns), 1, 16) AS c
       |  FROM c${k - 1} JOIN n$k ON n$k.a = c${k - 1}.a)""".stripMargin

  val all: Map[String, String] = Map(

    "q410_wl_refinement" ->
      s"""WITH $partEdgesSql,
         |nbr AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |  UNION ALL SELECT y, x FROM e0),
         |c0 AS MATERIALIZED (SELECT a, CAST(count(*) AS VARCHAR) AS c
         |  FROM nbr GROUP BY a),
         |${(1 to 3).map(wlRound).mkString(",\n")}
         |SELECT c AS color, CAST(count(*) AS BIGINT) AS n_nodes
         |FROM c3 GROUP BY 1 ORDER BY n_nodes DESC, color""".stripMargin,

    // Round-12 reformulation, forced by a real resource wall: the
    // original oracle ranked tab-appended suffixes with row_number,
    // self-joined rank-adjacent rows, and MATERIALIZED three stages each
    // carrying two ~suffix-length strings per suffix — at the ×10 corpus
    // (19.7M suffixes, 4.8G chars) DuckDB spilled >90 GB of sort/join
    // temp and exhausted the host disk, with or without the hints. Same
    // mathematical definition, cheaper plan: rank-adjacency IS lead()
    // over the sorted frame (no self-join), and the tab sentinel is
    // unnecessary for ADJACENCY — within a doc all suffixes are
    // distinct, and plain string comparison already orders a prefix
    // before its extensions, so tab-less order equals the sentinel
    // order with the pure-sentinel row (old rank 1) dropped. The last
    // suffix leads to '' (lcp 0), exactly the old left-join NULL → ''.
    // lmin caps at 1024 to mirror the engine's LcpMax contract (inert:
    // the engine require()s every doc < 1024 chars). Strings are
    // dropped in `l`'s projection, so only the one suffix sort pays.
    "q411_distinct_substrings" ->
      """WITH s0 AS MATERIALIZED (SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS p
        |  FROM documents),
        |sf AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
        |    substring(text, CAST(p AS INT)) AS hd
        |  FROM s0),
        |pr AS (SELECT doc_id, n, hd AS ha,
        |    coalesce(lead(hd) OVER (PARTITION BY doc_id ORDER BY hd), '') AS hb,
        |    least(length(hd),
        |      coalesce(length(lead(hd) OVER (PARTITION BY doc_id ORDER BY hd)), 0),
        |      1024) AS lmin
        |  FROM sf),
        |bj AS (SELECT *,
        |    (SELECT coalesce(max(gs.j), 0)
        |      FROM generate_series(32, 1024, 32) AS gs(j)
        |      WHERE gs.j <= lmin
        |        AND substring(ha, 1, CAST(gs.j AS INT)) =
        |            substring(hb, 1, CAST(gs.j AS INT))) AS bjv
        |  FROM pr),
        |l AS (SELECT doc_id, n,
        |    CAST(coalesce((SELECT max(bjv + gs.d)
        |      FROM generate_series(1, 31) AS gs(d)
        |      WHERE bjv + gs.d <= lmin
        |        AND substring(ha, 1, CAST(bjv + gs.d AS INT)) =
        |            substring(hb, 1, CAST(bjv + gs.d AS INT))), bjv)
        |      AS BIGINT) AS lcp
        |  FROM bj)
        |SELECT doc_id, n AS n_chars,
        |  n * (n + 1) // 2 AS n_substr_total,
        |  CAST(n * (n + 1) // 2 - sum(lcp) AS BIGINT) AS n_distinct,
        |  1.0 - CAST(n * (n + 1) // 2 - sum(lcp) AS DOUBLE)
        |    / CAST(n * (n + 1) // 2 AS DOUBLE) AS repeat_ratio
        |FROM l GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,

    "q412_ams_f2" ->
      """WITH tok AS MATERIALIZED (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |counts AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1),
        |seeded AS (SELECT CAST(g.s AS BIGINT) AS seed, cnt,
        |    CASE WHEN ('0x' || substr(md5(CAST(g.s AS VARCHAR) || ':' || tok),
        |      1, 2))::BIGINT % 2 = 0 THEN 1 ELSE -1 END AS sgn
        |  FROM counts CROSS JOIN generate_series(0, 7) AS g(s)),
        |ests AS MATERIALIZED (SELECT seed,
        |    CAST(sum(sgn * cnt) AS BIGINT) AS s_sum
        |  FROM seeded GROUP BY 1),
        |e2 AS MATERIALIZED (SELECT seed, s_sum, s_sum * s_sum AS est FROM ests),
        |f2 AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS f2_exact FROM counts),
        |med AS (SELECT CAST(sum(est) AS DOUBLE) / 2.0 AS est_median FROM (
        |  SELECT est, row_number() OVER (ORDER BY est) AS rn FROM e2)
        |  WHERE rn IN (4, 5))
        |SELECT seed, s_sum, est, f2_exact, est_median
        |FROM e2 CROSS JOIN f2 CROSS JOIN med ORDER BY seed""".stripMargin,

    "q413_diameter" ->
      s"""WITH RECURSIVE $partEdgesSql,
         |e AS MATERIALIZED (SELECT x AS src, y AS dst FROM e0
         |  UNION ALL SELECT y, x FROM e0),
         |s0 AS (SELECT min(src) AS id FROM e),
         |b1(id, hops) AS (SELECT id, CAST(0 AS BIGINT) FROM s0
         |  UNION SELECT e.dst, b1.hops + 1 FROM b1 JOIN e ON e.src = b1.id
         |  WHERE b1.hops < 16),
         |d1 AS MATERIALIZED (SELECT id, min(hops) AS hops FROM b1 GROUP BY 1),
         |u AS (SELECT id, hops FROM d1 ORDER BY hops DESC, id LIMIT 1),
         |b2(id, hops) AS (SELECT id, CAST(0 AS BIGINT) FROM u
         |  UNION SELECT e.dst, b2.hops + 1 FROM b2 JOIN e ON e.src = b2.id
         |  WHERE b2.hops < 16),
         |d2 AS MATERIALIZED (SELECT id, min(hops) AS hops FROM b2 GROUP BY 1),
         |far AS (SELECT id, hops FROM d2 ORDER BY hops DESC, id LIMIT 1)
         |SELECT s0.id AS seed, u.id AS sweep1_far, u.hops AS sweep1_ecc,
         |  far.id AS sweep2_far, far.hops AS diameter_lb,
         |  (SELECT CAST(count(*) AS BIGINT) FROM d2) AS n_reached
         |FROM s0 CROSS JOIN u CROSS JOIN far""".stripMargin,

    "q414_hrw_shards" ->
      """WITH docs AS (SELECT doc_id FROM documents),
        |nodesl AS (SELECT 'node' || CAST(g.i AS VARCHAR) AS node
        |  FROM generate_series(0, 7) AS g(i)),
        |w AS MATERIALIZED (SELECT d.doc_id, n.node,
        |    ('0x' || substr(md5(n.node || '#' || CAST(d.doc_id AS VARCHAR)),
        |      1, 10))::BIGINT AS wt
        |  FROM docs d CROSS JOIN nodesl n),
        |bf AS MATERIALIZED (SELECT doc_id, node FROM (
        |  SELECT doc_id, node, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY wt DESC, node ASC) AS rn FROM w) WHERE rn = 1),
        |af AS MATERIALIZED (SELECT doc_id, node FROM (
        |  SELECT doc_id, node, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY wt DESC, node ASC) AS rn FROM w WHERE node <> 'node0')
        |  WHERE rn = 1),
        |nb AS (SELECT node, CAST(count(*) AS BIGINT) AS n_before
        |  FROM bf GROUP BY 1),
        |na AS (SELECT node, CAST(count(*) AS BIGINT) AS n_after
        |  FROM af GROUP BY 1),
        |mv AS (SELECT af.node, CAST(count(*) AS BIGINT) AS n_gained
        |  FROM bf JOIN af ON af.doc_id = bf.doc_id AND af.node <> bf.node
        |  GROUP BY 1)
        |SELECT n.node, coalesce(nb.n_before, CAST(0 AS BIGINT)) AS n_before,
        |  coalesce(na.n_after, CAST(0 AS BIGINT)) AS n_after,
        |  coalesce(mv.n_gained, CAST(0 AS BIGINT)) AS n_gained
        |FROM nodesl n LEFT JOIN nb ON nb.node = n.node
        |LEFT JOIN na ON na.node = n.node
        |LEFT JOIN mv ON mv.node = n.node
        |ORDER BY n.node""".stripMargin)
}
