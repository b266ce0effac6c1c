package graft.queries

/**
 * DuckDB oracle SQL for the round-12 graph-extensions wave
 * ([[CatalogGx]]). q437/q438/q440/q441 are round-by-round replays with
 * the identical md5 priorities/weights, MATERIALIZED on every
 * loop-carried CTE (the graft-oracle-determinism rule); q439 is a
 * direct wedge aggregate. Extra no-op rounds past convergence are free
 * in both engines (they operate on empty frames), so the fixed unroll
 * counts match the engine caps exactly.
 */
object OraclesGx {

  /** One densest-subgraph peel round: record (n, m) of the live
    * subgraph, keep nodes with deg·n > 4m (exact cross-multiply). */
  private def peelRound(r: Int): String =
    s"""lv$r AS (SELECT n FROM st${r - 1} WHERE kind = 'n'),
       |le$r AS MATERIALIZED (SELECT e0.x, e0.y FROM e0
       |  JOIN lv$r a ON a.n = e0.x JOIN lv$r b ON b.n = e0.y),
       |dg$r AS (SELECT a, count(*) AS d FROM (
       |  SELECT x AS a FROM le$r UNION ALL SELECT y FROM le$r) GROUP BY a),
       |tt$r AS (SELECT (SELECT count(*) FROM lv$r) AS nn,
       |  (SELECT count(*) FROM le$r) AS mm),
       |st$r AS MATERIALIZED (
       |  SELECT kind, n, rnd, nn, mm FROM st${r - 1} WHERE kind = 's'
       |  UNION ALL
       |  SELECT 's', CAST(0 AS BIGINT), CAST($r AS BIGINT), nn, mm
       |  FROM tt$r WHERE nn > 0
       |  UNION ALL
       |  SELECT 'n', dg$r.a, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT)
       |  FROM dg$r, tt$r WHERE dg$r.d * tt$r.nn > 4 * tt$r.mm)""".stripMargin

  /** One local-dominance matching round: mutual-minimum live edges
    * match; both endpoints' edges die. Generic over the st0 edge frame —
    * shared with the q442 linkage-assignment oracle ([[OraclesRx]]). */
  private[queries] def matchRound(r: Int): String =
    s"""ee$r AS (SELECT x, y, wt FROM st${r - 1} WHERE kind = 'e'),
       |mn$r AS (SELECT a, min(wt) AS mw FROM (
       |  SELECT x AS a, wt FROM ee$r UNION ALL SELECT y, wt FROM ee$r)
       |  GROUP BY a),
       |mt$r AS MATERIALIZED (SELECT e.x, e.y, e.wt FROM ee$r e
       |  JOIN mn$r ax ON ax.a = e.x JOIN mn$r ay ON ay.a = e.y
       |  WHERE e.wt = ax.mw AND e.wt = ay.mw),
       |mv$r AS MATERIALIZED (SELECT x AS n FROM mt$r
       |  UNION ALL SELECT y FROM mt$r),
       |st$r AS MATERIALIZED (
       |  SELECT kind, x, y, wt, rnd FROM st${r - 1} WHERE kind = 'm'
       |  UNION ALL
       |  SELECT 'm', x, y, wt, CAST($r AS BIGINT) FROM mt$r
       |  UNION ALL
       |  SELECT 'e', e.x, e.y, e.wt, CAST(0 AS BIGINT) FROM ee$r e
       |  WHERE e.x NOT IN (SELECT n FROM mv$r)
       |    AND e.y NOT IN (SELECT n FROM mv$r))""".stripMargin

  /** One Jones–Plassmann round: local-priority-max uncolored nodes
    * take the mex of their colored neighborhood (bounded
    * generate_series(0, k) anti-join — mex ≤ k by pigeonhole). */
  private def jpRound(r: Int): String =
    s"""un$r AS (SELECT a, pr FROM st${r - 1} WHERE color = -1),
       |mx$r AS (SELECT n.a, max(u.pr) AS mp FROM nbr n
       |  JOIN un$r u ON u.a = n.b GROUP BY n.a),
       |cd$r AS MATERIALIZED (SELECT u.a FROM un$r u
       |  LEFT JOIN mx$r m ON m.a = u.a
       |  WHERE m.mp IS NULL OR u.pr > m.mp),
       |us$r AS MATERIALIZED (SELECT DISTINCT n.a, s.color AS c
       |  FROM nbr n JOIN st${r - 1} s ON s.a = n.b AND s.color >= 0
       |  JOIN cd$r d ON d.a = n.a),
       |nu$r AS (SELECT a, count(*) AS k FROM us$r GROUP BY a),
       |gx$r AS (SELECT a, unnest(generate_series(CAST(0 AS BIGINT), k)) AS c
       |  FROM nu$r),
       |mex$r AS (SELECT g.a, min(g.c) AS mc FROM gx$r g
       |  WHERE NOT EXISTS (SELECT 1 FROM us$r u
       |    WHERE u.a = g.a AND u.c = g.c)
       |  GROUP BY g.a),
       |cl$r AS MATERIALIZED (SELECT cd.a, coalesce(mex$r.mc, CAST(0 AS BIGINT))
       |    AS color
       |  FROM cd$r cd LEFT JOIN mex$r ON mex$r.a = cd.a),
       |st$r AS MATERIALIZED (SELECT s.a, s.pr,
       |    coalesce(cl$r.color, s.color) AS color
       |  FROM st${r - 1} s LEFT JOIN cl$r ON cl$r.a = s.a)""".stripMargin

  /** One deterministic walk step: the neighbor minimizing the per-step
    * md5, ties by neighbor id. */
  private def walkStep(r: Int): String =
    s"""w$r AS MATERIALIZED (SELECT seed, CAST($r AS BIGINT) AS step, b AS node
       |FROM (
       |  SELECT c.seed, n.b, row_number() OVER (PARTITION BY c.seed
       |    ORDER BY md5('wk:$r:' || CAST(c.node AS VARCHAR) ||
       |      ',' || CAST(n.b AS VARCHAR)), n.b) AS rn
       |  FROM w${r - 1} c JOIN nbr n ON n.a = c.node) WHERE rn = 1)""".stripMargin

  val all: Map[String, String] = Map(

    "q437_densest_peel" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |nodes AS (SELECT DISTINCT n FROM (
         |  SELECT x AS n FROM e0 UNION ALL SELECT y FROM e0)),
         |st0 AS MATERIALIZED (SELECT 'n' AS kind, n, CAST(0 AS BIGINT) AS rnd,
         |    CAST(0 AS BIGINT) AS nn, CAST(0 AS BIGINT) AS mm
         |  FROM nodes),
         |${(1 to 18).map(peelRound).mkString(",\n")},
         |s AS MATERIALIZED (SELECT rnd, nn, mm FROM st18 WHERE kind = 's')
         |SELECT s.rnd AS round, s.nn AS n_nodes, s.mm AS n_edges,
         |  NOT EXISTS (SELECT 1 FROM s o
         |    WHERE o.mm * s.nn > s.mm * o.nn
         |      OR (o.mm * s.nn = s.mm * o.nn AND o.rnd < s.rnd)) AS is_best
         |FROM s ORDER BY round""".stripMargin,

    "q438_maximal_matching" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |we AS MATERIALIZED (SELECT x, y,
         |    ('0x' || substr(md5('mm:' || CAST(x AS VARCHAR) || ','
         |      || CAST(y AS VARCHAR)), 1, 12))::BIGINT AS wt
         |  FROM e0),
         |st0 AS MATERIALIZED (SELECT 'e' AS kind, x, y, wt,
         |    CAST(0 AS BIGINT) AS rnd
         |  FROM we),
         |${(1 to 12).map(matchRound).mkString(",\n")}
         |SELECT x, y, wt, rnd AS round FROM st12 WHERE kind = 'm'
         |ORDER BY x, y""".stripMargin,

    "q439_butterflies" ->
      """WITH cp AS MATERIALIZED (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |pr AS MATERIALIZED (SELECT a.p AS p1, b.p AS p2, count(*) AS w
        |  FROM cp a JOIN cp b ON a.c = b.c AND a.p < b.p
        |  GROUP BY 1, 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_copairs,
        |  CAST(sum(w) AS BIGINT) AS n_wedges,
        |  CAST(sum((w * (w - 1)) // 2) AS BIGINT) AS n_butterflies
        |FROM pr""".stripMargin,

    "q440_jp_coloring" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |nbr0 AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |  UNION ALL SELECT y, x FROM e0),
         |pk AS MATERIALIZED (SELECT a, b FROM (
         |  SELECT a, b, row_number() OVER (PARTITION BY a
         |    ORDER BY md5('mk:' || CAST(a AS VARCHAR) ||
         |      ',' || CAST(b AS VARCHAR)), b) AS rn
         |  FROM nbr0) WHERE rn <= 4),
         |muk AS MATERIALIZED (SELECT p.a AS x, p.b AS y FROM pk p
         |  JOIN pk q ON q.a = p.b AND q.b = p.a WHERE p.a < p.b),
         |nbr AS MATERIALIZED (SELECT x AS a, y AS b FROM muk
         |  UNION ALL SELECT y, x FROM muk),
         |st0 AS MATERIALIZED (SELECT a,
         |    ('0x' || substr(md5('jp:' || CAST(a AS VARCHAR)), 1, 10))::BIGINT
         |      * 1048576 + a AS pr,
         |    CAST(-1 AS BIGINT) AS color
         |  FROM (SELECT DISTINCT a FROM nbr)),
         |${(1 to 20).map(jpRound).mkString(",\n")}
         |SELECT a AS node, color FROM st20 ORDER BY node""".stripMargin,

    "q441_det_walks" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |nbr AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |  UNION ALL SELECT y, x FROM e0),
         |w0 AS MATERIALIZED (SELECT a AS seed, CAST(0 AS BIGINT) AS step,
         |    a AS node
         |  FROM (SELECT DISTINCT a FROM nbr) WHERE a % 50 = 0),
         |${(1 to 8).map(walkStep).mkString(",\n")}
         |SELECT seed, step, node FROM (
         |  ${(0 to 8).map(r => s"SELECT * FROM w$r").mkString(" UNION ALL ")})
         |ORDER BY seed, step""".stripMargin)
}
