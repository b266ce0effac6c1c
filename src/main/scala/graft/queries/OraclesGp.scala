package graft.queries

/**
 * DuckDB oracle SQL for the round-11 wave ([[CatalogGp]]). The three
 * convergence-driven loops (SSSP, critical path, multi-source BFS) are
 * unrolled to their engine-side ROUND CAPS — the engine's early exit is
 * hash-identical by step(fp)=fp, so a cap-length replay lands on the same
 * fixed point; MATERIALIZED on every loop-carried CTE (the
 * graft-oracle-determinism rule). q424's quantiles are stated
 * IMPLEMENTATION-INDEPENDENTLY (k-th smallest by row_number — the oracle
 * doesn't care that the engine refines histograms). q425's ⌊log₂⌋ is
 * length(bin(x)), the bit-identical integer form of the engine's
 * length(conv(x, 10, 2)).
 */
object OraclesGp {

  /** One Bellman–Ford round: existing dists ∪ one-hop relaxations, min. */
  private def spRound(r: Int): String =
    s"""d$r AS MATERIALIZED (SELECT a, min(d) AS d FROM (
       |  SELECT a, d FROM d${r - 1}
       |  UNION ALL
       |  SELECT u.a, p.d + u.wt FROM und u JOIN d${r - 1} p ON p.a = u.b)
       |  GROUP BY a)""".stripMargin

  /** One critical-path relaxation round over the layered DAG. */
  private def cpRound(r: Int): String =
    s"""s$r AS MATERIALIZED (SELECT s.n, s.dur,
       |  greatest(s.ect, s.dur + coalesce(b.mx, CAST(0 AS BIGINT))) AS ect
       |  FROM s${r - 1} s LEFT JOIN (
       |    SELECT dg.v AS n, max(p.ect) AS mx
       |    FROM dag dg JOIN s${r - 1} p ON p.n = dg.u GROUP BY dg.v) b
       |  ON b.n = s.n)""".stripMargin

  /** One batched multi-source BFS round. */
  private def bfsRound(r: Int): String =
    s"""b$r AS MATERIALIZED (SELECT src, a, min(d) AS d FROM (
       |  SELECT src, a, d FROM b${r - 1}
       |  UNION ALL
       |  SELECT p.src, u.a, p.d + CAST(1 AS BIGINT)
       |  FROM und u JOIN b${r - 1} p ON p.a = u.b)
       |  GROUP BY src, a)""".stripMargin

  val all: Map[String, String] = Map(

    "q421_sssp" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |we AS MATERIALIZED (SELECT x, y,
         |    ('0x' || substr(md5('sp:' || CAST(x AS VARCHAR) || ','
         |      || CAST(y AS VARCHAR)), 1, 12))::BIGINT AS wt
         |  FROM e0),
         |und AS MATERIALIZED (SELECT x AS a, y AS b, wt FROM we
         |  UNION ALL SELECT y, x, wt FROM we),
         |d0 AS MATERIALIZED (SELECT (SELECT min(a) FROM und) AS a,
         |  CAST(0 AS BIGINT) AS d),
         |${(1 to 24).map(spRound).mkString(",\n")}
         |SELECT a AS node, d AS dist FROM d24 ORDER BY node""".stripMargin,

    "q422_critical_path" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |nodes AS MATERIALIZED (SELECT n,
         |    ('0x' || substr(md5('lvl:' || CAST(n AS VARCHAR)), 1, 8))::BIGINT
         |      % 8 AS lvl,
         |    ('0x' || substr(md5('dur:' || CAST(n AS VARCHAR)), 1, 8))::BIGINT
         |      % 1000 + 1 AS dur
         |  FROM (SELECT DISTINCT n FROM (
         |    SELECT x AS n FROM e0 UNION ALL SELECT y FROM e0))),
         |dag AS MATERIALIZED (SELECT ed.x AS u, ed.y AS v
         |  FROM (SELECT x, y FROM e0 UNION ALL SELECT y, x FROM e0) ed
         |  JOIN nodes nx ON nx.n = ed.x
         |  JOIN nodes ny ON ny.n = ed.y
         |  WHERE nx.lvl < ny.lvl),
         |s0 AS MATERIALIZED (SELECT n, dur, dur AS ect FROM nodes),
         |${(1 to 8).map(cpRound).mkString(",\n")}
         |SELECT s.n AS node, nodes.lvl, s.dur, s.ect
         |FROM s8 s JOIN nodes ON nodes.n = s.n ORDER BY node""".stripMargin,

    "q423_closeness" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |und AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |  UNION ALL SELECT y, x FROM e0),
         |srcs AS MATERIALIZED (SELECT a FROM (SELECT DISTINCT a FROM und)
         |  ORDER BY a LIMIT 8),
         |b0 AS MATERIALIZED (SELECT a AS src, a, CAST(0 AS BIGINT) AS d
         |  FROM srcs),
         |${(1 to 24).map(bfsRound).mkString(",\n")}
         |SELECT src, CAST(count(*) AS BIGINT) AS n_reached, max(d) AS ecc,
         |  CAST(sum(d) AS BIGINT) AS total_dist
         |FROM b24 GROUP BY src ORDER BY src""".stripMargin,

    "q424_exact_quantiles" ->
      """WITH t AS MATERIALIZED (
        |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
        |  FROM lineitem),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
        |ks AS (SELECT 'p50' AS q, (n + 1) // 2 AS k, n FROM nn
        |  UNION ALL SELECT 'p90', (9 * n + 9) // 10, n FROM nn
        |  UNION ALL SELECT 'p99', (99 * n + 99) // 100, n FROM nn),
        |ranked AS MATERIALIZED (
        |  SELECT c, row_number() OVER (ORDER BY c) AS rn FROM t)
        |SELECT ks.q, ks.k, ks.n, ranked.c AS value
        |FROM ks JOIN ranked ON ranked.rn = ks.k
        |ORDER BY q""".stripMargin,

    "q425_bigram_surprisal" ->
      """WITH d AS MATERIALIZED (
        |  SELECT doc_id, text FROM documents WHERE length(text) >= 2),
        |g AS MATERIALIZED (SELECT doc_id,
        |    substr(text, CAST(unnest(range(1, length(text))) AS INT), 2) AS bg
        |  FROM d),
        |dict AS MATERIALIZED (
        |  SELECT bg, CAST(count(*) AS BIGINT) AS c FROM g GROUP BY bg),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM dict),
        |srp AS MATERIALIZED (SELECT bg,
        |    CAST(length(bin(t)) - length(bin(c)) AS BIGINT) AS srp
        |  FROM dict, tot)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(s.srp) AS BIGINT) AS srp_sum
        |FROM g JOIN srp s USING (bg)
        |GROUP BY g.doc_id ORDER BY doc_id""".stripMargin)
}
