package graft.queries

/**
 * DuckDB oracle SQL for the round-10e graph/embedding wave
 * ([[CatalogGr]]). Dim-truncation recall by the identical
 * list_dot_product cosine over list_slice prefixes (the q28 contract);
 * Luby MIS and Borůvka MST unrolled round by round with the identical
 * md5 priorities/weights — MATERIALIZED on every loop-carried CTE (the
 * graft-oracle-determinism rule). The MST's inner label flatten is the
 * same pointer-doubling self-join the engine runs.
 */
object OraclesGr {

  /** One Luby round: undecided nodes below ALL undecided neighbors join
    * the MIS, their neighbors drop out. Spark's `dropped` anti-joins the
    * selected set; the CASE order (sel wins over dropped) mirrors it. */
  private def misRound(r: Int): String =
    s"""und$r AS (SELECT a, pr FROM st${r - 1} WHERE st = 0),
       |nm$r AS (SELECT n.a, min(u.pr) AS mn
       |  FROM nbr n JOIN und$r u ON u.a = n.b GROUP BY n.a),
       |sel$r AS MATERIALIZED (SELECT u.a FROM und$r u
       |  LEFT JOIN nm$r m ON m.a = u.a
       |  WHERE m.mn IS NULL OR u.pr < m.mn),
       |drp$r AS MATERIALIZED (SELECT DISTINCT n.a FROM nbr n
       |  JOIN sel$r s ON s.a = n.b
       |  WHERE n.a NOT IN (SELECT a FROM sel$r)),
       |st$r AS MATERIALIZED (
       |  SELECT a, pr, st FROM st${r - 1} WHERE st <> 0
       |  UNION ALL
       |  SELECT u.a, u.pr,
       |    CASE WHEN s.a IS NOT NULL THEN CAST($r AS BIGINT)
       |      WHEN d.a IS NOT NULL THEN CAST(-1 AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS st
       |  FROM und$r u LEFT JOIN sel$r s ON s.a = u.a
       |  LEFT JOIN drp$r d ON d.a = u.a)""".stripMargin

  /** One inner pointer-doubling flatten round of the Borůvka labels. */
  private def flatRound(r: Int, k: Int): String =
    s"""fl${r}_$k AS MATERIALIZED (SELECT a.l, b.p
       |  FROM fl${r}_${k - 1} a JOIN fl${r}_${k - 1} b ON b.l = a.p)""".stripMargin

  /** One Borůvka round: per-component minimum outgoing edge, hook
    * (2-cycles resolve toward the smaller label), flatten by pointer
    * doubling, relabel; chosen edges accumulate on the 'e' rows. */
  private def boruvkaRound(r: Int, hookRounds: Int): String = {
    val inner = (1 to hookRounds).map(flatRound(r, _)).mkString(",\n")
    s"""lb$r AS (SELECT n, lbl FROM st${r - 1} WHERE kind = 'l'),
       |el$r AS (SELECT we.x, we.y, we.wt, lx.lbl AS lx, ly.lbl AS ly
       |  FROM we JOIN lb$r lx ON lx.n = we.x JOIN lb$r ly ON ly.n = we.y
       |  WHERE lx.lbl <> ly.lbl),
       |mo$r AS (SELECT lx AS l, x, y, wt, lx, ly FROM el$r
       |  UNION ALL SELECT ly, x, y, wt, lx, ly FROM el$r),
       |ch$r AS MATERIALIZED (SELECT l, x, y, wt, lx, ly FROM (
       |  SELECT *, row_number() OVER (PARTITION BY l ORDER BY wt ASC) AS rn
       |  FROM mo$r) WHERE rn = 1),
       |hk0$r AS (SELECT l, CASE WHEN l = lx THEN ly ELSE lx END AS p
       |  FROM ch$r),
       |hk$r AS MATERIALIZED (SELECT h1.l,
       |  CASE WHEN h2.pp IS NOT NULL AND h2.pp = h1.l AND h1.l < h1.p
       |    THEN h1.l ELSE h1.p END AS p
       |  FROM hk0$r h1
       |  LEFT JOIN (SELECT l AS p, p AS pp FROM hk0$r) h2 ON h2.p = h1.p),
       |fl${r}_0 AS MATERIALIZED (SELECT d.lbl AS l, coalesce(h.p, d.lbl) AS p
       |  FROM (SELECT DISTINCT lbl FROM lb$r) d
       |  LEFT JOIN hk$r h ON h.l = d.lbl),
       |$inner,
       |st$r AS MATERIALIZED (
       |  SELECT kind, n, lbl, ex, ey, ewt FROM st${r - 1} WHERE kind = 'e'
       |  UNION ALL
       |  SELECT 'e', CAST(0 AS BIGINT), CAST(0 AS BIGINT), x, y, wt
       |  FROM (SELECT DISTINCT x, y, wt FROM ch$r)
       |  UNION ALL
       |  SELECT 'l', lb.n, f.p, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       |    CAST(0 AS BIGINT)
       |  FROM lb$r lb JOIN fl${r}_$hookRounds f ON f.l = lb.lbl)""".stripMargin
  }

  val all: Map[String, String] = Map(

    "q418_dim_recall" ->
      """WITH e AS MATERIALIZED (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |dd AS (SELECT CAST(unnest([4, 8, 16, 32, 64]) AS BIGINT) AS d),
        |p AS MATERIALIZED (
        |  SELECT dd.d, q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_dot_product(list_slice(q.v, 1, CAST(dd.d AS INT)),
        |        list_slice(c.v, 1, CAST(dd.d AS INT)))
        |      / (sqrt(list_dot_product(list_slice(q.v, 1, CAST(dd.d AS INT)),
        |          list_slice(q.v, 1, CAST(dd.d AS INT))))
        |        * sqrt(list_dot_product(list_slice(c.v, 1, CAST(dd.d AS INT)),
        |          list_slice(c.v, 1, CAST(dd.d AS INT))))) AS cos
        |  FROM e q JOIN e c ON q.vec_id % 25 = 0 AND c.vec_id % 25 <> 0
        |  CROSS JOIN dd),
        |t1 AS MATERIALIZED (SELECT d, q_id, c_id FROM (
        |  SELECT d, q_id, c_id, row_number() OVER (PARTITION BY d, q_id
        |    ORDER BY cos DESC, c_id ASC) AS rn FROM p) WHERE rn = 1),
        |tr AS (SELECT q_id, c_id AS true_id FROM t1 WHERE d = 64)
        |SELECT t1.d, CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN t1.c_id = tr.true_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_match,
        |  CAST(sum(CASE WHEN t1.c_id = tr.true_id THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall1
        |FROM t1 JOIN tr USING (q_id)
        |GROUP BY t1.d ORDER BY d""".stripMargin,

    "q419_luby_mis" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |nbr AS MATERIALIZED (SELECT x AS a, y AS b FROM e0
         |  UNION ALL SELECT y, x FROM e0),
         |st0 AS MATERIALIZED (SELECT a,
         |    ('0x' || substr(md5('mis:' || CAST(a AS VARCHAR)), 1, 10))::BIGINT
         |      * 1048576 + a AS pr,
         |    CAST(0 AS BIGINT) AS st
         |  FROM (SELECT DISTINCT a FROM nbr)),
         |${(1 to 6).map(misRound).mkString(",\n")}
         |SELECT a AS node, st AS sel_round FROM st6 WHERE st > 0
         |ORDER BY node""".stripMargin,

    "q420_boruvka_mst" ->
      s"""WITH ${OraclesAlg.partEdgesSql},
         |we AS MATERIALIZED (SELECT x, y,
         |    ('0x' || substr(md5('mst:' || CAST(x AS VARCHAR) || ','
         |      || CAST(y AS VARCHAR)), 1, 12))::BIGINT AS wt
         |  FROM e0),
         |nodes AS (SELECT DISTINCT n FROM (
         |  SELECT x AS n FROM we UNION ALL SELECT y FROM we)),
         |st0 AS MATERIALIZED (SELECT 'l' AS kind, n, n AS lbl,
         |    CAST(0 AS BIGINT) AS ex, CAST(0 AS BIGINT) AS ey,
         |    CAST(0 AS BIGINT) AS ewt
         |  FROM nodes),
         |${(1 to 6).map(boruvkaRound(_, 6)).mkString(",\n")}
         |SELECT DISTINCT ex AS x, ey AS y, ewt AS wt
         |FROM st6 WHERE kind = 'e' ORDER BY x, y""".stripMargin,

    // q436: NOT a round replay — a CC's fixpoint is canonical, so the
    // oracle states ground truth by construction: the md5-rank segments
    // ARE the components, labeled by their min doc_id. Segments of size 1
    // (possible only when n_docs ≡ 1 mod 4096) appear in no edge, so the
    // engine never sees them — mirrored by the n >= 2 filter.
    "q436_hook_components" ->
      """WITH r AS MATERIALIZED (
        |  SELECT doc_id,
        |    row_number() OVER (
        |      ORDER BY md5('cc:' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents),
        |seg AS (SELECT doc_id, (rnk - 1) // 4096 AS seg FROM r),
        |comp AS (SELECT doc_id,
        |    min(doc_id) OVER (PARTITION BY seg) AS component,
        |    count(*) OVER (PARTITION BY seg) AS n
        |  FROM seg)
        |SELECT doc_id AS id, component FROM comp WHERE n >= 2
        |ORDER BY id""".stripMargin)
}
