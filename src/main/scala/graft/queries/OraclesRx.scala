package graft.queries

/**
 * DuckDB oracle SQL for the round-12 second wave ([[CatalogRx]]).
 * q442 composes the shared q119 candidate CTE
 * ([[OraclesExt.fuzzyPairsCte]]) with the shared matching-round replay
 * ([[OraclesGx.matchRound]]); q443 replays the 16 signed sums from the
 * identical md5 parity; q444 mirrors the G² cell terms with the exact
 * piecewise lg ([[OraclesExt.lgSqlOf]]) in the identical fold order;
 * q445 labels DBSCAN components by a recursive min-label closure (the
 * cluster label is canonical, so no algorithm replay is needed); q446
 * is ground truth by construction (the q436 pattern).
 */
object OraclesRx {

  private def lg(x: String): String = OraclesExt.lgSqlOf(x)

  /** One G² cell: O·(((lg O + lg N) − lg rowTot) − lg colTot), zero
    * when the observed count is zero. */
  private def g2Term(o: String, rt: String, ct: String): String =
    s"""CASE WHEN $o > 0 THEN CAST($o AS DOUBLE) *
       |  (((${lg(o)} + ${lg("st.n")}) - ${lg(rt)}) - ${lg(ct)})
       |  ELSE 0.0 END""".stripMargin.replace("\n", " ")

  val all: Map[String, String] = Map(

    "q442_linkage_assignment" ->
      s"""WITH ${OraclesExt.fuzzyPairsCte},
         |pe AS MATERIALIZED (
         |  SELECT a_id, b_id, inter, CAST(na AS BIGINT) AS na,
         |    CAST(nb AS BIGINT) AS nb
         |  FROM i WHERE 2 * inter * 4 >= 3 * (na + nb)),
         |st0 AS MATERIALIZED (SELECT 'e' AS kind, a_id AS x, b_id AS y,
         |    (((na + nb - 2 * inter) * 1048576) // (na + nb))
         |      * 1099511627776
         |      + ('0x' || substr(md5('as:' || CAST(a_id AS VARCHAR) ||
         |        ',' || CAST(b_id AS VARCHAR)), 1, 10))::BIGINT AS wt,
         |    CAST(0 AS BIGINT) AS rnd
         |  FROM pe),
         |${(1 to 12).map(OraclesGx.matchRound).mkString(",\n")}
         |SELECT m.x AS a_id, m.y AS b_id,
         |  CAST(2 * pe.inter AS DOUBLE) / CAST(pe.na + pe.nb AS DOUBLE)
         |    AS dice,
         |  m.rnd AS round
         |FROM st12 m JOIN pe ON pe.a_id = m.x AND pe.b_id = m.y
         |WHERE m.kind = 'm' ORDER BY a_id""".stripMargin,

    "q443_ams_f2" ->
      """WITH fv AS MATERIALIZED (
        |  SELECT l_partkey AS v, CAST(count(*) AS BIGINT) AS f
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT j.j,
        |    CASE WHEN ('0x' || substr(md5('ams:' || CAST(j.j AS VARCHAR) ||
        |        ':' || CAST(fv.v AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
        |      THEN fv.f ELSE -fv.f END AS sf
        |  FROM fv, (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j) j),
        |sj AS MATERIALIZED (SELECT j, CAST(sum(sf) AS BIGINT) AS s_j
        |  FROM g GROUP BY 1),
        |ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM fv)
        |SELECT j, s_j, s_j * s_j AS est_f2, f2_exact,
        |  CAST(s_j * s_j AS DOUBLE) / CAST(f2_exact AS DOUBLE) AS ratio
        |FROM sj, ex ORDER BY j""".stripMargin,

    "q444_g2_collocations" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
         |bc AS MATERIALIZED (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
         |    SELECT w[i] AS w1, w[i + 1] AS w2
         |    FROM (SELECT w, unnest(range(1, len(w))) AS i FROM t))
         |  GROUP BY 1, 2),
         |fr AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS r1 FROM bc GROUP BY 1),
         |sc AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS k1 FROM bc GROUP BY 1),
         |st AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM bc)
         |SELECT bc.w1, bc.w2, bc.c12, fr.r1, sc.k1,
         |  (((${g2Term("bc.c12", "fr.r1", "sc.k1")}
         |   + ${g2Term("fr.r1 - bc.c12", "fr.r1", "st.n - sc.k1")})
         |   + ${g2Term("sc.k1 - bc.c12", "st.n - fr.r1", "sc.k1")})
         |   + ${g2Term("(st.n - fr.r1) - (sc.k1 - bc.c12)",
                        "st.n - fr.r1", "st.n - sc.k1")}) * 2.0 AS g2_bits
         |FROM bc JOIN fr ON fr.w1 = bc.w1
         |JOIN sc ON sc.w2 = bc.w2 CROSS JOIN st
         |WHERE bc.c12 >= 5
         |ORDER BY g2_bits DESC, bc.w1 ASC, bc.w2 ASC LIMIT 20""".stripMargin,

    // q445: the component labels need NO algorithm replay — the cluster
    // label is the canonical component-minimum core id, which the
    // recursive min-label closure computes exactly. The `lbl < bi`
    // prune keeps the closure at Σ|C|·(labels above the min that reach
    // a node) rows: the component minimum always propagates (it is
    // below every receiving node), so min(lbl) per node IS the
    // component minimum.
    "q445_grid_dbscan" ->
      """WITH RECURSIVE f0 AS (SELECT o_custkey AS id,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) // 1000000 AS x,
        |    CAST(count(*) * 2 AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |r AS (SELECT id, x, y, row_number() OVER (
        |    ORDER BY md5('db:' || CAST(id AS VARCHAR)), id) AS rnk FROM f0),
        |f AS MATERIALIZED (SELECT id, x, y FROM r WHERE rnk <= 2000),
        |cells AS (SELECT id, x, y, x // 5 AS cx, y // 5 AS cy FROM f),
        |cand AS MATERIALIZED (SELECT a.id AS ai, b.id AS bi
        |  FROM cells a
        |  JOIN (SELECT id, x AS bx, y AS by, cx + dx.d AS cx, cy + dy.d AS cy
        |        FROM cells,
        |        (SELECT unnest([-1, 0, 1]) AS d) dx,
        |        (SELECT unnest([-1, 0, 1]) AS d) dy) b
        |    ON a.cx = b.cx AND a.cy = b.cy AND a.id <> b.id
        |  WHERE (a.x - b.bx) * (a.x - b.bx)
        |      + (a.y - b.by) * (a.y - b.by) <= 25),
        |deg AS (SELECT ai AS id, count(*) AS d FROM cand GROUP BY 1),
        |core AS MATERIALIZED (SELECT id FROM deg WHERE d >= 4),
        |ce AS MATERIALIZED (SELECT ai, bi FROM cand
        |  WHERE ai IN (SELECT id FROM core) AND bi IN (SELECT id FROM core)),
        |lab AS (
        |  SELECT id AS node, id AS lbl FROM core
        |  UNION
        |  SELECT ce.bi, lab.lbl FROM lab JOIN ce ON ce.ai = lab.node
        |  WHERE lab.lbl < ce.bi),
        |comp AS MATERIALIZED (SELECT node, min(lbl) AS cluster FROM lab
        |  GROUP BY node),
        |bord AS MATERIALIZED (SELECT c.ai AS id, min(cc.cluster) AS cluster
        |  FROM cand c JOIN comp cc ON cc.node = c.bi
        |  WHERE c.ai NOT IN (SELECT id FROM core) GROUP BY c.ai)
        |SELECT f.id, f.x, f.y,
        |  CASE WHEN comp.node IS NOT NULL THEN 'core'
        |    WHEN bord.id IS NOT NULL THEN 'border'
        |    ELSE 'noise' END AS role,
        |  coalesce(comp.cluster, bord.cluster) AS cluster
        |FROM f LEFT JOIN comp ON comp.node = f.id
        |LEFT JOIN bord ON bord.id = f.id
        |ORDER BY f.id""".stripMargin,

    // q447: identical 63-bit word packing (bit 63 would overflow
    // DuckDB's checked shift), word-aligned intersections, bounded
    // type-pair grid keeps zero-overlap pairs.
    "q447_bitmap_overlap" ->
      """WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
        |  FROM events),
        |words AS MATERIALIZED (SELECT t, u // 63 AS w,
        |    bit_or(1::BIGINT << CAST(u % 63 AS INT)) AS m
        |  FROM tu GROUP BY 1, 2),
        |sizes AS MATERIALIZED (SELECT t, CAST(sum(bit_count(m)) AS BIGINT)
        |    AS n
        |  FROM words GROUP BY 1),
        |inter AS MATERIALIZED (SELECT a.t AS ta, b.t AS tb,
        |    CAST(sum(bit_count(a.m & b.m)) AS BIGINT) AS n_inter
        |  FROM words a JOIN words b ON a.w = b.w AND a.t < b.t
        |  GROUP BY 1, 2)
        |SELECT sa.t AS type_a, sb.t AS type_b, sa.n AS n_a, sb.n AS n_b,
        |  coalesce(i.n_inter, CAST(0 AS BIGINT)) AS n_inter,
        |  sa.n + sb.n - coalesce(i.n_inter, CAST(0 AS BIGINT)) AS n_union,
        |  CAST(coalesce(i.n_inter, CAST(0 AS BIGINT)) AS DOUBLE)
        |    / CAST(sa.n + sb.n - coalesce(i.n_inter, CAST(0 AS BIGINT))
        |      AS DOUBLE) AS jaccard
        |FROM sizes sa JOIN sizes sb ON sa.t < sb.t
        |LEFT JOIN inter i ON i.ta = sa.t AND i.tb = sb.t
        |ORDER BY type_a, type_b""".stripMargin,

    // q446: ground truth by construction (the q436 pattern) — the delta
    // bridges segment s to s+1 exactly when s ≡ 1 (mod 8), so merged
    // components are the closed-form rank ranges: a rank in segment s
    // belongs to group s−1 when s ≡ 2 (mod 8), else group s. Node set =
    // endpoints of ≥1 edge, exactly as the engine derives it.
    "q446_incremental_cc" ->
      """WITH r AS MATERIALIZED (
        |  SELECT doc_id,
        |    row_number() OVER (
        |      ORDER BY md5('ci:' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        |  FROM documents),
        |consec AS (SELECT a.doc_id AS x, b.doc_id AS y, a.rnk
        |  FROM r a JOIN r b ON b.rnk = a.rnk + 1),
        |base AS (SELECT x, y FROM consec WHERE rnk % 128 <> 0),
        |delta AS (SELECT x, y FROM consec
        |  WHERE rnk % 128 = 0 AND (rnk // 128) % 8 = 1),
        |nodes AS (SELECT DISTINCT id FROM (
        |  SELECT x AS id FROM base UNION ALL SELECT y FROM base
        |  UNION ALL SELECT x FROM delta UNION ALL SELECT y FROM delta)),
        |nr AS (SELECT n.id, r.rnk, 1 + (r.rnk - 1) // 128 AS s
        |  FROM nodes n JOIN r ON r.doc_id = n.id)
        |SELECT id, min(id) OVER (PARTITION BY
        |    CASE WHEN s % 8 = 2 THEN s - 1 ELSE s END) AS component
        |FROM nr ORDER BY id""".stripMargin)
}
