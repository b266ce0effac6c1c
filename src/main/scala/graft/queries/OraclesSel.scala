package graft.queries

/**
 * DuckDB oracle SQL for the round-10b selection/linkage/structure wave
 * ([[CatalogSel]]). Brute-force or window formulations of the same math:
 * the truss peel unrolled round by round, greedy set cover unrolled pick
 * by pick, KMV sketches via plain window row_number, sorted-neighborhood
 * via a rank band join, LCP via a two-tier prefix probe, the hierarchy
 * closure via a recursive CTE, SAX and dictionary matching via the
 * identical integer pipelines. MATERIALIZED on every loop-carried or
 * reused CTE (the graft-oracle-determinism rule).
 */
object OraclesSel {

  /** Oriented triangles of edge CTE `e`: a<b<c each found once. */
  private def triSql(e: String): String =
    s"""SELECT e1.x AS a, e1.y AS b, e2.y AS c
       |  FROM $e e1 JOIN $e e2 ON e2.x = e1.y
       |  JOIN $e e3 ON e3.x = e1.x AND e3.y = e2.y""".stripMargin

  /** One truss round: triangles of e{k-1}, per-edge support, survivors. */
  private def trussRound(k: Int): String =
    s"""t$k AS MATERIALIZED (${triSql(s"e${k - 1}")}),
       |s$k AS MATERIALIZED (SELECT x, y, CAST(count(*) AS BIGINT) AS sup FROM (
       |  SELECT a AS x, b AS y FROM t$k
       |  UNION ALL SELECT b, c FROM t$k
       |  UNION ALL SELECT a, c FROM t$k) GROUP BY 1, 2),
       |e$k AS MATERIALIZED (SELECT e.x, e.y FROM e${k - 1} e
       |  LEFT JOIN s$k ON s$k.x = e.x AND s$k.y = e.y
       |  WHERE coalesce(s$k.sup, 0) >= 1)""".stripMargin

  /** One greedy-cover round: best uncovered-gain doc, then the grown
    * covered set. */
  private def coverRound(k: Int): String = {
    val prev = if (k == 1) "" else s" WHERE bg NOT IN (SELECT bg FROM c${k - 1})"
    val grow =
      if (k == 1) s"SELECT DISTINCT ut.bg FROM ut JOIN p1 USING (doc_id)"
      else
        s"""SELECT bg FROM c${k - 1}
           |  UNION SELECT ut.bg FROM ut JOIN p$k USING (doc_id)""".stripMargin
    s"""p$k AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
       |  FROM ut$prev GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
       |c$k AS MATERIALIZED ($grow)""".stripMargin
  }

  val all: Map[String, String] = Map(

    "q402_ktruss" ->
      s"""WITH pp AS MATERIALIZED (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
         |e0 AS MATERIALIZED (SELECT a.pk AS x, b.pk AS y
         |  FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |${(1 to 4).map(trussRound).mkString(",\n")},
         |tf AS MATERIALIZED (${triSql("e4")}),
         |sf AS (SELECT x, y, CAST(count(*) AS BIGINT) AS sup FROM (
         |  SELECT a AS x, b AS y FROM tf
         |  UNION ALL SELECT b, c FROM tf
         |  UNION ALL SELECT a, c FROM tf) GROUP BY 1, 2)
         |SELECT e.x, e.y, coalesce(sf.sup, CAST(0 AS BIGINT)) AS support
         |FROM e4 e LEFT JOIN sf ON sf.x = e.x AND sf.y = e.y
         |ORDER BY e.x, e.y""".stripMargin,

    "q403_set_cover" ->
      s"""WITH toks AS MATERIALIZED (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |tj AS MATERIALIZED (SELECT doc_id, ts,
         |    unnest(generate_series(1, len(ts) - 1)) AS j
         |  FROM toks WHERE len(ts) >= 2),
         |ut AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, ts[j] || ' ' || ts[j + 1] AS bg FROM tj),
         |${(1 to 8).map(coverRound).mkString(",\n")}
         |${(1 to 8).map(k =>
            s"SELECT CAST($k AS BIGINT) AS pick_round, doc_id, gain FROM p$k")
           .mkString("\nUNION ALL ")}
         |ORDER BY pick_round""".stripMargin,

    "q404_kmv_sketch" ->
      """WITH tb AS MATERIALIZED (
        |  SELECT source, string_split(text, ' ') AS ts FROM documents),
        |tj AS MATERIALIZED (SELECT source, ts,
        |    unnest(generate_series(1, len(ts) - 1)) AS j
        |  FROM tb WHERE len(ts) >= 2),
        |bg AS MATERIALIZED (SELECT DISTINCT source,
        |    ('0x' || substr(md5(ts[j] || ' ' || ts[j + 1]), 1, 10))::BIGINT AS h
        |  FROM tj),
        |sk AS MATERIALIZED (SELECT source, h, nsrc FROM (
        |  SELECT source, h,
        |    row_number() OVER (PARTITION BY source ORDER BY h) AS rn,
        |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS nsrc
        |  FROM bg) WHERE rn <= 64),
        |srcs AS (SELECT DISTINCT source, nsrc FROM sk),
        |pairs AS MATERIALIZED (SELECT a.source AS s1, a.nsrc AS n1,
        |    b.source AS s2, b.nsrc AS n2
        |  FROM srcs a JOIN srcs b ON a.source < b.source),
        |cand AS MATERIALIZED (SELECT s1, s2, h, CAST(count(*) AS BIGINT) AS nin
        |  FROM (SELECT p.s1, p.s2, k.h FROM pairs p JOIN sk k ON k.source = p.s1
        |    UNION ALL
        |    SELECT p.s1, p.s2, k.h FROM pairs p JOIN sk k ON k.source = p.s2)
        |  GROUP BY 1, 2, 3),
        |mg AS (SELECT s1, s2, h, nin,
        |    row_number() OVER (PARTITION BY s1, s2 ORDER BY h) AS rn FROM cand),
        |ag AS MATERIALIZED (SELECT s1, s2, CAST(count(*) AS BIGINT) AS m,
        |    max(h) AS hk,
        |    CAST(sum(CASE WHEN nin = 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared
        |  FROM mg WHERE rn <= 64 GROUP BY 1, 2)
        |SELECT s1, s2, n1, n2, m, hk, shared, union_est, jacc_est,
        |  jacc_est * union_est AS inter_est
        |FROM (SELECT ag.s1, ag.s2, p.n1, p.n2, ag.m, ag.hk, ag.shared,
        |    CASE WHEN ag.m < 64 THEN CAST(ag.m AS DOUBLE)
        |         ELSE 69269232549888.0 / CAST(ag.hk AS DOUBLE) END AS union_est,
        |    CAST(ag.shared AS DOUBLE) / CAST(ag.m AS DOUBLE) AS jacc_est
        |  FROM ag JOIN pairs p ON p.s1 = ag.s1 AND p.s2 = ag.s2)
        |ORDER BY s1, s2""".stripMargin,

    "q405_sorted_neighborhood" ->
      """WITH r AS MATERIALIZED (SELECT p_partkey, p_name,
        |    CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rn
        |  FROM part)
        |SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
        |  b.rn - a.rn AS gap,
        |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
        |FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
        |WHERE levenshtein(a.p_name, b.p_name) <= 20
        |ORDER BY a_key, b_key""".stripMargin,

    "q406_lcp_repeats" ->
      """WITH s0 AS MATERIALIZED (
        |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS p
        |  FROM documents WHERE length(text) >= 1),
        |s AS MATERIALIZED (SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |    substring(text, CAST(p AS INT)) AS suf,
        |    substring(text, CAST(p AS INT), 96) AS hd
        |  FROM s0),
        |r AS MATERIALIZED (SELECT doc_id, pos, hd,
        |    CAST(row_number() OVER (ORDER BY suf, doc_id, pos) AS BIGINT) AS rk
        |  FROM s),
        |pr AS MATERIALIZED (SELECT a.doc_id AS doc_a, a.pos AS pos_a,
        |    b.doc_id AS doc_b, b.pos AS pos_b, a.hd AS ha, b.hd AS hb,
        |    least(length(a.hd), length(b.hd)) AS lmin
        |  FROM r a JOIN r b ON b.rk = a.rk + 1),
        |bj AS MATERIALIZED (SELECT *,
        |    (SELECT coalesce(max(g.j), 0) FROM generate_series(8, 96, 8) AS g(j)
        |      WHERE g.j <= lmin
        |        AND substring(ha, 1, CAST(g.j AS INT)) =
        |            substring(hb, 1, CAST(g.j AS INT))) AS bjv
        |  FROM pr),
        |l AS (SELECT doc_a, pos_a, doc_b, pos_b, ha,
        |    CAST(coalesce((SELECT max(bjv + g.d) FROM generate_series(1, 7) AS g(d)
        |      WHERE bjv + g.d <= lmin
        |        AND substring(ha, 1, CAST(bjv + g.d AS INT)) =
        |            substring(hb, 1, CAST(bjv + g.d AS INT))), bjv) AS BIGINT) AS lcp
        |  FROM bj)
        |SELECT doc_a, pos_a, doc_b, pos_b, lcp, lcp = 96 AS lcp_capped,
        |  substring(ha, 1, 40) AS snippet
        |FROM l ORDER BY lcp DESC, doc_a, pos_a LIMIT 25""".stripMargin,

    "q407_tree_rollup" ->
      """WITH RECURSIVE nodes AS MATERIALIZED (SELECT c_custkey AS v,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
        |anc AS (SELECT v, v // 10 AS anc, CAST(1 AS BIGINT) AS d
        |    FROM nodes WHERE v >= 10
        |  UNION ALL SELECT a.v, a.anc // 10, a.d + 1 FROM anc a
        |    WHERE a.anc >= 10),
        |sub AS (SELECT v, anc FROM anc
        |  UNION ALL SELECT v, v AS anc FROM nodes),
        |dep AS (SELECT v, max(d) AS depth FROM anc GROUP BY 1)
        |SELECT s.anc AS node, CAST(count(*) AS BIGINT) AS n_subtree,
        |  CAST(sum(n.bal) AS BIGINT) AS subtree_bal,
        |  coalesce(max(dep.depth), CAST(0 AS BIGINT)) AS depth
        |FROM sub s JOIN nodes n ON n.v = s.v
        |LEFT JOIN dep ON dep.v = s.anc
        |GROUP BY s.anc
        |ORDER BY subtree_bal DESC, node LIMIT 20""".stripMargin,

    "q408_sax_words" ->
      """WITH o AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |d0 AS (SELECT min(d) AS d0 FROM o),
        |day AS MATERIALIZED (SELECT
        |    CAST(date_diff('day', d0.d0, o.d) AS BIGINT) AS i,
        |    CAST(sum(v) AS BIGINT) AS v
        |  FROM o CROSS JOIN d0 GROUP BY 1),
        |mx AS (SELECT max(i) // 7 AS mw FROM day),
        |wg AS (SELECT i // 7 AS wk, CAST(sum(v) AS BIGINT) AS sv
        |  FROM day GROUP BY 1),
        |grid AS (SELECT CAST(unnest(generate_series(0,
        |    (SELECT CAST(mw AS INT) FROM mx))) AS BIGINT) AS wk),
        |wk AS MATERIALIZED (SELECT grid.wk,
        |    coalesce(wg.sv, CAST(0 AS BIGINT)) AS sv
        |  FROM grid LEFT JOIN wg ON wg.wk = grid.wk),
        |q AS MATERIALIZED (SELECT wk, sv,
        |    ((row_number() OVER (ORDER BY sv, wk) - 1) * 4)
        |      // (SELECT mw + 1 FROM mx) + 1 AS sym
        |  FROM wk),
        |wd AS MATERIALIZED (SELECT a.wk, a.sv,
        |    CAST(a.sym AS VARCHAR) || CAST(b.sym AS VARCHAR) ||
        |      CAST(c.sym AS VARCHAR) AS word
        |  FROM q a JOIN q b ON b.wk = a.wk + 1 JOIN q c ON c.wk = a.wk + 2),
        |fr AS (SELECT word, CAST(count(*) AS BIGINT) AS wfreq
        |  FROM wd GROUP BY 1)
        |SELECT wd.wk, wd.word, fr.wfreq, wd.sv
        |FROM wd JOIN fr USING (word) WHERE fr.wfreq <= 2
        |ORDER BY wd.wk""".stripMargin,

    "q409_dict_match" ->
      """WITH toks AS MATERIALIZED (
        |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |tj AS MATERIALIZED (SELECT doc_id, ts,
        |    unnest(generate_series(1, len(ts) - 1)) AS j
        |  FROM toks WHERE len(ts) >= 2),
        |allbg AS MATERIALIZED (SELECT ts[j] || ' ' || ts[j + 1] AS bg FROM tj),
        |dict AS MATERIALIZED (SELECT bg, CAST(count(*) AS BIGINT) AS tok_cnt
        |  FROM allbg GROUP BY 1 ORDER BY tok_cnt DESC, bg LIMIT 40)
        |SELECT d.bg, d.tok_cnt,
        |  CAST(sum(CASE WHEN strpos(doc.text, d.bg) > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_docs,
        |  CAST(sum((length(doc.text) - length(replace(doc.text, d.bg, '')))
        |    // length(d.bg)) AS BIGINT) AS n_occ
        |FROM dict d CROSS JOIN documents doc
        |GROUP BY d.bg, d.tok_cnt ORDER BY d.bg""".stripMargin)
}
