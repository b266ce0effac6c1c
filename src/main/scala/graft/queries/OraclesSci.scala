package graft.queries

/**
 * DuckDB mirrors for [[CatalogSci]]. Order-statistic picks replay the
 * engine's row_number filters (floor on the same double division),
 * sketch draws share the md5-prefix integer hash, and every divide
 * keeps the engine's parenthesization.
 */
object OraclesSci {

  val all: Map[String, String] = Map(
    "q235_modularity" ->
      """WITH edges AS (SELECT c.c_nationkey AS cn, s.s_nationkey AS sn
        |  FROM lineitem l
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
        |ends AS (
        |  SELECT cn AS nation,
        |    CASE WHEN cn = sn THEN 1 ELSE 0 END AS intra FROM edges
        |  UNION ALL SELECT sn AS nation, 0 FROM edges),
        |byn AS (SELECT nation, CAST(count(*) AS BIGINT) AS deg,
        |    CAST(sum(intra) AS BIGINT) AS wi FROM ends GROUP BY 1),
        |terms AS (SELECT nation, m,
        |    CAST(wi AS DOUBLE) / CAST(m AS DOUBLE) -
        |    (CAST(deg AS DOUBLE) / CAST(2 * m AS DOUBLE)) *
        |    (CAST(deg AS DOUBLE) / CAST(2 * m AS DOUBLE)) AS term
        |  FROM byn CROSS JOIN m)
        |SELECT m AS m_weight, CAST(count(*) AS BIGINT) AS n_communities,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY nation)), (a, x) -> a + x) AS modularity
        |FROM terms GROUP BY m""".stripMargin,

    "q236_bottomk_jaccard" ->
      """WITH toks AS (SELECT DISTINCT source, tok FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok
        |     FROM documents)),
        |h AS (SELECT source, tok,
        |    ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
        |sk AS (SELECT source, tok, h FROM
        |    (SELECT *, row_number() OVER (PARTITION BY source
        |       ORDER BY h, tok) AS rn FROM h) WHERE rn <= 64),
        |srcs AS (SELECT DISTINCT source FROM sk),
        |pairs AS (SELECT a.source AS sa, b.source AS sb
        |  FROM srcs a JOIN srcs b ON a.source < b.source),
        |unn AS (SELECT sa, sb, tok, h, CAST(count(*) AS BIGINT) AS n_sides
        |  FROM (SELECT sa, sb, tok, h FROM pairs JOIN sk ON sk.source = pairs.sa
        |        UNION ALL
        |        SELECT sa, sb, tok, h FROM pairs JOIN sk ON sk.source = pairs.sb)
        |  GROUP BY 1, 2, 3, 4),
        |cut AS (SELECT * FROM (SELECT *, row_number() OVER
        |      (PARTITION BY sa, sb ORDER BY h, tok) AS rn FROM unn)
        |  WHERE rn <= 64),
        |est AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS union_k,
        |    CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS in_both
        |  FROM cut GROUP BY 1, 2),
        |estd AS (SELECT sa, sb, CAST(in_both AS DOUBLE) /
        |    CAST(least(64, union_k) AS DOUBLE) AS j_est FROM est),
        |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nv
        |  FROM toks GROUP BY 1),
        |inter AS (SELECT a.source AS sa, b.source AS sb,
        |    CAST(count(*) AS BIGINT) AS ni
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2),
        |exact AS (SELECT sa, sb, CAST(ni AS DOUBLE) /
        |    CAST(na.nv + nb.nv - ni AS DOUBLE) AS j_exact
        |  FROM inter JOIN sizes na ON na.source = inter.sa
        |  JOIN sizes nb ON nb.source = inter.sb)
        |SELECT estd.sa, estd.sb, j_est, j_exact,
        |  abs(j_est - j_exact) AS abs_err
        |FROM estd JOIN exact ON estd.sa = exact.sa AND estd.sb = exact.sb
        |ORDER BY estd.sa, estd.sb""".stripMargin,

    "q237_theil_sen" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
        |ti AS (SELECT d, y,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t FROM daily),
        |slopes AS (SELECT a.t AS t1, b.t AS t2,
        |    CAST(b.y - a.y AS DOUBLE) / CAST(b.t - a.t AS DOUBLE) AS slope
        |  FROM ti a JOIN ti b ON a.t < b.t),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM slopes),
        |ms AS (SELECT slope, n_pairs FROM
        |    (SELECT slope, row_number() OVER (ORDER BY slope, t1, t2) AS rn
        |     FROM slopes) CROSS JOIN np
        |  WHERE rn = CAST(floor((n_pairs + 1) / 2) AS BIGINT)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM ti),
        |medy AS (SELECT med_y, n_days FROM
        |    (SELECT y AS med_y, row_number() OVER (ORDER BY y, t) AS rn
        |     FROM ti) CROSS JOIN nd
        |  WHERE rn = CAST(floor((n_days + 1) / 2) AS BIGINT)),
        |medt AS (SELECT t AS med_t FROM ti CROSS JOIN
        |    (SELECT n_days AS nd2 FROM nd)
        |  WHERE t = CAST(floor((nd2 + 1) / 2) AS BIGINT))
        |SELECT n_days, n_pairs, slope,
        |  CAST(med_y AS DOUBLE) - slope * CAST(med_t AS DOUBLE) AS intercept
        |FROM ms CROSS JOIN medy CROSS JOIN medt""".stripMargin,

    "q238_conformal" ->
      """WITH docs AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        |    CAST(n_chars AS BIGINT) AS y, doc_id % 3 AS fold FROM documents),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx FROM docs WHERE fold = 0),
        |mm AS (SELECT n, sx, sy, n AS n_train,
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) AS slope FROM m),
        |m2 AS (SELECT n_train, slope,
        |    (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
        |      CAST(n AS DOUBLE) AS intercept FROM mm),
        |cal AS (SELECT doc_id, n_train, slope, intercept,
        |    abs(CAST(y AS DOUBLE) - (slope * CAST(x AS DOUBLE) + intercept))
        |      AS r
        |  FROM docs CROSS JOIN m2 WHERE fold = 1),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |qh AS (SELECT n_train, slope, intercept, n_cal, r AS q90 FROM
        |    (SELECT *, row_number() OVER (ORDER BY r, doc_id) AS rn FROM cal)
        |    CROSS JOIN nc
        |  WHERE rn = least(CAST(floor((9 * (n_cal + 1) + 9) / 10) AS BIGINT),
        |    n_cal)),
        |test AS (SELECT n_train, n_cal, slope, intercept, q90,
        |    CASE WHEN abs(CAST(y AS DOUBLE) -
        |      (slope * CAST(x AS DOUBLE) + intercept)) <= q90
        |      THEN 1 ELSE 0 END AS cov
        |  FROM docs CROSS JOIN qh WHERE fold = 2)
        |SELECT n_train, n_cal, CAST(count(*) AS BIGINT) AS n_test, slope,
        |  intercept, q90,
        |  CAST(CAST(sum(cov) AS BIGINT) AS DOUBLE) /
        |    CAST(count(*) AS DOUBLE) AS coverage
        |FROM test GROUP BY 1, 2, 4, 5, 6""".stripMargin)
}
