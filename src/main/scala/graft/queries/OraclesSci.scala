package graft.queries

/**
 * DuckDB mirrors for [[CatalogSci]]. Order-statistic picks replay the
 * engine's row_number filters (floor on the same double division),
 * sketch draws share the md5-prefix integer hash, and every divide
 * keeps the engine's parenthesization.
 */
object OraclesSci {

  /** p^(d−1) RBO weights, built by the SAME repeated multiplication as
    * the engine side and embedded via Double.toString (round-trip
    * exact). */
  private val rboPw: Seq[Double] = Iterator.iterate(1.0)(_ * 0.9).take(10).toSeq

  /** One Weiszfeld iteration as chained CTEs: distance from the
    * dot-product identity, integer-quantized capped weights, exact
    * int64 sums, two divides — mirroring CatalogSci.q241GeoMedian. */
  private def geoIterCtes(i: Int): String = {
    val prev = if (i == 1) "a0" else s"a${i - 1}"
    s"""d$i AS (SELECT e.label, e.q,
       |    sqrt(greatest(list_dot_product(e.v, e.v) -
       |      2.0 * list_dot_product(e.v, a.x) +
       |      list_dot_product(a.x, a.x), 0.0)) AS d
       |  FROM emb e JOIN $prev a ON a.label = e.label),
       |w$i AS (SELECT label, q,
       |    CASE WHEN d < 1e-9 THEN 16777216
       |         ELSE least(CAST(round(1048576.0 / d) AS BIGINT), 16777216)
       |    END AS w
       |  FROM d$i),
       |u$i AS (SELECT label, w,
       |    CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS pos,
       |    unnest(q) AS qv FROM w$i),
       |s$i AS (SELECT label, pos, CAST(sum(w * qv) AS BIGINT) AS swq,
       |    CAST(sum(w) AS BIGINT) AS sw FROM u$i GROUP BY 1, 2),
       |x$i AS (SELECT label, pos,
       |    CAST(swq AS DOUBLE) / CAST(sw AS DOUBLE) / 1048576.0 AS coord
       |  FROM s$i),
       |a$i AS (SELECT label, list(coord ORDER BY pos) AS x
       |  FROM x$i GROUP BY 1)""".stripMargin
  }

  val all: Map[String, String] = Map(
    "q243_capture_recapture" ->
      """WITH docs AS (SELECT doc_id, md5(text) AS fp,
        |    ('0x' || substr(md5('cr_a:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 AS ina,
        |    ('0x' || substr(md5('cr_b:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 AS inb
        |  FROM documents),
        |m AS (SELECT
        |    CAST(count(DISTINCT CASE WHEN ina = 0 THEN fp END) AS BIGINT) AS n1,
        |    CAST(count(DISTINCT CASE WHEN inb = 0 THEN fp END) AS BIGINT) AS n2,
        |    CAST(count(DISTINCT fp) AS BIGINT) AS true_distinct FROM docs),
        |caught AS (SELECT CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS m FROM
        |  (SELECT fp, max(CASE WHEN ina = 0 THEN 1 ELSE 0 END) AS a,
        |     max(CASE WHEN inb = 0 THEN 1 ELSE 0 END) AS b
        |   FROM docs GROUP BY 1)),
        |e AS (SELECT n1, n2, m, true_distinct,
        |    CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0
        |      AS n_hat
        |  FROM m CROSS JOIN caught)
        |SELECT n1, n2, m, true_distinct, n_hat,
        |  abs(n_hat - CAST(true_distinct AS DOUBLE)) /
        |    CAST(true_distinct AS DOUBLE) AS rel_err
        |FROM e""".stripMargin,

    "q244_isotonic" ->
      """WITH lv AS (SELECT CAST(floor(n_chars / 50) AS BIGINT) AS level,
        |    CAST(count(*) AS BIGINT) AS w,
        |    CAST(sum(CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
        |      >= len(string_split(text, ' ')) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS sy
        |  FROM documents GROUP BY 1),
        |pre AS (SELECT level, w, sy,
        |    CAST(sum(w) OVER (ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cw,
        |    CAST(sum(sy) OVER (ORDER BY level ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS BIGINT) AS cs
        |  FROM lv),
        |iv AS (SELECT l.j, r.k,
        |    CAST(r.csk - l.csj0 AS DOUBLE) / CAST(r.cwk - l.cwj0 AS DOUBLE)
        |      AS avg_jk
        |  FROM (SELECT level AS j, cw - w AS cwj0, cs - sy AS csj0 FROM pre) l
        |  JOIN (SELECT level AS k, cw AS cwk, cs AS csk FROM pre) r
        |    ON l.j <= r.k),
        |mk AS (SELECT i.i, iv.j, min(avg_jk) AS mn
        |  FROM (SELECT level AS i FROM pre) i
        |  JOIN iv ON iv.j <= i.i AND i.i <= iv.k GROUP BY 1, 2),
        |ft AS (SELECT i, max(mn) AS fitted FROM mk GROUP BY 1)
        |SELECT level, w, CAST(sy AS DOUBLE) / CAST(w AS DOUBLE) AS raw_rate,
        |  fitted
        |FROM pre JOIN ft ON pre.level = ft.i ORDER BY level""".stripMargin,

    "q245_silhouette" ->
      """WITH pv AS (SELECT label,
        |    unnest(list_transform(range(0, len(embedding)),
        |      i -> {'pos': i, 'v': embedding[CAST(i + 1 AS INT)]})) AS e
        |  FROM embeddings),
        |f AS (SELECT label, CAST(e.pos AS BIGINT) AS pos,
        |    CAST(e.v AS DOUBLE) AS v FROM pv),
        |cmean AS (SELECT label AS cl, pos,
        |    CAST(sum(CAST(floor(v * 16777216) AS BIGINT)) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) / 16777216 AS cv
        |  FROM f GROUP BY 1, 2),
        |cents AS (SELECT cl, list(cv ORDER BY pos) AS cv FROM cmean
        |  GROUP BY 1),
        |sc AS (SELECT vec_id, label, cl,
        |    1.0 - list_dot_product(embedding::DOUBLE[], cv)
        |      / (sqrt(list_dot_product(embedding::DOUBLE[],
        |          embedding::DOUBLE[])) * sqrt(list_dot_product(cv, cv)))
        |      AS dist
        |  FROM embeddings CROSS JOIN cents),
        |own AS (SELECT vec_id, label, dist AS a FROM sc WHERE cl = label),
        |oth AS (SELECT vec_id, min(dist) AS b FROM sc WHERE cl <> label
        |  GROUP BY 1),
        |sil AS (SELECT own.vec_id AS vec_id, label,
        |    (b - a) / greatest(a, b) AS sil
        |  FROM own JOIN oth ON own.vec_id = oth.vec_id)
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(sil ORDER BY vec_id)), (a, x) -> a + x) /
        |    CAST(count(*) AS DOUBLE) AS mean_sil
        |FROM sil GROUP BY 1 ORDER BY label""".stripMargin,

    "q239_l_diversity" ->
      """SELECT lang, CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT source) AS BIGINT) AS l_div,
        |  count(DISTINCT source) >= 3 AS pass
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q240_rbo" -> {
      val pwList = rboPw.map(_.toString).mkString("[", ", ", "]")
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |sc AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
         |    list_dot_product(q.v, c.v) / (sqrt(list_dot_product(q.v, q.v)) *
         |      sqrt(list_dot_product(c.v, c.v))) AS cosine,
         |    list_dot_product(q.v, c.v) AS dotp
         |  FROM e q JOIN e c ON q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id),
         |rk AS (SELECT q_id, c_id,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cosine DESC, c_id ASC) AS ra,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY dotp DESC, c_id ASC) AS rb
         |  FROM sc),
         |cm AS (SELECT q_id, CAST(greatest(ra, rb) AS BIGINT) AS m
         |  FROM rk WHERE ra <= 10 AND rb <= 10),
         |bd AS (SELECT q_id, d, CAST(count(*) AS BIGINT) AS overlap_d
         |  FROM (SELECT q_id, unnest(range(m, 11)) AS d FROM cm)
         |  GROUP BY 1, 2),
         |t AS (SELECT q_id, d,
         |    ($pwList)[CAST(d AS INT)] *
         |      (CAST(overlap_d AS DOUBLE) / CAST(d AS DOUBLE)) AS term,
         |    CASE WHEN d = 10 THEN overlap_d ELSE 0 END AS o10
         |  FROM bd)
         |SELECT q_id, CAST(sum(o10) AS BIGINT) AS overlap_10,
         |  CAST(0.09999999999999998 AS DOUBLE) *
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY d)), (a, x) -> a + x) AS rbo
         |FROM t GROUP BY 1 ORDER BY q_id""".stripMargin
    },

    "q241_geo_median" -> {
      s"""WITH emb AS (SELECT label, vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         |    list_transform(embedding,
         |      x -> CAST(round(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS q
         |  FROM embeddings),
         |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM emb GROUP BY 1),
         |q0 AS (SELECT label,
         |    CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS pos,
         |    unnest(q) AS qv FROM emb),
         |s0 AS (SELECT label, pos, CAST(sum(qv) AS BIGINT) AS sq
         |  FROM q0 GROUP BY 1, 2),
         |x0 AS (SELECT s0.label, pos,
         |    CAST(CAST((sq - (((sq % n) + n) % n)) / n AS BIGINT) AS DOUBLE)
         |      / 1048576.0 AS coord
         |  FROM s0 JOIN n ON n.label = s0.label),
         |a0 AS (SELECT label, list(coord ORDER BY pos) AS x
         |  FROM x0 GROUP BY 1),
         |${(1 to 4).map(geoIterCtes).mkString(",\n")}
         |SELECT label, pos, coord FROM x4 ORDER BY label, pos""".stripMargin
    },

    "q242_neyman_alloc" ->
      """WITH strata AS (SELECT source, CAST(count(*) AS BIGINT) AS nh,
        |    CAST(sum(n_chars) AS BIGINT) AS sy,
        |    CAST(sum(n_chars * n_chars) AS BIGINT) AS syy
        |  FROM documents GROUP BY 1),
        |sv AS (SELECT source, nh, CAST(nh * syy - sy * sy AS DOUBLE) /
        |    CAST(nh * (nh - 1) AS DOUBLE) AS s2 FROM strata),
        |wv AS (SELECT source, nh, s2,
        |    CAST(nh AS DOUBLE) * sqrt(s2) AS w FROM sv),
        |tot AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(w ORDER BY source)), (a, x) -> a + x) AS sumw FROM wv),
        |al AS (SELECT source, nh, s2, 1000.0 * w / sumw AS alloc
        |  FROM wv CROSS JOIN tot),
        |ab AS (SELECT *, CAST(floor(alloc) AS BIGINT) AS base,
        |    alloc - CAST(CAST(floor(alloc) AS BIGINT) AS DOUBLE) AS frac
        |  FROM al),
        |used AS (SELECT CAST(sum(base) AS BIGINT) AS used FROM ab),
        |rk AS (SELECT *, row_number() OVER (ORDER BY frac DESC, source) AS rk
        |  FROM ab CROSS JOIN used)
        |SELECT source, nh AS n_docs, s2, alloc AS alloc_frac,
        |  CAST(base + CASE WHEN rk <= 1000 - used THEN 1 ELSE 0 END AS BIGINT)
        |    AS n_alloc
        |FROM rk ORDER BY source""".stripMargin,

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
