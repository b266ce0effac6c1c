package graft.queries

/**
 * DuckDB mirrors for [[CatalogStats]]. Determinism contract as
 * elsewhere: identical parenthesization on every divide, exact-lg
 * ([[OraclesExt.lgSqlOf]]) wherever the engine uses
 * [[graft.curation.Curation.lg]], and `list_reduce` over a sorted list
 * wherever the engine does a fixed-order fold.
 */
object OraclesStats {

  private val lg = OraclesExt.lgSqlOf _

  val all: Map[String, String] = Map(
    "q207_acf" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |cser AS (SELECT d, n * x - sx AS c FROM daily CROSS JOIN tot),
        |lagged AS (SELECT c,
        |    lag(c, 1) OVER (ORDER BY d) AS c1,
        |    lag(c, 2) OVER (ORDER BY d) AS c2,
        |    lag(c, 3) OVER (ORDER BY d) AS c3,
        |    lag(c, 4) OVER (ORDER BY d) AS c4,
        |    lag(c, 5) OVER (ORDER BY d) AS c5,
        |    lag(c, 6) OVER (ORDER BY d) AS c6,
        |    lag(c, 7) OVER (ORDER BY d) AS c7
        |  FROM cser),
        |sums AS (SELECT CAST(sum(c * c) AS BIGINT) AS den,
        |    CAST(sum(c * c1) AS BIGINT) AS num1, CAST(count(c1) AS BIGINT) AS np1,
        |    CAST(sum(c * c2) AS BIGINT) AS num2, CAST(count(c2) AS BIGINT) AS np2,
        |    CAST(sum(c * c3) AS BIGINT) AS num3, CAST(count(c3) AS BIGINT) AS np3,
        |    CAST(sum(c * c4) AS BIGINT) AS num4, CAST(count(c4) AS BIGINT) AS np4,
        |    CAST(sum(c * c5) AS BIGINT) AS num5, CAST(count(c5) AS BIGINT) AS np5,
        |    CAST(sum(c * c6) AS BIGINT) AS num6, CAST(count(c6) AS BIGINT) AS np6,
        |    CAST(sum(c * c7) AS BIGINT) AS num7, CAST(count(c7) AS BIGINT) AS np7
        |  FROM lagged)
        |SELECT lag, n_pairs, acf FROM (
        |  SELECT 1 AS lag, np1 AS n_pairs,
        |    CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums
        |  UNION ALL SELECT 2, np2, CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 3, np3, CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 4, np4, CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 5, np5, CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 6, np6, CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 7, np7, CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums)
        |ORDER BY lag""".stripMargin,

    "q208_survival" -> {
      s"""WITH users AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_d,
        |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN CAST(ts AS DATE) END) AS conv_d
        |  FROM events GROUP BY 1),
        |horizon AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
        |life AS (SELECT
        |    CAST(date_diff('day', first_d, COALESCE(conv_d, max_d)) AS BIGINT)
        |      AS t,
        |    CASE WHEN conv_d IS NOT NULL
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS death
        |  FROM users CROSS JOIN horizon),
        |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS ending,
        |    CAST(sum(death) AS BIGINT) AS d
        |  FROM life GROUP BY 1),
        |risk AS (SELECT t, d,
        |    CAST(sum(ending) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS n_risk
        |  FROM byt),
        |steps AS (SELECT t, n_risk, d,
        |    CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
        |    ${lg("n_risk - d")} - ${lg("n_risk")} AS step_lg2
        |  FROM risk WHERE d > 0)
        |SELECT t, n_risk, d, hazard,
        |  sum(step_lg2) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS km_lg2
        |FROM steps ORDER BY t""".stripMargin
    },

    "q209_adamic_adar" -> {
      s"""WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM ui GROUP BY 1),
        |pairs AS (SELECT a.item AS i, b.item AS j, a.u AS u
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item),
        |top AS (SELECT i, j FROM pairs GROUP BY 1, 2
        |  ORDER BY count(*) DESC, i, j LIMIT 20),
        |terms AS (SELECT i, j, u, 1.0 / ${lg("dg")} AS w
        |  FROM pairs JOIN top USING (i, j) JOIN deg USING (u))
        |SELECT i, j, CAST(count(*) AS BIGINT) AS common_users,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list({'u': u, 'w': w})), x -> x.w)),
        |    (a, x) -> a + x) AS aa_score
        |FROM terms GROUP BY i, j
        |ORDER BY aa_score DESC, i, j""".stripMargin
    },

    "q210_clustering" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |edges AS (SELECT a.item AS i, b.item AS j
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT i AS v FROM edges UNION ALL SELECT j AS v FROM edges)
        |  GROUP BY 1),
        |tri AS (SELECT e1.i AS x, e1.j AS y, e2.j AS z
        |  FROM edges e1
        |  JOIN edges e2 ON e1.j = e2.i
        |  JOIN edges e3 ON e1.i = e3.i AND e2.j = e3.j),
        |tpn AS (SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM (
        |    SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
        |    UNION ALL SELECT z AS v FROM tri)
        |  GROUP BY 1)
        |SELECT deg.v AS item, degree,
        |  COALESCE(triangles, CAST(0 AS BIGINT)) AS triangles,
        |  CASE WHEN degree >= 2 THEN
        |    CAST(COALESCE(triangles, 0) * 2 AS DOUBLE)
        |      / CAST(degree * (degree - 1) AS DOUBLE)
        |  ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
        |FROM deg LEFT JOIN tpn ON deg.v = tpn.v
        |ORDER BY item""".stripMargin,

    "q211_mann_whitney" ->
      """WITH d AS (SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS ct
        |  FROM documents WHERE lang IN ('en', 'zh') GROUP BY 1),
        |ranked AS (SELECT v, c1, ct,
        |    CAST(sum(ct) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM d),
        |sums AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(ct - c1) AS BIGINT) AS n2,
        |    CAST(sum(c1 * (cum * 2 - ct + 1)) AS BIGINT) AS r1x2,
        |    CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie_t
        |  FROM ranked),
        |u AS (SELECT n1, n2, r1x2 - n1 * (n1 + 1) AS u1_x2, tie_t FROM sums)
        |SELECT n1, n2, u1_x2,
        |  CAST(u1_x2 AS DOUBLE) / 2.0 AS u1,
        |  ((CAST(u1_x2 - n1 * n2 AS DOUBLE) / 2.0) *
        |   (CAST(u1_x2 - n1 * n2 AS DOUBLE) / 2.0) /
        |   (CAST(n1 * n2 AS DOUBLE) / 12.0 *
        |    (CAST(n1 + n2 + 1 AS DOUBLE) -
        |     CAST(tie_t AS DOUBLE) /
        |       CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))) AS z2
        |FROM u""".stripMargin,

    "q212_ks_test" ->
      """WITH d AS (SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS a,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b
        |  FROM documents WHERE source IN ('src0', 'src1') GROUP BY 1),
        |cum AS (SELECT
        |    CAST(sum(a) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS c1,
        |    CAST(sum(b) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS c2
        |  FROM d),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n1,
        |    CAST(sum(b) AS BIGINT) AS n2 FROM d)
        |SELECT max(n1) AS n1, max(n2) AS n2,
        |  CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
        |  CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
        |    / CAST(max(n1) * max(n2) AS DOUBLE) AS d_stat
        |FROM cum CROSS JOIN tot""".stripMargin,

    "q213_zipf_fit" -> {
      def fold(term: String): String =
        s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |      list_transform(ps, p -> $term)), (acc, t) -> acc + t)""".stripMargin
      s"""WITH top AS (SELECT unnest(string_split(text, ' ')) AS t
        |    FROM documents),
        |tf AS (SELECT t, CAST(count(*) AS BIGINT) AS f FROM top GROUP BY 1
        |  ORDER BY f DESC, t LIMIT 1000),
        |pts AS (SELECT
        |    CAST(row_number() OVER (ORDER BY f DESC, t) AS BIGINT) AS r, f
        |  FROM tf),
        |lst AS (SELECT list_sort(list({'r': r,
        |    'x': ${lg("r")}, 'y': ${lg("f")}})) AS ps FROM pts),
        |sums AS (SELECT CAST(len(ps) AS BIGINT) AS n_terms,
        |    ${fold("p.x")} AS sx, ${fold("p.y")} AS sy,
        |    ${fold("p.x * p.y")} AS sxy,
        |    ${fold("p.x * p.x")} AS sxx,
        |    ${fold("p.y * p.y")} AS syy
        |  FROM lst)
        |SELECT n_terms,
        |  ((n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx)) AS slope,
        |  ((sy - (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) * sx)
        |    / n_terms) AS intercept,
        |  ((n_terms * sxy - sx * sy) * (n_terms * sxy - sx * sy) /
        |    ((n_terms * sxx - sx * sx) * (n_terms * syy - sy * sy))) AS r2
        |FROM sums""".stripMargin
    },

    "q214_good_turing" ->
      """WITH counts AS (SELECT t, CAST(count(*) AS BIGINT) AS r FROM (
        |    SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1),
        |fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM counts
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens FROM fof),
        |led AS (SELECT r, n_r, n_tokens,
        |    lead(n_r, 1) OVER (ORDER BY r) AS n_r1,
        |    lead(r, 1) OVER (ORDER BY r) AS r_next
        |  FROM fof CROSS JOIN tot)
        |SELECT r, n_r,
        |  CASE WHEN r_next = r + 1 THEN
        |    CAST(r + 1 AS DOUBLE) * CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE)
        |  END AS r_star,
        |  CASE WHEN r_next = r + 1 THEN
        |    CAST(r + 1 AS DOUBLE) * CAST(n_r1 AS DOUBLE) / CAST(n_r AS DOUBLE)
        |      / CAST(n_tokens AS DOUBLE)
        |  END AS gt_prob
        |FROM led
        |ORDER BY r LIMIT 100""".stripMargin,

    "q215_lexical_diversity" ->
      """WITH tok AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1, 2),
        |agg AS (SELECT lang, CAST(sum(c) AS BIGINT) AS tokens,
        |    CAST(count(*) AS BIGINT) AS types,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM tok GROUP BY 1)
        |SELECT lang, tokens, types,
        |  CAST(types AS DOUBLE) / CAST(tokens AS DOUBLE) AS ttr,
        |  hapax, CAST(hapax AS DOUBLE) / CAST(types AS DOUBLE) AS hapax_share
        |FROM agg ORDER BY lang""".stripMargin,

    "q216_spearman" ->
      """WITH d AS (SELECT doc_id, n_chars AS vx,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS vy
        |  FROM documents),
        |rx AS (SELECT vx, CAST(sum(ct) OVER (ORDER BY vx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 2
        |      - ct + 1 AS BIGINT) AS r_vx
        |  FROM (SELECT vx, CAST(count(*) AS BIGINT) AS ct FROM d GROUP BY 1)),
        |ry AS (SELECT vy, CAST(sum(ct) OVER (ORDER BY vy
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 2
        |      - ct + 1 AS BIGINT) AS r_vy
        |  FROM (SELECT vy, CAST(count(*) AS BIGINT) AS ct FROM d GROUP BY 1)),
        |wr AS (SELECT r_vx, r_vy FROM d JOIN rx USING (vx) JOIN ry USING (vy)),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r_vx) AS BIGINT) AS sx,
        |    CAST(sum(r_vy) AS BIGINT) AS sy FROM wr),
        |c AS (SELECT n,
        |    CAST(n * r_vx - sx AS HUGEINT) AS cx,
        |    CAST(n * r_vy - sy AS HUGEINT) AS cy
        |  FROM wr CROSS JOIN tot),
        |sums AS (SELECT n, sum(cx * cy) AS sxy, sum(cx * cx) AS sxx,
        |    sum(cy * cy) AS syy
        |  FROM c GROUP BY 1)
        |SELECT n, CAST(sxy AS DOUBLE) /
        |  (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE)))
        |  AS spearman_rho
        |FROM sums""".stripMargin,

    "q217_heaps" ->
      """WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
        |thr AS (SELECT decile, CAST(mx * decile // 10 AS BIGINT) AS thr
        |  FROM (SELECT unnest(generate_series(1, 10)) AS decile) CROSS JOIN mx),
        |fs AS (SELECT t, min(doc_id) AS fd FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1),
        |types AS (SELECT decile, CAST(count(*) AS BIGINT) AS types
        |  FROM fs JOIN thr ON fd <= thr GROUP BY 1),
        |toks AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(nt) AS BIGINT) AS tokens
        |  FROM (SELECT doc_id,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
        |    FROM documents) d
        |  JOIN thr ON d.doc_id <= thr GROUP BY 1)
        |SELECT decile, n_docs, tokens, types
        |FROM toks JOIN types USING (decile)
        |ORDER BY decile""".stripMargin,

    "q218_cdc_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    [struct_pack(pos := CAST(i - 1 AS BIGINT), t := w[i])
        |     for i in range(1, len(w) + 1)] AS gs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
        |toks AS (SELECT doc_id, pos, t,
        |    CASE WHEN ('0x' || substr(md5(t), 1, 8))::BIGINT % 8 = 0
        |      THEN 1 ELSE 0 END AS b
        |  FROM (SELECT doc_id, unnest(gs, recursive := true) FROM t)),
        |ch AS (SELECT doc_id, pos, t,
        |    COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS chunk_id
        |  FROM toks),
        |chunks AS (SELECT doc_id,
        |    string_agg(t, ' ' ORDER BY pos) AS chunk,
        |    CAST(count(*) AS BIGINT) AS n_words
        |  FROM ch GROUP BY doc_id, chunk_id
        |  HAVING count(*) >= 3)
        |SELECT md5(chunk) AS chunk_hash, max(n_words) AS n_words,
        |  CAST(count(*) AS BIGINT) AS n_occurrences,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM chunks GROUP BY chunk
        |ORDER BY n_occurrences DESC, chunk
        |LIMIT 20""".stripMargin,

    "q219_mutual_info" -> {
      s"""WITH cells AS (SELECT event_type AS x,
        |    CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |rx AS (SELECT x, CAST(sum(c) AS BIGINT) AS rx FROM cells GROUP BY 1),
        |cy AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |terms AS (SELECT x, y, n,
        |    (CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (${lg("c")} + ${lg("n")} - ${lg("rx")} - ${lg("cy")}) AS term
        |  FROM cells JOIN rx USING (x) JOIN cy USING (y) CROSS JOIN tot)
        |SELECT n, CAST(len(cs) AS BIGINT) AS n_cells,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(cs, z -> z.term)), (a, t) -> a + t) AS mi_lg2
        |FROM (SELECT n,
        |    list_sort(list({'x': x, 'y': y, 'term': term})) AS cs
        |  FROM terms GROUP BY n)""".stripMargin
    },

    "q220_fertility" -> {
      s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS words,
        |  CAST(sum(n_pieces) AS BIGINT) AS pieces,
        |  CAST(sum(n_pieces) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
        |    AS fertility,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_pieces) AS DOUBLE)
        |    AS bytes_per_piece
        |FROM (${OraclesExt.bpeEncodeSql(8)}) e
        |JOIN documents USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin
    },

    "q221_burstiness" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |per AS (SELECT t, CAST(sum(c) AS BIGINT) AS s,
        |    CAST(sum(c * c) AS BIGINT) AS s2,
        |    CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT t, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
        |      SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |      FROM documents)
        |    GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT t AS token, df, s AS count,
        |  CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |  CAST(n * s2 - s * s AS DOUBLE) / CAST((n - 1) * s AS DOUBLE) AS fano
        |FROM per CROSS JOIN n
        |WHERE s >= 100
        |ORDER BY fano DESC, token
        |LIMIT 25""".stripMargin,

    "q222_diversity" -> {
      s"""WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS n_sources,
        |    CAST(sum(c * (c - 1)) AS BIGINT) AS pairs
        |  FROM cells GROUP BY 1),
        |terms AS (SELECT cells.lang, nn, n_sources, pairs, source,
        |    (CAST(c AS DOUBLE) / CAST(nn AS DOUBLE)) *
        |      (${lg("nn")} - ${lg("c")}) AS h
        |  FROM cells JOIN tot USING (lang))
        |SELECT lang, max(nn) AS n_docs, max(n_sources) AS n_sources,
        |  CAST(max(pairs) AS DOUBLE)
        |    / CAST(max(nn) * (max(nn) - 1) AS DOUBLE) AS simpson,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list({'k': source, 'h': h})),
        |      x -> x.h)), (a, t) -> a + t) AS shannon_lg2
        |FROM terms GROUP BY lang
        |ORDER BY lang""".stripMargin
    },

    "q223_ndcg" -> {
      s"""WITH knn AS (SELECT * FROM (${OraclesExt.knnSql}) k),
        |lab AS (SELECT vec_id, label FROM embeddings),
        |nrel AS (SELECT label, CAST(count(*) AS BIGINT) AS n_label
        |  FROM embeddings GROUP BY 1),
        |rels AS (SELECT knn.q_id, ql.label AS label, knn.rnk,
        |    CASE WHEN cl.label = ql.label THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS rel
        |  FROM knn
        |  JOIN lab ql ON knn.q_id = ql.vec_id
        |  JOIN lab cl ON knn.c_id = cl.vec_id),
        |per AS (SELECT q_id, label,
        |    CAST(sum(rel) AS BIGINT) AS n_rel_topk,
        |    list_sort(list({'rnk': rnk, 'rel': rel})) AS rs
        |  FROM rels GROUP BY 1, 2)
        |SELECT q_id, label, n_rel_topk,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(rs, x ->
        |      CAST(x.rel AS DOUBLE) / ${lg("(x.rnk + 1)")})),
        |    (a, t) -> a + t) AS dcg,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, CAST(least(10, n_label - 1) AS BIGINT) + 1),
        |      i -> 1.0 / ${lg("(i + 1)")})),
        |    (a, t) -> a + t) AS idcg,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(rs, x ->
        |      CAST(x.rel AS DOUBLE) / ${lg("(x.rnk + 1)")})),
        |    (a, t) -> a + t) /
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(range(1, CAST(least(10, n_label - 1) AS BIGINT) + 1),
        |      i -> 1.0 / ${lg("(i + 1)")})),
        |    (a, t) -> a + t) AS ndcg
        |FROM per JOIN nrel USING (label)
        |ORDER BY q_id""".stripMargin
    },

    "q224_label_noise" ->
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
        |    list_dot_product(embedding::DOUBLE[], cv)
        |      / (sqrt(list_dot_product(embedding::DOUBLE[],
        |          embedding::DOUBLE[])) * sqrt(list_dot_product(cv, cv)))
        |      AS cos
        |  FROM embeddings CROSS JOIN cents),
        |pred AS (SELECT vec_id, label, cl AS pred_label, cos AS cos_pred,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cos DESC, cl) AS rn
        |  FROM sc),
        |own AS (SELECT vec_id, cos AS cos_own FROM sc WHERE cl = label)
        |SELECT vec_id, label, pred_label, cos_own, cos_pred,
        |  cos_pred - cos_own AS margin
        |FROM pred JOIN own USING (vec_id)
        |WHERE rn = 1 AND pred_label <> label
        |ORDER BY margin DESC, vec_id
        |LIMIT 50""".stripMargin,

    "q225_stratified_ate" ->
      """WITH users AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |u AS (SELECT user_id % 2 AS variant, n_ev // 20 AS stratum, conv
        |  FROM users),
        |strata AS (SELECT stratum, CAST(count(*) AS BIGINT) AS n_s,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS c0
        |  FROM u GROUP BY 1
        |  HAVING n1 > 0 AND n0 > 0),
        |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS n_strata FROM strata),
        |terms AS (SELECT nn, n_strata, stratum,
        |    (CAST(n_s AS DOUBLE) / CAST(nn AS DOUBLE)) *
        |      (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |       CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS term
        |  FROM strata CROSS JOIN tot)
        |SELECT nn AS n_users, n_strata,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list({'stratum': stratum,
        |      'term': term})), x -> x.term)), (a, t) -> a + t) AS ate
        |FROM terms GROUP BY nn, n_strata""".stripMargin,

    "q226_wilson_ci" ->
      """WITH conv AS (SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |arms AS (SELECT user_id % 2 AS variant,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
        |  FROM conv GROUP BY 1)
        |SELECT variant, n, c,
        |  CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p_hat,
        |  ((CAST(c AS DOUBLE) + 1.9207294103470627) /
        |   (CAST(n AS DOUBLE) + 3.8414588206941254) -
        |   1.959963984540054 * sqrt(CAST(c AS DOUBLE) *
        |     CAST(n - c AS DOUBLE) / CAST(n AS DOUBLE) + 0.9603647051735313)
        |     / (CAST(n AS DOUBLE) + 3.8414588206941254)) AS wilson_lo,
        |  ((CAST(c AS DOUBLE) + 1.9207294103470627) /
        |   (CAST(n AS DOUBLE) + 3.8414588206941254) +
        |   1.959963984540054 * sqrt(CAST(c AS DOUBLE) *
        |     CAST(n - c AS DOUBLE) / CAST(n AS DOUBLE) + 0.9603647051735313)
        |     / (CAST(n AS DOUBLE) + 3.8414588206941254)) AS wilson_hi
        |FROM arms ORDER BY variant""".stripMargin,

    "q227_kendall_tau" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |p AS (SELECT a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN (x2 - x1) * (y2 - y1) > 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS concordant,
        |    CAST(sum(CASE WHEN (x2 - x1) * (y2 - y1) < 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS discordant,
        |    CAST(sum(CASE WHEN x1 = x2 THEN 1 ELSE 0 END) AS BIGINT) AS ties_x,
        |    CAST(sum(CASE WHEN y1 = y2 THEN 1 ELSE 0 END) AS BIGINT) AS ties_y
        |  FROM p)
        |SELECT n0, concordant, discordant, ties_x, ties_y,
        |  CAST(concordant - discordant AS DOUBLE) /
        |    sqrt(CAST((n0 - ties_x) * (n0 - ties_y) AS DOUBLE)) AS tau_b
        |FROM c""".stripMargin,

    "q228_cuped" ->
      """WITH span AS (SELECT min(CAST(ts AS DATE)) AS min_d,
        |    max(CAST(ts AS DATE)) AS max_d FROM events),
        |mid AS (SELECT min_d + CAST(floor(
        |    CAST(date_diff('day', min_d, max_d) AS DOUBLE) / 2) AS INT)
        |    AS mid_d FROM span),
        |users AS (SELECT user_id,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < mid_d THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) >= mid_d
        |      AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
        |  FROM events CROSS JOIN mid GROUP BY 1),
        |u AS (SELECT user_id % 2 AS variant, x, y FROM users),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
        |    CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
        |    CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0
        |  FROM u),
        |t AS (SELECT *, CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS theta FROM m)
        |SELECT n AS n_users, theta,
        |  (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |    CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS diff_raw,
        |  ((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) - theta *
        |    (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
        |      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) -
        |   (CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) - theta *
        |    (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) -
        |      CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) AS diff_cuped,
        |  (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (CAST(n * sxx - sx * sx AS DOUBLE) *
        |      CAST(n * syy - sy * sy AS DOUBLE))) AS rho2
        |FROM t""".stripMargin,

    "q229_kappa" ->
      """WITH rated AS (SELECT
        |    (n_chars >= 150 AND n_chars <= 450) AS ra,
        |    (2 * len(list_distinct(string_split(text, ' '))) >=
        |      len(string_split(text, ' '))) AS rb
        |  FROM documents),
        |c AS (SELECT
        |    CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS both_pass,
        |    CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS only_a,
        |    CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS only_b,
        |    CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
        |      AS neither
        |  FROM rated)
        |SELECT both_pass, only_a, only_b, neither,
        |  CAST(both_pass + neither AS DOUBLE) /
        |    CAST(both_pass + only_a + only_b + neither AS DOUBLE) AS po,
        |  CAST((both_pass + only_a + only_b + neither) * (both_pass + neither) -
        |      ((both_pass + only_a) * (both_pass + only_b) +
        |        (only_b + neither) * (only_a + neither)) AS DOUBLE) /
        |    CAST((both_pass + only_a + only_b + neither) *
        |        (both_pass + only_a + only_b + neither) -
        |      ((both_pass + only_a) * (both_pass + only_b) +
        |        (only_b + neither) * (only_a + neither)) AS DOUBLE) AS kappa
        |FROM c""".stripMargin,

    "q230_jsd" -> {
      s"""WITH tk AS (SELECT source,
         |    CAST(('0x' || substr(md5(tok), 1, 8))::BIGINT % 64 AS BIGINT) AS b
         |  FROM (SELECT source, unnest(string_split(text, ' ')) AS tok
         |        FROM documents)),
         |dc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS ct
         |  FROM tk GROUP BY 1, 2),
         |tot AS (SELECT source, CAST(sum(ct) AS BIGINT) AS nt FROM dc GROUP BY 1),
         |bs AS (SELECT DISTINCT b FROM dc),
         |grid AS (SELECT a.source AS sa, a.nt AS na,
         |    bb.source AS sb, bb.nt AS nb, bs.b
         |  FROM tot a JOIN tot bb ON a.source < bb.source CROSS JOIN bs),
         |j AS (SELECT sa, sb, grid.b AS b, na, nb,
         |    CAST(coalesce(ca.ct, 0) AS BIGINT) AS ca,
         |    CAST(coalesce(cb.ct, 0) AS BIGINT) AS cb
         |  FROM grid
         |  LEFT JOIN dc ca ON ca.source = grid.sa AND ca.b = grid.b
         |  LEFT JOIN dc cb ON cb.source = grid.sb AND cb.b = grid.b),
         |t AS (SELECT sa, sb, b,
         |    0.5 * (CASE WHEN ca > 0 THEN
         |      (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)) *
         |        (${lg("2 * ca * nb")} - ${lg("ca * nb + cb * na")})
         |      ELSE 0.0 END) +
         |    0.5 * (CASE WHEN cb > 0 THEN
         |      (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) *
         |        (${lg("2 * cb * na")} - ${lg("ca * nb + cb * na")})
         |      ELSE 0.0 END) AS contrib
         |  FROM j WHERE ca + cb > 0)
         |SELECT sa, sb,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(contrib ORDER BY b)), (a, x) -> a + x) AS jsd_bits
         |FROM t GROUP BY 1, 2 ORDER BY sa, sb""".stripMargin
    })
}
