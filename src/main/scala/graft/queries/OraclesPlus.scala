package graft.queries

/** DuckDB mirrors for [[CatalogPlus]]. */
object OraclesPlus {

  private val lg = OraclesExt.lgSqlOf _

  /** One gradient-boosting round (q290): residuals from the previous
    * additive model, candidate stats via (cell, y)-ascending folds, split
    * = min (SSE, threshold index), leaf values η·mean(residual) — mirrors
    * the engine's driver loop op-for-op over the same sufficient
    * statistics. */
  private def gbIterCtes(k: Int): String = {
    val prev = if (k == 1) "f0" else s"f${k - 1}"
    s"""rs$k AS MATERIALIZED (SELECT cell, y, cnt,
       |    CAST(y AS DOUBLE) - fv AS r FROM $prev),
       |agg$k AS MATERIALIZED (SELECT
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(cnt AS DOUBLE) * (r * r) ORDER BY cell, y)),
       |      (a, x) -> a + x) AS ss,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(cnt AS DOUBLE) * r ORDER BY cell, y)),
       |      (a, x) -> a + x) AS stot
       |  FROM rs$k),
       |cand$k AS MATERIALIZED (SELECT ci,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(cnt AS DOUBLE) * r ORDER BY cell, y)),
       |      (a, x) -> a + x) AS sl,
       |    CAST(sum(cnt) AS BIGINT) AS cl
       |  FROM (SELECT unnest(range(1, 10)) AS ci) c
       |  JOIN rs$k ON rs$k.cell < c.ci GROUP BY ci),
       |sc$k AS MATERIALIZED (SELECT ci, sl, cl, stot - sl AS sr,
       |    ntot - cl AS cr,
       |    ss - ((sl * sl) / CAST(cl AS DOUBLE)
       |      + ((stot - sl) * (stot - sl)) / CAST(ntot - cl AS DOUBLE)) AS sse
       |  FROM cand$k CROSS JOIN agg$k CROSS JOIN tt
       |  WHERE cl > 0 AND cl < ntot),
       |pk$k AS MATERIALIZED (SELECT ci, sse,
       |    0.5 * (sl / CAST(cl AS DOUBLE)) AS vl,
       |    0.5 * (sr / CAST(cr AS DOUBLE)) AS vr
       |  FROM sc$k ORDER BY sse, ci LIMIT 1),
       |f$k AS MATERIALIZED (SELECT f.cell, f.y, f.cnt,
       |    f.fv + CASE WHEN f.cell < p.ci THEN p.vl ELSE p.vr END AS fv
       |  FROM $prev f CROSS JOIN pk$k p)""".stripMargin
  }

  /** One Jacobi hitting-time round (q297): h_i ← 1 + Σ_j c_ij·h_j ∕ c_i·
    * over the previous round's h, dst-ascending folds, absorbing and
    * dead-end states pinned at 0 — mirrors the engine's driver loop. */
  private def htIterCtes(t: Int): String = {
    val prev = if (t == 1) "h0" else s"h${t - 1}"
    s"""h$t AS MATERIALIZED (SELECT rt.state AS state,
       |    CASE WHEN rt.state = 'purchase' OR rt.rtot = 0 THEN 0.0
       |      ELSE 1.0 + COALESCE((SELECT
       |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |            list(CAST(tr.c AS DOUBLE) * p.h ORDER BY tr.dst)),
       |            (a, x) -> a + x)
       |        FROM tr JOIN $prev p ON p.state = tr.dst
       |        WHERE tr.src = rt.state), 0.0) / CAST(rt.rtot AS DOUBLE)
       |    END AS h
       |  FROM rt)""".stripMargin
  }

  /** One Bradley–Terry MM round (q282): j-ascending denominator folds,
    * i-ascending normalization, prev-π fallback when the update is
    * degenerate — mirrors the engine's driver loop op-for-op. */
  private def btIterCtes(t: Int): String = {
    val prev = if (t == 1) "r0" else s"r${t - 1}"
    s"""d$t AS MATERIALIZED (SELECT a.i AS i,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(nm.nij AS DOUBLE) / (a.pi + b.pi) ORDER BY b.i)),
       |      (x, y) -> x + y) AS den
       |  FROM $prev a LEFT JOIN nm ON nm.i = a.i
       |  LEFT JOIN $prev b ON b.i = nm.j
       |  GROUP BY a.i, a.pi),
       |u$t AS MATERIALIZED (SELECT d.i AS i,
       |    CASE WHEN d.den IS NULL OR d.den = 0 THEN 0.0
       |         ELSE CAST(wt.wins AS DOUBLE) / d.den END AS u
       |  FROM d$t d JOIN wt ON wt.i = d.i),
       |s$t AS MATERIALIZED (SELECT list_reduce(list_prepend(
       |    CAST(0.0 AS DOUBLE), list(u ORDER BY i)), (x, y) -> x + y) AS s
       |  FROM u$t),
       |r$t AS MATERIALIZED (SELECT u.i AS i,
       |    CASE WHEN s.s > 0 THEN u.u / s.s ELSE p.pi END AS pi
       |  FROM u$t u CROSS JOIN s$t s JOIN $prev p ON p.i = u.i)""".stripMargin
  }

  val all: Map[String, String] = Map(

    "q278_fuzzy_name_match" ->
      """WITH cust AS (SELECT c_name FROM customer),
        |probes AS (SELECT DISTINCT
        |    substr(c_name, 1, 3) || substr(c_name, 5) AS probe,
        |    substr(c_name, len(c_name) - 3, 4) AS bk FROM cust),
        |cands AS (SELECT c_name,
        |    substr(c_name, len(c_name) - 3, 4) AS bk FROM cust)
        |SELECT probe, CAST(count(*) AS BIGINT) AS n_matches,
        |  min(c_name) AS first_match
        |FROM probes JOIN cands USING (bk)
        |WHERE levenshtein(probe, c_name) <= 1
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q279_synth_source_agg" ->
      """WITH ids AS (SELECT unnest(range(10000, 40000)) AS doc_id),
        |g AS (SELECT doc_id,
        |    md5('g9:a:' || CAST(doc_id AS VARCHAR)) AS ma,
        |    md5('g9:w:' || CAST(doc_id AS VARCHAR)) AS mw FROM ids),
        |f AS (SELECT doc_id, mw,
        |    8 + CAST(('0x' || substr(ma, 1, 8))::BIGINT % 25 AS INT)
        |      AS n_words,
        |    (['en','de','fr','es'])
        |      [CAST(('0x' || substr(ma, 9, 2))::BIGINT % 4 AS INT) + 1]
        |      AS lang,
        |    (['web','wiki','code','news','forum'])
        |      [CAST(('0x' || substr(ma, 11, 2))::BIGINT % 5 AS INT) + 1]
        |      AS source
        |  FROM g),
        |v AS (SELECT ['key','agg','row','scan','slow','fast','table',
        |    'value','part','hash','merge','batch','line','sort','window',
        |    'spark'] AS vocab),
        |c AS (SELECT lang, source, n_words,
        |    CAST(list_reduce(list_prepend(0, list_transform(range(n_words),
        |        j -> strlen(vocab[('0x' || substr(mw, CAST(j AS INT) + 1, 1))
        |          ::INT + 1]))),
        |      (a, x) -> a + x) + (n_words - 1) AS INT) AS n_chars
        |  FROM f CROSS JOIN v)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS sum_words,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q280_brier_decomp" ->
      """WITH d AS (SELECT
        |    ('0x' || substr(md5('brier:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 10 AS b,
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS o
        |  FROM documents),
        |bk AS (SELECT b, CAST(count(*) AS BIGINT) AS nk,
        |    CAST(sum(o) AS BIGINT) AS ok FROM d GROUP BY 1),
        |l AS (SELECT list(struct_pack(b := b, nk := nk, ok := ok) ORDER BY b)
        |    AS xs FROM bk),
        |t AS (SELECT xs,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(xs, e -> e.nk)), (a, x) -> a + x) AS n,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(xs, e -> e.ok)), (a, x) -> a + x) AS o
        |  FROM l),
        |u AS (SELECT xs, n, o,
        |    CAST(o AS DOUBLE) / CAST(n AS DOUBLE) AS obar FROM t)
        |SELECT n AS n_docs,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(xs, e ->
        |      CAST(e.nk AS DOUBLE) * ((CAST(e.b * 2 + 1 AS DOUBLE) / 20.0)
        |        * (CAST(e.b * 2 + 1 AS DOUBLE) / 20.0))
        |      - (2.0 * (CAST(e.b * 2 + 1 AS DOUBLE) / 20.0))
        |        * CAST(e.ok AS DOUBLE)
        |      + CAST(e.ok AS DOUBLE))), (a, x) -> a + x)
        |    / CAST(n AS DOUBLE) AS brier,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(xs, e ->
        |      CAST(e.nk AS DOUBLE) *
        |        ((CAST(e.b * 2 + 1 AS DOUBLE) / 20.0
        |          - CAST(e.ok AS DOUBLE) / CAST(e.nk AS DOUBLE))
        |        * (CAST(e.b * 2 + 1 AS DOUBLE) / 20.0
        |          - CAST(e.ok AS DOUBLE) / CAST(e.nk AS DOUBLE))))),
        |    (a, x) -> a + x) / CAST(n AS DOUBLE) AS reliability,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(xs, e ->
        |      CAST(e.nk AS DOUBLE) *
        |        ((CAST(e.ok AS DOUBLE) / CAST(e.nk AS DOUBLE) - obar)
        |        * (CAST(e.ok AS DOUBLE) / CAST(e.nk AS DOUBLE) - obar)))),
        |    (a, x) -> a + x) / CAST(n AS DOUBLE) AS resolution,
        |  obar * (1.0 - obar) AS uncertainty
        |FROM u""".stripMargin,

    "q281_roc_auc" ->
      """WITH byv AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM documents GROUP BY 1),
        |rk AS (SELECT v, c, p,
        |    COALESCE(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1 AS rlo
        |  FROM byv),
        |a AS (SELECT CAST(sum(p * (rlo * 2 + c - 1)) AS BIGINT) AS r1x2,
        |    CAST(sum(p) AS BIGINT) AS n1, CAST(sum(c) AS BIGINT) AS n FROM rk)
        |SELECT n1, n - n1 AS n0,
        |  CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE)
        |    / CAST(n1 * (n - n1) * 2 AS DOUBLE) AS auc
        |FROM a""".stripMargin,

    "q282_bt_rank" -> {
      s"""WITH pr AS (SELECT event_type AS lo,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS wi
         |  FROM events),
         |w AS (SELECT wi, lo, CAST(count(*) AS BIGINT) AS w FROM pr
         |  WHERE wi IS NOT NULL AND wi <> lo GROUP BY 1, 2),
         |ty AS (SELECT CAST(row_number() OVER (ORDER BY t) AS BIGINT) - 1
         |      AS i, t
         |  FROM (SELECT DISTINCT t FROM
         |    (SELECT wi AS t FROM w UNION ALL SELECT lo FROM w))),
         |nm AS (SELECT ti.i AS i, tj.i AS j, CAST(sum(cnt) AS BIGINT) AS nij
         |  FROM (SELECT wi AS x, lo AS y, w AS cnt FROM w
         |    UNION ALL SELECT lo AS x, wi AS y, w AS cnt FROM w) q
         |  JOIN ty ti ON ti.t = q.x JOIN ty tj ON tj.t = q.y GROUP BY 1, 2),
         |wt AS (SELECT ti.i AS i,
         |    COALESCE(CAST(sum(w.w) AS BIGINT), CAST(0 AS BIGINT)) AS wins
         |  FROM ty ti LEFT JOIN w ON w.wi = ti.t GROUP BY 1),
         |r0 AS (SELECT i, CAST(0.2e0 AS DOUBLE) AS pi FROM ty),
         |${(1 to 8).map(btIterCtes).mkString(",\n")}
         |SELECT ty.t AS event_type, wt.wins AS wins, r8.pi AS pi
         |FROM ty JOIN wt ON wt.i = ty.i JOIN r8 ON r8.i = ty.i
         |ORDER BY 1""".stripMargin
    },

    "q283_ips_ate" ->
      """WITH users AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |ux AS (SELECT y, user_id % 2 AS t, user_id % 5 AS x FROM users),
        |st AS (SELECT x, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(t) AS BIGINT) AS nt,
        |    CAST(sum(t * y) AS BIGINT) AS syt,
        |    CAST(sum((1 - t) * y) AS BIGINT) AS syc
        |  FROM ux GROUP BY 1
        |  HAVING CAST(sum(t) AS BIGINT) > 0
        |    AND CAST(sum(t) AS BIGINT) < CAST(count(*) AS BIGINT)),
        |l AS (SELECT list(struct_pack(x := x, n := n, nt := nt,
        |      syt := syt, syc := syc) ORDER BY x) AS xs FROM st),
        |t AS (SELECT xs, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(xs, e -> e.n)), (a, v) -> a + v) AS nu FROM l)
        |SELECT nu AS n_users, CAST(len(xs) AS BIGINT) AS n_strata,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(xs, e ->
        |      CAST(e.syt * e.n AS DOUBLE) / CAST(e.nt AS DOUBLE)
        |      - CAST(e.syc * e.n AS DOUBLE) / CAST(e.n - e.nt AS DOUBLE))),
        |    (a, v) -> a + v) / CAST(nu AS DOUBLE) AS ate_ips
        |FROM t""".stripMargin,

    "q284_diff_in_diff" ->
      """WITH p AS (SELECT user_id % 2 = 1 AS treat,
        |    ts >= TIMESTAMP '2024-01-16' AS post,
        |    CAST(value AS DECIMAL(25,6)) AS v
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT
        |    sum(CASE WHEN treat AND NOT post THEN v END) AS s_t_pre,
        |    count(CASE WHEN treat AND NOT post THEN 1 END) AS c_t_pre,
        |    sum(CASE WHEN treat AND post THEN v END) AS s_t_post,
        |    count(CASE WHEN treat AND post THEN 1 END) AS c_t_post,
        |    sum(CASE WHEN NOT treat AND NOT post THEN v END) AS s_c_pre,
        |    count(CASE WHEN NOT treat AND NOT post THEN 1 END) AS c_c_pre,
        |    sum(CASE WHEN NOT treat AND post THEN v END) AS s_c_post,
        |    count(CASE WHEN NOT treat AND post THEN 1 END) AS c_c_post
        |  FROM p),
        |m AS (SELECT
        |    CASE WHEN c_t_pre > 0
        |      THEN CAST(s_t_pre AS DOUBLE) / CAST(c_t_pre AS DOUBLE) END
        |      AS m_t_pre,
        |    CASE WHEN c_t_post > 0
        |      THEN CAST(s_t_post AS DOUBLE) / CAST(c_t_post AS DOUBLE) END
        |      AS m_t_post,
        |    CASE WHEN c_c_pre > 0
        |      THEN CAST(s_c_pre AS DOUBLE) / CAST(c_c_pre AS DOUBLE) END
        |      AS m_c_pre,
        |    CASE WHEN c_c_post > 0
        |      THEN CAST(s_c_post AS DOUBLE) / CAST(c_c_post AS DOUBLE) END
        |      AS m_c_post
        |  FROM a)
        |SELECT m_t_pre, m_t_post, m_c_pre, m_c_post,
        |  (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did
        |FROM m""".stripMargin,

    "q285_flesch_reading" ->
      """WITH d AS (SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |    CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS syl
        |  FROM documents),
        |sc AS (SELECT doc_id, lang, w, syl,
        |    206.835e0 - 1.015e0 * CAST(w AS DOUBLE)
        |      - 84.6e0 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) AS score
        |  FROM d)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(CAST(sum(w) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_words,
        |  CAST(CAST(sum(syl) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS syl_per_word,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(score ORDER BY doc_id)), (a, x) -> a + x)
        |    / CAST(count(*) AS DOUBLE) AS mean_flesch
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,

    "q286_dispersion_index" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_daily,
        |  CAST(n * (n * s2 - s1 * s1) AS DOUBLE)
        |    / CAST(n * (n - 1) * s1 AS DOUBLE) AS dispersion,
        |  n * (n * s2 - s1 * s1) > n * (n - 1) * s1 * 2 AS overdispersed
        |FROM a WHERE n > 1 ORDER BY 1""".stripMargin,

    "q287_jsd_sources" -> {
      s"""WITH tk AS (SELECT source, unnest(string_split(text, ' ')) AS tok
         |  FROM documents),
         |tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |tt AS (SELECT source, CAST(sum(c) AS BIGINT) AS nn
         |  FROM tc GROUP BY 1),
         |vocab AS (SELECT DISTINCT tok FROM tc),
         |pairs AS (SELECT a.source AS s1, a.nn AS na, b.source AS s2,
         |    b.nn AS nb
         |  FROM tt a JOIN tt b ON a.source < b.source),
         |grid AS (SELECT s1, s2, v.tok AS tok, na, nb,
         |    COALESCE(ta.c, CAST(0 AS BIGINT)) AS a,
         |    COALESCE(tb.c, CAST(0 AS BIGINT)) AS b
         |  FROM pairs CROSS JOIN vocab v
         |  LEFT JOIN tc ta ON ta.source = s1 AND ta.tok = v.tok
         |  LEFT JOIN tc tb ON tb.source = s2 AND tb.tok = v.tok),
         |ct AS (SELECT s1, s2, tok,
         |    (CASE WHEN a > 0 THEN
         |      (CAST(a AS DOUBLE) / CAST(na AS DOUBLE))
         |        * (${lg("a * nb * 2")} - ${lg("a * nb + b * na")})
         |      ELSE 0.0 END)
         |    + (CASE WHEN b > 0 THEN
         |      (CAST(b AS DOUBLE) / CAST(nb AS DOUBLE))
         |        * (${lg("b * na * 2")} - ${lg("a * nb + b * na")})
         |      ELSE 0.0 END) AS contrib
         |  FROM grid WHERE a + b > 0)
         |SELECT s1, s2,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(contrib ORDER BY tok)), (x, y) -> x + y) * 0.5 AS jsd_bits
         |FROM ct GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q288_lang_kappa" -> {
      s"""WITH q22 AS (
         |${OraclesExt.langIdSql}
         |),
         |cells AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
         |  FROM q22 GROUP BY 1, 2),
         |rm AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rm
         |  FROM cells GROUP BY 1),
         |cm AS (SELECT predicted_lang, CAST(sum(n) AS BIGINT) AS cm
         |  FROM cells GROUP BY 1),
         |ch AS (SELECT CAST(sum(rm.rm * cm.cm) AS BIGINT) AS sumrc
         |  FROM rm JOIN cm ON cm.predicted_lang = rm.lang),
         |b AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN lang = predicted_lang THEN n ELSE 0 END)
         |      AS BIGINT) AS agree
         |  FROM cells)
         |SELECT n_docs, agree,
         |  CAST(agree AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p_o,
         |  CAST(sumrc AS DOUBLE)
         |    / CAST(n_docs * n_docs AS DOUBLE) AS p_e,
         |  CAST(n_docs * agree - sumrc AS DOUBLE)
         |    / CAST(n_docs * n_docs - sumrc AS DOUBLE) AS kappa
         |FROM b CROSS JOIN ch""".stripMargin
    },

    "q289_holt_linear" ->
      """WITH RECURSIVE daily AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |idx AS (SELECT ds, c,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i FROM daily),
        |hw AS (
        |  SELECT i, ds, c, CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS t,
        |    CAST(NULL AS DOUBLE) AS fcst
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.ds, idx.c,
        |    0.5 * CAST(idx.c AS DOUBLE) + 0.5 * (hw.l + hw.t),
        |    0.25 * ((0.5 * CAST(idx.c AS DOUBLE) + 0.5 * (hw.l + hw.t))
        |      - hw.l) + 0.75 * hw.t,
        |    hw.l + hw.t
        |  FROM hw JOIN idx ON idx.i = hw.i + 1)
        |SELECT i, ds, c, l AS level, t AS trend, fcst
        |FROM hw ORDER BY i""".stripMargin,

    "q290_boosted_stumps" -> {
      s"""WITH cl0 AS (SELECT
         |    CAST((n_chars > 100)::INT + (n_chars > 150)::INT
         |      + (n_chars > 200)::INT + (n_chars > 250)::INT
         |      + (n_chars > 300)::INT + (n_chars > 350)::INT
         |      + (n_chars > 400)::INT + (n_chars > 450)::INT
         |      + (n_chars > 500)::INT AS BIGINT) AS cell,
         |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS yy
         |  FROM documents),
         |cs AS (SELECT cell, CAST(yy AS BIGINT) AS y,
         |    CAST(count(*) AS BIGINT) AS cnt FROM cl0 GROUP BY 1, 2),
         |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS ntot,
         |    CAST(sum(y * cnt) AS BIGINT) AS ytot FROM cs),
         |f0 AS (SELECT cell, y, cnt,
         |    CAST(ytot AS DOUBLE) / CAST(ntot AS DOUBLE) AS fv
         |  FROM cs CROSS JOIN tt),
         |${(1 to 3).map(gbIterCtes).mkString(",\n")}
         |SELECT round, threshold, vl AS left_val, vr AS right_val, sse
         |FROM (
         |  SELECT CAST(1 AS BIGINT) AS round,
         |    CAST(([100,150,200,250,300,350,400,450,500])[ci] AS BIGINT)
         |      AS threshold, vl, vr, sse FROM pk1
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT),
         |    CAST(([100,150,200,250,300,350,400,450,500])[ci] AS BIGINT),
         |    vl, vr, sse FROM pk2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT),
         |    CAST(([100,150,200,250,300,350,400,450,500])[ci] AS BIGINT),
         |    vl, vr, sse FROM pk3)
         |ORDER BY round""".stripMargin
    },

    "q291_match_att" ->
      """WITH users AS (SELECT user_id, CAST(count(*) AS BIGINT) AS ne,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |u2 AS (SELECT user_id, ne, y, user_id % 2 AS t, user_id % 5 AS x
        |  FROM users),
        |tr AS (SELECT x, user_id AS tu, ne AS tne, y AS ty FROM u2
        |  WHERE t = 1),
        |co AS (SELECT x, user_id AS cu, ne AS cne, y AS cy FROM u2
        |  WHERE t = 0),
        |pm AS (SELECT tu, ty, cy, row_number() OVER (PARTITION BY tu
        |    ORDER BY abs(tne - cne), cu) AS rk
        |  FROM tr JOIN co USING (x))
        |SELECT CAST(count(*) AS BIGINT) AS n_treated,
        |  CAST(CAST(sum(ty) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_treated,
        |  CAST(CAST(sum(cy) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_matched,
        |  CAST(CAST(sum(ty) AS BIGINT) - CAST(sum(cy) AS BIGINT) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS att
        |FROM pm WHERE rk = 1""".stripMargin,

    "q292_burrows_delta" ->
      """WITH tc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM
        |    (SELECT source, unnest(string_split(text, ' ')) AS tok
        |     FROM documents) GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS nn
        |  FROM tc GROUP BY 1),
        |vocab AS (SELECT DISTINCT tok FROM tc),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS nsrc FROM tot),
        |grid AS (SELECT t.source AS source, v.tok AS tok,
        |    CAST(COALESCE(tc.c, 0) AS DOUBLE) / CAST(t.nn AS DOUBLE) AS f
        |  FROM tot t CROSS JOIN vocab v
        |  LEFT JOIN tc ON tc.source = t.source AND tc.tok = v.tok),
        |mu AS (SELECT tok,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(f ORDER BY source)), (a, x) -> a + x)
        |      / (SELECT CAST(nsrc AS DOUBLE) FROM ns) AS mu
        |  FROM grid GROUP BY 1),
        |sd AS (SELECT g.tok AS tok, mu.mu AS mu,
        |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((g.f - mu.mu) * (g.f - mu.mu) ORDER BY g.source)),
        |      (a, x) -> a + x)
        |      / (SELECT CAST(nsrc - 1 AS DOUBLE) FROM ns)) AS sd
        |  FROM grid g JOIN mu ON mu.tok = g.tok GROUP BY g.tok, mu.mu),
        |z AS (SELECT g.source AS source, g.tok AS tok,
        |    (g.f - sd.mu) / sd.sd AS z
        |  FROM grid g JOIN sd ON sd.tok = g.tok WHERE sd.sd > 0),
        |pr AS (SELECT a.source AS s1, b.source AS s2, a.tok AS tok,
        |    abs(a.z - b.z) AS az
        |  FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source)
        |SELECT s1, s2,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(az ORDER BY tok)), (a, x) -> a + x)
        |    / CAST(count(*) AS DOUBLE) AS delta
        |FROM pr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q293_mcnemar_labelers" -> {
      s"""WITH q22 AS (
         |${OraclesExt.langIdSql}
         |),
         |sc AS (SELECT
         |    CASE WHEN (predicted_lang = 'en') = (lang = 'en')
         |      THEN 1 ELSE 0 END AS ca,
         |    CASE WHEN (s_en >= 2) = (lang = 'en')
         |      THEN 1 ELSE 0 END AS cb
         |  FROM q22),
         |a AS (SELECT CAST(sum(ca * (1 - cb)) AS BIGINT) AS b,
         |    CAST(sum(cb * (1 - ca)) AS BIGINT) AS c FROM sc)
         |SELECT b, c,
         |  CASE WHEN b + c > 0 THEN CAST((b - c) * (b - c) AS DOUBLE)
         |    / CAST(b + c AS DOUBLE) END AS chi2,
         |  CASE WHEN b + c > 0 THEN CAST((b - c) * (b - c) AS DOUBLE)
         |    / CAST(b + c AS DOUBLE) > 3.841458820694124 END AS significant
         |FROM a""".stripMargin
    },

    "q294_gains_curve" ->
      """WITH byv AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS p
        |  FROM documents GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(sum(c) OVER (ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_n,
        |    CAST(sum(p) OVER (ORDER BY v DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_pos
        |  FROM byv),
        |pt AS (SELECT CAST(sum(p) AS BIGINT) AS ptot FROM byv)
        |SELECT v, cum_n, cum_pos,
        |  CAST(cum_pos AS DOUBLE) / CAST(ptot AS DOUBLE) AS cum_recall,
        |  CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE) AS cum_prec
        |FROM cum CROSS JOIN pt ORDER BY v DESC""".stripMargin,

    // DuckDB's NATIVE ASOF JOIN vs the engine's custom AsofJoinExec —
    // two independent as-of implementations must agree exactly.
    "q295_asof_exec" ->
      """WITH purch AS (SELECT user_id AS r_user, ts AS r_ts,
        |    CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS r_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |views AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'view')
        |SELECT v.event_id AS event_id, p.r_value AS last_purchase_value
        |FROM views v ASOF LEFT JOIN purch p
        |  ON v.user_id = p.r_user AND v.ts >= p.r_ts
        |ORDER BY v.event_id""".stripMargin,

    "q296_neg_sampling" ->
      """WITH cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM
        |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |w AS (SELECT tok, cnt,
        |    CAST(cnt AS DOUBLE) / sqrt(sqrt(CAST(cnt AS DOUBLE))) AS weight
        |  FROM cnt),
        |z AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(weight ORDER BY tok)), (a, x) -> a + x) AS z FROM w)
        |SELECT tok, cnt, weight, weight / z AS prob,
        |  sum(weight) OVER (ORDER BY tok
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / z AS cum_prob
        |FROM w CROSS JOIN z ORDER BY tok""".stripMargin,

    "q297_hitting_time" -> {
      s"""WITH tr AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT event_type AS src,
         |      lead(event_type) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id) AS dst
         |    FROM events)
         |  WHERE dst IS NOT NULL GROUP BY 1, 2),
         |st AS (SELECT DISTINCT s AS state FROM
         |  (SELECT src AS s FROM tr UNION ALL SELECT dst FROM tr)),
         |rt AS (SELECT st.state AS state,
         |    COALESCE(CAST(sum(tr.c) AS BIGINT), CAST(0 AS BIGINT)) AS rtot
         |  FROM st LEFT JOIN tr ON tr.src = st.state GROUP BY 1),
         |h0 AS (SELECT state, CAST(0.0 AS DOUBLE) AS h FROM st),
         |${(1 to 12).map(htIterCtes).mkString(",\n")}
         |SELECT rt.state AS event_type, rt.rtot AS out_transitions,
         |  h12.h AS exp_steps_to_purchase
         |FROM rt JOIN h12 ON h12.state = rt.state ORDER BY 1""".stripMargin
    },

    "q298_cochran_armitage" ->
      """WITH u AS (SELECT user_id,
        |    CAST(CASE WHEN sum(CASE WHEN event_type = 'purchase'
        |        THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END
        |      AS BIGINT) AS r
        |  FROM events GROUP BY 1),
        |g AS (SELECT user_id % 5 AS sc, r FROM u),
        |gg AS (SELECT sc, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r) AS BIGINT) AS rr FROM g GROUP BY 1),
        |a AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(rr) AS BIGINT) AS rt,
        |    CAST(sum(sc * rr) AS BIGINT) AS ssr,
        |    CAST(sum(sc * n) AS BIGINT) AS ssn,
        |    CAST(sum(sc * sc * n) AS BIGINT) AS ss2n FROM gg)
        |SELECT nn AS n_users, rt AS r_total,
        |  CAST(nn * ((nn * ssr - rt * ssn) * (nn * ssr - rt * ssn))
        |      AS DOUBLE)
        |    / CAST(rt * (nn - rt) * (nn * ss2n - ssn * ssn) AS DOUBLE) AS z2,
        |  CAST(nn * ((nn * ssr - rt * ssn) * (nn * ssr - rt * ssn))
        |      AS DOUBLE)
        |    / CAST(rt * (nn - rt) * (nn * ss2n - ssn * ssn) AS DOUBLE)
        |    > 3.841458820694124 AS significant
        |FROM a""".stripMargin,

    "q299_kruskal_wallis" ->
      """WITH docs AS (SELECT lang, n_chars AS v FROM documents),
        |byv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM docs
        |  GROUP BY 1),
        |rk AS (SELECT v, c, COALESCE(sum(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |    AS rlo FROM byv),
        |rr AS (SELECT v, CAST(rlo * 2 + c - 1 AS BIGINT) AS ar2,
        |    CAST(c * c * c - c AS BIGINT) AS tie3, c FROM rk),
        |gv AS (SELECT lang, v, CAST(count(*) AS BIGINT) AS gc FROM docs
        |  GROUP BY 1, 2),
        |gr AS (SELECT lang, CAST(sum(gc) AS BIGINT) AS ng,
        |    CAST(sum(gc * ar2) AS BIGINT) AS r2
        |  FROM gv JOIN rr USING (v) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS nn,
        |    CAST(sum(tie3) AS BIGINT) AS s3 FROM rr),
        |l AS (SELECT list(struct_pack(lang := lang, ng := ng, r2 := r2)
        |    ORDER BY lang) AS xs FROM gr),
        |f AS (SELECT xs, nn, s3,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(xs, e ->
        |        ((CAST(e.r2 AS DOUBLE) / 2.0) * (CAST(e.r2 AS DOUBLE) / 2.0))
        |          / CAST(e.ng AS DOUBLE))), (a, x) -> a + x) AS sumr
        |  FROM l CROSS JOIN tot),
        |g AS (SELECT nn, s3, xs, sumr,
        |    12.0 / CAST(nn * (nn + 1) AS DOUBLE) * sumr
        |      - 3.0 * CAST(nn + 1 AS DOUBLE) AS h FROM f)
        |SELECT nn AS n_docs, CAST(len(xs) AS BIGINT) AS n_groups, h,
        |  h * CAST(nn * nn * nn - nn AS DOUBLE)
        |    / CAST(nn * nn * nn - nn - s3 AS DOUBLE) AS h_tie_corrected
        |FROM g""".stripMargin,

    "q300_synth_curation" ->
      """WITH ids AS (SELECT unnest(range(50000)) AS doc_id
        |  UNION ALL SELECT unnest(range(20000)) AS doc_id),
        |g AS (SELECT doc_id,
        |    md5('g9c:a:' || CAST(doc_id AS VARCHAR)) AS ma,
        |    md5('g9c:w:' || CAST(doc_id AS VARCHAR)) AS mw FROM ids),
        |f AS (SELECT doc_id, mw,
        |    8 + CAST(('0x' || substr(ma, 1, 8))::BIGINT % 25 AS INT)
        |      AS n_words,
        |    (['en','de','fr','es'])
        |      [CAST(('0x' || substr(ma, 9, 2))::BIGINT % 4 AS INT) + 1]
        |      AS lang,
        |    (['web','wiki','code','news','forum'])
        |      [CAST(('0x' || substr(ma, 11, 2))::BIGINT % 5 AS INT) + 1]
        |      AS source
        |  FROM g),
        |gated AS (SELECT doc_id, lang, source,
        |    CAST(n_words AS BIGINT) AS n_words,
        |    substr(mw, 1, n_words) AS wkey
        |  FROM f WHERE n_words >= 10 AND n_words <= 30),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY n_words, wkey
        |    ORDER BY doc_id) AS rk FROM gated)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_gated,
        |  CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unique,
        |  CAST(count(*) - sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS dup_rate,
        |  CAST(sum(CASE WHEN rk = 1 THEN n_words ELSE 0 END) AS BIGINT)
        |    AS tokens_kept
        |FROM rk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
