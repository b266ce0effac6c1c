package graft.queries

/**
 * DuckDB mirrors for [[CatalogSci]]. Order-statistic picks replay the
 * engine's row_number filters (floor on the same double division),
 * sketch draws share the md5-prefix integer hash, and every divide
 * keeps the engine's parenthesization.
 */
object OraclesSci {

  private val lg = OraclesExt.lgSqlOf _

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

  /** One PMI-SVD power-iteration round as chained CTEs (q250). */
  private def pmiIterCtes(t: Int): String = {
    val prev = s"v${t - 1}"
    s"""y$t AS MATERIALIZED (SELECT i,
       |    list_dot_product(row, (SELECT v FROM $prev)) AS y
       |  FROM rows),
       |n$t AS MATERIALIZED (SELECT
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(y * y ORDER BY i)), (a, x) -> a + x)) AS norm FROM y$t),
       |v$t AS MATERIALIZED (SELECT CASE WHEN norm = 0
       |    THEN (SELECT v FROM $prev)
       |    ELSE list(y / norm ORDER BY i) END AS v, norm
       |  FROM y$t CROSS JOIN n$t GROUP BY norm)""".stripMargin
  }

  /** One order-8 Hilbert xy2d round as a CTE (q252): rotate/flip then
    * accumulate s²·(3rx ⊕ ry), pure integer CASE arithmetic. */
  private def hilbertRound(t: Int, sBit: Long): String = {
    val prev = s"r${t - 1}"
    s"""r$t AS (SELECT px, py,
       |    CASE WHEN ry = 0 THEN y2 ELSE x2 END AS x,
       |    CASE WHEN ry = 0 THEN x2 ELSE y2 END AS y,
       |    d2 AS d
       |  FROM (SELECT px, py, rx, ry,
       |      d + ${sBit * sBit} * xor(3 * rx, ry) AS d2,
       |      CASE WHEN ry = 0 AND rx = 1 THEN ${sBit - 1} - x ELSE x END AS x2,
       |      CASE WHEN ry = 0 AND rx = 1 THEN ${sBit - 1} - y ELSE y END AS y2
       |    FROM (SELECT px, py, x, y, d,
       |        CASE WHEN (x & $sBit) > 0 THEN 1 ELSE 0 END AS rx,
       |        CASE WHEN (y & $sBit) > 0 THEN 1 ELSE 0 END AS ry
       |      FROM $prev)))""".stripMargin
  }

  /** One Huber IRLS round as chained CTEs (q254). */
  private def huberRound(t: Int): String = {
    val prev = s"g${t - 1}"
    s"""w$t AS (SELECT x, y,
       |    CASE WHEN res <= 50.0 THEN 65536
       |         ELSE CAST(round(3276800.0 / res) AS BIGINT) END AS w
       |  FROM (SELECT x, y, abs(CAST(y AS DOUBLE) -
       |      (slope * CAST(x AS DOUBLE) + intercept)) AS res
       |    FROM docs CROSS JOIN $prev)),
       |s$t AS (SELECT CAST(sum(w) AS BIGINT) AS sw,
       |    CAST(sum(w * x) AS BIGINT) AS swx,
       |    CAST(sum(w * y) AS BIGINT) AS swy,
       |    CAST(sum(w * x * y) AS BIGINT) AS swxy,
       |    CAST(sum(w * x * x) AS BIGINT) AS swxx,
       |    CAST(sum(CASE WHEN w < 65536 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_down FROM w$t),
       |f$t AS (SELECT (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE) -
       |      CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE)) /
       |    (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE) -
       |      CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS slope,
       |    n_down, swy, swx, sw FROM s$t),
       |g$t AS (SELECT slope, (CAST(swy AS DOUBLE) -
       |    slope * CAST(swx AS DOUBLE)) / CAST(sw AS DOUBLE) AS intercept,
       |    n_down FROM f$t)""".stripMargin
  }

  /** One value-iteration round for one removal scenario of the q266
    * Markov chain: removed state clamped to 0, others tconv +
    * state-ordered dot with the previous value vector. */
  private def mrRound(tag: String, removed: String, t: Int): String = {
    val prev = if (t == 1) s"v_${tag}_0" else s"v_${tag}_${t - 1}"
    val upd = s"tconv + list_dot_product(tj, (SELECT vl FROM $prev))"
    val expr = if (removed.isEmpty) upd
      else s"CASE WHEN s = '$removed' THEN 0.0 ELSE $upd END"
    s"""y_${tag}_$t AS MATERIALIZED (SELECT s,
       |    $expr AS v
       |  FROM stt),
       |v_${tag}_$t AS MATERIALIZED (SELECT list(v ORDER BY s) AS vl
       |  FROM y_${tag}_$t)""".stripMargin
  }

  private def mrScenario(tag: String, removed: String): String = {
    val rounds = (1 to 12).map(mrRound(tag, removed, _)).mkString(",\n")
    s"""v_${tag}_0 AS (SELECT list_transform(range(5),
       |    x -> CAST(0.0 AS DOUBLE)) AS vl),
       |$rounds,
       |p_$tag AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list(pi0.pi * yv.v ORDER BY pi0.s)), (a, x) -> a + x) +
       |    (SELECT CAST(ci AS DOUBLE) / CAST(nu AS DOUBLE)
       |     FROM pinst CROSS JOIN nu) AS p
       |  FROM pi0 JOIN y_${tag}_12 yv ON yv.s = pi0.s)""".stripMargin
  }

  val all: Map[String, String] = Map(
    "q275_mann_kendall" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |sp AS (SELECT CAST(sum(CASE WHEN b.x > a.x THEN 1
        |      WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM daily a JOIN daily b ON a.d < b.d),
        |ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |    AS BIGINT) AS tie_term FROM
        |  (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY x)),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |v AS (SELECT n, s,
        |    CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0
        |      AS var_s
        |  FROM sp CROSS JOIN ties CROSS JOIN nd)
        |SELECT n AS n_days, s, var_s,
        |  CAST(abs(s) - 1 AS DOUBLE) * CAST(abs(s) - 1 AS DOUBLE) / var_s
        |    AS z2
        |FROM v""".stripMargin,

    "q276_cv_kfold" ->
      """WITH folds AS (SELECT doc_id % 3 AS fold, CAST(count(*) AS BIGINT)
        |      AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM (SELECT doc_id,
        |      CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        |      CAST(n_chars AS BIGINT) AS y FROM documents)
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |    CAST(sum(sx) AS BIGINT) AS tsx, CAST(sum(sy) AS BIGINT) AS tsy,
        |    CAST(sum(sxy) AS BIGINT) AS tsxy,
        |    CAST(sum(sxx) AS BIGINT) AS tsxx FROM folds),
        |pf AS (SELECT fold, n, sx, sy, sxy, sxx, syy,
        |    tn - n AS trn, tsx - sx AS trsx, tsy - sy AS trsy,
        |    tsxy - sxy AS trsxy, tsxx - sxx AS trsxx
        |  FROM folds CROSS JOIN tot),
        |sl AS (SELECT *, CAST(trn * trsxy - trsx * trsy AS DOUBLE) /
        |    CAST(trn * trsxx - trsx * trsx AS DOUBLE) AS slope FROM pf),
        |ic AS (SELECT *, (CAST(trsy AS DOUBLE) -
        |    slope * CAST(trsx AS DOUBLE)) / CAST(trn AS DOUBLE) AS icpt
        |  FROM sl),
        |ss AS (SELECT fold, n, slope, icpt,
        |    CAST(syy AS DOUBLE) - 2.0 * icpt * CAST(sy AS DOUBLE) -
        |    2.0 * slope * CAST(sxy AS DOUBLE) +
        |    CAST(n AS DOUBLE) * icpt * icpt +
        |    2.0 * icpt * slope * CAST(sx AS DOUBLE) +
        |    slope * slope * CAST(sxx AS DOUBLE) AS sse
        |  FROM ic)
        |SELECT fold, n AS n_test, slope, icpt,
        |  sse / CAST(n AS DOUBLE) AS mse
        |FROM ss ORDER BY fold""".stripMargin,

    "q277_vocab_coverage" ->
      """WITH freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM
        |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |rk AS (SELECT
        |    CAST(row_number() OVER (ORDER BY c DESC, tok) AS BIGINT) AS rnk,
        |    CAST(sum(c) OVER (ORDER BY c DESC, tok ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM freq),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS v FROM freq),
        |ks AS (SELECT CAST(unnest([10, 100, 1000, 10000]) AS BIGINT) AS k)
        |SELECT k, v AS vocab_size,
        |  CAST(coalesce(cum, 0) AS DOUBLE) / CAST(total AS DOUBLE)
        |    AS coverage
        |FROM ks CROSS JOIN tot LEFT JOIN rk ON rk.rnk = least(k, v)
        |ORDER BY k""".stripMargin,

    "q272_anova_f" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |dg AS (SELECT CAST(dayofweek(d) + 1 AS BIGINT) AS g, x FROM daily),
        |groups AS (SELECT g, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(x) AS BIGINT) AS sg FROM dg GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(count(DISTINCT g) AS BIGINT) AS k FROM dg),
        |terms AS (SELECT g, n, sx, sxx, k,
        |    CAST((n * sg - ng * sx) * (n * sg - ng * sx) AS DOUBLE) /
        |      CAST(ng * n * n AS DOUBLE) AS term
        |  FROM groups CROSS JOIN tot),
        |sb AS (SELECT n, sx, sxx, k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(term ORDER BY g)), (a, x) -> a + x) AS ssb
        |  FROM terms GROUP BY 1, 2, 3, 4),
        |fin AS (SELECT n AS n_days, k AS n_groups, ssb,
        |    CAST(sxx AS DOUBLE) - CAST(sx * sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS sst FROM sb)
        |SELECT n_days, n_groups, ssb, sst - ssb AS ssw,
        |  (ssb / CAST(n_groups - 1 AS DOUBLE)) /
        |    ((sst - ssb) / CAST(n_days - n_groups AS DOUBLE)) AS f_stat
        |FROM fin""".stripMargin,

    "q273_runs_test" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |sg AS (SELECT d, CASE WHEN x > prev THEN 1 ELSE 0 END AS up FROM
        |    (SELECT d, x, lag(x) OVER (ORDER BY d) AS prev FROM daily)
        |  WHERE prev IS NOT NULL AND x <> prev),
        |rr AS (SELECT CAST(sum(CASE WHEN prevup IS NULL OR up <> prevup
        |      THEN 1 ELSE 0 END) AS BIGINT) AS r,
        |    CAST(sum(up) AS BIGINT) AS n1,
        |    CAST(sum(1 - up) AS BIGINT) AS n0
        |  FROM (SELECT up, lag(up) OVER (ORDER BY d) AS prevup FROM sg)),
        |f AS (SELECT r, n1, n0, n1 + n0 AS n FROM rr),
        |g AS (SELECT *,
        |    CAST(2 * n1 * n0 AS DOUBLE) / CAST(n AS DOUBLE) + 1.0 AS e_r,
        |    CAST(2 * n1 * n0 * (2 * n1 * n0 - n) AS DOUBLE) /
        |      CAST(n * n * (n - 1) AS DOUBLE) AS var_r FROM f)
        |SELECT r AS n_runs, n1, n0, e_r, var_r,
        |  (CAST(r AS DOUBLE) - e_r) * (CAST(r AS DOUBLE) - e_r) / var_r
        |    AS z2
        |FROM g""".stripMargin,

    "q274_ljung_box" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |cser AS (SELECT d, n, n * x - sx AS c FROM daily CROSS JOIN tot),
        |lagged AS (SELECT n, c,
        |    lag(c, 1) OVER (ORDER BY d) AS c1,
        |    lag(c, 2) OVER (ORDER BY d) AS c2,
        |    lag(c, 3) OVER (ORDER BY d) AS c3,
        |    lag(c, 4) OVER (ORDER BY d) AS c4,
        |    lag(c, 5) OVER (ORDER BY d) AS c5,
        |    lag(c, 6) OVER (ORDER BY d) AS c6,
        |    lag(c, 7) OVER (ORDER BY d) AS c7
        |  FROM cser),
        |sums AS (SELECT n, CAST(sum(c * c) AS BIGINT) AS den,
        |    CAST(sum(c * c1) AS BIGINT) AS num1,
        |    CAST(sum(c * c2) AS BIGINT) AS num2,
        |    CAST(sum(c * c3) AS BIGINT) AS num3,
        |    CAST(sum(c * c4) AS BIGINT) AS num4,
        |    CAST(sum(c * c5) AS BIGINT) AS num5,
        |    CAST(sum(c * c6) AS BIGINT) AS num6,
        |    CAST(sum(c * c7) AS BIGINT) AS num7
        |  FROM lagged GROUP BY n),
        |terms AS (
        |  SELECT n, CAST(1 AS BIGINT) AS k, (CAST(num1 AS DOUBLE) /
        |    CAST(den AS DOUBLE)) * (CAST(num1 AS DOUBLE) /
        |    CAST(den AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS term FROM sums
        |  UNION ALL SELECT n, 2, (CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE))
        |    * (CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE)) /
        |    CAST(n - 2 AS DOUBLE) FROM sums
        |  UNION ALL SELECT n, 3, (CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE))
        |    * (CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE)) /
        |    CAST(n - 3 AS DOUBLE) FROM sums
        |  UNION ALL SELECT n, 4, (CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE))
        |    * (CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE)) /
        |    CAST(n - 4 AS DOUBLE) FROM sums
        |  UNION ALL SELECT n, 5, (CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE))
        |    * (CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE)) /
        |    CAST(n - 5 AS DOUBLE) FROM sums
        |  UNION ALL SELECT n, 6, (CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE))
        |    * (CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE)) /
        |    CAST(n - 6 AS DOUBLE) FROM sums
        |  UNION ALL SELECT n, 7, (CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE))
        |    * (CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE)) /
        |    CAST(n - 7 AS DOUBLE) FROM sums)
        |SELECT n AS n_days, CAST(7 AS BIGINT) AS n_lags,
        |  CAST(n * (n + 2) AS DOUBLE) *
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(term ORDER BY k)), (a, x) -> a + x) AS q_stat
        |FROM terms GROUP BY n""".stripMargin,

    "q269_burstiness_t" ->
      """WITH gaps AS (SELECT user_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) -
        |      CAST(floor(epoch(prev)) AS BIGINT) AS g
        |  FROM (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev FROM events)
        |  WHERE prev IS NOT NULL),
        |pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(g) AS BIGINT) AS sg,
        |    CAST(sum(g * g) AS BIGINT) AS sgg FROM gaps GROUP BY 1),
        |f AS (SELECT *, CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
        |    sqrt((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) -
        |      CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sigma
        |  FROM pu WHERE n >= 6),
        |b AS (SELECT *, (sigma - mu) / (sigma + mu) AS b FROM f)
        |SELECT CAST(floor((b + 1.0) * 4) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_users, min(b) AS min_b,
        |  max(b) AS max_b
        |FROM b GROUP BY 1 ORDER BY bin""".stripMargin,

    "q270_pareto_8020" ->
      """WITH users AS (SELECT user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_users FROM users),
        |rk AS (SELECT cents,
        |    CAST(row_number() OVER (ORDER BY cents DESC, user_id) AS BIGINT)
        |      AS rnk,
        |    CAST(sum(cents) OVER (ORDER BY cents DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM users)
        |SELECT n_users, rnk AS k_star,
        |  CAST(rnk AS DOUBLE) / CAST(n_users AS DOUBLE) AS user_share,
        |  CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS revenue_share
        |FROM rk CROSS JOIN tot WHERE cum * 5 >= total * 4
        |ORDER BY rnk LIMIT 1""".stripMargin,

    "q271_rfm_segments" ->
      """WITH md AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
        |rfm AS (SELECT user_id,
        |    CAST(date_diff('day', last_d, max_d) AS BIGINT) AS r, f, m
        |  FROM (SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
        |      CAST(count(*) AS BIGINT) AS f,
        |      CAST(sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |        AS BIGINT) AS m
        |    FROM events GROUP BY 1) CROSS JOIN md),
        |sc AS (SELECT
        |    CAST(ntile(5) OVER (ORDER BY r, user_id) AS BIGINT) AS r_code,
        |    CAST(ntile(5) OVER (ORDER BY f DESC, user_id) AS BIGINT)
        |      AS f_code,
        |    CAST(ntile(5) OVER (ORDER BY m DESC, user_id) AS BIGINT)
        |      AS m_code
        |  FROM rfm)
        |SELECT r_code, f_code, m_code, CAST(count(*) AS BIGINT) AS n_users
        |FROM sc GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q266_markov_removal" -> {
      val scenarios = Seq("base" -> "", "click" -> "click",
        "error" -> "error", "signup" -> "signup", "view" -> "view")
        .map { case (tag, rm) => mrScenario(tag, rm) }.mkString(",\n")
      def eff(tag: String): String =
        s"((SELECT p FROM p_base) - (SELECT p FROM p_$tag)) / (SELECT p FROM p_base)"
      s"""WITH ev AS (SELECT user_id, ts, event_id, event_type,
         |    (event_type = 'purchase' AND value > 150.0) AS big FROM events),
         |seqd AS (SELECT * FROM (
         |    SELECT *, CAST(sum(CASE WHEN big THEN 1 ELSE 0 END) OVER
         |      (PARTITION BY user_id ORDER BY ts, event_id
         |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS bigcum
         |    FROM ev)
         |  WHERE bigcum = 0 OR (big AND bigcum = 1)),
         |steps AS (SELECT event_type AS s,
         |    CASE WHEN nxt_type IS NULL THEN 'null'
         |         WHEN nxt_big THEN 'conv' ELSE nxt_type END AS j
         |  FROM (SELECT *, lead(event_type) OVER w AS nxt_type,
         |          lead(big) OVER w AS nxt_big
         |        FROM seqd WINDOW w AS (PARTITION BY user_id
         |          ORDER BY ts, event_id))
         |  WHERE NOT big),
         |tc AS (SELECT s, j, CAST(count(*) AS BIGINT) AS c
         |  FROM steps GROUP BY 1, 2),
         |rt AS (SELECT s, CAST(sum(c) AS BIGINT) AS ct FROM tc GROUP BY 1),
         |states AS (SELECT unnest(['click', 'error', 'purchase', 'signup',
         |    'view']) AS s),
         |tgrid AS (SELECT a.s AS s, b.s AS j,
         |    coalesce(CAST(tc.c AS DOUBLE) / CAST(rt.ct AS DOUBLE), 0.0) AS p
         |  FROM states a CROSS JOIN states b
         |  LEFT JOIN tc ON tc.s = a.s AND tc.j = b.s
         |  LEFT JOIN rt ON rt.s = a.s),
         |trows AS (SELECT s, list(p ORDER BY j) AS tj FROM tgrid GROUP BY s),
         |tcv AS (SELECT a.s AS s,
         |    coalesce(CAST(tc.c AS DOUBLE) / CAST(rt.ct AS DOUBLE), 0.0)
         |      AS tconv
         |  FROM states a LEFT JOIN tc ON tc.s = a.s AND tc.j = 'conv'
         |  LEFT JOIN rt ON rt.s = a.s),
         |stt AS (SELECT trows.s AS s, tcv.tconv AS tconv, trows.tj AS tj
         |  FROM trows JOIN tcv ON trows.s = tcv.s),
         |firsts AS (SELECT event_type, big, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn FROM seqd)
         |  WHERE rn = 1 GROUP BY 1, 2),
         |nu AS (SELECT CAST(sum(c) AS BIGINT) AS nu FROM firsts),
         |pinst AS (SELECT coalesce(CAST(sum(CASE WHEN big THEN c END)
         |    AS BIGINT), 0) AS ci FROM firsts),
         |pi0 AS (SELECT st2.s AS s,
         |    coalesce(CAST(f.c AS DOUBLE) / CAST(nu.nu AS DOUBLE), 0.0) AS pi
         |  FROM states st2 LEFT JOIN (SELECT event_type, c FROM firsts
         |    WHERE NOT big) f ON f.event_type = st2.s CROSS JOIN nu),
         |$scenarios
         |SELECT removed_channel, p_conv, removal_effect FROM (
         |  SELECT '(none)' AS removed_channel,
         |    (SELECT p FROM p_base) AS p_conv, 0.0 AS removal_effect
         |  UNION ALL SELECT 'click', (SELECT p FROM p_click), ${eff("click")}
         |  UNION ALL SELECT 'error', (SELECT p FROM p_error), ${eff("error")}
         |  UNION ALL SELECT 'signup', (SELECT p FROM p_signup),
         |    ${eff("signup")}
         |  UNION ALL SELECT 'view', (SELECT p FROM p_view), ${eff("view")})
         |ORDER BY removed_channel""".stripMargin
    },

    "q267_ltv_triangle" ->
      """WITH fd AS (SELECT user_id, min(CAST(ts AS DATE)) AS first_d
        |  FROM events GROUP BY 1),
        |fc AS (SELECT user_id,
        |    CAST(date_trunc('week', first_d) AS DATE) AS cohort FROM fd),
        |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        |  FROM fc GROUP BY 1),
        |rev AS (SELECT fc.cohort,
        |    CAST(floor(date_diff('day', fc.cohort, CAST(e.ts AS DATE)) / 7)
        |      AS BIGINT) AS age_weeks,
        |    CAST(sum(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase' GROUP BY 1, 2),
        |cum AS (SELECT cohort, age_weeks,
        |    CAST(sum(cents) OVER (PARTITION BY cohort ORDER BY age_weeks
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_cents
        |  FROM rev)
        |SELECT strftime(cum.cohort, '%Y-%m-%d') AS cohort_week, age_weeks,
        |  n_users, cum_cents,
        |  CAST(cum_cents AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0
        |    AS ltv_per_user
        |FROM cum JOIN cs ON cs.cohort = cum.cohort
        |ORDER BY cohort_week, age_weeks""".stripMargin,

    "q268_chao1" ->
      """WITH freq AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM
        |    (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS v_obs,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM freq),
        |e AS (SELECT v_obs, f1, f2,
        |    CAST(v_obs AS DOUBLE) + CAST(f1 * (f1 - 1) AS DOUBLE) /
        |      CAST(2 * (f2 + 1) AS DOUBLE) AS chao1 FROM m)
        |SELECT v_obs, f1, f2, chao1,
        |  (chao1 - CAST(v_obs AS DOUBLE)) / chao1 AS unseen_frac
        |FROM e""".stripMargin,

    "q264_grid_dbscan" ->
      """WITH RECURSIVE pts AS (SELECT vec_id,
        |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 16) AS BIGINT) AS cx,
        |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 16) AS BIGINT) AS cy
        |  FROM embeddings),
        |cells AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS n,
        |    count(*) >= 5 AS core,
        |    (cx + 500) * 10000 + (cy + 500) AS cell
        |  FROM pts GROUP BY 1, 2),
        |corec AS (SELECT cx, cy, cell, n FROM cells WHERE core),
        |e AS (SELECT a.cell AS u, b.cell AS v
        |  FROM corec a JOIN corec b
        |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
        |    AND a.cell < b.cell),
        |e2 AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        |reach AS (SELECT u, v FROM e2
        |  UNION SELECT r.u, x.v FROM reach r JOIN e2 x ON r.v = x.u),
        |lab AS (SELECT u AS id, LEAST(u, MIN(v)) AS component
        |  FROM reach GROUP BY u),
        |comp AS (SELECT corec.cell, corec.n,
        |    coalesce(lab.component, corec.cell) AS component
        |  FROM corec LEFT JOIN lab ON lab.id = corec.cell),
        |cl AS (SELECT component, CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(sum(n) AS BIGINT) AS n_points FROM comp GROUP BY 1),
        |rk AS (SELECT CAST(row_number() OVER (ORDER BY n_points DESC,
        |      component) AS BIGINT) AS cluster_rank, n_cells, n_points
        |  FROM cl),
        |noise AS (SELECT CAST(0 AS BIGINT) AS cluster_rank,
        |    CAST(count(*) AS BIGINT) AS n_cells,
        |    CAST(coalesce(sum(n), 0) AS BIGINT) AS n_points
        |  FROM cells WHERE NOT core)
        |SELECT * FROM (
        |  SELECT cluster_rank, n_cells, n_points FROM rk
        |  WHERE cluster_rank <= 10
        |  UNION ALL SELECT * FROM noise)
        |ORDER BY cluster_rank""".stripMargin,

    "q265_gumbel" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x * x) AS BIGINT) AS s2 FROM daily),
        |a AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_max,
        |    sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) /
        |      CAST(n * (n - 1) AS DOUBLE)) AS sigma FROM m),
        |b AS (SELECT *, sigma * 0.779696801233676e0 AS beta FROM a),
        |c AS (SELECT *, mean_max - 0.5772156649015329e0 * beta AS mu FROM b)
        |SELECT n AS n_days, mean_max, sigma, mu, beta,
        |  mu + beta * 3.3842944934992527e0 AS return_level_30d
        |FROM c""".stripMargin,

    "q261_cart_stump" ->
      """WITH lv AS (SELECT CAST(floor(n_chars / 20) AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS w,
        |    CAST(sum(CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
        |      >= len(string_split(text, ' ')) THEN 1 ELSE 0 END) AS BIGINT)
        |      AS p
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS nn,
        |    CAST(sum(p) AS BIGINT) AS pp FROM lv),
        |cum AS (SELECT l, CAST(sum(w) OVER wc AS BIGINT) AS nl,
        |    CAST(sum(p) OVER wc AS BIGINT) AS pl
        |  FROM lv WINDOW wc AS (ORDER BY l ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |splits AS (SELECT l AS split_level, nl, pl, nn - nl AS nr,
        |    pp - pl AS pr, nn, pp
        |  FROM cum CROSS JOIN tot WHERE nl < nn),
        |scored AS (SELECT *,
        |    2.0 * CAST(pp AS DOUBLE) * CAST(nn - pp AS DOUBLE) /
        |      CAST(nn * nn AS DOUBLE) AS parent_gini,
        |    2.0 * CAST(pl AS DOUBLE) * CAST(nl - pl AS DOUBLE) /
        |      CAST(nl * nl AS DOUBLE) *
        |      (CAST(nl AS DOUBLE) / CAST(nn AS DOUBLE)) +
        |    2.0 * CAST(pr AS DOUBLE) * CAST(nr - pr AS DOUBLE) /
        |      CAST(nr * nr AS DOUBLE) *
        |      (CAST(nr AS DOUBLE) / CAST(nn AS DOUBLE)) AS child_gini
        |  FROM splits),
        |best AS (SELECT *, parent_gini - child_gini AS gain,
        |    row_number() OVER (ORDER BY parent_gini - child_gini DESC,
        |      split_level) AS rn
        |  FROM scored)
        |SELECT split_level, nl AS n_left, nr AS n_right, pl AS pos_left,
        |  pr AS pos_right, parent_gini, child_gini, gain
        |FROM best WHERE rn = 1""".stripMargin,

    "q262_power_mde" ->
      """WITH conv AS (SELECT user_id,
        |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |arms AS (SELECT user_id % 2 AS variant,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(conv) AS BIGINT) AS c
        |  FROM conv GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(c) AS BIGINT) AS cc, CAST(sum(n) AS BIGINT) AS nn
        |  FROM arms),
        |p AS (SELECT *, CAST(cc AS DOUBLE) / CAST(nn AS DOUBLE) AS p_pool,
        |    least(n1, n0) AS n_arm FROM t),
        |md AS (SELECT *, 2.8015852181129683e0 *
        |    sqrt(2.0 * p_pool * (1.0 - p_pool) / CAST(n_arm AS DOUBLE))
        |    AS mde_abs FROM p)
        |SELECT n1, n0, p_pool, mde_abs, mde_abs / p_pool AS mde_rel
        |FROM md""".stripMargin,

    "q263_mase_backtest" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1),
        |ti AS (SELECT d, y,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t FROM daily),
        |nd AS (SELECT CAST(max(t) AS BIGINT) AS tt FROM ti),
        |lagged AS (SELECT t, y, lag(y, 7) OVER (ORDER BY t) AS y7
        |  FROM ti),
        |train AS (SELECT lagged.* FROM lagged CROSS JOIN nd
        |  WHERE t <= tt - 14),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(t) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(t * y) AS BIGINT) AS sxy,
        |    CAST(sum(t * t) AS BIGINT) AS sxx FROM train),
        |f AS (SELECT n AS n_train,
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) AS slope, sx, sy, n FROM m),
        |g AS (SELECT n_train, slope, (CAST(sy AS DOUBLE) -
        |    slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        |  FROM f),
        |test AS (SELECT t, n_train,
        |    CAST(abs(y - y7) AS BIGINT) AS ae_naive,
        |    abs(CAST(y AS DOUBLE) -
        |      (slope * CAST(t AS DOUBLE) + intercept)) AS ae_line
        |  FROM lagged CROSS JOIN nd CROSS JOIN g WHERE t > tt - 14),
        |agg AS (SELECT n_train, CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(ae_naive) AS BIGINT) AS sae_naive,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(ae_line ORDER BY t)), (a, x) -> a + x) AS sae_line
        |  FROM test GROUP BY 1)
        |SELECT n_train, n_test,
        |  CAST(sae_naive AS DOUBLE) / CAST(n_test AS DOUBLE) AS mae_naive,
        |  sae_line / CAST(n_test AS DOUBLE) AS mae_line,
        |  (sae_line / CAST(n_test AS DOUBLE)) /
        |    (CAST(sae_naive AS DOUBLE) / CAST(n_test AS DOUBLE)) AS mase
        |FROM agg""".stripMargin,

    "q258_wasserstein" ->
      """WITH lv AS (SELECT CAST(floor(n_chars / 20) AS BIGINT) AS l,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca,
        |    CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
        |    CAST(sum(cb) AS BIGINT) AS nb FROM lv),
        |cum AS (SELECT l, CAST(sum(ca) OVER w AS BIGINT) AS cuma,
        |    CAST(sum(cb) OVER w AS BIGINT) AS cumb,
        |    lead(l) OVER (ORDER BY l) AS nextl
        |  FROM lv WINDOW w AS (ORDER BY l ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |terms AS (SELECT l,
        |    abs(CAST(cuma AS DOUBLE) / CAST(na AS DOUBLE) -
        |      CAST(cumb AS DOUBLE) / CAST(nb AS DOUBLE)) *
        |      CAST(nextl - l AS DOUBLE) AS term
        |  FROM cum CROSS JOIN tot WHERE nextl IS NOT NULL),
        |s AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY l)), (a, x) -> a + x) AS w1_levels FROM terms)
        |SELECT na AS n_en, nb AS n_other, w1_levels * 20.0 AS w1_chars
        |FROM s CROSS JOIN tot""".stripMargin,

    "q259_cooks_distance" ->
      """WITH docs AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
        |    CAST(n_chars AS BIGINT) AS y FROM documents),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy FROM docs),
        |f AS (SELECT *, CAST(n * sxy - sx * sy AS DOUBLE) /
        |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope FROM m),
        |g AS (SELECT *, (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) /
        |      CAST(n AS DOUBLE) AS intercept,
        |    (CAST(n * syy - sy * sy AS DOUBLE) -
        |      slope * CAST(n * sxy - sx * sy AS DOUBLE)) / CAST(n AS DOUBLE)
        |      AS sse FROM f),
        |hh AS (SELECT *, sse / CAST(n - 2 AS DOUBLE) AS s2 FROM g),
        |rows_ AS (SELECT doc_id, x, y,
        |    CAST(y AS DOUBLE) - (slope * CAST(x AS DOUBLE) + intercept) AS e,
        |    1.0 / CAST(n AS DOUBLE) +
        |      CAST((n * x - sx) * (n * x - sx) AS DOUBLE) /
        |      CAST(n * (n * sxx - sx * sx) AS DOUBLE) AS h,
        |    s2 FROM docs CROSS JOIN hh),
        |d AS (SELECT doc_id, x, y, e, h,
        |    e * e * h / (2.0 * s2 * ((1.0 - h) * (1.0 - h))) AS cooks_d
        |  FROM rows_)
        |SELECT doc_id, x, y, e, h, cooks_d FROM d
        |ORDER BY cooks_d DESC, doc_id LIMIT 20""".stripMargin,

    "q260_auc" ->
      """WITH rated AS (SELECT CAST(n_chars AS BIGINT) AS v,
        |    CASE WHEN 2 * len(list_distinct(string_split(text, ' '))) >=
        |      len(string_split(text, ' ')) THEN 1 ELSE 0 END AS pos
        |  FROM documents),
        |byv AS (SELECT v, CAST(sum(pos) AS BIGINT) AS n1v,
        |    CAST(sum(1 - pos) AS BIGINT) AS n0v FROM rated GROUP BY 1),
        |tot AS (SELECT CAST(sum(n1v) AS BIGINT) AS n1,
        |    CAST(sum(n0v) AS BIGINT) AS n0 FROM byv),
        |cum AS (SELECT v, n1v, n0v,
        |    CAST(coalesce(sum(n0v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
        |  FROM byv),
        |u AS (SELECT CAST(sum(2 * n1v * cum0 + n1v * n0v) AS BIGINT) AS u2
        |  FROM cum)
        |SELECT n1, n0, CAST(u2 AS DOUBLE) / CAST(2 * n1 * n0 AS DOUBLE)
        |  AS auc
        |FROM u CROSS JOIN tot""".stripMargin,

    "q255_obrien_fleming" -> {
      val b2 = CatalogSci.ObfZ.map(z => (z * z).toString + "e0")
        .mkString("[", ", ", "]")
      s"""WITH users AS (SELECT user_id % 2 AS variant,
         |    min(CAST(ts AS DATE)) AS first_d,
         |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
         |      THEN CAST(ts AS DATE) END) AS conv_d
         |  FROM events GROUP BY user_id),
         |span AS (SELECT min(CAST(ts AS DATE)) AS min_d,
         |    max(CAST(ts AS DATE)) AS max_d FROM events),
         |looks AS (SELECT k.look,
         |    min_d + CAST(floor(date_diff('day', min_d, max_d) * k.look / 5)
         |      AS INT) AS look_d
         |  FROM span CROSS JOIN (SELECT unnest(range(1, 6)) AS look) k),
         |cum AS (SELECT look, look_d,
         |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
         |      AS a,
         |    CAST(sum(CASE WHEN variant = 1 THEN 1 - conv ELSE 0 END)
         |      AS BIGINT) AS b,
         |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
         |      AS c,
         |    CAST(sum(CASE WHEN variant = 0 THEN 1 - conv ELSE 0 END)
         |      AS BIGINT) AS d
         |  FROM (SELECT u.variant, l.look, l.look_d,
         |      CASE WHEN conv_d IS NOT NULL AND conv_d <= look_d
         |        THEN 1 ELSE 0 END AS conv
         |    FROM users u CROSS JOIN looks l WHERE first_d <= look_d)
         |  GROUP BY 1, 2),
         |z AS (SELECT look, look_d, a + b + c + d AS n,
         |    CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0.0 ELSE
         |      (CAST(a + b + c + d AS DOUBLE) * CAST(a*d - b*c AS DOUBLE) *
         |        CAST(a*d - b*c AS DOUBLE)) /
         |        CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE) END AS z2,
         |    ($b2)[CAST(look AS INT)] AS boundary2
         |  FROM cum)
         |SELECT look, strftime(look_d, '%Y-%m-%d') AS look_d, n, z2,
         |  boundary2, z2 > boundary2 AS crossed
         |FROM z ORDER BY look""".stripMargin
    },

    "q256_bh_fdr" -> {
      val crits = CatalogSci.BhCrits.map(_.toString + "e0")
        .mkString("[", ", ", "]")
      s"""WITH rated AS (SELECT source,
         |    CASE WHEN 2 * len(list_distinct(string_split(text, ' '))) >=
         |      len(string_split(text, ' ')) THEN 1 ELSE 0 END AS pass
         |  FROM documents),
         |bysrc AS (SELECT source, CAST(sum(pass) AS BIGINT) AS a0,
         |    CAST(count(*) AS BIGINT) AS ns FROM rated GROUP BY 1),
         |tot AS (SELECT CAST(sum(a0) AS BIGINT) AS ta,
         |    CAST(sum(ns) AS BIGINT) AS tn FROM bysrc),
         |cells AS (SELECT source, a0 AS a, ns - a0 AS b, ta - a0 AS c,
         |    tn - ns - (ta - a0) AS d FROM bysrc CROSS JOIN tot),
         |scored AS (SELECT source,
         |    CASE WHEN (a+b) * (c+d) * (a+c) * (b+d) = 0 THEN 0.0 ELSE
         |      (CAST(a + b + c + d AS DOUBLE) * CAST(a*d - b*c AS DOUBLE) *
         |        CAST(a*d - b*c AS DOUBLE)) /
         |        CAST((a+b) * (c+d) * (a+c) * (b+d) AS DOUBLE) END AS chi2
         |  FROM cells),
         |ranked AS (SELECT source, chi2,
         |    CAST(row_number() OVER (ORDER BY chi2 DESC, source) AS BIGINT)
         |      AS rank,
         |    ($crits)[CAST(row_number() OVER (ORDER BY chi2 DESC, source)
         |      AS INT)] AS crit
         |  FROM scored),
         |ks AS (SELECT CAST(max(CASE WHEN chi2 >= crit THEN rank ELSE 0 END)
         |    AS BIGINT) AS kstar FROM ranked)
         |SELECT source, chi2, rank, crit, rank <= kstar AS rejected
         |FROM ranked CROSS JOIN ks ORDER BY rank""".stripMargin
    },

    "q257_entropy_rate" -> {
      s"""WITH tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cij FROM (
         |    SELECT user_id, event_type AS cur,
         |      lead(event_type) OVER (PARTITION BY user_id
         |        ORDER BY ts, event_id) AS nxt
         |    FROM events) WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |rt AS (SELECT cur, CAST(sum(cij) AS BIGINT) AS ci FROM tr GROUP BY 1),
         |tot AS (SELECT CAST(sum(cij) AS BIGINT) AS nn,
         |    CAST(count(DISTINCT cur) AS BIGINT) AS n_states FROM tr),
         |terms AS (SELECT nn, n_states, cur, nxt,
         |    (CAST(cij AS DOUBLE) / CAST(nn AS DOUBLE)) *
         |      (${lg("ci")} - ${lg("cij")}) AS term
         |  FROM tr JOIN rt USING (cur) CROSS JOIN tot)
         |SELECT nn AS n_transitions, n_states,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(term ORDER BY cur, nxt)), (a, x) -> a + x)
         |    AS entropy_rate_bits
         |FROM terms GROUP BY 1, 2""".stripMargin
    },

    "q252_hilbert" -> {
      val rounds = Seq(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L).zipWithIndex
        .map { case (sb, i) => hilbertRound(i + 1, sb) }.mkString(",\n")
      s"""WITH r0 AS (SELECT l_partkey % 256 AS px, l_suppkey % 256 AS py,
         |    l_partkey % 256 AS x, l_suppkey % 256 AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |$rounds
         |SELECT CAST(floor(d / 4096) AS BIGINT) AS bucket,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(px) AS BIGINT) AS min_pk, CAST(max(px) AS BIGINT) AS max_pk,
         |  CAST(min(py) AS BIGINT) AS min_sk, CAST(max(py) AS BIGINT) AS max_sk
         |FROM r8 GROUP BY 1 ORDER BY bucket""".stripMargin
    },

    "q253_voptimal_hist" ->
      """WITH lv AS (SELECT CAST(floor(n_chars / 20) AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS w FROM documents GROUP BY 1),
        |pre AS (SELECT l, w, CAST(row_number() OVER (ORDER BY l) AS BIGINT)
        |      AS i,
        |    CAST(sum(w) OVER cum AS BIGINT) AS cw,
        |    CAST(sum(w * l) OVER cum AS BIGINT) AS cwv,
        |    CAST(sum(w * l * l) OVER cum AS BIGINT) AS cwv2
        |  FROM lv WINDOW cum AS (ORDER BY l ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |pre0 AS (SELECT i, l, cw, cwv, cwv2 FROM pre
        |  UNION ALL SELECT CAST(0 AS BIGINT), CAST(-1 AS BIGINT),
        |    CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |iv AS (SELECT a.i AS j, b.i AS k, b.l AS lk,
        |    CAST(b.cw - a.cw AS BIGINT) AS ww,
        |    CAST(b.cwv2 - a.cwv2 AS DOUBLE) -
        |      (CAST(b.cwv - a.cwv AS DOUBLE) * CAST(b.cwv - a.cwv AS DOUBLE) /
        |        CAST(b.cw - a.cw AS DOUBLE)) AS sse
        |  FROM pre0 a JOIN pre0 b ON a.i < b.i),
        |dp1 AS (SELECT k AS i, sse AS cost, CAST(0 AS BIGINT) AS arg
        |  FROM iv WHERE j = 0),
        |dp2 AS (SELECT i, cost, j AS arg FROM (
        |    SELECT iv.k AS i, iv.j AS j, dp1.cost + iv.sse AS cost,
        |      row_number() OVER (PARTITION BY iv.k
        |        ORDER BY dp1.cost + iv.sse, iv.j) AS rn
        |    FROM dp1 JOIN iv ON iv.j = dp1.i) WHERE rn = 1),
        |dp3 AS (SELECT i, cost, j AS arg FROM (
        |    SELECT iv.k AS i, iv.j AS j, dp2.cost + iv.sse AS cost,
        |      row_number() OVER (PARTITION BY iv.k
        |        ORDER BY dp2.cost + iv.sse, iv.j) AS rn
        |    FROM dp2 JOIN iv ON iv.j = dp2.i) WHERE rn = 1),
        |dp4 AS (SELECT i, cost, j AS arg FROM (
        |    SELECT iv.k AS i, iv.j AS j, dp3.cost + iv.sse AS cost,
        |      row_number() OVER (PARTITION BY iv.k
        |        ORDER BY dp3.cost + iv.sse, iv.j) AS rn
        |    FROM dp3 JOIN iv ON iv.j = dp3.i) WHERE rn = 1),
        |lastv AS (SELECT max(i) AS bl FROM pre),
        |b4 AS (SELECT dp4.arg AS j4, dp4.i AS i4 FROM dp4
        |  JOIN lastv ON dp4.i = lastv.bl),
        |b3 AS (SELECT b4.j4, b4.i4, dp3.arg AS j3 FROM b4
        |  JOIN dp3 ON dp3.i = b4.j4),
        |b2 AS (SELECT b3.j4, b3.i4, b3.j3, dp2.arg AS j2 FROM b3
        |  JOIN dp2 ON dp2.i = b3.j3),
        |spans AS (SELECT CAST(1 AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS jj,
        |    j2 AS kk FROM b2
        |  UNION ALL SELECT CAST(2 AS BIGINT), j2, j3 FROM b2
        |  UNION ALL SELECT CAST(3 AS BIGINT), j3, j4 FROM b2
        |  UNION ALL SELECT CAST(4 AS BIGINT), j4, i4 FROM b2)
        |SELECT bucket, CAST(lo0 + 1 AS BIGINT) AS lo_level, lk AS hi_level,
        |  ww AS n_docs, sse
        |FROM spans
        |JOIN iv ON iv.j = spans.jj AND iv.k = spans.kk
        |JOIN (SELECT i AS jj2, l AS lo0 FROM pre0) p ON p.jj2 = spans.jj
        |ORDER BY bucket""".stripMargin,

    "q254_huber_irls" -> {
      s"""WITH docs AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x,
         |    CAST(n_chars AS BIGINT) AS y FROM documents),
         |m0 AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx FROM docs),
         |f0 AS (SELECT CAST(n * sxy - sx * sy AS DOUBLE) /
         |    CAST(n * sxx - sx * sx AS DOUBLE) AS slope FROM m0),
         |g0 AS (SELECT slope, (CAST(sy AS DOUBLE) -
         |    slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
         |  FROM f0 CROSS JOIN m0),
         |${(1 to 4).map(huberRound).mkString(",\n")}
         |SELECT slope, intercept, n_down FROM g4""".stripMargin
    },

    "q249_shapley" ->
      """WITH ev AS (SELECT user_id,
        |    CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |      WHEN 'signup' THEN 4 WHEN 'view' THEN 8 ELSE 0 END AS chan,
        |    event_type, value FROM events),
        |u AS (SELECT user_id, CAST(bit_or(chan) AS BIGINT) AS mask,
        |    CAST(max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |  FROM ev GROUP BY 1),
        |bm AS (SELECT mask, CAST(sum(conv) AS BIGINT) AS conv_cnt
        |  FROM u GROUP BY 1),
        |grid AS (SELECT unnest(range(16)) AS S),
        |v AS (SELECT S, CAST(coalesce(sum(conv_cnt), 0) AS BIGINT) AS v
        |  FROM grid LEFT JOIN bm ON (bm.mask & grid.S) = bm.mask
        |  GROUP BY 1),
        |ch AS (SELECT unnest([1, 2, 4, 8]) AS c),
        |terms AS (SELECT c, vs.S AS S,
        |    CASE bit_count(vs.S) WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2
        |      ELSE 6 END * (vsc.v - vs.v) AS wd
        |  FROM ch JOIN v vs ON (vs.S & ch.c) = 0
        |  JOIN v vsc ON vsc.S = (vs.S | ch.c))
        |SELECT CASE c WHEN 1 THEN 'click' WHEN 2 THEN 'error'
        |    WHEN 4 THEN 'signup' ELSE 'view' END AS channel,
        |  CAST(sum(wd) AS DOUBLE) / 24.0 AS phi
        |FROM terms GROUP BY c ORDER BY channel""".stripMargin,

    "q250_pmi_svd" -> {
      s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS w
         |  FROM documents),
         |toks AS (SELECT doc_id, unnest(gs, recursive := true) FROM (
         |  SELECT doc_id,
         |    [struct_pack(p := CAST(i - 1 AS BIGINT), tok := w[i])
         |     for i in range(1, len(w) + 1)] AS gs
         |  FROM base)),
         |cnts AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM toks GROUP BY 1),
         |top AS (SELECT tok, cnt,
         |    CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) - 1
         |      AS idx
         |  FROM (SELECT * FROM cnts ORDER BY cnt DESC, tok LIMIT 64)),
         |adj AS (SELECT doc_id, p, tok,
         |    lead(tok) OVER (PARTITION BY doc_id ORDER BY p) AS nxt
         |  FROM toks),
         |prs AS (SELECT ti.idx AS i, tj.idx AS j FROM adj
         |  JOIN top ti ON ti.tok = adj.tok
         |  JOIN top tj ON tj.tok = adj.nxt
         |  WHERE adj.nxt IS NOT NULL),
         |cooc AS (SELECT i, j, CAST(count(*) AS BIGINT) AS cij FROM
         |    (SELECT i, j FROM prs UNION ALL SELECT j AS i, i AS j FROM prs)
         |  GROUP BY 1, 2),
         |marg AS (SELECT i, CAST(sum(cij) AS BIGINT) AS ci
         |  FROM cooc GROUP BY 1),
         |tot AS (SELECT CAST(sum(cij) AS BIGINT) AS nn FROM cooc),
         |grid AS (SELECT gi.i AS i, gj.j AS j
         |  FROM (SELECT unnest(range(64)) AS i) gi
         |  CROSS JOIN (SELECT unnest(range(64)) AS j) gj),
         |ppmi AS (SELECT grid.i AS i, grid.j AS j,
         |    CASE WHEN cooc.cij IS NULL THEN 0.0
         |      ELSE greatest(${lg("cij * nn")} - ${lg("ci * cj")}, 0.0)
         |    END AS m
         |  FROM grid LEFT JOIN cooc ON cooc.i = grid.i AND cooc.j = grid.j
         |  LEFT JOIN marg mi ON mi.i = grid.i
         |  LEFT JOIN (SELECT i AS j, ci AS cj FROM marg) mj ON mj.j = grid.j
         |  CROSS JOIN tot),
         |rows AS MATERIALIZED (SELECT i, list(m ORDER BY j) AS row
         |  FROM ppmi GROUP BY 1),
         |v0 AS (SELECT list_transform(range(64),
         |    x -> CAST(0.125 AS DOUBLE)) AS v),
         |${(1 to 8).map(pmiIterCtes).mkString(",\n")}
         |SELECT top.tok AS tok, top.idx AS idx, top.cnt AS cnt,
         |  v[CAST(idx + 1 AS INT)] AS loading, norm AS eigval
         |FROM top CROSS JOIN v8 ORDER BY idx""".stripMargin
    },

    "q251_hill_tail" -> {
      s"""WITH px AS (SELECT CAST(round(value * 100) AS BIGINT) AS x, event_id
         |  FROM events WHERE event_type = 'purchase'
         |  ORDER BY x DESC, event_id LIMIT 101),
         |rk AS (SELECT x, CAST(row_number() OVER (ORDER BY x DESC, event_id)
         |    AS BIGINT) AS rn FROM px),
         |xk AS (SELECT x AS xk1 FROM rk WHERE rn = 101),
         |sp AS (SELECT rn, ${lg("x")} - ${lg("xk1")} AS spread, xk1
         |  FROM rk CROSS JOIN xk WHERE rn <= 100),
         |su AS (SELECT xk1, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list(spread ORDER BY rn)), (a, x) -> a + x) AS sumspread
         |  FROM sp GROUP BY 1)
         |SELECT CAST(100 AS BIGINT) AS k, xk1, sumspread / 100.0 AS xi_bits,
         |  1.0 / (sumspread / 100.0 * 0.6931471805599453) AS alpha
         |FROM su""".stripMargin
    },

    "q246_srm" ->
      """WITH arms AS (SELECT user_id % 2 AS variant,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
        |t AS (SELECT
        |    CAST(sum(CASE WHEN variant = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 0 THEN n ELSE 0 END) AS BIGINT) AS n0
        |  FROM arms)
        |SELECT n1, n0,
        |  CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)
        |    AS chi2,
        |  CAST((n1 - n0) * (n1 - n0) AS DOUBLE) / CAST(n1 + n0 AS DOUBLE)
        |    > 3.841458820694124 AS srm_flag
        |FROM t""".stripMargin,

    "q247_mmd_quad" ->
      """WITH emb AS (SELECT vec_id % 2 = 0 AS grp,
        |    list_transform(embedding,
        |      x -> CAST(round(CAST(x AS DOUBLE) * 1024) AS BIGINT)) AS q
        |  FROM embeddings),
        |p1 AS (SELECT grp, CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS i,
        |    unnest(q) AS qi, q FROM emb),
        |p2 AS (SELECT grp, i, qi,
        |    CAST(generate_subscripts(q, 1) - 1 AS BIGINT) AS j,
        |    unnest(q) AS qj FROM p1),
        |pr AS (SELECT grp, i, j, CAST(sum(qi * qj) AS BIGINT) AS sij,
        |    CAST(count(*) AS BIGINT) AS n FROM p2 GROUP BY 1, 2, 3),
        |m AS (SELECT grp, i, j,
        |    CAST(sij AS DOUBLE) / CAST(n AS DOUBLE) / 1048576.0 AS mij
        |  FROM pr),
        |a AS (SELECT i, j, mij AS ma FROM m WHERE grp),
        |b AS (SELECT i, j, mij AS mb FROM m WHERE NOT grp),
        |counts AS (SELECT
        |    CAST(sum(CASE WHEN grp THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
        |    CAST(sum(CASE WHEN NOT grp THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
        |  FROM emb),
        |d AS (SELECT a.i AS i, a.j AS j, (ma - mb) * (ma - mb) AS d2
        |  FROM a JOIN b ON a.i = b.i AND a.j = b.j)
        |SELECT n_even, n_odd,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(d2 ORDER BY i, j)), (a, x) -> a + x) AS mmd2_quad
        |FROM d CROSS JOIN counts GROUP BY n_even, n_odd""".stripMargin,

    "q248_trimmed_ate" ->
      """WITH users AS (SELECT user_id % 2 AS variant, user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY user_id),
        |cnt AS (SELECT *,
        |    CAST(row_number() OVER (PARTITION BY variant
        |      ORDER BY cents, user_id) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY variant) AS BIGINT) AS n
        |  FROM users),
        |tr AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_kept,
        |    CAST(sum(cents) AS BIGINT) AS s FROM cnt
        |  WHERE rn > CAST(floor(n / 10) AS BIGINT)
        |    AND rn <= n - CAST(floor(n / 10) AS BIGINT)
        |  GROUP BY 1),
        |tm AS (SELECT variant, n_kept,
        |    CAST(s AS DOUBLE) / CAST(n_kept AS DOUBLE) / 100.0
        |      AS trimmed_mean FROM tr)
        |SELECT a1.n_kept AS n1_kept, a0.n_kept AS n0_kept,
        |  a1.trimmed_mean AS tm1, a0.trimmed_mean AS tm0,
        |  a1.trimmed_mean - a0.trimmed_mean AS trimmed_diff
        |FROM (SELECT * FROM tm WHERE variant = 1) a1
        |CROSS JOIN (SELECT * FROM tm WHERE variant = 0) a0""".stripMargin,

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
        |sv AS (SELECT source, nh, CASE WHEN nh < 2 THEN 0.0
        |    ELSE CAST(nh * syy - sy * sy AS DOUBLE) /
        |    CAST(nh * (nh - 1) AS DOUBLE) END AS s2 FROM strata),
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
