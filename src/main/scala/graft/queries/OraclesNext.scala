package graft.queries

/** DuckDB mirrors for [[CatalogNext]]. Same determinism discipline as the
  * rest of the oracle surface: exact integer sufficient statistics, fixed
  * parenthesization on every double combination, `list(v ORDER BY k)` folds
  * for order-sensitive float sums, exactly-representable decimal literals
  * only. */
object OraclesNext {

  private val lg = OraclesExt.lgSqlOf _

  /** One q321 power-iteration round on the implicit modularity matrix:
    * Ax via neighbor-ascending folds, the dᵀx scalar via an item-
    * ascending fold, ∞-norm rescale — mirrors the engine loop
    * op-for-op. */
  private def spectralRound(k: Int): String = {
    val prev = s"x${k - 1}"
    s"""ax$k AS MATERIALIZED (SELECT nbr.a AS item,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list($prev.x ORDER BY nbr.b)), (a, x) -> a + x) AS ax
       |  FROM nbr JOIN $prev ON $prev.item = nbr.b GROUP BY nbr.a),
       |sdx$k AS MATERIALIZED (SELECT
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(d AS DOUBLE) * x ORDER BY item)), (a, x) -> a + x)
       |      AS sdx
       |  FROM deg JOIN $prev USING (item)),
       |bx$k AS MATERIALIZED (SELECT deg.item,
       |    COALESCE(ax, 0.0) - CAST(d AS DOUBLE) * sdx
       |      / CAST(twom AS DOUBLE) AS bx
       |  FROM deg LEFT JOIN ax$k ON ax$k.item = deg.item
       |  CROSS JOIN sdx$k CROSS JOIN twom),
       |mx$k AS MATERIALIZED (SELECT max(abs(bx)) AS mx FROM bx$k),
       |x$k AS MATERIALIZED (SELECT item, bx / mx AS x
       |  FROM bx$k CROSS JOIN mx$k)""".stripMargin
  }

  /** Shared survival-frame CTEs (q208's derivation + the q301 arm split). */
  private[queries] val lifeCtes: String =
    """users AS (SELECT user_id,
      |    min(CAST(ts AS DATE)) AS first_d,
      |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
      |      THEN CAST(ts AS DATE) END) AS conv_d
      |  FROM events GROUP BY 1),
      |horizon AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
      |life AS (SELECT user_id % 2 AS g,
      |    CAST(date_diff('day', first_d, COALESCE(conv_d, max_d)) AS BIGINT)
      |      AS t,
      |    CASE WHEN conv_d IS NOT NULL
      |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS death
      |  FROM users CROSS JOIN horizon)""".stripMargin

  val all: Map[String, String] = Map(

    "q301_logrank" ->
      s"""WITH $lifeCtes,
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e1,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e2,
        |    CAST(sum(CASE WHEN g = 0 THEN death ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN g = 1 THEN death ELSE 0 END) AS BIGINT) AS d2
        |  FROM life GROUP BY 1),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1tot,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2tot
        |  FROM life),
        |risk AS (SELECT t, d1, d2,
        |    n1tot - COALESCE(sum(e1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        |    n2tot - COALESCE(sum(e2) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
        |  FROM byt CROSS JOIN tot),
        |terms AS (SELECT t, d1,
        |    CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS eexp,
        |    CASE WHEN n1 + n2 > 1 THEN
        |      CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |        * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |        * (CAST((n1 + n2) - (d1 + d2) AS DOUBLE)
        |          / CAST((n1 + n2) - 1 AS DOUBLE))
        |    ELSE CAST(0.0 AS DOUBLE) END AS v
        |  FROM risk WHERE d1 + d2 > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_times,
        |  CAST(sum(d1) AS BIGINT) AS o1,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(eexp ORDER BY t)), (a, x) -> a + x) AS e1,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(v ORDER BY t)), (a, x) -> a + x) AS v1,
        |  (CAST(sum(d1) AS DOUBLE)
        |      - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list(eexp ORDER BY t)), (a, x) -> a + x))
        |    * (CAST(sum(d1) AS DOUBLE)
        |      - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list(eexp ORDER BY t)), (a, x) -> a + x))
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list(v ORDER BY t)), (a, x) -> a + x) AS chi2
        |FROM terms""".stripMargin,

    "q302_nelson_aalen" ->
      s"""WITH $lifeCtes,
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
        |    CAST(d AS DOUBLE)
        |      / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)) AS vterm
        |  FROM risk WHERE d > 0)
        |SELECT t, n_risk, d, hazard,
        |  sum(hazard) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS na_cum,
        |  sum(vterm) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS var_cum
        |FROM steps ORDER BY t""".stripMargin,

    "q303_mantel_haenszel" ->
      """WITH tab AS (SELECT c_nationkey AS stratum,
        |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |      AND c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |      AND NOT c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN NOT c_mktsegment = 'AUTOMOBILE'
        |      AND c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN NOT c_mktsegment = 'AUTOMOBILE'
        |      AND NOT c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM customer GROUP BY 1),
        |tab2 AS (SELECT stratum, a, b, c, d, a + b + c + d AS n FROM tab
        |  WHERE a + b + c + d > 1),
        |terms AS (SELECT stratum, a,
        |    CAST(a * d AS DOUBLE) / CAST(n AS DOUBLE) AS adn,
        |    CAST(b * c AS DOUBLE) / CAST(n AS DOUBLE) AS bcn,
        |    CAST((a + b) * (a + c) AS DOUBLE) / CAST(n AS DOUBLE) AS e,
        |    CAST((a + b) * (c + d) AS DOUBLE)
        |      * CAST((a + c) * (b + d) AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        * CAST(n - 1 AS DOUBLE)) AS v
        |  FROM tab2),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(a) AS BIGINT) AS sum_o,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(adn ORDER BY stratum)), (a, x) -> a + x) AS sum_ad,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(bcn ORDER BY stratum)), (a, x) -> a + x) AS sum_bc,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(e ORDER BY stratum)), (a, x) -> a + x) AS sum_e,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v ORDER BY stratum)), (a, x) -> a + x) AS sum_v
        |  FROM terms)
        |SELECT n_strata, sum_o, sum_e, sum_v,
        |  sum_ad / sum_bc AS or_mh,
        |  (CAST(sum_o AS DOUBLE) - sum_e) * (CAST(sum_o AS DOUBLE) - sum_e)
        |    / sum_v AS chi2_mh
        |FROM agg""".stripMargin,

    "q304_fleiss_kappa" ->
      """WITH rated AS (
        |  SELECT doc_id, 1 AS rater,
        |    md5('flk1:' || CAST(doc_id AS VARCHAR)) AS ma, lang
        |  FROM documents
        |  UNION ALL SELECT doc_id, 2,
        |    md5('flk2:' || CAST(doc_id AS VARCHAR)), lang FROM documents
        |  UNION ALL SELECT doc_id, 3,
        |    md5('flk3:' || CAST(doc_id AS VARCHAR)), lang FROM documents),
        |ratings AS (SELECT doc_id,
        |    CASE WHEN ('0x' || substr(ma, 1, 4))::BIGINT % 20 = 0
        |      THEN (['de','en','es','fr','zh'])
        |        [CAST(('0x' || substr(ma, 5, 2))::BIGINT % 5 AS INT) + 1]
        |      ELSE lang END AS cat
        |  FROM rated),
        |nij AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS nij
        |  FROM ratings GROUP BY 1, 2),
        |sq AS (SELECT CAST(sum(nij * nij) AS BIGINT) AS ssq,
        |    CAST(sum(nij) / 3 AS BIGINT) AS n_docs FROM nij),
        |pj AS (SELECT cat, CAST(count(*) AS BIGINT) AS cj
        |  FROM ratings GROUP BY 1),
        |pe AS (SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((CAST(cj AS DOUBLE) / CAST(n_docs * 3 AS DOUBLE))
        |        * (CAST(cj AS DOUBLE) / CAST(n_docs * 3 AS DOUBLE))
        |        ORDER BY cat)), (a, x) -> a + x) AS p_e
        |  FROM pj CROSS JOIN (SELECT n_docs FROM sq) s)
        |SELECT n_docs, CAST(3 AS BIGINT) AS n_raters,
        |  CAST(ssq - n_docs * 3 AS DOUBLE) / CAST(n_docs * 6 AS DOUBLE)
        |    AS p_bar,
        |  p_e,
        |  (CAST(ssq - n_docs * 3 AS DOUBLE) / CAST(n_docs * 6 AS DOUBLE)
        |    - p_e) / (1.0 - p_e) AS kappa
        |FROM sq CROSS JOIN pe""".stripMargin,

    "q305_jarque_bera" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2,
        |    CAST(sum(c * c * c) AS BIGINT) AS s3,
        |    CAST(sum(c * c * c * c) AS BIGINT) AS s4
        |  FROM daily),
        |m1 AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m
        |  FROM mom),
        |m2c AS (SELECT *,
        |    CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - m * m AS m2,
        |    CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 3.0 * m * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 2.0 * m * m * m AS m3,
        |    CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
        |      - 4.0 * m * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
        |      + 6.0 * (m * m) * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
        |      - 3.0 * (m * m) * (m * m) AS m4
        |  FROM m1),
        |sk AS (SELECT *, m3 / (m2 * sqrt(m2)) AS skew,
        |    m4 / (m2 * m2) AS kurt FROM m2c)
        |SELECT n AS n_days, m AS mean_daily, m2, skew, kurt,
        |  CAST(n AS DOUBLE) / 6.0
        |    * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jb
        |FROM sk""".stripMargin,

    "q306_levene_bf" ->
      """WITH c AS (SELECT c_mktsegment AS seg, c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x FROM customer),
        |rk AS (SELECT seg, x,
        |    row_number() OVER (PARTITION BY seg ORDER BY x, c_custkey)
        |      AS rn,
        |    count(*) OVER (PARTITION BY seg) AS cnt
        |  FROM c),
        |med AS (SELECT seg, x AS med FROM rk WHERE rn = (cnt + 1) // 2),
        |z AS (SELECT c.seg, abs(x - med) AS z FROM c JOIN med USING (seg)),
        |grp AS (SELECT seg, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(z) AS BIGINT) AS sz,
        |    CAST(sum(z * z) AS BIGINT) AS sz2
        |  FROM z GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(ng) AS BIGINT) AS n,
        |    CAST(sum(sz) AS BIGINT) AS szall,
        |    CAST(sum(sz2) AS BIGINT) AS sz2all,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
        |        / CAST(ng AS DOUBLE) ORDER BY seg)),
        |      (a, x) -> a + x) AS fold_g
        |  FROM grp),
        |ss AS (SELECT k, n,
        |    fold_g - CAST(szall AS DOUBLE) * CAST(szall AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS ss_between,
        |    CAST(sz2all AS DOUBLE) - fold_g AS ss_within
        |  FROM agg)
        |SELECT k, n, ss_between, ss_within,
        |  (ss_between / CAST(k - 1 AS DOUBLE))
        |    / (ss_within / CAST(n - k AS DOUBLE)) AS f_stat
        |FROM ss""".stripMargin,

    "q307_durbin_watson" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT ds, y,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i
        |  FROM daily),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(i * y) AS BIGINT) AS sxy
        |  FROM idx),
        |fit AS (SELECT n, sy, sxy,
        |    n * (n + 1) // 2 AS sx,
        |    n * (n + 1) * (2 * n + 1) // 6 AS sxx
        |  FROM sums),
        |fit2 AS (SELECT n,
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta, sy, sx
        |  FROM fit),
        |fit3 AS (SELECT n, beta,
        |    (CAST(sy AS DOUBLE) - beta * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS alpha
        |  FROM fit2),
        |resid AS (SELECT i, n, beta, alpha,
        |    CAST(y AS DOUBLE) - (alpha + beta * CAST(i AS DOUBLE)) AS e
        |  FROM idx CROSS JOIN fit3),
        |resid2 AS (SELECT i, n, beta, alpha, e,
        |    lag(e, 1) OVER (ORDER BY i) AS ep
        |  FROM resid)
        |SELECT max(n) AS n_days, max(beta) AS beta, max(alpha) AS alpha,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CASE WHEN ep IS NULL THEN 0.0
        |      ELSE (e - ep) * (e - ep) END ORDER BY i)),
        |    (a, x) -> a + x)
        |  / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(e * e ORDER BY i)), (a, x) -> a + x) AS dw
        |FROM resid2""".stripMargin,

    "q308_grubbs" ->
      """WITH c AS (SELECT c_custkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x FROM customer),
        |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x * x) AS BIGINT) AS s2
        |  FROM c),
        |st2 AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |    s1, s2 FROM st),
        |st3 AS (SELECT n, mean,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * mean)
        |      / CAST(n - 1 AS DOUBLE)) AS s
        |  FROM st2)
        |SELECT n AS n_cust, mean / 100.0 AS mean_bal,
        |  abs(CAST(x AS DOUBLE) - mean) / s AS g_stat,
        |  c_custkey AS outlier_custkey,
        |  CAST(x AS DOUBLE) / 100.0 AS outlier_bal
        |FROM c CROSS JOIN st3
        |ORDER BY abs(CAST(x AS DOUBLE) - mean) DESC, c_custkey
        |LIMIT 1""".stripMargin,

    "q309_friedman" ->
      """WITH cells AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
        |    event_type, CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |byv AS (SELECT ds, v, CAST(count(*) AS BIGINT) AS c
        |  FROM cells GROUP BY 1, 2),
        |ranked AS (SELECT ds, v,
        |    COALESCE(sum(c) OVER (PARTITION BY ds ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + 1
        |      AS rlo,
        |    c, CAST(c * c * c - c AS BIGINT) AS tie3
        |  FROM byv),
        |ranked2 AS (SELECT ds, v, rlo * 2 + c - 1 AS ar2, tie3
        |  FROM ranked),
        |pt AS (SELECT event_type, CAST(sum(ar2) AS BIGINT) AS r2
        |  FROM cells JOIN ranked2 USING (ds, v) GROUP BY 1),
        |base AS (SELECT
        |    CAST(count(DISTINCT ds) AS BIGINT) AS b,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS k
        |  FROM cells),
        |ties AS (SELECT CAST(sum(tie3) AS BIGINT) AS tsum FROM ranked2),
        |sr AS (SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((CAST(r2 AS DOUBLE) / 2.0) * (CAST(r2 AS DOUBLE) / 2.0)
        |        ORDER BY event_type)), (a, x) -> a + x) AS sumr2
        |  FROM pt),
        |qs AS (SELECT b, k, tsum, sumr2,
        |    12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE)
        |      * CAST(k + 1 AS DOUBLE)) * sumr2
        |      - 3.0 * CAST(b AS DOUBLE) * CAST(k + 1 AS DOUBLE) AS q_stat,
        |    1.0 - CAST(tsum AS DOUBLE)
        |      / CAST(b * (k * k * k - k) AS DOUBLE) AS c_ties
        |  FROM sr CROSS JOIN base CROSS JOIN ties)
        |SELECT b AS n_blocks, k AS n_treatments, q_stat,
        |  CASE WHEN c_ties > 0.0 THEN q_stat / c_ties
        |    ELSE CAST('nan' AS DOUBLE) END AS q_tie_corrected
        |FROM qs""".stripMargin,

    "q310_cronbach" ->
      """WITH items AS (SELECT unnest(
        |    ['click','error','purchase','signup','view']) AS item),
        |us AS (SELECT DISTINCT user_id FROM events),
        |counts AS (SELECT user_id, event_type,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |x AS (SELECT us.user_id, items.item,
        |    COALESCE(cnt, CAST(0 AS BIGINT)) AS x
        |  FROM us CROSS JOIN items
        |  LEFT JOIN counts ON counts.user_id = us.user_id
        |    AND counts.event_type = items.item),
        |per_item AS (SELECT item, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sx2
        |  FROM x GROUP BY 1),
        |iv AS (SELECT max(n) AS n_users,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE)
        |        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))
        |        / CAST(n - 1 AS DOUBLE) ORDER BY item)),
        |      (a, x) -> a + x) AS sum_item_var
        |  FROM per_item),
        |ut AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS t FROM x
        |  GROUP BY 1),
        |tv AS (SELECT
        |    (CAST(sum(t * t) AS DOUBLE) - CAST(sum(t) AS DOUBLE)
        |      * (CAST(sum(t) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
        |      / CAST(count(*) - 1 AS DOUBLE) AS total_var
        |  FROM ut)
        |SELECT CAST(5 AS BIGINT) AS k, n_users, sum_item_var, total_var,
        |  (5.0 / 4.0) * (1.0 - sum_item_var / total_var) AS alpha
        |FROM iv CROSS JOIN tv""".stripMargin,

    "q311_max_drawdown" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy FROM daily),
        |eq AS (SELECT ds, n,
        |    n * sum(y) OVER (ORDER BY ds
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - CAST(row_number() OVER (ORDER BY ds) AS BIGINT) * sy AS e
        |  FROM daily CROSS JOIN tot),
        |eq2 AS (SELECT ds, n, e,
        |    max(e) OVER (ORDER BY ds
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
        |  FROM eq),
        |eq3 AS (SELECT ds, n, e, runmax, runmax - e AS dd FROM eq2),
        |trough AS (SELECT n AS n_days, ds AS trough_ds, runmax AS rm, dd
        |  FROM eq3 ORDER BY dd DESC, ds LIMIT 1),
        |peak AS (SELECT min(eq3.ds) AS peak_ds
        |  FROM eq3 JOIN trough ON eq3.e = trough.rm
        |    AND eq3.ds <= trough.trough_ds)
        |SELECT n_days, peak_ds, trough_ds,
        |  CAST(dd AS DOUBLE) / (CAST(n_days AS DOUBLE) * 100.0)
        |    AS max_drawdown
        |FROM trough CROSS JOIN peak""".stripMargin,

    "q312_var_cvar" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |diffs AS (SELECT ds, y - lag(y, 1) OVER (ORDER BY ds) AS dy
        |  FROM daily),
        |dd AS (SELECT ds, dy FROM diffs WHERE dy IS NOT NULL),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dd),
        |rk AS (SELECT dy,
        |    CAST(row_number() OVER (ORDER BY dy, ds) AS BIGINT) AS rn,
        |    n, (n + 19) // 20 AS k
        |  FROM dd CROSS JOIN nn)
        |SELECT n AS n_changes, k AS k_tail,
        |  -(CAST(max(dy) AS DOUBLE) / 100.0) AS var95_loss,
        |  -(CAST(sum(dy) AS DOUBLE) / (CAST(k AS DOUBLE) * 100.0))
        |    AS cvar95_loss
        |FROM rk WHERE rn <= k GROUP BY n, k""".stripMargin,

    "q313_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |idx AS (SELECT ds, c,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i FROM daily),
        |hw AS (
        |  SELECT i, ds, c, CAST(c AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS t,
        |    [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]::DOUBLE[] AS s,
        |    CAST(0.0 AS DOUBLE) AS seasonal, CAST(NULL AS DOUBLE) AS fcst
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.ds, idx.c,
        |    0.5 * (CAST(idx.c AS DOUBLE) - hw.s[1])
        |      + 0.5 * (hw.l + hw.t),
        |    0.25 * ((0.5 * (CAST(idx.c AS DOUBLE) - hw.s[1])
        |        + 0.5 * (hw.l + hw.t)) - hw.l) + 0.75 * hw.t,
        |    list_append(hw.s[2:7],
        |      0.5 * (CAST(idx.c AS DOUBLE)
        |          - (0.5 * (CAST(idx.c AS DOUBLE) - hw.s[1])
        |            + 0.5 * (hw.l + hw.t)))
        |        + 0.5 * hw.s[1]),
        |    hw.s[1],
        |    hw.l + hw.t + hw.s[1]
        |  FROM hw JOIN idx ON idx.i = hw.i + 1)
        |SELECT i, ds, c, l AS level, t AS trend, seasonal, fcst
        |FROM hw ORDER BY i""".stripMargin,

    "q314_pacf" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |cser AS (SELECT d, n * x - sx AS c FROM daily CROSS JOIN tot),
        |lagd AS (SELECT c,
        |    lag(c, 1) OVER (ORDER BY d) AS c1,
        |    lag(c, 2) OVER (ORDER BY d) AS c2,
        |    lag(c, 3) OVER (ORDER BY d) AS c3,
        |    lag(c, 4) OVER (ORDER BY d) AS c4,
        |    lag(c, 5) OVER (ORDER BY d) AS c5
        |  FROM cser),
        |sums AS (SELECT CAST(sum(c * c) AS BIGINT) AS den,
        |    CAST(sum(c * c1) AS BIGINT) AS num1,
        |    CAST(sum(c * c2) AS BIGINT) AS num2,
        |    CAST(sum(c * c3) AS BIGINT) AS num3,
        |    CAST(sum(c * c4) AS BIGINT) AS num4,
        |    CAST(sum(c * c5) AS BIGINT) AS num5
        |  FROM lagd),
        |rs AS (SELECT
        |    CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS r1,
        |    CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) AS r2,
        |    CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) AS r3,
        |    CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) AS r4,
        |    CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) AS r5
        |  FROM sums),
        |dl1 AS (SELECT *, r1 AS p11, 1.0 - r1 * r1 AS v1 FROM rs),
        |dl2 AS (SELECT *, (r2 - (p11 * r1)) / v1 AS p22 FROM dl1),
        |dl2b AS (SELECT *, p11 - p22 * p11 AS p21,
        |    v1 * (1.0 - p22 * p22) AS v2 FROM dl2),
        |dl3 AS (SELECT *,
        |    (r3 - ((p21 * r2) + (p22 * r1))) / v2 AS p33 FROM dl2b),
        |dl3b AS (SELECT *, p21 - p33 * p22 AS p31, p22 - p33 * p21 AS p32,
        |    v2 * (1.0 - p33 * p33) AS v3 FROM dl3),
        |dl4 AS (SELECT *,
        |    (r4 - (((p31 * r3) + (p32 * r2)) + (p33 * r1))) / v3 AS p44
        |  FROM dl3b),
        |dl4b AS (SELECT *, p31 - p44 * p33 AS p41, p32 - p44 * p32 AS p42,
        |    p33 - p44 * p31 AS p43, v3 * (1.0 - p44 * p44) AS v4 FROM dl4),
        |dl5 AS (SELECT *,
        |    (r5 - ((((p41 * r4) + (p42 * r3)) + (p43 * r2)) + (p44 * r1)))
        |      / v4 AS p55
        |  FROM dl4b)
        |SELECT CAST(1 AS BIGINT) AS "lag", r1 AS acf, p11 AS pacf FROM dl5
        |UNION ALL SELECT CAST(2 AS BIGINT), r2, p22 FROM dl5
        |UNION ALL SELECT CAST(3 AS BIGINT), r3, p33 FROM dl5
        |UNION ALL SELECT CAST(4 AS BIGINT), r4, p44 FROM dl5
        |UNION ALL SELECT CAST(5 AS BIGINT), r5, p55 FROM dl5
        |ORDER BY "lag"""".stripMargin,

    "q315_changepoint" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pre AS (SELECT ds,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i,
        |    sum(y) OVER (ORDER BY ds
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
        |    sum(y * y) OVER (ORDER BY ds
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q
        |  FROM daily),
        |tot AS (SELECT max(i) AS n, max(p) AS pn, max(q) AS qn FROM pre),
        |cand AS (SELECT ds, i, p, q, n, pn, qn,
        |    CAST(q AS DOUBLE)
        |      - CAST(p AS DOUBLE) * CAST(p AS DOUBLE) / CAST(i AS DOUBLE)
        |      AS sse_l,
        |    CAST(qn - q AS DOUBLE)
        |      - CAST(pn - p AS DOUBLE) * CAST(pn - p AS DOUBLE)
        |        / CAST(n - i AS DOUBLE) AS sse_r
        |  FROM pre CROSS JOIN tot
        |  WHERE i >= 2 AND i <= n - 2)
        |SELECT n AS n_days, i AS split_i, ds AS split_ds,
        |  CAST(qn AS DOUBLE)
        |    - CAST(pn AS DOUBLE) * CAST(pn AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS sse_full,
        |  sse_l + sse_r AS sse_split,
        |  CAST(p AS DOUBLE) / CAST(i AS DOUBLE) AS mean_left,
        |  CAST(pn - p AS DOUBLE) / CAST(n - i AS DOUBLE) AS mean_right
        |FROM cand ORDER BY sse_l + sse_r, i LIMIT 1""".stripMargin,

    "q316_geo_radius" ->
      """WITH pts AS (SELECT c_custkey AS key,
        |    ('0x' || substr(md5('glat:' || CAST(c_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 2000000 AS ilat,
        |    ('0x' || substr(md5('glon:' || CAST(c_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 2000000 AS ilon
        |  FROM customer),
        |cells AS (SELECT key, ilat, ilon, ilat // 20000 AS cl,
        |    ilon // 20000 AS cn FROM pts),
        |probes AS (SELECT key AS a, ilat AS alat, ilon AS alon,
        |    cl + dxs.dx AS pl, cn + dys.dy AS pn
        |  FROM cells
        |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dxs
        |  CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dys),
        |pairs AS (SELECT a, c2.key AS b,
        |    (alat - c2.ilat) * (alat - c2.ilat)
        |      + (alon - c2.ilon) * (alon - c2.ilon) AS d2
        |  FROM probes JOIN cells c2
        |    ON probes.pl = c2.cl AND probes.pn = c2.cn
        |    AND probes.a < c2.key)
        |SELECT a AS a_key, b AS b_key, d2,
        |  sqrt(CAST(d2 AS DOUBLE)) * 0.11132e0 AS meters
        |FROM pairs ORDER BY d2, a, b LIMIT 10""".stripMargin,

    "q317_naive_bayes" -> {
      s"""WITH toks AS (SELECT doc_id, lang AS true_lang,
        |    unnest(string_split(text, ' ')) AS w,
        |    CAST(generate_subscripts(string_split(text, ' '), 1) - 1
        |      AS BIGINT) AS pos
        |  FROM documents),
        |tf AS (SELECT doc_id, true_lang, pos,
        |    ('0x' || substr(md5('nbf:' || w), 1, 8))::BIGINT % 1024 AS f
        |  FROM toks),
        |cf AS (SELECT true_lang AS l, f, CAST(count(*) AS BIGINT) AS cf
        |  FROM tf GROUP BY 1, 2),
        |cl AS (SELECT true_lang AS l, CAST(count(*) AS BIGINT) AS cl
        |  FROM tf GROUP BY 1),
        |nd AS (SELECT lang AS l, CAST(count(*) AS BIGINT) AS nd
        |  FROM documents GROUP BY 1),
        |ndtot AS (SELECT CAST(count(*) AS BIGINT) AS ndtot FROM documents),
        |scored AS (SELECT tf.doc_id, langs.l,
        |    CAST(count(*) AS BIGINT) AS ntok,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(${lg("COALESCE(cf.cf, 0) + 1")} ORDER BY pos)),
        |      (a, x) -> a + x) AS sumlg
        |  FROM tf
        |  CROSS JOIN (SELECT l FROM nd) langs
        |  LEFT JOIN cf ON cf.l = langs.l AND cf.f = tf.f
        |  GROUP BY 1, 2),
        |fl AS (SELECT scored.doc_id, scored.l,
        |    (${lg("nd.nd")} - ${lg("ndtot.ndtot")}) + scored.sumlg
        |      - CAST(scored.ntok AS DOUBLE) * ${lg("cl.cl + 1024")}
        |      AS score
        |  FROM scored JOIN cl ON cl.l = scored.l
        |  JOIN nd ON nd.l = scored.l CROSS JOIN ndtot),
        |pred AS (SELECT doc_id, l AS pred_lang FROM (
        |    SELECT doc_id, l, row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, l) AS rk FROM fl)
        |  WHERE rk = 1)
        |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents JOIN pred USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    },

    "q318_map_retrieval" ->
      """WITH dtok AS (SELECT DISTINCT doc_id, source, w FROM (
        |    SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |    FROM documents)),
        |qd AS (SELECT doc_id AS qid, source AS qsrc, w FROM dtok
        |  WHERE doc_id < 10),
        |cd AS (SELECT doc_id AS cid, source AS csrc, w FROM dtok
        |  WHERE doc_id >= 10),
        |ov AS (SELECT qid, qsrc, cid, csrc,
        |    CAST(count(*) AS BIGINT) AS ov
        |  FROM qd JOIN cd USING (w) GROUP BY 1, 2, 3, 4),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY qid
        |    ORDER BY ov DESC, cid) AS BIGINT) AS rk FROM ov),
        |topk AS (SELECT *, CASE WHEN csrc = qsrc THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS rel
        |  FROM rk WHERE rk <= 10),
        |hits AS (SELECT *, sum(rel) OVER (PARTITION BY qid ORDER BY rk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hits
        |  FROM topk),
        |apn AS (SELECT qid,
        |    CAST(sum(CASE WHEN rel = 1 THEN hits * (2520 // rk)
        |      ELSE 0 END) AS BIGINT) AS apnum
        |  FROM hits GROUP BY 1),
        |rtot AS (SELECT q.doc_id AS qid,
        |    least(COALESCE(nr.nrel, CAST(0 AS BIGINT)),
        |      CAST(10 AS BIGINT)) AS rq
        |  FROM (SELECT doc_id, source FROM documents WHERE doc_id < 10) q
        |  LEFT JOIN (SELECT source, CAST(count(*) AS BIGINT) AS nrel
        |    FROM documents WHERE doc_id >= 10 GROUP BY 1) nr
        |    ON q.source = nr.source),
        |ap AS (SELECT apn.qid,
        |    CAST(apnum AS DOUBLE) / (2520.0 * CAST(rq AS DOUBLE)) AS ap
        |  FROM apn JOIN rtot ON rtot.qid = apn.qid WHERE rq > 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(ap ORDER BY qid)), (a, x) -> a + x)
        |    / CAST(count(*) AS DOUBLE) AS map10
        |FROM ap""".stripMargin,

    "q319_item_cosine" ->
      """WITH ui AS (SELECT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2),
        |norms AS (SELECT item, CAST(sum(c * c) AS BIGINT) AS n2 FROM ui
        |  GROUP BY 1),
        |pairs AS (SELECT x.item AS i, y.item AS j,
        |    CAST(sum(x.c * y.c) AS BIGINT) AS dot
        |  FROM ui x JOIN ui y ON x.u = y.u AND x.item < y.item
        |  GROUP BY 1, 2),
        |cosd AS (SELECT i, j, dot,
        |    CAST(dot AS DOUBLE)
        |      / (sqrt(CAST(ni.n2 AS DOUBLE)) * sqrt(CAST(nj.n2 AS DOUBLE)))
        |      AS cosine
        |  FROM pairs JOIN norms ni ON pairs.i = ni.item
        |  JOIN norms nj ON pairs.j = nj.item),
        |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY i
        |    ORDER BY cosine DESC, j) AS BIGINT) AS rk
        |  FROM cosd WHERE i < 10)
        |SELECT i AS item, j AS neighbor, dot, cosine, rk FROM rk
        |WHERE rk <= 5 ORDER BY item, rk""".stripMargin,

    "q320_als_rank1" ->
      """WITH rr AS (SELECT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item,
        |    CAST(CAST(count(*) AS BIGINT) AS DOUBLE) AS r
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL
        |  GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT item, CAST(1.0 AS DOUBLE) AS v FROM rr),
        |u1 AS MATERIALIZED (SELECT u,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * v ORDER BY item)), (a, x) -> a + x)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v * v ORDER BY item)), (a, x) -> a + x) AS v_u
        |  FROM rr JOIN v0 USING (item) GROUP BY u),
        |v1 AS MATERIALIZED (SELECT item,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * v_u ORDER BY u)), (a, x) -> a + x)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v_u * v_u ORDER BY u)), (a, x) -> a + x) AS v
        |  FROM rr JOIN u1 USING (u) GROUP BY item),
        |u2 AS MATERIALIZED (SELECT u,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * v ORDER BY item)), (a, x) -> a + x)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v * v ORDER BY item)), (a, x) -> a + x) AS v_u
        |  FROM rr JOIN v1 USING (item) GROUP BY u),
        |v2 AS MATERIALIZED (SELECT item,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * v_u ORDER BY u)), (a, x) -> a + x)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v_u * v_u ORDER BY u)), (a, x) -> a + x) AS v
        |  FROM rr JOIN u2 USING (u) GROUP BY item),
        |u3 AS MATERIALIZED (SELECT u,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * v ORDER BY item)), (a, x) -> a + x)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v * v ORDER BY item)), (a, x) -> a + x) AS v_u
        |  FROM rr JOIN v2 USING (item) GROUP BY u),
        |v3 AS MATERIALIZED (SELECT item,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(r * v_u ORDER BY u)), (a, x) -> a + x)
        |    / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(v_u * v_u ORDER BY u)), (a, x) -> a + x) AS v
        |  FROM rr JOIN u3 USING (u) GROUP BY item),
        |pred AS (SELECT rr.u, rr.item, rr.r, u3.v_u * v3.v AS p
        |  FROM rr JOIN u3 USING (u) JOIN v3 USING (item)),
        |rmse AS (SELECT sqrt(
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list((r - p) * (r - p) ORDER BY u, item)), (a, x) -> a + x)
        |    / CAST(count(*) AS DOUBLE)) AS rmse FROM pred)
        |SELECT item, v AS v_score, rmse
        |FROM v3 CROSS JOIN rmse
        |ORDER BY v_score DESC, item LIMIT 10""".stripMargin,

    "q321_spectral_split" -> {
      s"""WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
        |edges AS (SELECT a.item AS i, b.item AS j
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nbr AS (SELECT i AS a, j AS b FROM edges
        |  UNION ALL SELECT j, i FROM edges),
        |deg AS (SELECT a AS item, CAST(count(*) AS BIGINT) AS d FROM nbr
        |  GROUP BY 1),
        |twom AS (SELECT CAST(sum(d) AS BIGINT) AS twom FROM deg),
        |x0 AS (SELECT item, CASE WHEN
        |    ('0x' || substr(md5('sp:' || CAST(item AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 = 0
        |    THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS x
        |  FROM deg),
        |${(1 to 8).map(spectralRound).mkString(",\n")}
        |SELECT item, x AS score,
        |  CASE WHEN x >= 0.0 THEN CAST(1 AS BIGINT)
        |    ELSE CAST(0 AS BIGINT) END AS community
        |FROM x8 ORDER BY item""".stripMargin
    },

    "q322_kneser_ney" -> {
      s"""WITH toks AS (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    CAST(generate_subscripts(string_split(text, ' '), 1) - 1
        |      AS BIGINT) AS pos
        |  FROM documents),
        |big AS (SELECT doc_id, pos,
        |    lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
        |    w AS w2
        |  FROM toks),
        |big2 AS (SELECT doc_id, pos, w1, w2 FROM big WHERE w1 IS NOT NULL),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big2
        |  GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |    CAST(count(*) AS BIGINT) AS n1w1 FROM c12 GROUP BY 1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS ncont2 FROM c12
        |  GROUP BY 1),
        |types AS (SELECT CAST(count(*) AS BIGINT) AS ntypes FROM c12),
        |scored AS (SELECT doc_id, pos, ntypes,
        |    ${lg("(c12 * 4 - 3) * ntypes + n1w1 * ncont2 * 3")}
        |      - ${lg("c1 * 4 * ntypes")} AS lgp
        |  FROM big2 JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
        |  JOIN cont USING (w2) CROSS JOIN types)
        |SELECT CAST(count(*) AS BIGINT) AS n_bigrams,
        |  max(ntypes) AS n_bigram_types,
        |  -(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(lgp ORDER BY doc_id, pos)), (a, x) -> a + x)
        |    / CAST(count(*) AS DOUBLE)) AS cross_entropy_bits
        |FROM scored""".stripMargin
    },

    "q323_competing_risks" ->
      """WITH RECURSIVE users AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_d,
        |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN CAST(ts AS DATE) END) AS ca_d,
        |    min(CASE WHEN event_type = 'error'
        |      THEN CAST(ts AS DATE) END) AS cb_d
        |  FROM events GROUP BY 1),
        |horizon AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
        |life AS (SELECT
        |    CASE WHEN ca_d IS NULL AND cb_d IS NULL
        |      THEN CAST(date_diff('day', first_d, max_d) AS BIGINT)
        |      ELSE least(
        |        COALESCE(CAST(date_diff('day', first_d, ca_d) AS BIGINT),
        |          9223372036854775807),
        |        COALESCE(CAST(date_diff('day', first_d, cb_d) AS BIGINT),
        |          9223372036854775807)) END AS t,
        |    CASE WHEN ca_d IS NULL AND cb_d IS NULL THEN 0
        |      WHEN cb_d IS NULL OR (ca_d IS NOT NULL AND
        |        CAST(date_diff('day', first_d, ca_d) AS BIGINT) <=
        |        CAST(date_diff('day', first_d, cb_d) AS BIGINT)) THEN 1
        |      ELSE 2 END AS cause
        |  FROM users CROSS JOIN horizon),
        |byt AS (SELECT t, CAST(count(*) AS BIGINT) AS ending,
        |    CAST(sum(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS da,
        |    CAST(sum(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS db
        |  FROM life GROUP BY 1),
        |risk AS (SELECT t, da, db,
        |    CAST(sum(ending) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
        |      AS n_risk
        |  FROM byt),
        |deaths AS (SELECT t, da, db, n_risk,
        |    CAST(row_number() OVER (ORDER BY t) AS BIGINT) AS i
        |  FROM risk WHERE da + db > 0),
        |aj AS (
        |  SELECT i, t, n_risk, da, db, CAST(1.0 AS DOUBLE) AS s_before,
        |    0.0 + 1.0 * (CAST(da AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      AS cif_a,
        |    0.0 + 1.0 * (CAST(db AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      AS cif_b,
        |    1.0 * (1.0 - CAST(da + db AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      AS s_after
        |  FROM deaths WHERE i = 1
        |  UNION ALL
        |  SELECT d.i, d.t, d.n_risk, d.da, d.db,
        |    aj.s_after,
        |    aj.cif_a + aj.s_after
        |      * (CAST(d.da AS DOUBLE) / CAST(d.n_risk AS DOUBLE)),
        |    aj.cif_b + aj.s_after
        |      * (CAST(d.db AS DOUBLE) / CAST(d.n_risk AS DOUBLE)),
        |    aj.s_after * (1.0 - CAST(d.da + d.db AS DOUBLE)
        |      / CAST(d.n_risk AS DOUBLE))
        |  FROM aj JOIN deaths d ON d.i = aj.i + 1)
        |SELECT t, n_risk, da AS d_a, db AS d_b, s_before, cif_a, cif_b
        |FROM aj ORDER BY t""".stripMargin,

    "q324_tukey_hsd" ->
      """WITH c AS (SELECT c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x FROM customer),
        |grp AS (SELECT seg, CAST(count(*) AS BIGINT) AS ng,
        |    CAST(sum(x) AS BIGINT) AS s1,
        |    CAST(sum(x * x) AS BIGINT) AS s2
        |  FROM c GROUP BY 1),
        |msw AS (SELECT
        |    (CAST(sum(s2) AS DOUBLE)
        |      - list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |            / CAST(ng AS DOUBLE) ORDER BY seg)), (a, x) -> a + x))
        |      / CAST(sum(ng) - count(*) AS DOUBLE) AS msw
        |  FROM grp),
        |m AS (SELECT seg, ng,
        |    CAST(s1 AS DOUBLE) / CAST(ng AS DOUBLE) AS mean FROM grp)
        |SELECT a.seg AS seg_a, b.seg AS seg_b,
        |  (a.mean - b.mean) / 100.0 AS diff_bal,
        |  abs(a.mean - b.mean)
        |    / sqrt(msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
        |      + 1.0 / CAST(b.ng AS DOUBLE))) AS q_stat
        |FROM m a JOIN m b ON a.seg < b.seg CROSS JOIN msw
        |ORDER BY seg_a, seg_b""".stripMargin,

    "q325_hmm_viterbi" -> {
      val lg45 = s"(${lg("4")} - ${lg("5")})"
      val lg15 = s"(${lg("1")} - ${lg("5")})"
      s"""WITH RECURSIVE daily AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |mm AS (SELECT CAST(min(c) AS BIGINT) AS minc,
        |    CAST(max(c) AS BIGINT) AS maxc FROM daily),
        |idx AS (SELECT ds, c,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i,
        |    least((c - minc) // ((maxc - minc) // 10 + 1),
        |      CAST(9 AS BIGINT)) AS b
        |  FROM daily CROSS JOIN mm),
        |n1 AS (SELECT max(i) AS n FROM idx),
        |fwd AS (
        |  SELECT i, ds, c, b,
        |    (${lg("1")} - ${lg("2")}) + (${lg("10 - b")} - ${lg("55")})
        |      AS dl,
        |    (${lg("1")} - ${lg("2")}) + (${lg("b + 1")} - ${lg("55")})
        |      AS dh,
        |    [0] AS bl, [0] AS bh
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT idx.i, idx.ds, idx.c, idx.b,
        |    CASE WHEN fwd.dl + $lg45 >= fwd.dh + $lg15
        |      THEN (fwd.dl + $lg45)
        |        + (${lg("10 - idx.b")} - ${lg("55")})
        |      ELSE (fwd.dh + $lg15)
        |        + (${lg("10 - idx.b")} - ${lg("55")}) END,
        |    CASE WHEN fwd.dl + $lg15 >= fwd.dh + $lg45
        |      THEN (fwd.dl + $lg15)
        |        + (${lg("idx.b + 1")} - ${lg("55")})
        |      ELSE (fwd.dh + $lg45)
        |        + (${lg("idx.b + 1")} - ${lg("55")}) END,
        |    list_append(fwd.bl,
        |      CASE WHEN fwd.dl + $lg45 >= fwd.dh + $lg15
        |        THEN 0 ELSE 1 END),
        |    list_append(fwd.bh,
        |      CASE WHEN fwd.dl + $lg15 >= fwd.dh + $lg45
        |        THEN 0 ELSE 1 END)
        |  FROM fwd JOIN idx ON idx.i = fwd.i + 1),
        |lastrow AS (SELECT fwd.* FROM fwd CROSS JOIN n1 WHERE fwd.i = n),
        |bt AS (
        |  SELECT i AS j,
        |    CASE WHEN dl >= dh THEN 0 ELSE 1 END AS st, bl, bh
        |  FROM lastrow
        |  UNION ALL
        |  SELECT bt.j - 1,
        |    CASE WHEN bt.st = 0 THEN bt.bl[CAST(bt.j AS INT)]
        |      ELSE bt.bh[CAST(bt.j AS INT)] END,
        |    bt.bl, bt.bh
        |  FROM bt WHERE bt.j > 1)
        |SELECT fwd.i, fwd.ds, fwd.c, fwd.b AS bucket, fwd.dl AS d_low,
        |  fwd.dh AS d_high, CAST(bt.st AS BIGINT) AS state
        |FROM fwd JOIN bt ON bt.j = fwd.i ORDER BY fwd.i""".stripMargin
    },

    "q326_knn_loo" ->
      """WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    CAST(label AS BIGINT) AS label FROM embeddings),
        |q AS (SELECT vec_id AS q_id, v AS qv, label AS q_label FROM emb
        |  WHERE vec_id % 10 = 0),
        |sc AS (SELECT q.q_id, q.q_label, e.vec_id AS c_id,
        |    e.label AS c_label,
        |    list_dot_product(qv, e.v)
        |      / (sqrt(list_dot_product(qv, qv))
        |        * sqrt(list_dot_product(e.v, e.v))) AS cosine
        |  FROM emb e CROSS JOIN q WHERE q.q_id <> e.vec_id),
        |top AS (SELECT * FROM (SELECT *,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cosine DESC, c_id) AS rnk FROM sc)
        |  WHERE rnk <= 5),
        |votes AS (SELECT q_id, q_label, c_label,
        |    CAST(count(*) AS BIGINT) AS votes
        |  FROM top GROUP BY 1, 2, 3),
        |pred AS (SELECT q_id, q_label AS label, c_label AS pred_label
        |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY votes DESC, c_label) AS vr FROM votes)
        |  WHERE vr = 1)
        |SELECT label, pred_label, CAST(count(*) AS BIGINT) AS n
        |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q327_plsa_em" ->
      """WITH ndw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY 1, 2),
        |th0 AS (SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5('pl:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 1000 + 500 AS k0
        |  FROM ndw),
        |th AS (SELECT doc_id, CAST(k0 AS DOUBLE) / 2000.0 AS th0,
        |    1.0 - CAST(k0 AS DOUBLE) / 2000.0 AS th1 FROM th0),
        |pr AS (SELECT w,
        |    ('0x' || substr(md5('pw:0:' || w), 1, 8))::BIGINT % 1000 + 500
        |      AS k0,
        |    ('0x' || substr(md5('pw:1:' || w), 1, 8))::BIGINT % 1000 + 500
        |      AS k1
        |  FROM (SELECT DISTINCT w FROM ndw)),
        |pt AS (SELECT CAST(sum(k0) AS BIGINT) AS t0,
        |    CAST(sum(k1) AS BIGINT) AS t1 FROM pr),
        |phi AS (SELECT w, CAST(k0 AS DOUBLE) / CAST(t0 AS DOUBLE) AS ph0,
        |    CAST(k1 AS DOUBLE) / CAST(t1 AS DOUBLE) AS ph1
        |  FROM pr CROSS JOIN pt),
        |resp AS (SELECT ndw.doc_id, ndw.w, ndw.n,
        |    th0 * ph0 / (th0 * ph0 + th1 * ph1) AS r0
        |  FROM ndw JOIN th USING (doc_id) JOIN phi USING (w)),
        |numw AS (SELECT w,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(n AS DOUBLE) * r0 ORDER BY doc_id)),
        |      (a, x) -> a + x) AS s0,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(n AS DOUBLE) * (1.0 - r0) ORDER BY doc_id)),
        |      (a, x) -> a + x) AS s1
        |  FROM resp GROUP BY 1),
        |den AS (SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(s0 ORDER BY w)), (a, x) -> a + x) AS d0,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(s1 ORDER BY w)), (a, x) -> a + x) AS d1
        |  FROM numw),
        |pn AS (SELECT w, s0 / d0 AS phi0, s1 / d1 AS phi1
        |  FROM numw CROSS JOIN den),
        |top0 AS (SELECT CAST(0 AS BIGINT) AS topic, w AS word,
        |    phi0 AS phi, CAST(rk AS BIGINT) AS rk
        |  FROM (SELECT w, phi0, row_number() OVER
        |    (ORDER BY phi0 DESC, w) AS rk FROM pn) WHERE rk <= 5),
        |top1 AS (SELECT CAST(1 AS BIGINT) AS topic, w AS word,
        |    phi1 AS phi, CAST(rk AS BIGINT) AS rk
        |  FROM (SELECT w, phi1, row_number() OVER
        |    (ORDER BY phi1 DESC, w) AS rk FROM pn) WHERE rk <= 5)
        |SELECT * FROM top0 UNION ALL SELECT * FROM top1
        |ORDER BY topic, rk""".stripMargin,

    "q328_centrality" ->
      """WITH RECURSIVE ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |edges AS (SELECT a.item AS i, b.item AS j
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nbr AS (SELECT i AS a, j AS b FROM edges
        |  UNION ALL SELECT j, i FROM edges),
        |seeds AS (SELECT item FROM
        |  (SELECT DISTINCT a AS item FROM nbr) ORDER BY item LIMIT 10),
        |bfs AS (SELECT item AS seed, item AS node, CAST(0 AS BIGINT) AS d
        |  FROM seeds
        |  UNION
        |  SELECT bfs.seed, nbr.b, bfs.d + 1
        |  FROM bfs JOIN nbr ON nbr.a = bfs.node WHERE bfs.d < 6),
        |mind AS (SELECT seed, node, CAST(min(d) AS BIGINT) AS d FROM bfs
        |  GROUP BY 1, 2)
        |SELECT seed, CAST(count(*) AS BIGINT) AS n_reached,
        |  CAST(sum(d) AS BIGINT) AS sum_dist,
        |  CAST(count(*) AS DOUBLE) / CAST(sum(d) AS DOUBLE) AS closeness,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(1.0 / CAST(d AS DOUBLE) ORDER BY node)),
        |    (a, x) -> a + x) AS harmonic
        |FROM mind WHERE d > 0 GROUP BY seed ORDER BY seed""".stripMargin,

    "q329_dtw" -> {
      s"""WITH RECURSIVE daily AS MATERIALIZED (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |idx AS MATERIALIZED (SELECT ds, c,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i
        |  FROM daily),
        |wa AS MATERIALIZED (SELECT i, c FROM idx WHERE i <= 7),
        |wb AS MATERIALIZED (SELECT i - 7 AS j, c FROM idx
        |  WHERE i >= 8 AND i <= 14),
        |$dtwCellCtes,
        |cells AS MATERIALIZED ($dtwCellsUnion),
        |pt AS (SELECT 7 AS i, 7 AS j
        |  UNION ALL
        |  SELECT CASE WHEN pt.i = 1 THEN 1
        |      WHEN pt.j = 1 THEN pt.i - 1
        |      WHEN dg.v <= up.v AND dg.v <= lf.v THEN pt.i - 1
        |      WHEN up.v <= lf.v THEN pt.i - 1
        |      ELSE pt.i END,
        |    CASE WHEN pt.i = 1 THEN pt.j - 1
        |      WHEN pt.j = 1 THEN 1
        |      WHEN dg.v <= up.v AND dg.v <= lf.v THEN pt.j - 1
        |      WHEN up.v <= lf.v THEN pt.j
        |      ELSE pt.j - 1 END
        |  FROM pt
        |  LEFT JOIN cells dg ON dg.i = pt.i - 1 AND dg.j = pt.j - 1
        |  LEFT JOIN cells up ON up.i = pt.i - 1 AND up.j = pt.j
        |  LEFT JOIN cells lf ON lf.i = pt.i AND lf.j = pt.j - 1
        |  WHERE NOT (pt.i = 1 AND pt.j = 1))
        |SELECT (SELECT v FROM d7_7) AS dtw_dist,
        |  (SELECT CAST(count(*) AS BIGINT) FROM pt) AS path_len,
        |  CAST((SELECT v FROM d7_7) AS DOUBLE)
        |    / CAST((SELECT count(*) FROM pt) AS DOUBLE) AS dtw_norm""".stripMargin
    },

    "q330_dow_anomaly" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |dd AS (SELECT ds, c,
        |    CAST(isodow(CAST(ds AS DATE)) - 1 AS BIGINT) AS dow
        |  FROM daily),
        |grp AS (SELECT dow, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(c) AS BIGINT) AS s1,
        |    CAST(sum(c * c) AS BIGINT) AS s2
        |  FROM dd GROUP BY 1),
        |g2 AS (SELECT dow, n, s1, s2,
        |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM grp),
        |g3 AS (SELECT dow, mean,
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * mean)
        |      / CAST(n - 1 AS DOUBLE)) AS sd
        |  FROM g2)
        |SELECT ds, dow, c,
        |  (CAST(c AS DOUBLE) - mean) / sd AS z
        |FROM dd JOIN g3 USING (dow)
        |ORDER BY abs((CAST(c AS DOUBLE) - mean) / sd) DESC, ds
        |LIMIT 5""".stripMargin,

    "q331_gehan_logrank" ->
      s"""WITH $lifeCtes,
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e1,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e2,
        |    CAST(sum(CASE WHEN g = 0 THEN death ELSE 0 END) AS BIGINT) AS d1,
        |    CAST(sum(CASE WHEN g = 1 THEN death ELSE 0 END) AS BIGINT) AS d2
        |  FROM life GROUP BY 1),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1tot,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2tot
        |  FROM life),
        |risk AS (SELECT t, d1, d2,
        |    n1tot - COALESCE(sum(e1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        |    n2tot - COALESCE(sum(e2) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n2
        |  FROM byt CROSS JOIN tot),
        |terms AS (SELECT t,
        |    CAST(n1 + n2 AS DOUBLE) * (CAST(d1 AS DOUBLE)
        |      - CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |      AS u,
        |    CASE WHEN n1 + n2 > 1 THEN
        |      CAST((n1 + n2) * (n1 + n2) AS DOUBLE)
        |        * (CAST((d1 + d2) * n1 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
        |          * (CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE))
        |          * (CAST((n1 + n2) - (d1 + d2) AS DOUBLE)
        |            / CAST((n1 + n2) - 1 AS DOUBLE)))
        |    ELSE CAST(0.0 AS DOUBLE) END AS vw
        |  FROM risk WHERE d1 + d2 > 0),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_times,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(u ORDER BY t)), (a, x) -> a + x) AS u_stat,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(vw ORDER BY t)), (a, x) -> a + x) AS var_w
        |  FROM terms)
        |SELECT n_times, u_stat, var_w,
        |  u_stat * u_stat / var_w AS chi2
        |FROM agg""".stripMargin,

    "q332_esd_anomalies" -> {
      s"""WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |rem0 AS MATERIALIZED (SELECT ds, c FROM daily),
        |${(1 to 5).map(esdRound).mkString(",\n")}
        |SELECT CAST(1 AS BIGINT) AS round, ds, c, r AS r_stat FROM pick1
        |UNION ALL SELECT CAST(2 AS BIGINT), ds, c, r FROM pick2
        |UNION ALL SELECT CAST(3 AS BIGINT), ds, c, r FROM pick3
        |UNION ALL SELECT CAST(4 AS BIGINT), ds, c, r FROM pick4
        |UNION ALL SELECT CAST(5 AS BIGINT), ds, c, r FROM pick5
        |ORDER BY round""".stripMargin
    },

    "q333_stl_lite" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |mv AS (SELECT ds, c,
        |    CAST(sum(c) OVER (ORDER BY ds
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS mov,
        |    count(*) OVER (ORDER BY ds
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
        |  FROM daily),
        |tr AS (SELECT ds, c, mov,
        |    CAST(isodow(CAST(ds AS DATE)) - 1 AS BIGINT) AS dow,
        |    c * 7 - mov AS detr
        |  FROM mv WHERE nw = 7),
        |seas AS (SELECT dow,
        |    CAST(sum(detr) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS seas7
        |  FROM tr GROUP BY 1),
        |j AS (SELECT ds, tr.dow, c,
        |    CAST(mov AS DOUBLE) / 7.0 AS trend,
        |    seas7 / 7.0 AS seasonal
        |  FROM tr JOIN seas ON tr.dow = seas.dow)
        |SELECT ds, dow, c, trend, seasonal,
        |  CAST(c AS DOUBLE) - trend - seasonal AS remainder
        |FROM j ORDER BY ds""".stripMargin,

    "q334_assortativity" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |edges AS (SELECT a.item AS i, b.item AS j
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nbr AS (SELECT i AS a, j AS b FROM edges
        |  UNION ALL SELECT j, i FROM edges),
        |deg AS (SELECT a AS item, CAST(count(*) AS BIGINT) AS d FROM nbr
        |  GROUP BY 1),
        |ends AS (SELECT da.d AS da, db.d AS db
        |  FROM nbr JOIN deg da ON da.item = nbr.a
        |  JOIN deg db ON db.item = nbr.b),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS se,
        |    CAST(sum(da) AS BIGINT) AS sx,
        |    CAST(sum(da * da) AS BIGINT) AS sxx,
        |    CAST(sum(da * db) AS BIGINT) AS sxy
        |  FROM ends)
        |SELECT se // 2 AS n_edges,
        |  CASE WHEN CAST(se AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
        |    THEN CAST(NULL AS DOUBLE)
        |    ELSE (CAST(se AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(se AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) END
        |    AS assortativity
        |FROM agg""".stripMargin,

    "q335_elasticity" -> {
      s"""WITH b AS (SELECT
        |    CAST(round(l_discount * 100) AS BIGINT) AS pctoff,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1),
        |b2 AS (SELECT pctoff, 100 - pctoff AS p, q FROM b),
        |pts AS (SELECT pctoff, ${lg("p")} AS x, ${lg("q")} AS y FROM b2),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(x ORDER BY pctoff)), (a, x) -> a + x) AS sx,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(y ORDER BY pctoff)), (a, x) -> a + x) AS sy,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(x * x ORDER BY pctoff)), (a, x) -> a + x) AS sxx,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(x * y ORDER BY pctoff)), (a, x) -> a + x) AS sxy
        |  FROM pts)
        |SELECT n AS n_buckets,
        |  (CAST(n AS DOUBLE) * sxy - sx * sy)
        |    / (CAST(n AS DOUBLE) * sxx - sx * sx) AS elasticity
        |FROM agg""".stripMargin
    },

    "q336_raking_ipf" -> {
      s"""WITH cells AS (SELECT event_type AS et,
        |    CAST(isodow(CAST(ts AS DATE)) - 1 AS BIGINT) AS dow,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS ntot FROM cells),
        |w0 AS (SELECT et, dow, n, ntot, CAST(n AS DOUBLE) AS w
        |  FROM cells CROSS JOIN tot),
        |${(1 to 5).map(ipfRound).mkString(",\n")}
        |SELECT et AS event_type, dow, n, w AS raked
        |FROM wb5 ORDER BY event_type, dow""".stripMargin
    },

    "q337_eb_shrinkage" ->
      """WITH src AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS x
        |  FROM documents GROUP BY 1),
        |src2 AS (SELECT source, n, x,
        |    CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS rate FROM src),
        |mom AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(rate ORDER BY source)), (a, x) -> a + x) AS sr,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(rate * rate ORDER BY source)), (a, x) -> a + x) AS srr
        |  FROM src2),
        |m2 AS (SELECT k, sr, srr, sr / CAST(k AS DOUBLE) AS m FROM mom),
        |m3 AS (SELECT k, m,
        |    (srr - sr * m) / CAST(k - 1 AS DOUBLE) AS v FROM m2),
        |m4 AS (SELECT m, v, m * (1.0 - m) / v - 1.0 AS ab FROM m3),
        |m5 AS (SELECT m, v, m * ab AS alpha, (1.0 - m) * ab AS beta
        |  FROM m4)
        |SELECT source, n, x, rate,
        |  (CAST(x AS DOUBLE) + alpha)
        |    / (CAST(n AS DOUBLE) + alpha + beta) AS shrunk
        |FROM src2 CROSS JOIN m5 ORDER BY source""".stripMargin,

    "q338_fwl_partial" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y,
        |    CAST(count(*) AS BIGINT) AS d
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT ds, y, d,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i
        |  FROM daily),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(d) AS BIGINT) AS sd,
        |    CAST(sum(i * y) AS BIGINT) AS siy,
        |    CAST(sum(i * d) AS BIGINT) AS sid,
        |    CAST(sum(d * y) AS BIGINT) AS sdy,
        |    CAST(sum(d * d) AS BIGINT) AS sdd
        |  FROM idx),
        |f1 AS (SELECT *, n * (n + 1) // 2 AS sx,
        |    n * (n + 1) * (2 * n + 1) // 6 AS sxx FROM sums),
        |f2 AS (SELECT *,
        |    (CAST(n AS DOUBLE) * CAST(siy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS by
        |  FROM f1),
        |f3 AS (SELECT *,
        |    (CAST(sy AS DOUBLE) - by * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS ay,
        |    (CAST(n AS DOUBLE) * CAST(sid AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sd AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bd
        |  FROM f2),
        |f4 AS (SELECT *,
        |    (CAST(sd AS DOUBLE) - bd * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE) AS ad,
        |    (CAST(n AS DOUBLE) * CAST(sdy AS DOUBLE)
        |      - CAST(sd AS DOUBLE) * CAST(sy AS DOUBLE))
        |      / (CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
        |        - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) AS naive
        |  FROM f3),
        |resid AS (SELECT idx.i, f4.n, f4.naive, f4.by, f4.bd,
        |    CAST(y AS DOUBLE) - (ay + by * CAST(i AS DOUBLE)) AS ry,
        |    CAST(d AS DOUBLE) - (ad + bd * CAST(i AS DOUBLE)) AS rd
        |  FROM idx CROSS JOIN f4)
        |SELECT max(n) AS n_days, max(naive) AS beta_naive,
        |  max(by) AS trend_y, max(bd) AS trend_d,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(rd * ry ORDER BY i)), (a, x) -> a + x)
        |  / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(rd * rd ORDER BY i)), (a, x) -> a + x) AS beta_fwl
        |FROM resid""".stripMargin,

    "q339_dow_bands" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |dd AS (SELECT ds, c,
        |    CAST(isodow(CAST(ds AS DATE)) - 1 AS BIGINT) AS dow
        |  FROM daily),
        |rk AS (SELECT ds, c, dow,
        |    CAST(row_number() OVER (PARTITION BY dow ORDER BY c, ds)
        |      AS BIGINT) AS rn,
        |    count(*) OVER (PARTITION BY dow) AS nd
        |  FROM dd)
        |SELECT dow, CAST(max(nd) AS BIGINT) AS n_days,
        |  max(CASE WHEN rn = (nd * 1 + 9) // 10 THEN c END) AS p10,
        |  max(CASE WHEN rn = (nd * 5 + 9) // 10 THEN c END) AS p50,
        |  max(CASE WHEN rn = (nd * 9 + 9) // 10 THEN c END) AS p90
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    "q340_iv_wald" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y,
        |    CAST(count(*) AS BIGINT) AS d
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT ds, y, d,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i
        |  FROM daily),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM idx),
        |arms AS (SELECT
        |    CASE WHEN i <= n // 2 THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS z,
        |    CAST(count(*) AS BIGINT) AS nz,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(d) AS BIGINT) AS sd
        |  FROM idx CROSS JOIN nn GROUP BY 1),
        |m AS (SELECT z, CAST(sy AS DOUBLE) / CAST(nz AS DOUBLE) AS my,
        |    CAST(sd AS DOUBLE) / CAST(nz AS DOUBLE) AS md FROM arms)
        |SELECT a.my AS my1, b.my AS my0, a.md AS md1, b.md AS md0,
        |  (a.my - b.my) / (a.md - b.md) AS wald_estimate
        |FROM (SELECT * FROM m WHERE z = 1) a
        |CROSS JOIN (SELECT * FROM m WHERE z = 0) b""".stripMargin,

    "q341_survivorship" ->
      """WITH base AS (SELECT c_custkey AS k, c_name AS nm,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
        |    c_mktsegment AS seg,
        |    ('0x' || substr(md5('rc:' || CAST(c_custkey AS VARCHAR)), 1, 8))
        |      ::BIGINT % 100 AS recency,
        |    'crm' AS src
        |  FROM customer WHERE c_custkey % 10 = 0),
        |clone AS (SELECT c_custkey AS k,
        |    substr(c_name, 1, 3) || substr(c_name, 5, 1000) AS nm,
        |    CAST(round(c_acctbal * 100) AS BIGINT)
        |      + (('0x' || substr(md5('bd:' || CAST(c_custkey AS VARCHAR)),
        |          1, 8))::BIGINT % 10001 - 5000) AS bal,
        |    c_mktsegment AS seg,
        |    ('0x' || substr(md5('rw:' || CAST(c_custkey AS VARCHAR)), 1, 8))
        |      ::BIGINT % 100 AS recency,
        |    'web' AS src
        |  FROM customer WHERE c_custkey % 10 = 0),
        |recs AS (SELECT * FROM base UNION ALL SELECT * FROM clone),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY k
        |    ORDER BY recency DESC, src) AS rn FROM recs)
        |SELECT k AS custkey, CAST(count(*) AS BIGINT) AS n_records,
        |  max(CASE WHEN rn = 1 THEN nm END) AS name_surv,
        |  CAST(max(bal) AS DOUBLE) / 100.0 AS bal_surv,
        |  min(seg) AS seg_surv
        |FROM rk GROUP BY k ORDER BY custkey""".stripMargin,

    "q342_cost_threshold" ->
      """WITH d AS (SELECT n_chars,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS y
        |  FROM documents),
        |rng AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM d),
        |binned AS (SELECT
        |    least((n_chars - lo) * 32 // (hi - lo + 1), 31) AS bin,
        |    CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
        |  FROM d CROSS JOIN rng GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt,
        |    CAST(sum(pos) AS BIGINT) AS pt FROM binned),
        |sweep AS (SELECT bin AS thr,
        |    COALESCE(CAST(sum(pos) OVER w AS BIGINT), CAST(0 AS BIGINT))
        |      AS fn,
        |    COALESCE(CAST(sum(n) OVER w AS BIGINT), CAST(0 AS BIGINT))
        |      AS below,
        |    nt, pt
        |  FROM binned CROSS JOIN tot
        |  WINDOW w AS (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT thr, fn, (pt - fn) AS tp,
        |  ((nt - below) - (pt - fn)) AS fp,
        |  (fn * 5 + ((nt - below) - (pt - fn))) AS cost
        |FROM sweep ORDER BY cost, thr LIMIT 1""".stripMargin,

    "q343_avg_precision" ->
      """WITH ranked AS (SELECT doc_id,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS rel,
        |    CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
        |      AS BIGINT) AS k
        |  FROM documents),
        |hits AS (SELECT rel, k,
        |    CAST(sum(rel) OVER (ORDER BY k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS hits
        |  FROM ranked)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(rel) AS BIGINT) AS n_rel,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CASE WHEN rel = 1
        |        THEN CAST(hits AS DOUBLE) / CAST(k AS DOUBLE)
        |        ELSE 0.0 END ORDER BY k)),
        |    (a, x) -> a + x) / CAST(sum(rel) AS DOUBLE) AS avg_precision
        |FROM hits""".stripMargin,

    "q344_interleave" ->
      """WITH RECURSIVE docs AS (SELECT doc_id, n_chars,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS rel
        |  FROM documents),
        |ta AS (SELECT * FROM (SELECT doc_id, rel,
        |    row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r
        |  FROM docs) WHERE r <= 20),
        |tb AS (SELECT * FROM (SELECT doc_id, rel,
        |    row_number() OVER (ORDER BY doc_id) AS r
        |  FROM docs) WHERE r <= 20),
        |la AS (SELECT list(doc_id ORDER BY r) AS ids,
        |    list(rel ORDER BY r) AS rels FROM ta),
        |lb AS (SELECT list(doc_id ORDER BY r) AS ids,
        |    list(rel ORDER BY r) AS rels FROM tb),
        |draft AS (
        |  SELECT CAST(0 AS BIGINT) AS pos, CAST([] AS BIGINT[]) AS picked,
        |    CAST([] AS BIGINT[]) AS team, CAST([] AS BIGINT[]) AS rel
        |  UNION ALL
        |  SELECT d.pos + 1,
        |    list_append(d.picked, CASE WHEN (d.pos + 1) % 2 = 1
        |      THEN list_filter(la.ids,
        |        x -> NOT list_contains(d.picked, x))[1]
        |      ELSE list_filter(lb.ids,
        |        x -> NOT list_contains(d.picked, x))[1] END),
        |    list_append(d.team, CASE WHEN (d.pos + 1) % 2 = 1
        |      THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END),
        |    list_append(d.rel, CASE WHEN (d.pos + 1) % 2 = 1
        |      THEN la.rels[list_position(la.ids, list_filter(la.ids,
        |        x -> NOT list_contains(d.picked, x))[1])]
        |      ELSE lb.rels[list_position(lb.ids, list_filter(lb.ids,
        |        x -> NOT list_contains(d.picked, x))[1])] END)
        |  FROM draft d CROSS JOIN la CROSS JOIN lb
        |  WHERE d.pos < 10)
        |SELECT CAST(i AS BIGINT) AS pos, picked[i] AS doc_id,
        |  team[i] AS team, rel[i] AS rel
        |FROM draft CROSS JOIN range(1, 11) t(i)
        |WHERE pos = 10 ORDER BY pos""".stripMargin,

    "q345_knapsack_dp" ->
      """WITH RECURSIVE items AS (SELECT doc_id,
        |    n_chars // 50 + 1 AS w,
        |    CAST(length(list_distinct(string_split(text, ' ')))
        |      AS BIGINT) AS v
        |  FROM documents WHERE doc_id < 35),
        |it AS (SELECT CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT)
        |    AS r, w, v FROM items),
        |nit AS (SELECT CAST(count(*) AS BIGINT) AS n FROM it),
        |dp AS (
        |  SELECT CAST(0 AS BIGINT) AS r,
        |    list_transform(range(0, 61), c -> CAST(0 AS BIGINT)) AS dpv
        |  UNION ALL
        |  SELECT d.r + 1,
        |    list_transform(range(0, 61), c ->
        |      CASE WHEN c >= it.w
        |        THEN greatest(d.dpv[CAST(c + 1 AS INTEGER)],
        |          d.dpv[CAST(c - it.w + 1 AS INTEGER)] + it.v)
        |        ELSE d.dpv[CAST(c + 1 AS INTEGER)] END)
        |  FROM dp d JOIN it ON it.r = d.r + 1),
        |gitems AS (SELECT CAST(row_number() OVER (
        |    ORDER BY CAST(v AS DOUBLE) / CAST(w AS DOUBLE) DESC, doc_id)
        |    AS BIGINT) AS r, w, v FROM items),
        |gr AS (
        |  SELECT CAST(0 AS BIGINT) AS r, CAST(60 AS BIGINT) AS rem,
        |    CAST(0 AS BIGINT) AS tot
        |  UNION ALL
        |  SELECT g.r,
        |    CASE WHEN g.w <= gr.rem THEN gr.rem - g.w ELSE gr.rem END,
        |    CASE WHEN g.w <= gr.rem THEN gr.tot + g.v ELSE gr.tot END
        |  FROM gr JOIN gitems g ON g.r = gr.r + 1)
        |SELECT (SELECT n FROM nit) AS n_items,
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs_total,
        |  CAST(35 AS BIGINT) AS doc_id_cap,
        |  CAST(60 AS BIGINT) AS capacity,
        |  (SELECT dpv[61] FROM dp JOIN nit ON dp.r = nit.n) AS best_value,
        |  (SELECT tot FROM gr JOIN nit ON gr.r = nit.n) AS greedy_value
        |""".stripMargin,

    "q346_merge_apply" ->
      """WITH base AS (SELECT c_custkey AS k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal FROM customer),
        |mx AS (SELECT max(k) AS mk FROM base),
        |chg0 AS (
        |  SELECT k, 'U' AS op, bal + 100 AS nbal FROM base WHERE k % 7 = 0
        |  UNION ALL
        |  SELECT k, 'D' AS op, CAST(NULL AS BIGINT) AS nbal FROM base
        |  WHERE k % 11 = 0
        |  UNION ALL
        |  SELECT mk + i AS k, 'I' AS op, CAST(mk + i AS BIGINT) AS nbal
        |  FROM mx CROSS JOIN range(1, 51) t(i)),
        |chg AS (SELECT k, op, nbal FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY
        |      CASE WHEN op = 'D' THEN 0 WHEN op = 'U' THEN 1 ELSE 2 END)
        |    AS rk
        |  FROM chg0) WHERE rk = 1),
        |merged AS (SELECT base.bal, chg.op, chg.nbal
        |  FROM base FULL OUTER JOIN chg ON base.k = chg.k)
        |SELECT
        |  CAST(sum(CASE WHEN op IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_unchanged,
        |  CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inserted,
        |  CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_updated,
        |  CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_deleted,
        |  CAST(sum(CASE WHEN op IS NULL OR op <> 'D' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_final,
        |  CAST(sum(CASE WHEN op IS NULL OR op <> 'D' THEN
        |      CASE WHEN op = 'U' OR op = 'I' THEN nbal ELSE bal END
        |    ELSE 0 END) AS BIGINT) AS sum_bal_cents
        |FROM merged""".stripMargin,

    "q347_two_way_anova" ->
      """WITH d AS (SELECT c_mktsegment AS a, c_custkey % 2 AS b,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS y FROM customer),
        |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS nc,
        |    CAST(sum(y) AS BIGINT) AS tc FROM d GROUP BY a, b),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS t,
        |    CAST(sum(y * y) AS BIGINT) AS syy FROM d),
        |ma AS (SELECT a, CAST(sum(nc) AS BIGINT) AS na,
        |    CAST(sum(tc) AS BIGINT) AS ta FROM cells GROUP BY a),
        |fa AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(ta AS DOUBLE) * CAST(ta AS DOUBLE)
        |      / CAST(na AS DOUBLE) ORDER BY a)),
        |    (acc, x) -> acc + x) AS fa FROM ma),
        |mb AS (SELECT b, CAST(sum(nc) AS BIGINT) AS nb,
        |    CAST(sum(tc) AS BIGINT) AS tb FROM cells GROUP BY b),
        |fb AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(tb AS DOUBLE) * CAST(tb AS DOUBLE)
        |      / CAST(nb AS DOUBLE) ORDER BY b)),
        |    (acc, x) -> acc + x) AS fb FROM mb),
        |fc AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(CAST(tc AS DOUBLE) * CAST(tc AS DOUBLE)
        |      / CAST(nc AS DOUBLE) ORDER BY a, b)),
        |    (acc, x) -> acc + x) AS fc,
        |    CAST(count(*) AS BIGINT) AS ncells FROM cells),
        |fin AS (SELECT n, syy, fa, fb, fc, ncells,
        |    CAST(t AS DOUBLE) * CAST(t AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS cm
        |  FROM tot CROSS JOIN fa CROSS JOIN fb CROSS JOIN fc)
        |SELECT n AS n_cust, fa - cm AS ss_a, fb - cm AS ss_b,
        |  fc - fa - fb + cm AS ss_ab,
        |  CAST(syy AS DOUBLE) - fc AS ss_err,
        |  ((fa - cm) / 4.0)
        |    / ((CAST(syy AS DOUBLE) - fc) / CAST(n - ncells AS DOUBLE))
        |    AS f_a,
        |  ((fb - cm) / 1.0)
        |    / ((CAST(syy AS DOUBLE) - fc) / CAST(n - ncells AS DOUBLE))
        |    AS f_b,
        |  ((fc - fa - fb + cm) / 4.0)
        |    / ((CAST(syy AS DOUBLE) - fc) / CAST(n - ncells AS DOUBLE))
        |    AS f_ab
        |FROM fin""".stripMargin,

    "q348_textrank" -> {
      s"""WITH toks AS MATERIALIZED (SELECT doc_id,
        |    unnest(string_split(text, ' ')) AS w,
        |    CAST(generate_subscripts(string_split(text, ' '), 1)
        |      AS BIGINT) AS pos
        |  FROM documents),
        |lagged AS (SELECT doc_id, pos, w,
        |    lag(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w1
        |  FROM toks),
        |pairs AS MATERIALIZED (SELECT least(w1, w) AS x,
        |    greatest(w1, w) AS y, CAST(count(*) AS BIGINT) AS cw
        |  FROM lagged WHERE w1 IS NOT NULL AND w1 <> w GROUP BY 1, 2),
        |nbr AS MATERIALIZED (SELECT x AS a, y AS b, cw FROM pairs
        |  UNION ALL SELECT y, x, cw FROM pairs),
        |wout AS MATERIALIZED (SELECT b AS node,
        |    CAST(sum(cw) AS BIGINT) AS wj FROM nbr GROUP BY 1),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM wout),
        |pr0 AS MATERIALIZED (SELECT node, CAST(1.0 AS DOUBLE) AS pr
        |  FROM wout),
        |${(1 to 6).map(trRound).mkString(",\n")}
        |SELECT node AS word, pr AS textrank FROM pr6
        |ORDER BY pr DESC, node LIMIT 15""".stripMargin
    },

    "q349_simpson_audit" ->
      """WITH strata AS (SELECT c_nationkey AS stratum,
        |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |      AND c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN c_mktsegment = 'AUTOMOBILE'
        |      AND NOT c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS b,
        |    CAST(sum(CASE WHEN c_mktsegment <> 'AUTOMOBILE'
        |      AND c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN c_mktsegment <> 'AUTOMOBILE'
        |      AND NOT c_acctbal > 5000.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d
        |  FROM customer GROUP BY 1),
        |agg AS (SELECT CAST(sign(CAST(sum(a) * sum(d) - sum(b) * sum(c)
        |    AS DOUBLE)) AS BIGINT) AS agg_dir FROM strata),
        |dirs AS (SELECT stratum,
        |    CAST(sign(CAST(a * d - b * c AS DOUBLE)) AS BIGINT) AS dir
        |  FROM strata)
        |SELECT max(agg_dir) AS aggregate_direction,
        |  CAST(count(*) AS BIGINT) AS n_strata,
        |  CAST(sum(CASE WHEN dir = agg_dir THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_agree,
        |  CAST(sum(CASE WHEN dir = -agg_dir THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_reversed,
        |  CAST(sum(CASE WHEN dir = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null
        |FROM dirs CROSS JOIN agg""".stripMargin,

    "q350_qte" ->
      """WITH d AS (SELECT
        |    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS z,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS yv, c_custkey
        |  FROM customer),
        |ranked AS (SELECT z, yv,
        |    CAST(row_number() OVER (PARTITION BY z
        |      ORDER BY yv, c_custkey) AS BIGINT) AS rn,
        |    CAST(count(*) OVER (PARTITION BY z) AS BIGINT) AS nz
        |  FROM d),
        |qs AS (SELECT z, CAST(i AS BIGINT) AS decile,
        |    CAST(max(yv) AS BIGINT) AS yq
        |  FROM ranked CROSS JOIN range(1, 10) t(i)
        |  WHERE rn = (nz * i + 9) // 10 GROUP BY 1, 2)
        |SELECT t.decile, CAST(t.yq AS DOUBLE) / 100.0 AS y_treat,
        |  CAST(c.yq AS DOUBLE) / 100.0 AS y_ctrl,
        |  CAST(t.yq AS DOUBLE) / 100.0 - CAST(c.yq AS DOUBLE) / 100.0
        |    AS qte
        |FROM (SELECT * FROM qs WHERE z = 1) t
        |JOIN (SELECT * FROM qs WHERE z = 0) c USING (decile)
        |ORDER BY decile""".stripMargin)

  /** One q348 TextRank round: inflow via neighbor-ascending folds over
    * the weighted transition wᵢⱼ∕Wⱼ, then the damped update — mirrors
    * the engine loop op-for-op (0.25∕n + 0.75·inflow). */
  private def trRound(k: Int): String = {
    val prev = s"pr${k - 1}"
    s"""ct$k AS MATERIALIZED (SELECT nbr.a AS node,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list($prev.pr * (CAST(nbr.cw AS DOUBLE)
       |        / CAST(wout.wj AS DOUBLE)) ORDER BY nbr.b)),
       |      (acc, x) -> acc + x) AS inflow
       |  FROM nbr JOIN $prev ON $prev.node = nbr.b
       |  JOIN wout ON wout.node = nbr.b
       |  GROUP BY nbr.a),
       |pr$k AS MATERIALIZED (SELECT wout.node,
       |    0.25 / CAST(nn AS DOUBLE) + 0.75 * COALESCE(inflow, 0.0) AS pr
       |  FROM wout LEFT JOIN ct$k ON ct$k.node = wout.node
       |  CROSS JOIN nn)""".stripMargin
  }

  /** One q332 gESD round: mean/sd from the surviving integer sums, the
    * (r DESC, ds) argmax pick, and the anti-joined remainder. */
  private def esdRound(k: Int): String = {
    val prev = if (k == 1) "rem0" else s"rem${k - 1}"
    s"""st$k AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(c) AS BIGINT) AS s1,
       |    CAST(sum(c * c) AS BIGINT) AS s2 FROM $prev),
       |st${k}b AS (SELECT n, s1, s2,
       |    CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean FROM st$k),
       |st${k}c AS (SELECT n, mean,
       |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * mean)
       |      / CAST(n - 1 AS DOUBLE)) AS sd FROM st${k}b),
       |pick$k AS MATERIALIZED (SELECT ds, c,
       |    abs(CAST(c AS DOUBLE) - mean) / sd AS r
       |  FROM $prev CROSS JOIN st${k}c
       |  ORDER BY abs(CAST(c AS DOUBLE) - mean) / sd DESC, ds LIMIT 1),
       |rem$k AS MATERIALIZED (SELECT $prev.ds, $prev.c FROM $prev
       |  WHERE $prev.ds NOT IN (SELECT ds FROM pick$k))""".stripMargin
  }

  /** One q336 IPF round: row rake then column rake, margins as
    * key-ascending folds. */
  private def ipfRound(k: Int): String = {
    val prev = if (k == 1) "w0" else s"wb${k - 1}"
    s"""rm$k AS MATERIALIZED (SELECT et AS ret,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(w ORDER BY dow)), (a, x) -> a + x) AS rm
       |  FROM $prev GROUP BY et),
       |wa$k AS MATERIALIZED (SELECT et, dow, n, ntot,
       |    w * ((CAST(ntot AS DOUBLE) / 5.0) / rm) AS w
       |  FROM $prev JOIN rm$k ON et = ret),
       |cm$k AS MATERIALIZED (SELECT dow AS rdow,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(w ORDER BY et)), (a, x) -> a + x) AS cm
       |  FROM wa$k GROUP BY dow),
       |wb$k AS MATERIALIZED (SELECT et, dow, n, ntot,
       |    w * ((CAST(ntot AS DOUBLE) / 7.0) / cm) AS w
       |  FROM wa$k JOIN cm$k ON dow = rdow)""".stripMargin
  }

  /** q329: the 49 DTW DP cells, unrolled exactly as the engine's driver
    * loop computes them (integer costs, least-of-three min chains). */
  private def dtwCellCtes: String =
    (for (i <- 1 to 7; j <- 1 to 7) yield {
      val cost =
        s"abs((SELECT c FROM wa WHERE i = $i) - (SELECT c FROM wb WHERE j = $j))"
      val v =
        if (i == 1 && j == 1) cost
        else if (i == 1) s"$cost + (SELECT v FROM d1_${j - 1})"
        else if (j == 1) s"$cost + (SELECT v FROM d${i - 1}_1)"
        else s"$cost + least((SELECT v FROM d${i - 1}_${j - 1}), " +
          s"(SELECT v FROM d${i - 1}_$j), (SELECT v FROM d${i}_${j - 1}))"
      s"d${i}_$j AS MATERIALIZED (SELECT CAST($v AS BIGINT) AS v)"
    }).mkString(",\n")

  private def dtwCellsUnion: String =
    (for (i <- 1 to 7; j <- 1 to 7) yield
      s"SELECT $i AS i, $j AS j, (SELECT v FROM d${i}_$j) AS v")
      .mkString(" UNION ALL ")
}
