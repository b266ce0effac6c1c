package graft.queries

/** DuckDB mirrors for [[CatalogDist]]. Same determinism discipline as the
  * rest of the oracle surface: exact integer sufficient statistics, e0-form
  * double literals for fixed constants, `lgSqlOf` for every data-dependent
  * logarithm, `list(v ORDER BY k)` folds for order-sensitive float sums,
  * fixed parenthesization on every double combination. */
object OraclesDist {

  private def lg(x: String): String = OraclesExt.lgSqlOf(x)

  private val benfordValues: String = Seq(
    "(1, 0.3010299956639812e0)", "(2, 0.17609125905568124e0)",
    "(3, 0.12493873660829992e0)", "(4, 0.09691001300805642e0)",
    "(5, 0.07918124604762482e0)", "(6, 0.06694678963061322e0)",
    "(7, 0.05799194697768673e0)", "(8, 0.05115252244738129e0)",
    "(9, 0.04575749056067514e0)").mkString(", ")

  private val lorenzCols: String = (1 to 9).map { q =>
    s"""(SELECT CAST(cum AS DOUBLE) / CAST(tot.sx AS DOUBLE)
       |    FROM ranked WHERE i = (tot.n * $q + 9) // 10) AS l${q * 10}"""
      .stripMargin
  }.mkString(",\n  ")

  val all: Map[String, String] = Map(

    "q351_benford" ->
      s"""WITH obs0 AS (SELECT CAST(substr(CAST(
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
        |    AS BIGINT) AS digit
        |  FROM orders),
        |obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS obs FROM obs0
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n FROM obs),
        |digits AS (SELECT CAST(i AS BIGINT) AS digit, p
        |  FROM (VALUES $benfordValues) t(i, p))
        |SELECT d.digit, CAST(COALESCE(obs.obs, 0) AS BIGINT) AS obs,
        |  CAST(COALESCE(obs.obs, 0) AS DOUBLE) / CAST(n AS DOUBLE)
        |    AS share,
        |  CAST(n AS DOUBLE) * p AS expected,
        |  (CAST(COALESCE(obs.obs, 0) AS DOUBLE) - CAST(n AS DOUBLE) * p)
        |    * (CAST(COALESCE(obs.obs, 0) AS DOUBLE)
        |      - CAST(n AS DOUBLE) * p)
        |    / (CAST(n AS DOUBLE) * p) AS chi2_contrib
        |FROM digits d LEFT JOIN obs USING (digit) CROSS JOIN tot
        |ORDER BY d.digit""".stripMargin,

    "q352_gini_lorenz" ->
      s"""WITH spend AS (SELECT o_custkey AS k,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM orders GROUP BY 1),
        |ranked AS (SELECT k, x,
        |    CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS i,
        |    CAST(sum(x) OVER (ORDER BY x, k
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum
        |  FROM spend),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(i * x) AS BIGINT) AS six FROM ranked)
        |SELECT n AS n_cust,
        |  (2.0 * CAST(six AS DOUBLE)
        |    - CAST(n + 1 AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) AS gini,
        |  $lorenzCols
        |FROM tot""".stripMargin,

    "q353_ks_two_sample" ->
      """WITH d AS (SELECT
        |    CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS z,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v FROM customer),
        |byv AS (SELECT v, CAST(sum(z) AS BIGINT) AS c1,
        |    CAST(sum(1 - z) AS BIGINT) AS c2 FROM d GROUP BY 1),
        |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM byv),
        |cdf AS (SELECT v, n1, n2,
        |    abs(CAST(sum(c1) OVER w AS BIGINT) * n2
        |      - CAST(sum(c2) OVER w AS BIGINT) * n1) AS dscaled
        |  FROM byv CROSS JOIN tot
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT n1, n2, v AS at_value, dscaled,
        |  CAST(dscaled AS DOUBLE) / CAST(n1 * n2 AS DOUBLE) AS ks_d
        |FROM cdf ORDER BY dscaled DESC, v LIMIT 1""".stripMargin,

    "q354_mann_kendall" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |md AS (SELECT max(d) AS md FROM daily),
        |win AS (SELECT
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i, y
        |  FROM daily CROSS JOIN md
        |  WHERE date_diff('day', d, md) < 120),
        |pairs AS (SELECT a.i AS i, b.i AS j, b.y - a.y AS dy,
        |    b.i - a.i AS dt
        |  FROM win a JOIN win b ON a.i < b.i),
        |st AS (SELECT
        |    CAST(sum(CAST(sign(CAST(dy AS DOUBLE)) AS BIGINT)) AS BIGINT)
        |      AS s_mk,
        |    CAST(count(*) AS BIGINT) AS m FROM pairs),
        |rk AS (SELECT CAST(dy AS DOUBLE) / CAST(dt AS DOUBLE) AS slope,
        |    CAST(row_number() OVER (ORDER BY
        |      CAST(dy AS DOUBLE) / CAST(dt AS DOUBLE), i, j) AS BIGINT)
        |      AS r
        |  FROM pairs),
        |med AS (SELECT slope AS theil_sen_cents_per_day
        |  FROM rk CROSS JOIN st WHERE r = (m + 1) // 2)
        |SELECT m AS n_pairs, s_mk,
        |  CAST(s_mk AS DOUBLE) / CAST(m AS DOUBLE) AS tau,
        |  theil_sen_cents_per_day
        |FROM st CROSS JOIN med""".stripMargin,

    "q355_psi_drift" ->
      s"""WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |rng AS (SELECT min(v) AS lo, max(v) AS hi, min(d) AS d0,
        |    max(d) AS d1 FROM o),
        |binned AS (SELECT
        |    least((v - lo) * 10 // (hi - lo + 1), 9) AS bin,
        |    CASE WHEN date_diff('day', d0, d) * 2
        |        <= date_diff('day', d0, d1)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS h1
        |  FROM o CROSS JOIN rng),
        |cells AS (SELECT bin, CAST(sum(h1) AS BIGINT) AS a,
        |    CAST(sum(1 - h1) AS BIGINT) AS b FROM binned GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n,
        |    CAST(sum(b) AS BIGINT) AS m FROM cells),
        |contrib AS (SELECT bin, a, b,
        |    CASE WHEN a > 0 AND b > 0 THEN
        |      (CAST(a AS DOUBLE) / CAST(n AS DOUBLE)
        |        - CAST(b AS DOUBLE) / CAST(m AS DOUBLE))
        |      * (${lg("a * m")} - ${lg("b * n")})
        |    ELSE 0.0 END AS c
        |  FROM cells CROSS JOIN tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(sum(CASE WHEN a = 0 OR b = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_skipped,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(c ORDER BY bin)), (acc, x) -> acc + x) AS psi_bits
        |FROM contrib""".stripMargin,

    "q356_jsd_weekday" ->
      s"""WITH e AS (SELECT event_type AS t,
        |    CASE WHEN dayofweek(CAST(ts AS DATE)) IN (0, 6)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS we
        |  FROM events),
        |cells AS (SELECT t, CAST(sum(1 - we) AS BIGINT) AS a,
        |    CAST(sum(we) AS BIGINT) AS b FROM e GROUP BY 1),
        |tot AS (SELECT CAST(sum(a) AS BIGINT) AS n,
        |    CAST(sum(b) AS BIGINT) AS m FROM cells),
        |terms AS (SELECT t, a, b,
        |    CASE WHEN a > 0 THEN
        |      (CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
        |        * (${lg("a * m * 2")} - ${lg("a * m + b * n")})
        |    ELSE 0.0 END AS kp,
        |    CASE WHEN b > 0 THEN
        |      (CAST(b AS DOUBLE) / CAST(m AS DOUBLE))
        |        * (${lg("b * n * 2")} - ${lg("a * m + b * n")})
        |    ELSE 0.0 END AS kq
        |  FROM cells CROSS JOIN tot),
        |folded AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(kp ORDER BY t)), (acc, x) -> acc + x) AS kl_p,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(kq ORDER BY t)), (acc, x) -> acc + x) AS kl_q
        |  FROM terms)
        |SELECT n_types, kl_p, kl_q, (kl_p + kl_q) / 2.0 AS jsd_bits
        |FROM folded""".stripMargin,

    "q357_mutual_info" ->
      s"""WITH d AS (SELECT c_mktsegment AS seg,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS v, c_custkey
        |  FROM customer),
        |ranked AS (SELECT v,
        |    CAST(row_number() OVER (ORDER BY v, c_custkey) AS BIGINT)
        |      AS rn,
        |    CAST(count(*) OVER () AS BIGINT) AS nn
        |  FROM d),
        |cuts AS (SELECT
        |    (SELECT max(v) FROM ranked WHERE rn = (nn * 1 + 3) // 4)
        |      AS t1,
        |    (SELECT max(v) FROM ranked WHERE rn = (nn * 2 + 3) // 4)
        |      AS t2,
        |    (SELECT max(v) FROM ranked WHERE rn = (nn * 3 + 3) // 4)
        |      AS t3
        |  FROM (SELECT DISTINCT nn FROM ranked)),
        |cells AS (SELECT seg,
        |    1 + CASE WHEN v > t1 THEN 1 ELSE 0 END
        |      + CASE WHEN v > t2 THEN 1 ELSE 0 END
        |      + CASE WHEN v > t3 THEN 1 ELSE 0 END AS qt,
        |    CAST(count(*) AS BIGINT) AS nij
        |  FROM d CROSS JOIN cuts GROUP BY 1, 2),
        |rows_ AS (SELECT seg, CAST(sum(nij) AS BIGINT) AS ri FROM cells
        |  GROUP BY 1),
        |cols_ AS (SELECT qt, CAST(sum(nij) AS BIGINT) AS cj FROM cells
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
        |terms AS (SELECT cells.seg, cells.qt, nij, n,
        |    CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (${lg("nij * n")} - ${lg("ri * cj")}) AS c
        |  FROM cells JOIN rows_ USING (seg) JOIN cols_ USING (qt)
        |  CROSS JOIN tot)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(c ORDER BY seg, qt)), (acc, x) -> acc + x) AS mi_bits
        |FROM terms""".stripMargin,

    "q358_conformal" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |idx AS (SELECT y,
        |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS i
        |  FROM daily),
        |resid AS (SELECT a.i AS i, abs(a.y - b.y) AS r
        |  FROM idx a JOIN idx b ON a.i = b.i + 1),
        |cal AS (SELECT i, r FROM resid WHERE i % 2 = 0),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS nc FROM cal),
        |rkc AS (SELECT r,
        |    CAST(row_number() OVER (ORDER BY r, i) AS BIGINT) AS rn
        |  FROM cal),
        |qh AS (SELECT r AS qhat, nc FROM rkc CROSS JOIN nc
        |  WHERE rn = ((nc + 1) * 9 + 9) // 10),
        |test AS (SELECT r FROM resid WHERE i % 2 = 1)
        |SELECT max(nc) AS n_cal, CAST(count(*) AS BIGINT) AS n_test,
        |  max(qhat) AS qhat_cents,
        |  CAST(sum(CASE WHEN r <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS coverage
        |FROM test CROSS JOIN qh""".stripMargin,

    "q359_kendall_tau" ->
      """WITH monthly AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS m,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS x,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pairs AS (SELECT
        |    CAST(sign(CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS sx,
        |    CAST(sign(CAST(b.y - a.y AS DOUBLE)) AS BIGINT) AS sy
        |  FROM monthly a JOIN monthly b ON a.m < b.m),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS m_pairs,
        |    CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS concordant,
        |    CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS discordant,
        |    CAST(sum(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_x,
        |    CAST(sum(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties_y
        |  FROM pairs)
        |SELECT m_pairs, concordant, discordant,
        |  CAST(concordant - discordant AS DOUBLE)
        |    / sqrt(CAST(m_pairs - ties_x AS DOUBLE)
        |      * CAST(m_pairs - ties_y AS DOUBLE)) AS tau_b
        |FROM agg""".stripMargin,

    "q360_rfm" -> {
      def scoreCte(c: String, src: String, inverted: Boolean): String = {
        val raw = s"""1 + CASE WHEN $c > t1 THEN 1 ELSE 0 END
           | + CASE WHEN $c > t2 THEN 1 ELSE 0 END
           | + CASE WHEN $c > t3 THEN 1 ELSE 0 END
           | + CASE WHEN $c > t4 THEN 1 ELSE 0 END""".stripMargin
        val sc = if (inverted) s"6 - ($raw)" else s"($raw)"
        s"""rk_$c AS (SELECT k, $c,
           |    CAST(row_number() OVER (ORDER BY $c, k) AS BIGINT) AS rn,
           |    CAST(count(*) OVER () AS BIGINT) AS nn
           |  FROM $src),
           |cut_$c AS (SELECT
           |    (SELECT max($c) FROM rk_$c WHERE rn = (nn * 1 + 4) // 5)
           |      AS t1,
           |    (SELECT max($c) FROM rk_$c WHERE rn = (nn * 2 + 4) // 5)
           |      AS t2,
           |    (SELECT max($c) FROM rk_$c WHERE rn = (nn * 3 + 4) // 5)
           |      AS t3,
           |    (SELECT max($c) FROM rk_$c WHERE rn = (nn * 4 + 4) // 5)
           |      AS t4
           |  FROM (SELECT DISTINCT nn FROM rk_$c)),
           |sc_$c AS (SELECT k, CAST($sc AS BIGINT) AS ${c}_score
           |  FROM $src CROSS JOIN cut_$c)""".stripMargin
      }
      s"""WITH o AS (SELECT o_custkey AS k,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
        |ref AS (SELECT max(d) AS ref FROM o),
        |rfm AS (SELECT k,
        |    CAST(date_diff('day', max(d), (SELECT ref FROM ref))
        |      AS BIGINT) AS r,
        |    CAST(count(*) AS BIGINT) AS f,
        |    CAST(sum(v) AS BIGINT) AS mv
        |  FROM o GROUP BY k),
        |${scoreCte("r", "rfm", inverted = true)},
        |${scoreCte("f", "rfm", inverted = false)},
        |${scoreCte("mv", "rfm", inverted = false)}
        |SELECT r_score, f_score, mv_score,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(mv) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0
        |    AS avg_monetary
        |FROM rfm JOIN sc_r USING (k) JOIN sc_f USING (k)
        |JOIN sc_mv USING (k)
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    })
}
