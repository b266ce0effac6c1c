package graft.queries

/** DuckDB mirrors for [[CatalogPlan]]. The bandit replay is a recursive
  * CTE stepping the engine's integer state machine day by day (same md5
  * draws, same cross-multiplied argmax); RMST's prefix products are
  * correlated UNGROUPED folds (the grouped-list_reduce bug avoidance);
  * everything else is the standard discipline. */
object OraclesPlan {

  private val banditEx =
    "(('0x' || substr(md5('bd:' || CAST(idx.i AS VARCHAR)), 1, 8))" +
      "::BIGINT % 10 = 0)"
  private val banditEarm =
    "(1 + ('0x' || substr(md5('ba:' || CAST(idx.i AS VARCHAR)), 1, 8))" +
      "::BIGINT % 3)"
  /** The engine's exploit argmax verbatim: best=1; s2·n_b>s_b·n2 → 2;
    * s3·n_b>s_b·n3 → 3 (untried arms first, low index wins ties). */
  private val banditCh: String = {
    val b2 = "(CASE WHEN st.s2 * st.n1 > st.s1 * st.n2 THEN 2 ELSE 1 END)"
    s"""(CASE WHEN $banditEx THEN $banditEarm
       |  WHEN st.n1 = 0 THEN 1 WHEN st.n2 = 0 THEN 2
       |  WHEN st.n3 = 0 THEN 3
       |  ELSE (CASE WHEN $b2 = 1
       |    THEN (CASE WHEN st.s3 * st.n1 > st.s1 * st.n3
       |      THEN 3 ELSE 1 END)
       |    ELSE (CASE WHEN st.s3 * st.n2 > st.s2 * st.n3
       |      THEN 3 ELSE 2 END) END) END)""".stripMargin
  }

  /** One arm's RMST pipeline (suffix g ∈ {0,1}): death-time risk table,
    * per-row prefix products via correlated ungrouped folds, segment sum
    * + tail extension to τ=60. */
  private def rmstArm(g: Int): String =
    s"""byt$g AS (SELECT t, CAST(count(*) AS BIGINT) AS ending,
       |    CAST(sum(death) AS BIGINT) AS d
       |  FROM life WHERE g = $g GROUP BY 1),
       |dth$g AS MATERIALIZED (SELECT t, d, n FROM (
       |  SELECT t, d, CAST(sum(ending) OVER (ORDER BY t
       |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
       |    AS n
       |  FROM byt$g) WHERE d > 0 AND t <= 60),
       |sat$g AS (SELECT i.t,
       |    (SELECT list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
       |      list(CAST(j.n - j.d AS DOUBLE) / CAST(j.n AS DOUBLE)
       |        ORDER BY j.t)), (a, x) -> a * x)
       |     FROM dth$g j WHERE j.t <= i.t) AS s_at
       |  FROM dth$g i),
       |seg$g AS (SELECT t, s_at,
       |    COALESCE(lag(t) OVER (ORDER BY t), 0) AS tprev,
       |    COALESCE(lag(s_at) OVER (ORDER BY t), 1.0) AS sprev
       |  FROM sat$g),
       |rm$g AS (SELECT
       |    (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(sprev * CAST(t - tprev AS DOUBLE) ORDER BY t)),
       |      (a, x) -> a + x) FROM seg$g)
       |    + (SELECT min(s_at) FROM seg$g)
       |      * CAST(60 - (SELECT max(t) FROM seg$g) AS DOUBLE) AS v)"""
      .stripMargin

  val all: Map[String, String] = Map(

    "q386_blocking_quality" -> {
      def scheme(name: String, key: String): String =
        s"""SELECT '$name' AS scheme,
           |  (SELECT CAST(count(*) AS BIGINT) FROM (
           |    SELECT $key AS bk FROM recs GROUP BY 1)) AS n_blocks,
           |  (SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) FROM (
           |    SELECT CAST(count(*) AS BIGINT) AS c FROM recs
           |    GROUP BY $key)) AS cand_pairs,
           |  (SELECT CAST(count(*) AS BIGINT)
           |    FROM (SELECT k, $key AS bk FROM recs WHERE side = 0) a
           |    JOIN (SELECT k, $key AS bk FROM recs WHERE side = 1) b
           |    ON a.k = b.k AND a.bk = b.bk) AS tib,
           |  (SELECT CAST(count(*) AS BIGINT) FROM recs WHERE side = 0)
           |    AS n_true,
           |  (SELECT CAST(count(*) AS BIGINT) FROM recs) AS n_recs"""
          .stripMargin
      val schemes = Seq(
        scheme("name_suffix4", "substr(nm, -4, 4)"),
        scheme("segment", "seg"),
        scheme("balance_band", "CAST(bal // 100000 AS VARCHAR)"))
        .mkString("\nUNION ALL\n")
      s"""WITH base AS (SELECT c_custkey AS k, c_name AS nm,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
        |    c_mktsegment AS seg
        |  FROM customer WHERE c_custkey % 10 = 0),
        |clone AS (SELECT k,
        |    substr(nm, 1, 3) || substr(nm, 5, 1000) AS nm,
        |    bal + (('0x' || substr(md5('bd:' || CAST(k AS VARCHAR)),
        |      1, 8))::BIGINT % 10001 - 5000) AS bal,
        |    seg
        |  FROM base),
        |recs AS (SELECT *, CAST(0 AS BIGINT) AS side FROM base
        |  UNION ALL SELECT *, 1 FROM clone),
        |raw AS ($schemes)
        |SELECT scheme, n_blocks, cand_pairs,
        |  CAST(tib AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall,
        |  CAST(cand_pairs AS DOUBLE)
        |    / CAST((n_recs * (n_recs - 1)) // 2 AS DOUBLE)
        |    AS reduction_ratio
        |FROM raw ORDER BY scheme""".stripMargin
    },

    "q387_bandit_replay" -> {
      def upd(a: Int, col: String): String =
        s"st.s$a + CASE WHEN $banditCh = $a THEN idx.$col ELSE 0 END, " +
          s"st.n$a + CASE WHEN $banditCh = $a THEN 1 ELSE 0 END"
      s"""WITH RECURSIVE o AS (SELECT o_orderdate, o_totalprice, seg
        |  FROM orders JOIN (SELECT c_custkey AS o_custkey,
        |    c_mktsegment AS seg FROM customer) c USING (o_custkey)
        |  WHERE seg IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')),
        |daily AS MATERIALIZED (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CASE WHEN seg = 'AUTOMOBILE'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS r1,
        |    CAST(sum(CASE WHEN seg = 'BUILDING'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS r2,
        |    CAST(sum(CASE WHEN seg = 'MACHINERY'
        |      THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS r3
        |  FROM o GROUP BY 1),
        |idx AS MATERIALIZED (SELECT ds, r1, r2, r3,
        |    CAST(row_number() OVER (ORDER BY ds) AS BIGINT) AS i
        |  FROM daily),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM idx),
        |st AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS s1,
        |    CAST(0 AS BIGINT) AS n1, CAST(0 AS BIGINT) AS s2,
        |    CAST(0 AS BIGINT) AS n2, CAST(0 AS BIGINT) AS s3,
        |    CAST(0 AS BIGINT) AS n3, CAST(0 AS BIGINT) AS tot,
        |    CAST(0 AS BIGINT) AS nexp
        |  UNION ALL
        |  SELECT idx.i, ${upd(1, "r1")}, ${upd(2, "r2")},
        |    ${upd(3, "r3")},
        |    st.tot + CASE $banditCh WHEN 1 THEN idx.r1
        |      WHEN 2 THEN idx.r2 ELSE idx.r3 END,
        |    st.nexp + CASE WHEN $banditEx THEN 1 ELSE 0 END
        |  FROM st JOIN idx ON idx.i = st.i + 1)
        |SELECT (SELECT nd FROM nn) AS n_days,
        |  tot AS policy_reward_cents, nexp AS n_explore,
        |  (SELECT CAST(greatest(sum(r1), sum(r2), sum(r3)) AS BIGINT)
        |    FROM idx) AS best_fixed_arm_cents,
        |  (SELECT CAST(greatest(sum(r1), sum(r2), sum(r3)) AS BIGINT)
        |    FROM idx) - tot AS regret_cents
        |FROM st CROSS JOIN nn WHERE st.i = nn.nd""".stripMargin
    },

    "q388_forecast_combo" ->
      """WITH daily AS (SELECT
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS ds,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |f AS (SELECT ds, y,
        |    lag(y, 1) OVER w AS f1, lag(y, 7) OVER w AS f2,
        |    sum(y) OVER (ORDER BY ds
        |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) // 7 AS f3,
        |    row_number() OVER w AS rn
        |  FROM daily WINDOW w AS (ORDER BY ds)),
        |fe AS MATERIALIZED (SELECT * FROM f WHERE rn > 7),
        |maes AS (SELECT CAST(count(*) AS BIGINT) AS n_eval,
        |    CAST(sum(abs(y - f1)) AS BIGINT) AS ae1,
        |    CAST(sum(abs(y - f2)) AS BIGINT) AS ae2,
        |    CAST(sum(abs(y - f3)) AS BIGINT) AS ae3
        |  FROM fe),
        |comb AS (SELECT ds, y,
        |    (CAST(f1 AS DOUBLE) / CAST(ae1 AS DOUBLE)
        |      + CAST(f2 AS DOUBLE) / CAST(ae2 AS DOUBLE)
        |      + CAST(f3 AS DOUBLE) / CAST(ae3 AS DOUBLE))
        |    / (1.0 / CAST(ae1 AS DOUBLE) + 1.0 / CAST(ae2 AS DOUBLE)
        |      + 1.0 / CAST(ae3 AS DOUBLE)) AS fc
        |  FROM fe CROSS JOIN maes),
        |cm AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(abs(CAST(y AS DOUBLE) - fc) ORDER BY ds)),
        |    (a, x) -> a + x) AS cae
        |  FROM comb)
        |SELECT n_eval,
        |  CAST(ae1 AS DOUBLE) / CAST(n_eval AS DOUBLE) AS mae_persist,
        |  CAST(ae2 AS DOUBLE) / CAST(n_eval AS DOUBLE) AS mae_weekly,
        |  CAST(ae3 AS DOUBLE) / CAST(n_eval AS DOUBLE) AS mae_ma7,
        |  cae / CAST(n_eval AS DOUBLE) AS mae_combined
        |FROM maes CROSS JOIN cm""".stripMargin,

    "q389_tail_dependence" ->
      """WITH spend AS (SELECT o_custkey AS k,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS y
        |  FROM orders GROUP BY 1),
        |d AS (SELECT c.c_custkey AS k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS x, y
        |  FROM customer c JOIN spend ON spend.k = c.c_custkey),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |tx AS (SELECT max(x) AS tx FROM (SELECT x,
        |    CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS rn
        |  FROM d) CROSS JOIN nn WHERE rn = (n * 9 + 9) // 10),
        |ty AS (SELECT max(y) AS ty FROM (SELECT y,
        |    CAST(row_number() OVER (ORDER BY y, k) AS BIGINT) AS rn
        |  FROM d) CROSS JOIN nn WHERE rn = (n * 9 + 9) // 10)
        |SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(CASE WHEN x > tx THEN 1 ELSE 0 END) AS BIGINT) AS nx,
        |  CAST(sum(CASE WHEN y > ty THEN 1 ELSE 0 END) AS BIGINT) AS ny,
        |  CAST(sum(CASE WHEN x > tx AND y > ty THEN 1 ELSE 0 END)
        |    AS BIGINT) AS nboth,
        |  CAST(sum(CASE WHEN x > tx AND y > ty THEN 1 ELSE 0 END)
        |    AS DOUBLE)
        |    / CAST(sum(CASE WHEN y > ty THEN 1 ELSE 0 END) AS DOUBLE)
        |    AS lambda_u,
        |  CAST(sum(CASE WHEN x > tx THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS independence_expect
        |FROM d CROSS JOIN tx CROSS JOIN ty""".stripMargin,

    "q390_rmst" -> {
      s"""WITH ${OraclesNext.lifeCtes},
        |${rmstArm(0)},
        |${rmstArm(1)}
        |SELECT (SELECT v FROM rm0) AS rmst_ctrl_days,
        |  (SELECT v FROM rm1) AS rmst_treat_days,
        |  (SELECT v FROM rm1) - (SELECT v FROM rm0) AS rmst_diff_days"""
        .stripMargin
    },

    "q391_waterfill" ->
      """WITH q AS (SELECT event_type AS et, CAST(count(*) AS BIGINT)
        |    AS dem
        |  FROM events GROUP BY 1),
        |cap AS (SELECT CAST(sum(dem) * 3 AS BIGINT) AS c5 FROM q),
        |ranked AS (SELECT et, dem, c5,
        |    CAST(row_number() OVER (ORDER BY dem, et) AS BIGINT) AS rk,
        |    COALESCE(CAST(sum(dem) OVER (ORDER BY dem, et
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cums
        |  FROM q CROSS JOIN cap),
        |lv AS (SELECT et, dem, rk,
        |    CAST(c5 - cums * 5 AS DOUBLE) / CAST(5 - rk + 1 AS DOUBLE)
        |      AS lvl5,
        |    CAST(dem AS DOUBLE) * 5.0
        |      <= CAST(c5 - cums * 5 AS DOUBLE)
        |        / CAST(5 - rk + 1 AS DOUBLE) AS clipped
        |  FROM ranked),
        |level AS (SELECT lvl5 AS level5 FROM lv WHERE NOT clipped
        |  ORDER BY rk LIMIT 1)
        |SELECT et AS event_type, dem AS demand,
        |  least(CAST(dem AS DOUBLE), level5 / 5.0) AS allocation,
        |  CAST(dem AS DOUBLE) > level5 / 5.0 AS rationed
        |FROM lv CROSS JOIN level ORDER BY et""".stripMargin,

    "q392_shift_share" ->
      """WITH o AS (SELECT o_orderdate, o_totalprice, seg
        |  FROM orders JOIN (SELECT c_custkey AS o_custkey,
        |    c_mktsegment AS seg FROM customer) c USING (o_custkey)),
        |rng AS (SELECT min(CAST(o_orderdate AS DATE)) AS d0,
        |    max(CAST(o_orderdate AS DATE)) AS d1 FROM o),
        |halves AS (SELECT seg,
        |    CASE WHEN date_diff('day', d0, CAST(o_orderdate AS DATE)) * 2
        |        <= date_diff('day', d0, d1)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS h1,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM o CROSS JOIN rng),
        |byseg AS (SELECT seg,
        |    CAST(sum(CASE WHEN h1 = 1 THEN v ELSE 0 END) AS BIGINT) AS y0,
        |    CAST(sum(CASE WHEN h1 = 0 THEN v ELSE 0 END) AS BIGINT) AS y1
        |  FROM halves GROUP BY 1),
        |tot AS (SELECT CAST(sum(y0) AS BIGINT) AS t0,
        |    CAST(sum(y1) AS BIGINT) AS t1 FROM byseg)
        |SELECT seg, y0, y1, CAST(y1 - y0 AS DOUBLE) AS delta,
        |  CAST(y0 AS DOUBLE)
        |    * (CAST(t1 - t0 AS DOUBLE) / CAST(t0 AS DOUBLE))
        |    AS national_part,
        |  CAST(y0 AS DOUBLE)
        |    * (CAST(y1 - y0 AS DOUBLE) / CAST(y0 AS DOUBLE)
        |      - CAST(t1 - t0 AS DOUBLE) / CAST(t0 AS DOUBLE))
        |    AS competitive_part
        |FROM byseg CROSS JOIN tot ORDER BY seg""".stripMargin,

    "q393_price_index" ->
      """WITH l AS (SELECT l_partkey AS pk,
        |    CAST(l_shipdate AS DATE) AS sd,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ext,
        |    CAST(round(l_quantity) AS BIGINT) AS qty
        |  FROM lineitem),
        |rng AS (SELECT min(sd) AS d0, max(sd) AS d1 FROM l),
        |halves AS (SELECT pk,
        |    CASE WHEN date_diff('day', d0, sd) * 2
        |        <= date_diff('day', d0, d1)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS h1,
        |    ext, qty
        |  FROM l CROSS JOIN rng),
        |bypart AS MATERIALIZED (SELECT pk,
        |    CAST(sum(CASE WHEN h1 = 1 THEN ext ELSE 0 END) AS BIGINT)
        |      AS e0,
        |    CAST(sum(CASE WHEN h1 = 1 THEN qty ELSE 0 END) AS BIGINT)
        |      AS q0,
        |    CAST(sum(CASE WHEN h1 = 0 THEN ext ELSE 0 END) AS BIGINT)
        |      AS e1,
        |    CAST(sum(CASE WHEN h1 = 0 THEN qty ELSE 0 END) AS BIGINT)
        |      AS q1
        |  FROM halves GROUP BY 1),
        |common AS MATERIALIZED (SELECT * FROM bypart
        |  WHERE q0 > 0 AND q1 > 0),
        |sums AS (SELECT CAST(count(*) AS BIGINT) AS n_parts,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(e1 AS DOUBLE) / CAST(q1 AS DOUBLE)
        |        * CAST(q0 AS DOUBLE) ORDER BY pk)), (a, x) -> a + x)
        |      AS p1q0,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(e0 AS DOUBLE) / CAST(q0 AS DOUBLE)
        |        * CAST(q0 AS DOUBLE) ORDER BY pk)), (a, x) -> a + x)
        |      AS p0q0,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(e1 AS DOUBLE) / CAST(q1 AS DOUBLE)
        |        * CAST(q1 AS DOUBLE) ORDER BY pk)), (a, x) -> a + x)
        |      AS p1q1,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(e0 AS DOUBLE) / CAST(q0 AS DOUBLE)
        |        * CAST(q1 AS DOUBLE) ORDER BY pk)), (a, x) -> a + x)
        |      AS p0q1
        |  FROM common)
        |SELECT n_parts, p1q0 / p0q0 AS laspeyres, p1q1 / p0q1 AS paasche,
        |  sqrt((p1q0 / p0q0) * (p1q1 / p0q1)) AS fisher
        |FROM sums""".stripMargin,

    "q394_harrell_c" ->
      """WITH act AS (SELECT user_id, CAST(count(*) AS BIGINT)
        |    AS activity
        |  FROM events GROUP BY 1),
        |users AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_d,
        |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN CAST(ts AS DATE) END) AS conv_d
        |  FROM events GROUP BY 1),
        |horizon AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
        |life0 AS (SELECT u.user_id,
        |    CAST(date_diff('day', first_d, COALESCE(conv_d, max_d))
        |      AS BIGINT) AS t,
        |    CASE WHEN conv_d IS NOT NULL THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS death,
        |    activity,
        |    ('0x' || substr(md5('hc:' || CAST(u.user_id AS VARCHAR)),
        |      1, 8))::BIGINT AS pri
        |  FROM users u CROSS JOIN horizon
        |  JOIN act ON act.user_id = u.user_id),
        |life AS MATERIALIZED (SELECT user_id, t, death, activity
        |  FROM life0 ORDER BY pri, user_id LIMIT 400),
        |pairs AS (SELECT
        |    CASE WHEN a.t < b.t THEN a.death
        |      WHEN b.t < a.t THEN b.death
        |      ELSE CAST(0 AS BIGINT) END AS permissible,
        |    CAST(CASE WHEN a.t < b.t THEN
        |        sign(CAST(a.activity - b.activity AS DOUBLE))
        |      ELSE sign(CAST(b.activity - a.activity AS DOUBLE)) END
        |      AS BIGINT) AS dir
        |  FROM life a JOIN life b ON a.user_id < b.user_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_permissible,
        |  CAST(sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS concordant,
        |  CAST(sum(CASE WHEN dir = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS discordant,
        |  (CAST(sum(CASE WHEN dir = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    + 0.5 * CAST(sum(CASE WHEN dir = 0 THEN 1 ELSE 0 END)
        |      AS DOUBLE))
        |    / CAST(count(*) AS DOUBLE) AS c_index,
        |  (SELECT CAST(count(*) AS BIGINT) FROM users) AS n_users_total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM life) AS n_sampled
        |FROM pairs WHERE permissible = 1""".stripMargin,

    "q395_abc_xyz" ->
      """WITH l AS (SELECT l_partkey AS pk,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS m
        |  FROM lineitem),
        |bypart AS (SELECT pk, CAST(sum(v) AS BIGINT) AS rev FROM l
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS tr FROM bypart),
        |abc AS (SELECT pk, rev,
        |    CASE WHEN cum * 100 <= tr * 80 THEN 'A'
        |      WHEN cum * 100 <= tr * 95 THEN 'B' ELSE 'C' END AS abc
        |  FROM (SELECT pk, rev, tr,
        |      CAST(sum(rev) OVER (ORDER BY rev DESC, pk
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |        AS BIGINT) AS cum
        |    FROM bypart CROSS JOIN tot)),
        |monthly AS (SELECT pk, m, CAST(sum(v) AS BIGINT) AS mv FROM l
        |  GROUP BY 1, 2),
        |xyz AS (SELECT pk,
        |    CASE WHEN CAST(nm AS DOUBLE) * CAST(sxx AS DOUBLE) * 16.0
        |        <= CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) * 17.0
        |      THEN 'X'
        |      WHEN CAST(nm AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        <= CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) * 2.0
        |      THEN 'Y' ELSE 'Z' END AS xyz
        |  FROM (SELECT pk, CAST(count(*) AS BIGINT) AS nm,
        |      CAST(sum(mv) AS BIGINT) AS sx,
        |      CAST(sum(mv * mv) AS BIGINT) AS sxx
        |    FROM monthly GROUP BY 1))
        |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(rev) AS DOUBLE) / CAST(max(tr) AS DOUBLE)
        |    AS revenue_share
        |FROM abc JOIN xyz USING (pk) CROSS JOIN tot
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
