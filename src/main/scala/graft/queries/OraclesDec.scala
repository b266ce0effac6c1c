package graft.queries

/** DuckDB mirrors for [[CatalogDec]]. The Cox Newton loop and the Markov
  * absorption chains are replayed round-for-round (generated MATERIALIZED /
  * recursive CTEs) with the engine's exact accumulation orders; everything
  * else is the usual integer-sufficient-statistic + ordered-fold
  * discipline. */
object OraclesDec {

  /** One Cox Newton round in θ-space: score and curvature as t-ascending
    * folds over the death-time risk table, then θ ← θ − g∕gp. */
  private def coxRound(k: Int): String = {
    val prev = s"th${k - 1}"
    val x = "(CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) * th)"
    s"""cg$k AS MATERIALIZED (SELECT max(th) AS thv,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(s AS DOUBLE) / th
       |        - CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / $x)
       |        ORDER BY t)), (a, v) -> a + v) AS g,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list(CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / $x)
       |          * (CAST(n1 AS DOUBLE) / $x)
       |        - CAST(s AS DOUBLE) / th / th
       |        ORDER BY t)), (a, v) -> a + v) AS gp
       |  FROM riskd CROSS JOIN $prev),
       |th$k AS (SELECT thv - g / gp AS th FROM cg$k)""".stripMargin
  }

  private val markovChannels = Seq("click", "error", "signup", "view")

  /** The 1-row transition-probability CTE: p_<src>_<dst> columns for all
    * channel sources plus start, each COALESCE(count,0)∕out as DOUBLE. */
  private def markovProbs: String = {
    val srcs = "start" +: markovChannels
    val cols = srcs.flatMap { a =>
      (markovChannels :+ "conv").map { b =>
        s"""COALESCE((SELECT CAST(c AS DOUBLE) FROM cnt
           |      WHERE src = '$a' AND dst = '$b'), 0.0)
           |    / (SELECT CAST(o AS DOUBLE) FROM outs WHERE src = '$a')
           |    AS p_${a}_$b""".stripMargin
      }
    }
    s"pr AS MATERIALIZED (SELECT\n  ${cols.mkString(",\n  ")})"
  }

  /** One absorption chain (16 fixed-point rounds, 4-slot state carried as
    * columns) with channel `removed` muted (x forced 0), or none. The
    * update is the engine's left-associated accumulation verbatim:
    * ((((0.0 + p·x₁) + p·x₂) + p·x₃) + p·x₄) + p_conv. */
  private def markovChain(name: String, removed: Option[String]): String = {
    def upd(ci: String): String =
      if (removed.contains(ci)) "CAST(0.0 AS DOUBLE)"
      else {
        val terms = markovChannels.zipWithIndex
          .map { case (cj, j) => s"pr.p_${ci}_$cj * x${j + 1}" }
        s"((((0.0 + ${terms(0)}) + ${terms(1)}) + ${terms(2)}) " +
          s"+ ${terms(3)}) + pr.p_${ci}_conv"
      }
    val ups = markovChannels.map(upd)
    s"""$name(step, x1, x2, x3, x4) AS (
       |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |    CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
       |  UNION ALL
       |  SELECT step + 1, ${ups(0)}, ${ups(1)}, ${ups(2)}, ${ups(3)}
       |  FROM $name CROSS JOIN pr WHERE step < 16)""".stripMargin
  }

  /** x_start of a finished chain: the engine's start-fold (all four terms
    * present; muted channels hold x = 0 so the extra +0 terms are exact
    * no-ops) plus the direct start→conv mass. */
  private def markovStart(name: String): String = {
    val terms = markovChannels.zipWithIndex
      .map { case (cj, j) => s"pr.p_start_$cj * x${j + 1}" }
    s"""(SELECT ((((0.0 + ${terms(0)}) + ${terms(1)}) + ${terms(2)})
       |    + ${terms(3)}) + pr.p_start_conv
       |  FROM $name CROSS JOIN pr WHERE step = 16)""".stripMargin
  }

  val all: Map[String, String] = Map(

    "q361_cox_ph" -> {
      s"""WITH ${OraclesNext.lifeCtes},
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS e1,
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e0,
        |    CAST(sum(CASE WHEN g = 1 THEN death ELSE 0 END) AS BIGINT)
        |      AS s,
        |    CAST(sum(death) AS BIGINT) AS d
        |  FROM life GROUP BY 1),
        |tot AS (SELECT
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n1tot,
        |    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n0tot
        |  FROM life),
        |risk AS (SELECT t, s, d,
        |    n1tot - COALESCE(sum(e1) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
        |    n0tot - COALESCE(sum(e0) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
        |  FROM byt CROSS JOIN tot),
        |riskd AS MATERIALIZED (SELECT t, s, d, n1, n0 FROM risk
        |  WHERE d > 0),
        |th0 AS (SELECT CAST(1.0 AS DOUBLE) AS th),
        |${(1 to 6).map(coxRound).mkString(",\n")},
        |sc AS (SELECT CAST(count(*) AS BIGINT) AS n_times,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(s AS DOUBLE)
        |        - CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE)
        |          / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE)))
        |        ORDER BY t)), (a, v) -> a + v) AS score_at_1
        |  FROM riskd)
        |SELECT n_times, score_at_1, th AS hazard_ratio
        |FROM sc CROSS JOIN th6""".stripMargin
    },

    "q362_perm_test" ->
      """WITH users AS (SELECT user_id AS u,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(round(value * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY 1),
        |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(CASE WHEN u % 2 = 1 THEN y ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN u % 2 = 1 THEN 1 ELSE 0 END)
        |        AS DOUBLE)
        |    - CAST(sum(CASE WHEN u % 2 = 0 THEN y ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END)
        |        AS DOUBLE) AS t_obs
        |  FROM users),
        |reps AS (SELECT b,
        |    CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    - CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS DOUBLE)
        |      / CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS tb
        |  FROM (SELECT u, y, b,
        |      ('0x' || substr(md5(CAST(u AS VARCHAR) || '_p'
        |        || CAST(b AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm
        |    FROM users CROSS JOIN range(0, 64) t(b))
        |  GROUP BY 1)
        |SELECT max(n_users) AS n_users, CAST(count(*) AS BIGINT)
        |    AS n_reps,
        |  max(t_obs) AS t_obs_cents,
        |  CAST(1 + sum(CASE WHEN abs(tb) >= abs(t_obs) THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(count(*) + 1 AS DOUBLE) AS p_value
        |FROM reps CROSS JOIN obs""".stripMargin,

    "q363_lindley_queue" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d')
        |      AS ds,
        |    CAST(count(*) AS BIGINT) AS a
        |  FROM events GROUP BY 1),
        |cap AS (SELECT CAST(sum(a) // count(*) AS BIGINT) AS c,
        |    CAST(count(*) AS BIGINT) AS nd FROM daily),
        |m AS (SELECT ds,
        |    CAST(sum(a - c) OVER (ORDER BY ds
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS mt
        |  FROM daily CROSS JOIN cap),
        |m2 AS (SELECT ds, mt,
        |    mt - least(min(mt) OVER (ORDER BY ds
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |      CAST(0 AS BIGINT)) AS bl
        |  FROM m),
        |peak AS (SELECT ds AS peak_day, bl AS max_backlog FROM m2
        |  ORDER BY bl DESC, ds LIMIT 1)
        |SELECT (SELECT c FROM cap) AS capacity,
        |  (SELECT nd FROM cap) AS n_days,
        |  (SELECT CAST(sum(CASE WHEN bl > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    FROM m2) AS n_congested,
        |  peak_day, max_backlog
        |FROM peak""".stripMargin,

    "q364_newsvendor" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS dem FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
        |qs AS (SELECT dem AS q_star FROM (SELECT dem, d,
        |    CAST(row_number() OVER (ORDER BY dem, d) AS BIGINT) AS rn
        |  FROM daily) CROSS JOIN n WHERE rn = (nd * 4 + 4) // 5)
        |SELECT max(q_star) AS q_star, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(greatest(dem - q_star, 0) * 4
        |    + greatest(q_star - dem, 0)) AS BIGINT) AS cost_at_q,
        |  CAST(sum(greatest(dem - (q_star - 1), 0) * 4
        |    + greatest((q_star - 1) - dem, 0)) AS BIGINT) AS cost_minus,
        |  CAST(sum(greatest(dem - (q_star + 1), 0) * 4
        |    + greatest((q_star + 1) - dem, 0)) AS BIGINT) AS cost_plus
        |FROM daily CROSS JOIN qs""".stripMargin,

    "q365_cohort_ltv" ->
      """WITH o AS (SELECT o_custkey AS k,
        |    CAST(year(CAST(o_orderdate AS DATE)) * 12
        |      + month(CAST(o_orderdate AS DATE)) AS BIGINT) AS mi,
        |    strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ms,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
        |  FROM orders),
        |coh AS (SELECT k, min(ms) AS cohort FROM o GROUP BY 1),
        |act AS (SELECT DISTINCT k, mi FROM o),
        |mx AS (SELECT max(mi) AS maxmi FROM act),
        |aggk AS (SELECT k, CAST(sum(v) AS BIGINT) AS cv,
        |    CAST(count(DISTINCT mi) AS BIGINT) AS am FROM o GROUP BY 1),
        |basek AS (SELECT k, CAST(count(*) AS BIGINT) AS base
        |  FROM act CROSS JOIN mx WHERE mi < maxmi GROUP BY 1),
        |retk AS (SELECT a.k, CAST(count(*) AS BIGINT) AS ret
        |  FROM act a JOIN act b ON a.k = b.k AND b.mi = a.mi + 1
        |  GROUP BY 1),
        |perc AS (SELECT cohort, cv, am, COALESCE(base, 0) AS base,
        |    COALESCE(ret, 0) AS ret
        |  FROM coh JOIN aggk USING (k) LEFT JOIN basek USING (k)
        |  LEFT JOIN retk USING (k)),
        |cg AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(cv) AS BIGINT) AS sv, CAST(sum(am) AS BIGINT) AS sam,
        |    CAST(sum(base) AS BIGINT) AS sb, CAST(sum(ret) AS BIGINT)
        |      AS sr
        |  FROM perc GROUP BY 1)
        |SELECT cohort, n_cust,
        |  CAST(sr AS DOUBLE) / CAST(sb AS DOUBLE) AS retention,
        |  CAST(sv AS DOUBLE) / CAST(sam AS DOUBLE) / 100.0
        |    AS arpu_dollars,
        |  CASE WHEN sr < sb THEN
        |    CAST(sv AS DOUBLE) / CAST(sam AS DOUBLE)
        |      / (1.0 - CAST(sr AS DOUBLE) / CAST(sb AS DOUBLE)) / 100.0
        |  END AS ltv_proj_dollars
        |FROM cg WHERE sb > 0 ORDER BY cohort""".stripMargin,

    "q366_brier_decomp" ->
      """WITH docs AS (SELECT doc_id, source,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS y,
        |    ('0x' || substr(md5('bt:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2 AS h
        |  FROM documents),
        |train AS (SELECT source,
        |    CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS f
        |  FROM docs WHERE h = 0 GROUP BY 1),
        |ev AS (SELECT f, y FROM docs JOIN train USING (source)
        |  WHERE h = 1),
        |groups AS (SELECT f, CAST(count(*) AS BIGINT) AS nk,
        |    CAST(sum(y) AS BIGINT) AS pk FROM ev GROUP BY 1),
        |tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
        |    CAST(sum(pk) AS BIGINT) AS p FROM groups),
        |terms AS (SELECT f, nk, n,
        |    f - CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE) AS fo,
        |    CAST(pk AS DOUBLE) / CAST(nk AS DOUBLE)
        |      - CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS ob
        |  FROM groups CROSS JOIN tot),
        |base AS (SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE) * (fo * fo)
        |        ORDER BY f)), (a, v) -> a + v) AS rel,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(CAST(nk AS DOUBLE) / CAST(n AS DOUBLE) * (ob * ob)
        |        ORDER BY f)), (a, v) -> a + v) AS res
        |  FROM terms),
        |u AS (SELECT n, CAST(p AS DOUBLE) / CAST(n AS DOUBLE)
        |    * (1.0 - CAST(p AS DOUBLE) / CAST(n AS DOUBLE)) AS unc
        |  FROM tot)
        |SELECT n AS n_eval, rel, res, unc,
        |  rel - res + unc AS brier
        |FROM base CROSS JOIN u""".stripMargin,

    "q367_position_attrib" ->
      """WITH conv AS (SELECT user_id, min(ts) AS conv_ts FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |t0 AS (SELECT e.user_id, e.event_type AS ch, e.ts, e.event_id
        |  FROM events e JOIN conv USING (user_id)
        |  WHERE e.event_type IN ('click', 'error', 'signup', 'view')
        |    AND e.ts < conv_ts),
        |pos AS (SELECT user_id, ch,
        |    CAST(row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS BIGINT) AS p,
        |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS k
        |  FROM t0),
        |cr AS (SELECT user_id, ch, p, k,
        |    CASE WHEN p = 1 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
        |      END AS ft,
        |    CASE WHEN p = k THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT)
        |      END AS lt,
        |    1.0 / CAST(k AS DOUBLE) AS lin,
        |    CASE WHEN k = 1 THEN 1.0 WHEN k = 2 THEN 0.5
        |      WHEN p = 1 OR p = k THEN 0.4
        |      ELSE 0.2 / CAST(k - 2 AS DOUBLE) END AS ub
        |  FROM pos)
        |SELECT ch, CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(sum(ft) AS BIGINT) AS first_touch,
        |  CAST(sum(lt) AS BIGINT) AS last_touch,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(lin ORDER BY user_id, p)), (a, v) -> a + v)
        |    AS linear_credit,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(ub ORDER BY user_id, p)), (a, v) -> a + v)
        |    AS ushape_credit
        |FROM cr GROUP BY ch ORDER BY ch""".stripMargin,

    "q368_markov_attrib" -> {
      val chains = markovChain("chf", None) +: markovChannels.map(c =>
        markovChain(s"ch_$c", Some(c)))
      val effs = markovChannels.map(c =>
        s"1.0 - ${markovStart(s"ch_$c")} / xf AS e_$c")
      val sumE = markovChannels.map(c => s"e_$c")
        .foldLeft("0.0")((a, b) => s"($a + $b)")
      val rows = markovChannels.map(c =>
        s"SELECT '$c' AS channel, xf AS p_conv_full, e_$c " +
          s"AS removal_effect, e_$c / es AS share FROM fin")
        .mkString("\n  UNION ALL ")
      s"""WITH RECURSIVE conv AS (SELECT user_id, min(ts) AS conv_ts
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |us AS (SELECT DISTINCT user_id FROM events),
        |usr AS (SELECT us.user_id, conv_ts FROM us
        |  LEFT JOIN conv USING (user_id)),
        |tch AS MATERIALIZED (SELECT e.user_id, e.event_type AS ch, e.ts,
        |    e.event_id,
        |    CASE WHEN conv_ts IS NOT NULL THEN 1 ELSE 0 END AS cv
        |  FROM events e JOIN usr USING (user_id)
        |  WHERE e.event_type IN ('click', 'error', 'signup', 'view')
        |    AND (conv_ts IS NULL OR e.ts < conv_ts)),
        |pos AS (SELECT user_id, ch, cv,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS p,
        |    lead(ch, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM tch),
        |mid AS (SELECT ch AS src, COALESCE(nxt,
        |    CASE WHEN cv = 1 THEN 'conv' ELSE 'null' END) AS dst
        |  FROM pos),
        |st AS (SELECT 'start' AS src, ch AS dst FROM pos WHERE p = 1),
        |lon AS (SELECT 'start' AS src,
        |    CASE WHEN conv_ts IS NOT NULL THEN 'conv' ELSE 'null' END
        |      AS dst
        |  FROM usr WHERE user_id NOT IN
        |    (SELECT DISTINCT user_id FROM tch)),
        |trans AS (SELECT * FROM mid UNION ALL SELECT * FROM st
        |  UNION ALL SELECT * FROM lon),
        |cnt AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT)
        |    AS c
        |  FROM trans GROUP BY 1, 2),
        |outs AS MATERIALIZED (SELECT src, CAST(sum(c) AS BIGINT) AS o
        |  FROM cnt GROUP BY 1),
        |$markovProbs,
        |${chains.mkString(",\n")},
        |fin AS (SELECT xf, ${markovChannels.map(c => s"e_$c").mkString(", ")},
        |    es
        |  FROM (SELECT ${markovStart("chf")} AS xf) b0,
        |  LATERAL (SELECT ${effs.mkString(", ")}) e0,
        |  LATERAL (SELECT $sumE AS es) s0)
        |$rows
        |ORDER BY channel""".stripMargin
    },

    "q369_sprt" ->
      """WITH daily AS (SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d')
        |      AS ds,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS p,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |path AS (SELECT ds,
        |    CAST(sum(p) OVER w AS BIGINT) AS cp,
        |    CAST(sum(n) OVER w AS BIGINT) AS cn
        |  FROM daily WINDOW w AS (ORDER BY ds
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p2 AS (SELECT ds,
        |    CAST(cp AS DOUBLE) - 0.5 * CAST(cn - cp AS DOUBLE) AS llr
        |  FROM path),
        |p3 AS (SELECT ds, llr,
        |    CASE WHEN llr >= 4.1875 THEN 'accept_h1'
        |      WHEN llr <= -4.1875 THEN 'accept_h0' END AS crossed
        |  FROM p2),
        |fc AS (SELECT ds AS cross_day, crossed AS decision,
        |    llr AS llr_at_cross
        |  FROM p3 WHERE crossed IS NOT NULL ORDER BY ds LIMIT 1),
        |fin AS (SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    (SELECT llr FROM p3 ORDER BY ds DESC LIMIT 1) AS llr_final
        |  FROM p3)
        |SELECT n_days, llr_final, cross_day, decision, llr_at_cross
        |FROM fin CROSS JOIN fc""".stripMargin,

    "q370_isotonic" ->
      """WITH d AS (SELECT n_chars,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS y
        |  FROM documents),
        |rng AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM d),
        |bins AS (SELECT
        |    least((n_chars - lo) * 32 // (hi - lo + 1), 31) AS bin,
        |    CAST(count(*) AS BIGINT) AS nb, CAST(sum(y) AS BIGINT) AS pb
        |  FROM d CROSS JOIN rng GROUP BY 1),
        |pre AS (SELECT bin, nb, pb,
        |    CAST(row_number() OVER (ORDER BY bin) AS BIGINT) AS r,
        |    CAST(sum(nb) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sn,
        |    CAST(sum(pb) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS sp
        |  FROM bins),
        |jk AS (SELECT j.r AS jr, k.r AS kr,
        |    CAST(k.sp - j.sp + j.pb AS DOUBLE)
        |      / CAST(k.sn - j.sn + j.nb AS DOUBLE) AS m
        |  FROM pre j JOIN pre k ON j.r <= k.r),
        |inner1 AS (SELECT i.r AS ir, jr, min(m) AS mn
        |  FROM pre i JOIN jk ON jr <= i.r AND kr >= i.r GROUP BY 1, 2),
        |iso AS (SELECT ir, max(mn) AS iso FROM inner1 GROUP BY 1)
        |SELECT bin, nb AS n_docs,
        |  CAST(pb AS DOUBLE) / CAST(nb AS DOUBLE) AS raw_rate,
        |  iso AS iso_rate
        |FROM pre JOIN iso ON pre.r = iso.ir ORDER BY bin""".stripMargin)
}
