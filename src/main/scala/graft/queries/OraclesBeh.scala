package graft.queries

/** DuckDB mirrors for [[CatalogBeh]]. The q378/q379 event-sequence state
  * machines fold over BIGINT-encoded elements with BIGINT-encoded state
  * (bit ops only), so `list_reduce` replays Spark's `aggregate` exactly;
  * the 3-core peel is 12 generated MATERIALIZED rounds; everything else is
  * the standard integer-statistic + ordered-fold discipline. */
object OraclesBeh {

  private def lg(x: String): String = OraclesExt.lgSqlOf(x)

  /** One q374 peel round: surviving-degree filter + two-sided semi-join. */
  private def peelRound(k: Int): String = {
    val prev = s"nbr${k - 1}"
    s"""kp$k AS MATERIALIZED (SELECT a FROM $prev GROUP BY a
       |  HAVING count(*) >= 3),
       |nbr$k AS MATERIALIZED (SELECT n.a, n.b FROM $prev n
       |  JOIN kp$k ka ON n.a = ka.a
       |  JOIN kp$k kb ON n.b = kb.a)""".stripMargin
  }

  val all: Map[String, String] = Map(

    "q371_sample_quantiles" ->
      """WITH d AS (SELECT doc_id, n_chars FROM documents),
        |samp AS (SELECT doc_id, n_chars FROM (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5('sq:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS pri
        |  FROM d) ORDER BY pri, doc_id LIMIT 256),
        |ks AS (SELECT CAST(count(*) AS BIGINT) AS k FROM samp),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
        |rk AS (SELECT n_chars,
        |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
        |      AS rn
        |  FROM samp),
        |ests AS (
        |  SELECT CAST(25 AS BIGINT) AS pct, n_chars AS est
        |  FROM rk CROSS JOIN ks WHERE rn = (k * 25 + 99) // 100
        |  UNION ALL
        |  SELECT CAST(50 AS BIGINT), n_chars FROM rk CROSS JOIN ks
        |  WHERE rn = (k * 50 + 99) // 100
        |  UNION ALL
        |  SELECT CAST(75 AS BIGINT), n_chars FROM rk CROSS JOIN ks
        |  WHERE rn = (k * 75 + 99) // 100),
        |fin AS (SELECT pct, est,
        |    (SELECT CAST(count(*) AS BIGINT) FROM d
        |      WHERE d.n_chars <= ests.est) AS achieved_rank
        |  FROM ests)
        |SELECT pct, est, achieved_rank, (SELECT n FROM nn) AS n,
        |  abs(CAST(achieved_rank AS DOUBLE)
        |      / CAST((SELECT n FROM nn) AS DOUBLE)
        |    - CAST(pct AS DOUBLE) / 100.0) AS rank_error
        |FROM fin ORDER BY pct""".stripMargin,

    "q372_weighted_sample" -> {
      s"""WITH d AS (SELECT doc_id, n_chars AS w,
        |    ('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS u
        |  FROM documents),
        |p AS (SELECT doc_id, w,
        |    (${lg("(u + 1)")} - 32.0) / CAST(w AS DOUBLE) AS pri
        |  FROM d),
        |top AS (SELECT doc_id, w FROM p ORDER BY pri DESC, doc_id
        |  LIMIT 32),
        |pop AS (SELECT CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(count(*) AS BIGINT) AS n FROM d)
        |SELECT CAST(count(*) AS BIGINT) AS k, max(n) AS n,
        |  CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS mean_w_sample,
        |  CAST(max(sw) AS DOUBLE) / CAST(max(n) AS DOUBLE) AS mean_w_pop
        |FROM top CROSS JOIN pop""".stripMargin
    },

    "q373_ridge" ->
      """WITH d AS (SELECT n_chars AS x1,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x2,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      AS y
        |  FROM documents),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1 * x1) AS BIGINT) AS s11,
        |    CAST(sum(x1 * x2) AS BIGINT) AS s12,
        |    CAST(sum(x2 * x2) AS BIGINT) AS s22,
        |    CAST(sum(x1 * y) AS BIGINT) AS b1,
        |    CAST(sum(x2 * y) AS BIGINT) AS b2
        |  FROM d),
        |g2 AS (SELECT n, s11, s12, s22, b1, b2,
        |    CAST(s11 + 1000 AS DOUBLE) * CAST(s22 + 1000 AS DOUBLE)
        |      - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE) AS det
        |  FROM g)
        |SELECT n AS n_docs,
        |  (CAST(s22 + 1000 AS DOUBLE) * CAST(b1 AS DOUBLE)
        |    - CAST(s12 AS DOUBLE) * CAST(b2 AS DOUBLE)) / det AS beta1,
        |  (CAST(s11 + 1000 AS DOUBLE) * CAST(b2 AS DOUBLE)
        |    - CAST(s12 AS DOUBLE) * CAST(b1 AS DOUBLE)) / det AS beta2
        |FROM g2""".stripMargin,

    "q374_three_core" -> {
      s"""WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
        |ed AS (SELECT a.item AS x, b.item AS y
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |nbr0 AS MATERIALIZED (SELECT x AS a, y AS b FROM ed
        |  UNION ALL SELECT y, x FROM ed),
        |${(1 to 12).map(peelRound).mkString(",\n")}
        |SELECT a AS item, CAST(count(*) AS BIGINT) AS core_degree
        |FROM nbr12 GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "q375_point_in_polygon" ->
      """WITH pts AS (SELECT c_custkey AS k,
        |    ('0x' || substr(md5('px:' || CAST(c_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 2000001 AS px,
        |    ('0x' || substr(md5('py:' || CAST(c_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 1200001 AS py
        |  FROM customer),
        |eg AS (SELECT CAST(x1 AS BIGINT) AS x1, CAST(y1 AS BIGINT) AS y1,
        |    CAST(x2 AS BIGINT) AS x2, CAST(y2 AS BIGINT) AS y2
        |  FROM (VALUES
        |    (0, 0, 1000000, 400000), (1000000, 400000, 2000000, 0),
        |    (2000000, 0, 2000000, 1200000),
        |    (2000000, 1200000, 1000000, 800000),
        |    (1000000, 800000, 0, 1200000), (0, 1200000, 0, 0))
        |    t(x1, y1, x2, y2)),
        |cr AS (SELECT k, CAST(count(*) AS BIGINT) AS nc
        |  FROM pts CROSS JOIN eg
        |  WHERE ((y1 <= py AND py < y2) OR (y2 <= py AND py < y1))
        |    AND ((x2 - x1) * (py - y1) - (px - x1) * (y2 - y1))
        |      * CAST(sign(CAST(y2 - y1 AS DOUBLE)) AS BIGINT) > 0
        |  GROUP BY 1),
        |mk AS (SELECT pts.k,
        |    CASE WHEN COALESCE(nc, 0) % 2 = 1 THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS inside
        |  FROM pts LEFT JOIN cr ON pts.k = cr.k)
        |SELECT CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(sum(inside) AS BIGINT) AS n_inside,
        |  CAST(sum(inside) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |    AS share_inside
        |FROM mk""".stripMargin,

    "q376_bitemporal" ->
      """WITH base AS (SELECT c_custkey AS k,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
        |    ('0x' || substr(md5('vd:' || CAST(c_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 200 + 100 AS vday,
        |    ('0x' || substr(md5('td:' || CAST(c_custkey AS VARCHAR)),
        |      1, 8))::BIGINT % 100 AS tday
        |  FROM customer),
        |vers AS (
        |  SELECT k, CAST(0 AS BIGINT) AS vfrom, vday AS vto,
        |    CAST(0 AS BIGINT) AS tfrom, bal FROM base
        |  UNION ALL
        |  SELECT k, vday, CAST(10000 AS BIGINT), tday, bal + 1000
        |  FROM base
        |  UNION ALL
        |  SELECT k, vday, CAST(10000 AS BIGINT), tday + 50, bal + 1200
        |  FROM base WHERE k % 5 = 0),
        |snap AS (SELECT k, bal, tfrom,
        |    row_number() OVER (PARTITION BY k ORDER BY tfrom DESC) AS rk
        |  FROM vers WHERE tfrom <= 120 AND vfrom <= 250 AND vto > 250)
        |SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(bal) AS BIGINT) AS sum_bal_cents,
        |  CAST(sum(CASE WHEN tfrom > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_from_v2
        |FROM snap WHERE rk = 1""".stripMargin,

    "q377_interval_overlap" ->
      """WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(epoch_us(min(ts)) // 1000000 AS BIGINT) AS s1,
        |    CAST(epoch_us(max(ts)) // 1000000 AS BIGINT) + 1 AS e1
        |  FROM events GROUP BY 1, 2),
        |wins AS (SELECT CAST(i AS BIGINT) AS w,
        |    ('0x' || substr(md5('mw:' || CAST(i AS VARCHAR)), 1, 8))
        |      ::BIGINT % 2592000 + 1704067200 AS s2
        |  FROM range(0, 40) t(i)),
        |wins2 AS (SELECT w, s2, s2 + 21600 AS e2 FROM wins),
        |sb AS (SELECT user_id, d, s1, e1, unnest(range(s1 // 604800,
        |    (e1 - 1) // 604800 + 1)) AS bk FROM spans),
        |wb AS (SELECT w, s2, e2, unnest(range(s2 // 604800,
        |    (e2 - 1) // 604800 + 1)) AS bk FROM wins2),
        |pairs AS (SELECT user_id, d, w,
        |    least(e1, e2) - greatest(s1, s2) AS overlap_s
        |  FROM sb JOIN wb USING (bk)
        |  WHERE s1 < e2 AND s2 < e1
        |    AND bk = greatest(s1, s2) // 604800)
        |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT w) AS BIGINT) AS n_windows_hit,
        |  CAST(sum(overlap_s) AS BIGINT) AS total_overlap_s
        |FROM pairs""".stripMargin,

    "q378_window_funnel" ->
      // The engine's fold advances on the FIRST qualifying event in
      // (tms, step)-encoded value order, which is exactly the greedy
      // min-next chain below — expressed as four conditional min
      // aggregates because DuckDB 1.0's list_reduce over grouped lists
      // mis-evaluates under parallel plans (reproduced at sf0.1).
      """WITH stp AS (SELECT user_id,
        |    (epoch_us(ts) // 1000000) * 8
        |      + CASE event_type WHEN 'signup' THEN CAST(1 AS BIGINT)
        |        WHEN 'view' THEN 2 WHEN 'click' THEN 3
        |        WHEN 'purchase' THEN 4 END AS el
        |  FROM events
        |  WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
        |users AS (SELECT DISTINCT user_id FROM stp),
        |u1 AS (SELECT user_id, min(el) AS e1 FROM stp
        |  WHERE (el & 7) = 1 GROUP BY 1),
        |u2 AS (SELECT s.user_id, min(el) AS e2 FROM stp s
        |  JOIN u1 USING (user_id)
        |  WHERE (el & 7) = 2 AND el > e1
        |    AND (el >> 3) - (e1 >> 3) <= 86400 GROUP BY 1),
        |u3 AS (SELECT s.user_id, min(el) AS e3 FROM stp s
        |  JOIN u1 USING (user_id) JOIN u2 USING (user_id)
        |  WHERE (el & 7) = 3 AND el > e2
        |    AND (el >> 3) - (e1 >> 3) <= 86400 GROUP BY 1),
        |u4 AS (SELECT s.user_id, min(el) AS e4 FROM stp s
        |  JOIN u1 USING (user_id) JOIN u3 USING (user_id)
        |  WHERE (el & 7) = 4 AND el > e3
        |    AND (el >> 3) - (e1 >> 3) <= 86400 GROUP BY 1),
        |pu AS (SELECT users.user_id,
        |    CASE WHEN e4 IS NOT NULL THEN CAST(4 AS BIGINT)
        |      WHEN e3 IS NOT NULL THEN 3 WHEN e2 IS NOT NULL THEN 2
        |      WHEN e1 IS NOT NULL THEN 1 ELSE 0 END AS lvl
        |  FROM users LEFT JOIN u1 USING (user_id)
        |  LEFT JOIN u2 USING (user_id) LEFT JOIN u3 USING (user_id)
        |  LEFT JOIN u4 USING (user_id))
        |SELECT lvl, CAST(count(*) AS BIGINT) AS n_users
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin,

    "q379_sequence_match" ->
      // In the engine's fold, armed == "the previous error/signup/
      // purchase event was an error", so a purchase matches iff its
      // lag() in the 3-type stream is an error — a pure window
      // formulation (no list_reduce; see the q378 DuckDB note).
      """WITH ev AS (SELECT user_id,
        |    epoch_us(ts) * 4 + CASE event_type
        |      WHEN 'error' THEN CAST(1 AS BIGINT)
        |      WHEN 'signup' THEN 2 WHEN 'purchase' THEN 3 END AS el
        |  FROM events
        |  WHERE event_type IN ('error', 'signup', 'purchase')),
        |lagged AS (SELECT user_id, el & 3 AS code,
        |    lag(el & 3) OVER (PARTITION BY user_id ORDER BY el) AS prev
        |  FROM ev),
        |pu AS (SELECT user_id,
        |    CAST(sum(CASE WHEN code = 3 AND prev = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m
        |  FROM lagged GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(CASE WHEN m > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_matched_users,
        |  CAST(sum(m) AS BIGINT) AS total_matches
        |FROM pu""".stripMargin,

    "q380_clustering_coeff" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |ed AS (SELECT a.item AS x, b.item AS y
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS MATERIALIZED (SELECT x AS u, y AS v FROM ed),
        |tri AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |corners AS (SELECT a AS id FROM tri
        |  UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri),
        |nodes AS (SELECT DISTINCT u AS id FROM (SELECT u FROM e
        |  UNION ALL SELECT v FROM e)),
        |tr AS (SELECT nodes.id,
        |    COALESCE(t.nt, CAST(0 AS BIGINT)) AS n_triangles
        |  FROM nodes LEFT JOIN (SELECT id, CAST(count(*) AS BIGINT) AS nt
        |    FROM corners GROUP BY 1) t ON t.id = nodes.id),
        |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM
        |  (SELECT x AS id FROM ed UNION ALL SELECT y FROM ed)
        |  GROUP BY 1),
        |cc AS (SELECT tr.id, deg, n_triangles,
        |    CASE WHEN deg >= 2 THEN
        |      2.0 * CAST(n_triangles AS DOUBLE)
        |        / CAST(deg * (deg - 1) AS DOUBLE)
        |    ELSE 0.0 END AS cc
        |  FROM tr JOIN deg ON deg.id = tr.id),
        |mean AS (SELECT
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list(cc ORDER BY id)), (a, x) -> a + x)
        |      / CAST(count(*) AS DOUBLE) AS mean_cc
        |  FROM cc)
        |SELECT id, deg, n_triangles, cc, mean_cc
        |FROM (SELECT * FROM cc ORDER BY cc DESC, id LIMIT 20)
        |CROSS JOIN mean ORDER BY cc DESC, id""".stripMargin)
}
