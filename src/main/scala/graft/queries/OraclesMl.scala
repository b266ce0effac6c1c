package graft.queries

/**
 * DuckDB oracle SQL for the round-11 ML-kernel wave ([[CatalogMl]]).
 * q426's split scores stay in HUGEINT-free DECIMAL(38,0) exactly like the
 * engine; q427's "strictly after" uses row-value comparisons over
 * (ts, event_id) — DuckDB's struct ordering is the same lexicographic
 * order Spark's struct comparison uses; q428/q429's floats are single
 * correctly-rounded IEEE ops over exact integers, written in the
 * engine's exact operation order.
 */
object OraclesMl {

  val all: Map[String, String] = Map(

    "q426_best_split" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
        |    CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS y
        |  FROM events),
        |mm AS (SELECT min(c) AS mn, max(c) AS mx,
        |  CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p FROM ev),
        |hist AS MATERIALIZED (
        |  SELECT (c - mn) // ((mx - mn) // 64 + 1) AS bin,
        |    CAST(count(*) AS BIGINT) AS nb, CAST(sum(y) AS BIGINT) AS pb
        |  FROM ev, mm GROUP BY 1),
        |lft AS (SELECT k.bin AS k, CAST(sum(h.nb) AS BIGINT) AS nl,
        |    CAST(sum(h.pb) AS BIGINT) AS pl
        |  FROM (SELECT bin FROM hist) k JOIN hist h ON h.bin <= k.bin
        |  GROUP BY k.bin),
        |scored AS (SELECT k, nl, pl, n - nl AS nr, p - pl AS pr, mn, mx,
        |    (CAST(pl AS DECIMAL(38,0)) * pl
        |       + CAST(nl - pl AS DECIMAL(38,0)) * (nl - pl)) * (n - nl)
        |     + (CAST(p - pl AS DECIMAL(38,0)) * (p - pl)
        |       + CAST((n - nl) - (p - pl) AS DECIMAL(38,0))
        |         * ((n - nl) - (p - pl))) * nl AS score
        |  FROM lft, mm WHERE nl < n)
        |SELECT k AS split_bin,
        |  mn + (k + 1) * ((mx - mn) // 64 + 1) AS threshold_cents,
        |  nl, pl, nr, pr
        |FROM scored ORDER BY score DESC, k ASC LIMIT 1""".stripMargin,

    "q427_seq_patterns" ->
      """WITH ev AS MATERIALIZED (
        |  SELECT user_id, event_type AS ty, row(ts, event_id) AS k
        |  FROM events),
        |a1 AS MATERIALIZED (SELECT user_id, ty AS a, min(k) AS ka
        |  FROM ev GROUP BY user_id, ty),
        |a2 AS MATERIALIZED (SELECT e.user_id, a1.a, e.ty AS b,
        |    min(e.k) AS kb
        |  FROM ev e JOIN a1 ON a1.user_id = e.user_id AND e.k > a1.ka
        |  GROUP BY e.user_id, a1.a, e.ty),
        |a3 AS MATERIALIZED (SELECT DISTINCT e.user_id, a2.a, a2.b,
        |    e.ty AS c
        |  FROM ev e JOIN a2 ON a2.user_id = e.user_id AND e.k > a2.kb)
        |SELECT a, b, c, CAST(count(*) AS BIGINT) AS n_users
        |FROM a3 GROUP BY a, b, c ORDER BY a, b, c""".stripMargin,

    "q428_covisit_lift" ->
      """WITH baskets AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |no AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM baskets),
        |cx AS MATERIALIZED (SELECT pk, CAST(count(*) AS BIGINT) AS cnt
        |  FROM baskets GROUP BY pk),
        |pairs AS MATERIALIZED (
        |  SELECT a.pk AS x, b.pk AS y, CAST(count(*) AS BIGINT) AS cxy
        |  FROM baskets a JOIN baskets b ON a.ok = b.ok AND a.pk <> b.pk
        |  GROUP BY a.pk, b.pk HAVING count(*) >= 2),
        |scored AS MATERIALIZED (
        |  SELECT p.x, p.y, p.cxy,
        |    CAST(no.n * p.cxy AS DOUBLE)
        |      / CAST(gx.cnt * gy.cnt AS DOUBLE) AS lift
        |  FROM pairs p
        |  JOIN cx gx ON gx.pk = p.x
        |  JOIN cx gy ON gy.pk = p.y
        |  CROSS JOIN no),
        |ranked AS (SELECT x, y, cxy, lift,
        |    CAST(row_number() OVER (PARTITION BY x
        |      ORDER BY lift DESC, y ASC) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT x, y, rnk, cxy, lift FROM ranked
        |WHERE rnk <= 5 ORDER BY x, rnk""".stripMargin,

    "q434_woe_iv" ->
      s"""WITH ev AS MATERIALIZED (
         |  SELECT CAST(round(value * 100) AS BIGINT) AS c,
         |    CASE WHEN event_type = 'purchase' THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS y
         |  FROM events),
         |mm AS (SELECT min(c) AS mn, max(c) AS mx,
         |  CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS p FROM ev),
         |bins AS MATERIALIZED (
         |  SELECT (c - mn) // ((mx - mn) // 10 + 1) AS bin,
         |    CAST(sum(y) AS BIGINT) AS n_pos,
         |    CAST(count(*) - sum(y) AS BIGINT) AS n_neg,
         |    p AS tp, n - p AS tn
         |  FROM ev, mm GROUP BY 1, p, n),
         |scored AS MATERIALIZED (SELECT bin, n_pos, n_neg,
         |    (${OraclesExt.lgSqlOf("2 * n_pos + 1")}
         |      - ${OraclesExt.lgSqlOf("2 * tp + 10")})
         |     - (${OraclesExt.lgSqlOf("2 * n_neg + 1")}
         |      - ${OraclesExt.lgSqlOf("2 * tn + 10")}) AS woe,
         |    tp, tn
         |  FROM bins),
         |iv AS (SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list((CAST(n_pos AS DOUBLE) / CAST(tp AS DOUBLE)
         |      - CAST(n_neg AS DOUBLE) / CAST(tn AS DOUBLE)) * woe
         |      ORDER BY bin)),
         |    (a, x) -> a + x) AS iv
         |  FROM scored)
         |SELECT bin, n_pos, n_neg, woe, iv.iv
         |FROM scored, iv ORDER BY bin""".stripMargin,

    "q429_target_encode" ->
      """WITH o AS MATERIALIZED (
        |  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
        |    CAST(round(orders.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders JOIN customer c ON orders.o_custkey = c.c_custkey),
        |g AS (SELECT CAST(sum(cents) AS BIGINT) AS gs,
        |  CAST(count(*) AS BIGINT) AS gn FROM o)
        |SELECT nation, segment, CAST(count(*) AS BIGINT) AS n_cat,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  (CAST(sum(cents) AS DOUBLE)
        |     + 100.0 * (CAST(gs AS DOUBLE) / CAST(gn AS DOUBLE)))
        |    / CAST(count(*) + 100 AS DOUBLE) AS enc
        |FROM o, g GROUP BY nation, segment, gs, gn
        |ORDER BY nation, segment""".stripMargin)
}
