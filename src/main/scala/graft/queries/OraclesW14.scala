package graft.queries

/** DuckDB oracles for the round-14 waves. q457 replays the stabbing
  * greedy as an h-indexed list-state recursive CTE over the same
  * md5-bottom panel (the q454/q456 sequential-kernel pattern): state is
  * the stab-point list, one interval consumed per step in (ed, sd,
  * okey) order, a point appended when the interval starts after the
  * last point. q458 replays the DGIM micro-step rule — each recursion
  * step is EITHER one merge (two oldest buckets of the smallest
  * thrice-occupied size) OR one arrival (expire + append), identity
  * past the end — with the bucket list as a LIST-OF-STRUCTS state
  * column; 4200 steps cover 2000 arrivals + ≤2000 merges (each merge
  * consumes one prior append). */
object OraclesW14 {

  val all: Map[String, String] = Map(
    "q457_interval_stabbing" ->
      """WITH RECURSIVE ivr AS MATERIALIZED (
        |  SELECT c.c_mktsegment AS seg, o.o_orderkey AS okey,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS sd,
        |    greatest(CAST(max(CAST(l.l_shipdate AS DATE))
        |      - DATE '1970-01-01' AS BIGINT),
        |      CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
        |        AS BIGINT)) AS ed
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2, 3),
        |panel AS MATERIALIZED (
        |  SELECT seg, okey, sd, ed FROM (
        |    SELECT *, row_number() OVER (PARTITION BY seg
        |      ORDER BY md5('stab:' || CAST(okey AS VARCHAR)), okey) AS rnk
        |    FROM ivr)
        |  WHERE rnk <= 60),
        |idx AS MATERIALIZED (
        |  SELECT seg, sd, ed,
        |    row_number() OVER (PARTITION BY seg ORDER BY ed, sd, okey) AS i
        |  FROM panel),
        |nmax AS (SELECT seg, CAST(max(i) AS BIGINT) AS n FROM idx
        |  GROUP BY 1),
        |st(h, seg, pts) AS (
        |  SELECT 0, seg, CAST([] AS BIGINT[])
        |  FROM (SELECT DISTINCT seg FROM panel)
        |  UNION ALL
        |  SELECT h + 1, seg,
        |    CASE WHEN asd IS NULL THEN pts
        |      WHEN len(pts) = 0 OR asd > pts[len(pts)] THEN
        |        list_append(pts, aed)
        |      ELSE pts END
        |  FROM (
        |    SELECT st.h AS h, st.seg AS seg, st.pts AS pts, p.sd AS asd,
        |      p.ed AS aed
        |    FROM st LEFT JOIN idx p ON p.seg = st.seg AND p.i = st.h + 1)
        |  WHERE h < 60)
        |SELECT s.seg, n.n AS n_intervals,
        |  CAST(len(s.pts) AS BIGINT) AS n_stab_points,
        |  s.pts[1] AS first_stab_day, s.pts[len(s.pts)] AS last_stab_day,
        |  CAST(list_sum(s.pts) AS BIGINT) AS sum_stab_days
        |FROM (SELECT seg, pts FROM st WHERE h = 60) s
        |JOIN nmax n ON n.seg = s.seg
        |ORDER BY s.seg""".stripMargin,

    "q458_dgim_window" ->
      """WITH RECURSIVE panel AS MATERIALIZED (
        |  SELECT event_type AS series,
        |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS bit,
        |    row_number() OVER (PARTITION BY event_type ORDER BY event_id)
        |      AS i
        |  FROM (SELECT event_id, event_type, user_id,
        |      row_number() OVER (
        |        ORDER BY md5('dgim:' || CAST(event_id AS VARCHAR)),
        |          event_id) AS rnk FROM events)
        |  WHERE rnk <= 2000),
        |nrow AS (SELECT series, CAST(max(i) AS BIGINT) AS n FROM panel
        |  GROUP BY 1),
        |ex AS (SELECT p.series,
        |    CAST(coalesce(sum(CASE WHEN p.i > nrow.n - 256 THEN p.bit END),
        |      0) AS BIGINT) AS exact_ones
        |  FROM panel p JOIN nrow ON nrow.series = p.series GROUP BY 1),
        |st(h, series, i, bks) AS (
        |  SELECT 0, series, CAST(0 AS BIGINT),
        |    CAST([] AS STRUCT(ts BIGINT, sz BIGINT)[])
        |  FROM (SELECT DISTINCT series FROM panel)
        |  UNION ALL
        |  SELECT h + 1, series,
        |    CASE WHEN pend IS NOT NULL THEN i ELSE i + 1 END,
        |    CASE
        |      WHEN pend IS NOT NULL THEN
        |        list_append(
        |          list_filter(bks, b -> NOT (b.sz = pend
        |            AND (b.ts = olds[1] OR b.ts = olds[2]))),
        |          {'ts': olds[2], 'sz': 2 * pend})
        |      WHEN nbit IS NULL THEN bks
        |      WHEN nbit = 1 THEN list_append(
        |        list_filter(bks, b -> b.ts > i + 1 - 256),
        |        {'ts': i + 1, 'sz': CAST(1 AS BIGINT)})
        |      ELSE list_filter(bks, b -> b.ts > i + 1 - 256)
        |    END
        |  FROM (
        |    SELECT q.*, CASE WHEN pend IS NULL THEN NULL ELSE
        |        list_sort(list_transform(
        |          list_filter(q.bks, b -> b.sz = pend), b -> b.ts)) END
        |        AS olds
        |    FROM (
        |      SELECT st.h AS h, st.series AS series, st.i AS i,
        |        st.bks AS bks, p.bit AS nbit,
        |        list_min(list_transform(
        |          list_filter(st.bks, b ->
        |            len(list_filter(st.bks, c -> c.sz = b.sz)) >= 3),
        |          b -> b.sz)) AS pend
        |      FROM st LEFT JOIN panel p
        |        ON p.series = st.series AND p.i = st.i + 1) q)
        |  WHERE h < 4200),
        |fin AS (
        |  SELECT series,
        |    CASE WHEN len(bks) = 0 THEN 0
        |      ELSE CAST(list_sum(list_transform(bks, b -> b.sz))
        |        - list_sort(bks)[1].sz + list_sort(bks)[1].sz // 2
        |        AS BIGINT) END AS dgim_est,
        |    CAST(len(bks) AS BIGINT) AS n_buckets,
        |    CASE WHEN len(bks) = 0 THEN 0
        |      ELSE CAST(list_max(list_transform(bks, b -> b.sz))
        |        AS BIGINT) END AS max_bucket
        |  FROM st WHERE h = 4200)
        |SELECT f.series, nrow.n AS n_seen, ex.exact_ones, f.dgim_est,
        |  f.n_buckets, f.max_bucket,
        |  (abs(f.dgim_est - ex.exact_ones) * 2 <= ex.exact_ones
        |    OR f.dgim_est = ex.exact_ones) AS within_bound
        |FROM fin f
        |JOIN nrow ON nrow.series = f.series
        |JOIN ex ON ex.series = f.series
        |ORDER BY f.series""".stripMargin,

    "q459_tree_lca" ->
      """WITH panel AS MATERIALIZED (
        |  SELECT c_custkey AS v, CAST(c_custkey AS VARCHAR) AS vs
        |  FROM (SELECT c_custkey, row_number() OVER (
        |      ORDER BY md5('lca:' || CAST(c_custkey AS VARCHAR)),
        |        c_custkey) AS rnk
        |    FROM customer)
        |  WHERE rnk <= 40),
        |pairs AS (
        |  SELECT a.v AS u, a.vs AS us, b.v AS v, b.vs AS vs
        |  FROM panel a JOIN panel b ON a.v < b.v),
        |lcp AS (
        |  SELECT u, us, v, vs,
        |    coalesce((SELECT max(d)
        |      FROM unnest(range(1, 1 + least(len(us), len(vs)))) AS t(d)
        |      WHERE substr(us, 1, CAST(d AS INT))
        |        = substr(vs, 1, CAST(d AS INT))), 0) AS p
        |  FROM pairs)
        |SELECT u, v,
        |  CASE WHEN p = 0 THEN NULL
        |    ELSE CAST(substr(us, 1, CAST(p AS INT)) AS BIGINT) END AS lca,
        |  CAST(p AS BIGINT) AS lca_depth,
        |  CASE WHEN p = 0 THEN NULL
        |    ELSE CAST(len(us) - p + len(vs) - p AS BIGINT) END AS tree_dist
        |FROM lcp ORDER BY u, v""".stripMargin)
}
