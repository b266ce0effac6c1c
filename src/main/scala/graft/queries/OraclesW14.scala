package graft.queries

/** DuckDB oracles for the round-14 waves. q457 replays the stabbing
  * greedy as an h-indexed list-state recursive CTE over the same
  * md5-bottom panel (the q454/q456 sequential-kernel pattern): state is
  * the stab-point list, one interval consumed per step in (ed, sd,
  * okey) order, a point appended when the interval starts after the
  * last point. */
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
        |ORDER BY s.seg""".stripMargin)
}
