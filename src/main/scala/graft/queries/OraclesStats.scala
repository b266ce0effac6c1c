package graft.queries

/**
 * DuckDB mirrors for [[CatalogStats]]. Determinism contract as
 * elsewhere: identical parenthesization on every divide, exact-lg
 * ([[OraclesExt.lgSqlOf]]) wherever the engine uses
 * [[graft.curation.Curation.lg]], and `list_reduce` over a sorted list
 * wherever the engine does a fixed-order fold.
 */
object OraclesStats {

  private val lg = OraclesExt.lgSqlOf _

  val all: Map[String, String] = Map(
    "q207_acf" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(count(*) AS BIGINT) AS n FROM daily),
        |cser AS (SELECT d, n * x - sx AS c FROM daily CROSS JOIN tot),
        |lagged AS (SELECT c,
        |    lag(c, 1) OVER (ORDER BY d) AS c1,
        |    lag(c, 2) OVER (ORDER BY d) AS c2,
        |    lag(c, 3) OVER (ORDER BY d) AS c3,
        |    lag(c, 4) OVER (ORDER BY d) AS c4,
        |    lag(c, 5) OVER (ORDER BY d) AS c5,
        |    lag(c, 6) OVER (ORDER BY d) AS c6,
        |    lag(c, 7) OVER (ORDER BY d) AS c7
        |  FROM cser),
        |sums AS (SELECT CAST(sum(c * c) AS BIGINT) AS den,
        |    CAST(sum(c * c1) AS BIGINT) AS num1, CAST(count(c1) AS BIGINT) AS np1,
        |    CAST(sum(c * c2) AS BIGINT) AS num2, CAST(count(c2) AS BIGINT) AS np2,
        |    CAST(sum(c * c3) AS BIGINT) AS num3, CAST(count(c3) AS BIGINT) AS np3,
        |    CAST(sum(c * c4) AS BIGINT) AS num4, CAST(count(c4) AS BIGINT) AS np4,
        |    CAST(sum(c * c5) AS BIGINT) AS num5, CAST(count(c5) AS BIGINT) AS np5,
        |    CAST(sum(c * c6) AS BIGINT) AS num6, CAST(count(c6) AS BIGINT) AS np6,
        |    CAST(sum(c * c7) AS BIGINT) AS num7, CAST(count(c7) AS BIGINT) AS np7
        |  FROM lagged)
        |SELECT lag, n_pairs, acf FROM (
        |  SELECT 1 AS lag, np1 AS n_pairs,
        |    CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) AS acf FROM sums
        |  UNION ALL SELECT 2, np2, CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 3, np3, CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 4, np4, CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 5, np5, CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 6, np6, CAST(num6 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums
        |  UNION ALL SELECT 7, np7, CAST(num7 AS DOUBLE) / CAST(den AS DOUBLE) FROM sums)
        |ORDER BY lag""".stripMargin,

    "q208_survival" -> {
      s"""WITH users AS (SELECT user_id,
        |    min(CAST(ts AS DATE)) AS first_d,
        |    min(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN CAST(ts AS DATE) END) AS conv_d
        |  FROM events GROUP BY 1),
        |horizon AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events),
        |life AS (SELECT
        |    CAST(date_diff('day', first_d, COALESCE(conv_d, max_d)) AS BIGINT)
        |      AS t,
        |    CASE WHEN conv_d IS NOT NULL
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS death
        |  FROM users CROSS JOIN horizon),
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
        |    ${lg("n_risk - d")} - ${lg("n_risk")} AS step_lg2
        |  FROM risk WHERE d > 0)
        |SELECT t, n_risk, d, hazard,
        |  sum(step_lg2) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS km_lg2
        |FROM steps ORDER BY t""".stripMargin
    },

    "q209_adamic_adar" -> {
      s"""WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
        |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS dg FROM ui GROUP BY 1),
        |pairs AS (SELECT a.item AS i, b.item AS j, a.u AS u
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item),
        |top AS (SELECT i, j FROM pairs GROUP BY 1, 2
        |  ORDER BY count(*) DESC, i, j LIMIT 20),
        |terms AS (SELECT i, j, u, 1.0 / ${lg("dg")} AS w
        |  FROM pairs JOIN top USING (i, j) JOIN deg USING (u))
        |SELECT i, j, CAST(count(*) AS BIGINT) AS common_users,
        |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(list_sort(list({'u': u, 'w': w})), x -> x.w)),
        |    (a, x) -> a + x) AS aa_score
        |FROM terms GROUP BY i, j
        |ORDER BY aa_score DESC, i, j""".stripMargin
    },

    "q210_clustering" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |edges AS (SELECT a.item AS i, b.item AS j
        |  FROM ui a JOIN ui b ON a.u = b.u AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT i AS v FROM edges UNION ALL SELECT j AS v FROM edges)
        |  GROUP BY 1),
        |tri AS (SELECT e1.i AS x, e1.j AS y, e2.j AS z
        |  FROM edges e1
        |  JOIN edges e2 ON e1.j = e2.i
        |  JOIN edges e3 ON e1.i = e3.i AND e2.j = e3.j),
        |tpn AS (SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM (
        |    SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
        |    UNION ALL SELECT z AS v FROM tri)
        |  GROUP BY 1)
        |SELECT deg.v AS item, degree,
        |  COALESCE(triangles, CAST(0 AS BIGINT)) AS triangles,
        |  CASE WHEN degree >= 2 THEN
        |    CAST(COALESCE(triangles, 0) * 2 AS DOUBLE)
        |      / CAST(degree * (degree - 1) AS DOUBLE)
        |  ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
        |FROM deg LEFT JOIN tpn ON deg.v = tpn.v
        |ORDER BY item""".stripMargin)
}
