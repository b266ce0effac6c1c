package graft.queries

/**
 * DuckDB oracle SQL for the round-11 evaluation-metrics wave
 * ([[CatalogEv]]). q432 mirrors the engine parenthesis for parenthesis:
 * the q418 DOUBLE[] cosine idiom, the exact-lg discount
 * ([[OraclesExt.lgSqlOf]]), and FIXED-ORDER list_reduce folds for DCG
 * (terms by rank) and IDCG (a range comprehension). q433 replays the
 * tie-corrected Mann–Whitney identity on the distinct-value frame.
 */
object OraclesEv {

  private def lg(x: String): String = OraclesExt.lgSqlOf(x)

  val all: Map[String, String] = Map(

    "q432_retrieval_metrics" ->
      s"""WITH e AS MATERIALIZED (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e
         |  WHERE vec_id % 25 = 0),
         |c AS (SELECT vec_id AS c_id, label AS c_label, v AS cv FROM e
         |  WHERE vec_id % 25 <> 0),
         |lab AS (SELECT c_label, CAST(count(*) AS BIGINT) AS r
         |  FROM c GROUP BY c_label),
         |scored AS MATERIALIZED (
         |  SELECT q.q_id, q.q_label, c.c_id,
         |    list_dot_product(q.qv, c.cv)
         |      / (sqrt(list_dot_product(q.qv, q.qv))
         |        * sqrt(list_dot_product(c.cv, c.cv))) AS cos,
         |    CASE WHEN q.q_label = c.c_label THEN CAST(1 AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS rel
         |  FROM c CROSS JOIN q),
         |top AS MATERIALIZED (SELECT q_id, q_label, c_id, rel,
         |    CAST(rn AS BIGINT) AS rnk
         |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
         |    ORDER BY cos DESC, c_id ASC) AS rn FROM scored)
         |  WHERE rn <= 10),
         |perq AS (SELECT q_id, q_label,
         |    CAST(sum(rel) AS BIGINT) AS n_rel_top10,
         |    min(CASE WHEN rel = 1 THEN rnk END) AS first_rel,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(CAST(rel AS DOUBLE) / ${lg("rnk + 1")} ORDER BY rnk)),
         |      (a, x) -> a + x) AS dcg
         |  FROM top GROUP BY q_id, q_label)
         |SELECT perq.q_id, lab.r AS n_rel_corpus, perq.n_rel_top10,
         |  coalesce(perq.first_rel, CAST(0 AS BIGINT)) AS first_rel,
         |  coalesce(1.0 / perq.first_rel, 0.0) AS rr,
         |  perq.dcg,
         |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    [1.0 / ${lg("i + 1")} for i in range(1, least(lab.r, 10) + 1)]),
         |    (a, x) -> a + x) AS idcg,
         |  perq.dcg / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    [1.0 / ${lg("i + 1")} for i in range(1, least(lab.r, 10) + 1)]),
         |    (a, x) -> a + x) AS ndcg
         |FROM perq JOIN lab ON lab.c_label = perq.q_label
         |ORDER BY q_id""".stripMargin,

    "q433_roc_auc" ->
      """WITH r AS MATERIALIZED (
        |  SELECT CAST(length(text) AS BIGINT) AS v,
        |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
        |      ELSE CAST(0 AS BIGINT) END AS y
        |  FROM documents),
        |g AS (SELECT v, CAST(count(*) AS BIGINT) AS f,
        |  CAST(sum(y) AS BIGINT) AS fp FROM r GROUP BY v),
        |rk AS (SELECT v, f, fp,
        |    CAST(sum(f) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      - f AS before
        |  FROM g),
        |a AS (SELECT
        |    CAST(sum(fp * (2 * before + f + 1)) AS BIGINT) AS two_rpos,
        |    CAST(sum(fp) AS BIGINT) AS p,
        |    CAST(sum(f - fp) AS BIGINT) AS n
        |  FROM rk)
        |SELECT p AS n_pos, n AS n_neg,
        |  two_rpos - p * (p + 1) AS two_u,
        |  CAST(two_rpos - p * (p + 1) AS DOUBLE)
        |    / CAST(2 * p * n AS DOUBLE) AS auc
        |FROM a""".stripMargin)
}
