package graft.queries

/**
 * DuckDB oracle SQL for [[CatalogMore]]. The BFS oracle deliberately uses
 * the CLASSIC recursive-CTE form (all walks, min() over lengths) against
 * the engine's delta-frontier rewrite — the hash match proves the
 * level-order optimization preserves shortest distances; likewise the
 * join-size oracle states the Σ cntA·cntB identity in nested-subquery
 * form.
 */
object OraclesMore {

  /** The 64-bucket hashed-TF vector + cosine-knn CTE prefix shared with
    * the q155 oracle (rebuilt here so each oracle stays self-contained). */
  private val knnPrefix =
    """WITH v AS (SELECT doc_id,
      |    [CAST(len(list_filter(w, t ->
      |       ('0x' || substr(md5(t), 1, 8))::BIGINT % 64 = i)) AS DOUBLE)
      |     for i in range(0, 64)] AS v
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      |q AS (SELECT doc_id AS q_id, v AS qv FROM v WHERE doc_id % 100 = 0),
      |sc AS (SELECT q.q_id, c.doc_id AS c_id,
      |    list_dot_product(qv, c.v)
      |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v)))
      |      AS cosine
      |  FROM v c CROSS JOIN q WHERE q.q_id <> c.doc_id),
      |knn AS (SELECT q_id, c_id, rnk FROM (
      |  SELECT q_id, c_id,
      |    row_number() OVER (PARTITION BY q_id
      |      ORDER BY cosine DESC, c_id ASC) AS rnk
      |  FROM sc) WHERE rnk <= 5)""".stripMargin

  private val ewmaLags = 8
  private val ewmaSelects = (0 until ewmaLags)
    .map(k => s"lag(c, $k) OVER w AS l$k").mkString(",\n  ")
  private val ewmaNum = (0 until ewmaLags)
    .map(k => s"coalesce(l$k * ${1L << (ewmaLags - 1 - k)}, 0)").mkString(" + ")
  private val ewmaDen = (0 until ewmaLags)
    .map(k => s"(CASE WHEN l$k IS NOT NULL THEN ${1L << (ewmaLags - 1 - k)} ELSE 0 END)")
    .mkString(" + ")

  val all: Map[String, String] = Map(
    "q175_bfs_hops" ->
      """WITH RECURSIVE
        |p AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sp
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT c AS src, sp AS dst FROM p
        |      UNION ALL SELECT sp, c FROM p),
        |seeds AS (SELECT s_suppkey * 2 + 1 AS id FROM supplier
        |          WHERE s_suppkey % 50 = 0),
        |bfs(id, hops) AS (
        |  SELECT id, CAST(0 AS BIGINT) FROM seeds
        |  UNION
        |  SELECT e.dst, bfs.hops + 1 FROM bfs JOIN e ON e.src = bfs.id
        |  WHERE bfs.hops < 6)
        |SELECT id, min(hops) AS hops FROM bfs
        |GROUP BY id
        |ORDER BY hops, id""".stripMargin,

    "q176_markov" ->
      """WITH seq AS (
        |  SELECT event_type AS to_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type
        |  FROM events),
        |t AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS cnt
        |      FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, cnt,
        |  CAST(cnt AS DOUBLE) /
        |    CAST(sum(cnt) OVER (PARTITION BY from_type) AS DOUBLE) AS prob
        |FROM t
        |ORDER BY from_type, to_type""".stripMargin,

    "q177_pareto" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS dt
        |  FROM documents),
        |b AS (SELECT n_chars, max(dt) AS bucket_max FROM d GROUP BY 1),
        |c AS (SELECT n_chars, bucket_max,
        |    max(bucket_max) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_smaller
        |  FROM b)
        |SELECT doc_id, d.n_chars, dt AS distinct_tokens
        |FROM d JOIN c USING (n_chars)
        |WHERE (best_smaller IS NULL OR best_smaller < dt) AND dt = bucket_max
        |ORDER BY n_chars, doc_id""".stripMargin,

    "q178_join_estimate" ->
      """SELECT 'customer_orders' AS join_name,
        |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) FROM
        |    (SELECT c_custkey AS k, count(*) AS ca FROM customer GROUP BY 1) a
        |    JOIN (SELECT o_custkey AS k, count(*) AS cb FROM orders GROUP BY 1) b
        |    USING (k)) AS predicted_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM customer
        |   JOIN orders ON c_custkey = o_custkey) AS actual_rows
        |UNION ALL
        |SELECT 'orders_lineitem',
        |  (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) FROM
        |    (SELECT o_orderkey AS k, count(*) AS ca FROM orders GROUP BY 1) a
        |    JOIN (SELECT l_orderkey AS k, count(*) AS cb FROM lineitem GROUP BY 1) b
        |    USING (k)) AS predicted_rows,
        |  (SELECT CAST(count(*) AS BIGINT) FROM orders
        |   JOIN lineitem ON o_orderkey = l_orderkey) AS actual_rows
        |ORDER BY join_name""".stripMargin,

    "q179_ewma" ->
      s"""WITH h AS (SELECT event_type AS series, date_trunc('hour', ts) AS hour,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT series, hour, c,
        |  $ewmaSelects
        |  FROM h WINDOW w AS (PARTITION BY series ORDER BY hour))
        |SELECT series, hour, c,
        |  CAST($ewmaNum AS DOUBLE) / CAST($ewmaDen AS DOUBLE) AS ewma
        |FROM l
        |ORDER BY series, hour""".stripMargin,

    "q180_event_runs" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |  - row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) AS island
        |  FROM events),
        |runs AS (SELECT user_id, event_type, island,
        |    CAST(count(*) AS BIGINT) AS run_len
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT event_type, run_len, CAST(count(*) AS BIGINT) AS n_runs
        |FROM runs GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q181_retrieval_eval" ->
      s"""$knnPrefix,
        |j AS (SELECT k.q_id, k.rnk, (dq.lang = dc.lang) AS rel
        |  FROM knn k
        |  JOIN documents dq ON k.q_id = dq.doc_id
        |  JOIN documents dc ON k.c_id = dc.doc_id),
        |pq AS (SELECT q_id, min(CASE WHEN rel THEN rnk END) AS first_rel
        |  FROM j GROUP BY q_id)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hit,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS hit_rate,
        |  CAST(sum(CASE WHEN first_rel IS NOT NULL THEN 60 // first_rel
        |      ELSE 0 END) AS DOUBLE)
        |    / (60.0 * CAST(count(*) AS DOUBLE)) AS mrr
        |FROM pq""".stripMargin,

    "q182_bloom" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |vocab AS (SELECT DISTINCT t FROM toks),
        |setbits AS (SELECT DISTINCT
        |    ('0x' || substr(md5(t || '#' || i), 1, 8))::BIGINT % 512 AS p
        |  FROM vocab CROSS JOIN (SELECT unnest(range(0, 3)) AS i)),
        |base AS (SELECT DISTINCT t FROM toks WHERE doc_id % 97 = 0),
        |probes AS (SELECT t FROM base UNION SELECT t || '~zz' FROM base),
        |pb AS (SELECT t AS probe,
        |    ('0x' || substr(md5(t || '#' || i), 1, 8))::BIGINT % 512 AS p
        |  FROM probes CROSS JOIN (SELECT unnest(range(0, 3)) AS i))
        |SELECT probe, probe IN (SELECT t FROM vocab) AS present,
        |  bool_and(p IN (SELECT p FROM setbits)) AS bloom_member
        |FROM pb GROUP BY probe
        |ORDER BY probe""".stripMargin,

    // The q123 training replay (24 exact GD rounds) nested as a CTE, then
    // the 8-bin reliability aggregation on top.
    "q183_calibration" ->
      s"""WITH sc AS (
        |${OraclesExt.qualityLrSql(24)}
        |),
        |g AS (SELECT least(p * 8 // 65536, 7) AS bin,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    CAST(sum(p) AS BIGINT) AS sum_p
        |  FROM sc GROUP BY 1)
        |SELECT bin, n, n_pos,
        |  CAST(sum_p AS DOUBLE) / (65536.0 * CAST(n AS DOUBLE)) AS mean_pred,
        |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS obs_rate
        |FROM g
        |ORDER BY bin""".stripMargin,

    "q184_freq_triples" ->
      """WITH ui AS (SELECT DISTINCT user_id AS u,
        |    json_extract(props, '$.k')::BIGINT AS item
        |  FROM events WHERE json_extract(props, '$.k') IS NOT NULL),
        |top AS (SELECT item FROM ui GROUP BY item
        |  ORDER BY count(*) DESC, item LIMIT 10),
        |u1 AS (SELECT u, item FROM ui WHERE item IN (SELECT item FROM top))
        |SELECT a.item AS i, b.item AS j, c.item AS k,
        |  CAST(count(*) AS BIGINT) AS support
        |FROM u1 a
        |JOIN u1 b ON a.u = b.u AND a.item < b.item
        |JOIN u1 c ON b.u = c.u AND b.item < c.item
        |GROUP BY 1, 2, 3
        |ORDER BY support DESC, i, j, k
        |LIMIT 20""".stripMargin,

    "q185_weighted_median" ->
      """WITH d AS (SELECT lang, doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS wt
        |  FROM documents),
        |c AS (SELECT lang, n_chars,
        |    sum(wt) OVER (PARTITION BY lang ORDER BY n_chars, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
        |    sum(wt) OVER (PARTITION BY lang) AS total
        |  FROM d)
        |SELECT lang, CAST(max(total) AS BIGINT) AS total_weight,
        |  min(CASE WHEN cumw * 2 >= total THEN n_chars END)
        |    AS weighted_median_chars
        |FROM c GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "q186_expectations" ->
      """WITH o AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_null,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_uniq,
        |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS v_pos
        |  FROM orders),
        |l AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
        |  FROM lineitem),
        |fk AS (SELECT CAST((SELECT count(*) FROM lineitem
        |      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |    AS BIGINT) AS v_fk,
        |    CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n),
        |rows_ AS (
        |  SELECT 'orders.o_custkey_not_null' AS check_, n, v_null AS v FROM o
        |  UNION ALL SELECT 'orders.o_orderkey_unique', n, v_uniq FROM o
        |  UNION ALL SELECT 'orders.o_totalprice_positive', n, v_pos FROM o
        |  UNION ALL SELECT 'lineitem.l_quantity_in_1_50', n, v_qty FROM l
        |  UNION ALL SELECT 'lineitem.l_discount_in_0_1', n, v_disc FROM l
        |  UNION ALL SELECT 'lineitem.fk_orders', n, v_fk FROM fk)
        |SELECT check_ AS "check", n AS n_checked, v AS n_violations,
        |  v = 0 AS pass
        |FROM rows_
        |ORDER BY "check"""".stripMargin,

    "q187_benford" ->
      """WITH d AS (SELECT
        |    substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR),
        |      1, 1) AS digit,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1)
        |SELECT digit, n,
        |  CAST(n AS DOUBLE) / CAST((SELECT sum(n) FROM d) AS DOUBLE) AS share
        |FROM d
        |ORDER BY digit""".stripMargin,

    "q188_woe" -> {
      val lg = OraclesExt.lgSqlOf _
      s"""WITH b AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS nt,
        |    CAST(len(list_filter(w, t -> t IN ${OraclesExt.stop})) AS BIGINT) AS ns,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |           list_transform(w, t -> CAST(length(t) AS BIGINT))),
        |         (acc, x) -> acc + x) AS BIGINT) AS tl,
        |    CAST(greatest(len(w) - 2, 0) AS BIGINT) AS n_ngrams,
        |    CAST(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
        |                            for i in range(1, len(w) - 1)])) AS BIGINT)
        |      AS n_distinct
        |  FROM b),
        |g AS (SELECT doc_id, nt,
        |    (nt BETWEEN 20 AND 90)
        |      AND (CAST(tl AS DOUBLE) / CAST(nt AS DOUBLE) >= 3.0
        |           AND CAST(tl AS DOUBLE) / CAST(nt AS DOUBLE) <= 8.0)
        |      AND ns >= 2
        |      AND ((CASE WHEN n_ngrams > 0
        |                 THEN 1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_ngrams AS DOUBLE)
        |                 ELSE 0.0 END) <= 0.2) AS pass
        |  FROM s),
        |a AS (SELECT least(nt // 20, 7) AS bucket,
        |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(sum(CASE WHEN NOT pass THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        |  FROM g GROUP BY 1),
        |t AS (SELECT CAST(sum(n_pos) AS BIGINT) AS tp,
        |    CAST(sum(n_neg) AS BIGINT) AS tn FROM a)
        |SELECT bucket, n_pos, n_neg,
        |  CASE WHEN n_pos > 0 AND n_neg > 0 AND tp > 0 AND tn > 0 THEN
        |    ((${lg("n_pos")} - ${lg("n_neg")}) - (${lg("tp")} - ${lg("tn")}))
        |  END AS woe_bits
        |FROM a CROSS JOIN t
        |ORDER BY bucket""".stripMargin
    },

    "q189_token_budget" ->
      s"""WITH d AS (SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
        |    (CAST(len(list_filter(string_split(text, ' '),
        |        t -> t IN ${OraclesExt.stop})) AS BIGINT) * 1000000)
        |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |c AS (SELECT source, nt,
        |    sum(nt) OVER (PARTITION BY source ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumtok,
        |    sum(nt) OVER (PARTITION BY source) AS total
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
        |  CAST(sum(nt) AS BIGINT) AS tokens_kept,
        |  CAST(sum(nt) AS DOUBLE) / CAST(max(total) AS DOUBLE) AS token_share
        |FROM c WHERE cumtok * 2 <= total
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q190_gini" ->
      """WITH ps AS (SELECT source,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS x
        |  FROM documents GROUP BY source),
        |r AS (SELECT x, CAST(row_number() OVER (ORDER BY x, source) AS BIGINT)
        |    AS i FROM ps)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |  CAST(sum(x) AS BIGINT) AS total_tokens,
        |  CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
        |    / CAST(count(*) * sum(x) AS DOUBLE) AS gini
        |FROM r""".stripMargin,

    "q191_triplets" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |p AS (SELECT q.vec_id AS q_id, q.label AS q_lab,
        |    c.vec_id AS c_id, c.label AS c_lab,
        |    list_dot_product(q.v, c.v)
        |      / (sqrt(list_dot_product(q.v, q.v)) *
        |         sqrt(list_dot_product(c.v, c.v))) AS cos
        |  FROM e q JOIN e c ON q.vec_id % 25 = 0 AND c.vec_id <> q.vec_id),
        |pos AS (SELECT q_id, q_lab AS label, c_id AS pos_id, cos AS pos_cos
        |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, c_id) AS rnk FROM p WHERE q_lab = c_lab)
        |  WHERE rnk = 1),
        |neg AS (SELECT q_id, c_id AS neg_id, cos AS neg_cos
        |  FROM (SELECT *, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos DESC, c_id) AS rnk FROM p WHERE q_lab <> c_lab)
        |  WHERE rnk = 1)
        |SELECT pos.q_id, label, pos_id, pos_cos, neg_id, neg_cos,
        |  pos_cos - neg_cos AS margin
        |FROM pos JOIN neg ON pos.q_id = neg.q_id
        |ORDER BY pos.q_id""".stripMargin,

    // Both legs reuse the exact q28/q35 oracle texts as nested CTEs: the
    // recall number is a pure function of two already-proven replays.
    "q192_ann_recall" ->
      s"""WITH ex AS (
        |${OraclesExt.knnSql}
        |),
        |iv AS (
        |${OraclesExt.annIvfSql}
        |),
        |hits AS (SELECT iv.q_id, CAST(count(*) AS BIGINT) AS h
        |  FROM iv JOIN ex ON iv.q_id = ex.q_id AND iv.c_id = ex.c_id
        |  GROUP BY 1),
        |qs AS (SELECT DISTINCT q_id FROM ex)
        |SELECT CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(coalesce(sum(h), 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(sum(h), 0) AS DOUBLE)
        |    / (10.0 * CAST(count(*) AS DOUBLE)) AS recall_at_10
        |FROM qs LEFT JOIN hits USING (q_id)""".stripMargin,

    "q193_quantile_norm" ->
      """WITH h AS (SELECT CAST(l_quantity AS BIGINT) AS v,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |c AS (SELECT v, cnt,
        |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS below,
        |    (SELECT CAST(sum(cnt) AS BIGINT) FROM h) AS n
        |  FROM h)
        |SELECT v AS l_quantity, cnt,
        |  CAST(below AS DOUBLE) / CAST(n - 1 AS DOUBLE) AS pct_rank
        |FROM c
        |ORDER BY l_quantity""".stripMargin,

    // Precision/recall of the q49 LSH replay vs the q29 brute force —
    // both legs reuse their proven oracle texts as nested CTEs.
    "q194_neardup_eval" ->
      s"""WITH ex AS (
        |${OraclesExt.embedNearDupSql}
        |),
        |ap AS (
        |${OraclesExt.embedLshSql}
        |),
        |co AS (SELECT CAST(count(*) AS BIGINT) AS n_common
        |  FROM ap JOIN ex ON ap.a_id = ex.a_id AND ap.b_id = ex.b_id)
        |SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM ex) AS n_exact,
        |  (SELECT CAST(count(*) AS BIGINT) FROM ap) AS n_approx,
        |  n_common,
        |  CASE WHEN (SELECT count(*) FROM ap) > 0 THEN
        |    CAST(n_common AS DOUBLE)
        |      / CAST((SELECT count(*) FROM ap) AS DOUBLE) END AS precision,
        |  CASE WHEN (SELECT count(*) FROM ex) > 0 THEN
        |    CAST(n_common AS DOUBLE)
        |      / CAST((SELECT count(*) FROM ex) AS DOUBLE) END AS recall
        |FROM co""".stripMargin,

    "q195_k_anonymity" ->
      """WITH g AS (SELECT o_orderpriority, o_orderdate,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_small_groups,
        |    CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT)
        |      AS rows_at_risk,
        |    CAST(sum(c) AS BIGINT) AS n_rows
        |  FROM g)
        |SELECT n_groups, n_small_groups, rows_at_risk, n_rows,
        |  CAST(rows_at_risk AS DOUBLE) / CAST(n_rows AS DOUBLE) AS risk_share
        |FROM a""".stripMargin,

    // Confusion matrix on top of the q22 language-ID replay (nested CTE).
    "q196_lang_confusion" ->
      s"""WITH q22 AS (
        |${OraclesExt.langIdSql}
        |),
        |cell AS (SELECT lang, predicted_lang, CAST(count(*) AS BIGINT) AS n
        |  FROM q22 GROUP BY 1, 2)
        |SELECT lang, predicted_lang, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE) AS share_of_lang
        |FROM cell
        |ORDER BY lang, predicted_lang""".stripMargin,

    "q197_selectivity" -> {
      val preds = Seq((5L, 15L), (20L, 30L), (1L, 50L), (40L, 45L))
      val acts = preds.zipWithIndex.map { case ((a, b), i) =>
        s"CAST(sum(CASE WHEN v BETWEEN $a AND $b THEN 1 ELSE 0 END) AS BIGINT) AS act_$i"
      }.mkString(",\n  ")
      val rows = preds.zipWithIndex.map { case ((a, b), i) =>
        val est = s"n * ($b - $a + 1) // (hi - lo + 1)"
        s"""SELECT CAST($a AS BIGINT) AS pred_lo, CAST($b AS BIGINT) AS pred_hi,
           |  CAST($est AS BIGINT) AS est_rows, act_$i AS actual_rows,
           |  CASE WHEN $est > 0 THEN
           |    CAST(act_$i AS DOUBLE) / CAST($est AS DOUBLE) END AS actual_over_est
           |FROM a""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH a AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(min(v) AS BIGINT) AS lo, CAST(max(v) AS BIGINT) AS hi,
         |  $acts
         |  FROM (SELECT CAST(l_quantity AS BIGINT) AS v FROM lineitem))
         |$rows
         |ORDER BY pred_lo, pred_hi""".stripMargin
    },

    // Same deferred-divide cell identity; the chi2 sum is the identical
    // sorted-list fold (float addition doesn't commute, sorted folds do).
    "q198_cramers_v" ->
      """WITH cells AS (SELECT o_orderpriority AS r,
        |    EXTRACT(year FROM o_orderdate) AS c,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rn FROM cells GROUP BY 1),
        |ct AS (SELECT c, CAST(sum(o) AS BIGINT) AS cn FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(sum(o) AS BIGINT) AS n,
        |    CAST(count(DISTINCT r) AS BIGINT) AS rl,
        |    CAST(count(DISTINCT c) AS BIGINT) AS cl
        |  FROM cells),
        |terms AS (SELECT cells.r, cells.c, n, rl, cl,
        |    (CAST(o * n - rn * cn AS DOUBLE) * CAST(o * n - rn * cn AS DOUBLE))
        |      / CAST(rn * cn * n AS DOUBLE) AS t
        |  FROM cells JOIN rt USING (r) JOIN ct USING (c) CROSS JOIN tot),
        |agg AS (SELECT n, rl AS r_levels, cl AS c_levels,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |      list_transform(
        |        list_sort(list({'r': r, 'c': c, 't': t})),
        |        x -> x.t)),
        |      (a, x) -> a + x) AS chi2
        |  FROM terms GROUP BY 1, 2, 3)
        |SELECT n, r_levels, c_levels, chi2,
        |  sqrt(chi2 / CAST(n * least(r_levels - 1, c_levels - 1) AS DOUBLE))
        |    AS cramers_v
        |FROM agg""".stripMargin,

    "q199_ctfidf" -> {
      val lg = OraclesExt.lgSqlOf _
      s"""WITH toks AS (SELECT lang, doc_id, unnest(string_split(text, ' ')) AS t
        |  FROM documents),
        |tf AS (SELECT lang, t, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df
        |  FROM (SELECT DISTINCT doc_id, t FROM toks) GROUP BY 1),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |scored AS (SELECT lang, t, tf.tf, df.df,
        |    CAST(tf.tf AS DOUBLE) * (${lg("n_docs")} - ${lg("df.df")}) AS score
        |  FROM tf JOIN df USING (t) CROSS JOIN nd),
        |ranked AS (SELECT lang, t AS term, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY score DESC, t) AS BIGINT) AS rnk
        |  FROM scored)
        |SELECT lang, term, tf, df, score, rnk
        |FROM ranked WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin
    },

    "q200_events_report" ->
      """WITH base AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |    CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types,
        |    CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 3600000000
        |      AS BIGINT) AS span_hours
        |  FROM events),
        |peak AS (SELECT CAST(max(c) AS BIGINT) AS peak_hour_events FROM (
        |  SELECT count(*) AS c FROM events GROUP BY date_trunc('hour', ts))),
        |pu AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |hist AS (SELECT c, CAST(count(*) AS BIGINT) AS w FROM pu GROUP BY 1),
        |med AS (SELECT CAST(min(CASE WHEN cum * 2 >= nu THEN c END) AS BIGINT)
        |    AS median_events_per_user
        |  FROM (SELECT c, sum(w) OVER (ORDER BY c
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |      (SELECT count(*) FROM pu) AS nu
        |    FROM hist))
        |SELECT 'median_events_per_user' AS metric,
        |  median_events_per_user AS value FROM med
        |UNION ALL SELECT 'n_event_types', n_event_types FROM base
        |UNION ALL SELECT 'n_events', n_events FROM base
        |UNION ALL SELECT 'n_users', n_users FROM base
        |UNION ALL SELECT 'peak_hour_events', peak_hour_events FROM base
        |  CROSS JOIN peak
        |UNION ALL SELECT 'span_hours', span_hours FROM base
        |ORDER BY metric""".stripMargin,

    "q201_skew_report" ->
      """WITH k AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS n_keys FROM k)
        |SELECT key, cnt,
        |  CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS share,
        |  CAST(cnt * n_keys * 1000000 // n AS BIGINT) AS x_mean_x1e6
        |FROM k CROSS JOIN t
        |ORDER BY cnt DESC, key
        |LIMIT 10""".stripMargin,

    "q202_lateness_audit" ->
      """WITH l AS (SELECT
        |    greatest(coalesce(
        |      max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - epoch_us(ts), 0), 0) AS late_us
        |  FROM events)
        |SELECT CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_late,
        |  CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_1min,
        |  CAST(sum(CASE WHEN late_us > 120000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_2min,
        |  CAST(sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS drop_5min,
        |  CAST(max(late_us) AS BIGINT) AS max_late_us,
        |  CAST(sum(CASE WHEN late_us > 120000000 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS drop_2min_share
        |FROM l""".stripMargin,

    "q203_kwic" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |p AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS i FROM d)
        |SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |  array_to_string(w[greatest(i - 3, 1):least(i + 3, len(w))], ' ')
        |    AS context
        |FROM p WHERE w[i] = 'merge'
        |ORDER BY doc_id, pos""".stripMargin,

    "q204_exact_variance" ->
      """SELECT l_returnflag, n, variance, sqrt(variance) AS stddev FROM (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE)
        |      / CAST(count(*) * (count(*) - 1) AS DOUBLE) AS variance
        |  FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x
        |        FROM lineitem)
        |  GROUP BY 1)
        |ORDER BY l_returnflag""".stripMargin,

    "q205_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |      THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1),
        |arms AS (SELECT user_id % 2 AS variant, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(converted) AS BIGINT) AS c
        |  FROM u GROUP BY 1),
        |ab AS (SELECT
        |    (SELECT n FROM arms WHERE variant = 0) AS n1,
        |    (SELECT c FROM arms WHERE variant = 0) AS c1,
        |    (SELECT n FROM arms WHERE variant = 1) AS n2,
        |    (SELECT c FROM arms WHERE variant = 1) AS c2),
        |z AS (SELECT n1, c1, n2, c2,
        |    CASE WHEN c1 + c2 > 0 AND c1 + c2 < n1 + n2 THEN
        |      (CAST(c1 * n2 - c2 * n1 AS DOUBLE) *
        |       CAST(c1 * n2 - c2 * n1 AS DOUBLE))
        |        * CAST(n1 + n2 AS DOUBLE)
        |        / CAST(n1 * n2 * (c1 + c2) AS DOUBLE)
        |        / CAST(n1 + n2 - c1 - c2 AS DOUBLE) END AS z2
        |  FROM ab)
        |SELECT n1, c1, n2, c2, z2, z2 > 3.841458820694124 AS significant_95
        |FROM z""".stripMargin,

    "q206_catalog_profile" -> {
      val tables = Seq(
        "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
          "c_mktsegment"),
        "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
          "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
          "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
        "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority"))
      tables.flatMap { case (t, cols) =>
        cols.map { c =>
          s"""SELECT '$t' AS table_name, '$c' AS column_name,
             |  CAST(count(*) AS BIGINT) AS n_rows,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_nulls
             |FROM $t""".stripMargin
        }
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name, column_name")
    })
}
