package graft.queries

/** DuckDB mirrors for [[CatalogCur]]. Pure integer/rational arithmetic
  * throughout — the only floats are final one-divide ratios. */
object OraclesCur {

  val all: Map[String, String] = Map(

    "q381_dedup_savings" -> {
      val thresholds = (5 to 9).map { t =>
        val thr = t * 10
        s"""SELECT CAST($thr AS BIGINT) AS threshold_pct,
           |  (SELECT n_sample FROM tot) AS n_sample,
           |  CAST(count(*) AS BIGINT) AS n_removed,
           |  CAST(COALESCE(sum(n_chars), 0) AS DOUBLE)
           |    / CAST((SELECT sample_chars FROM tot) AS DOUBLE)
           |    AS savings_share
           |FROM (SELECT DISTINCT j AS doc_id FROM pairs
           |  WHERE num >= un * $thr) r
           |JOIN chars USING (doc_id)""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH samp AS (SELECT doc_id, text, n_chars FROM (
        |  SELECT doc_id, text, n_chars,
        |    ('0x' || substr(md5('ds:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS pri
        |  FROM documents) ORDER BY pri, doc_id LIMIT 200),
        |toks AS (SELECT doc_id, unnest(list_distinct(
        |    string_split(text, ' '))) AS tok FROM samp),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz
        |  FROM toks GROUP BY 1),
        |pairs AS MATERIALIZED (SELECT i, j,
        |    inter * 100 AS num, szi + szj - inter AS un
        |  FROM (SELECT a.doc_id AS i, b.doc_id AS j,
        |      CAST(count(*) AS BIGINT) AS inter
        |    FROM toks a JOIN toks b
        |      ON a.tok = b.tok AND a.doc_id < b.doc_id
        |    GROUP BY 1, 2) p
        |  JOIN (SELECT doc_id AS i, sz AS szi FROM sizes) si USING (i)
        |  JOIN (SELECT doc_id AS j, sz AS szj FROM sizes) sj USING (j)),
        |chars AS (SELECT doc_id, n_chars FROM samp),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sample,
        |    CAST(sum(n_chars) AS BIGINT) AS sample_chars FROM samp)
        |SELECT * FROM ($thresholds)
        |ORDER BY threshold_pct""".stripMargin
    },

    "q382_importance_resample" ->
      """WITH docs AS (SELECT doc_id, source,
        |    ('0x' || substr(md5('ir:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT AS u
        |  FROM documents),
        |bysrc AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
        |  FROM docs GROUP BY 1),
        |tot AS (SELECT CAST(sum(ns) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k FROM bysrc),
        |tgt AS (SELECT n // k AS t FROM tot)
        |SELECT source, max(ns) AS n_before,
        |  CAST(sum(CASE WHEN u * ns < t * 4294967296 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_after,
        |  max(t) AS n_target,
        |  CAST(sum(CASE WHEN u * ns < t * 4294967296 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(max(t) AS DOUBLE) AS achieved_ratio
        |FROM docs JOIN bysrc USING (source) CROSS JOIN tgt
        |GROUP BY source ORDER BY source""".stripMargin,

    "q383_freshness_decay" ->
      """WITH ev AS (SELECT event_type AS t, CAST(ts AS DATE) AS d
        |  FROM events),
        |mx AS (SELECT max(d) AS md FROM ev),
        |wtd AS (SELECT t, date_diff('day', d, md) // 7 AS k
        |  FROM ev CROSS JOIN mx),
        |mk AS (SELECT CAST(max(k) AS BIGINT) AS mk FROM wtd)
        |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(1 AS BIGINT) << CAST(mk - k AS INTEGER))
        |      AS DOUBLE)
        |    / CAST(CAST(1 AS BIGINT) << CAST(max(mk) AS INTEGER)
        |      AS DOUBLE) AS decayed_count
        |FROM wtd CROSS JOIN mk GROUP BY t ORDER BY t""".stripMargin,

    "q384_partition_advisor" -> {
      def stats(name: String, key: String): String =
        s"""SELECT '$name' AS candidate, CAST(count(*) AS BIGINT) AS card,
           |  CAST(sum(c) AS BIGINT) AS n,
           |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS max_share,
           |  CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
           |    / CAST(sum(c) AS DOUBLE) AS skew_ratio,
           |  CAST(abs(count(*) - 128) AS DOUBLE)
           |    * (CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
           |      / CAST(sum(c) AS DOUBLE)) AS penalty
           |FROM (SELECT $key AS k, CAST(count(*) AS BIGINT) AS c
           |  FROM orders GROUP BY 1)""".stripMargin
      val parts = Seq(
        stats("order_month", "strftime(CAST(o_orderdate AS DATE), '%Y-%m')"),
        stats("custkey_mod64", "o_custkey % 64"),
        stats("order_priority", "o_orderpriority")).mkString("\nUNION ALL\n")
      s"""WITH allc AS ($parts)
        |SELECT candidate, card, n, max_share, skew_ratio, penalty,
        |  CAST(row_number() OVER (ORDER BY penalty, candidate) AS BIGINT)
        |    AS rank
        |FROM allc ORDER BY rank""".stripMargin
    },

    "q385_fertility" ->
      """WITH d AS (SELECT lang, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM d)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS tokens,
        |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE)
        |    AS chars_per_token,
        |  CAST(sum(n_tokens) AS DOUBLE) / CAST(max(tt) AS DOUBLE)
        |    AS token_share
        |FROM d CROSS JOIN tot GROUP BY lang ORDER BY lang""".stripMargin)
}
