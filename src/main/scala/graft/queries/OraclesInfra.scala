package graft.queries

/**
 * DuckDB mirrors for [[CatalogInfra]]. The Poisson thresholds, the
 * 2³² fold, and the ln2 literal are shared constants with the engine
 * side; every divide keeps the engine's parenthesization.
 */
object OraclesInfra {

  private val lg = OraclesExt.lgSqlOf _

  val all: Map[String, String] = Map(
    "q231_poisson_boot" ->
      """WITH point AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS sx FROM documents),
        |reps AS (SELECT doc_id, n_chars, r.b AS b,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
        |      CAST(r.b AS VARCHAR)), 1, 8))::BIGINT AS u
        |  FROM documents CROSS JOIN (SELECT unnest(range(32)) AS b) r),
        |wts AS (SELECT b, n_chars,
        |    CASE WHEN u < 1580030168 THEN 0
        |         WHEN u < 3160060337 THEN 1
        |         WHEN u < 3950075421 THEN 2
        |         WHEN u < 4213413783 THEN 3
        |         WHEN u < 4279248373 THEN 4
        |         WHEN u < 4292415291 THEN 5
        |         WHEN u < 4294609777 THEN 6
        |         WHEN u < 4294923276 THEN 7
        |         ELSE 8 END AS w
        |  FROM reps),
        |means AS (SELECT b,
        |    CAST(CAST(sum(w * n_chars) AS BIGINT) AS DOUBLE) /
        |      CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS m
        |  FROM wts GROUP BY 1 HAVING CAST(sum(w) AS BIGINT) > 0),
        |ms AS (SELECT list(m ORDER BY m) AS ml FROM means)
        |SELECT n_docs, CAST(32 AS BIGINT) AS n_reps,
        |  CAST(sx AS DOUBLE) / CAST(n_docs AS DOUBLE) AS point_mean,
        |  ml[2] AS boot_lo, ml[31] AS boot_hi
        |FROM ms CROSS JOIN point""".stripMargin,

    "q232_compaction" ->
      """WITH files AS (SELECT source, lang,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1, 2),
        |assigned AS (SELECT *,
        |    CAST(coalesce(sum(bytes) OVER (ORDER BY bytes DESC, source, lang
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_before
        |  FROM files),
        |binned AS (SELECT *,
        |    CAST(floor(CAST(cum_before AS DOUBLE) / 65536) AS BIGINT) AS bin
        |  FROM assigned)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |  CAST(sum(bytes) AS BIGINT) AS total_bytes,
        |  CAST(CAST(sum(bytes) AS BIGINT) AS DOUBLE) / 65536.0 AS fill_ratio
        |FROM binned GROUP BY 1 ORDER BY bin""".stripMargin,

    "q233_shard_assign" ->
      """WITH docs AS (SELECT doc_id, n_chars,
        |    ('0x' || substr(md5('epoch0:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 16 AS shard
        |  FROM documents),
        |shards AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS bytes
        |  FROM docs GROUP BY 1),
        |tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS tb FROM shards)
        |SELECT shard, n_docs, bytes,
        |  CAST(bytes * 16 AS DOUBLE) / CAST(tb AS DOUBLE) AS load_ratio
        |FROM shards CROSS JOIN tot ORDER BY shard""".stripMargin,

    "q234_dp_counts" -> {
      s"""WITH byl AS (SELECT lang, CAST(count(*) AS BIGINT) AS true_count
         |  FROM documents GROUP BY 1),
         |seeded AS (SELECT lang, true_count,
         |    2 * ('0x' || substr(md5('dp:' || lang), 1, 8))::BIGINT
         |      - 4294967296 AS d
         |  FROM byl),
         |noised AS (SELECT lang, true_count,
         |    CASE WHEN d = 0 THEN 0.0 ELSE
         |      CAST(sign(d) AS DOUBLE) * (0.0 -
         |        (${lg("greatest(4294967296 - abs(d), 1)")} - 32.0)) *
         |        0.6931471805599453 / 1.0 END AS noise
         |  FROM seeded)
         |SELECT lang, true_count, noise,
         |  CAST(true_count AS DOUBLE) + noise AS noisy_count,
         |  1.0 AS epsilon
         |FROM noised ORDER BY lang""".stripMargin
    })
}
