package graft.queries

/**
 * DuckDB oracle SQL for the round-10 indexing & synopsis wave
 * ([[CatalogIdx]]). Brute-force / window-function formulations of the
 * same math: suffix ranks by literally sorting suffix strings, BWT by
 * per-doc suffix sort, skyline by the global later-max sweep, winnowing
 * by the same OR-of-frames argmin rule, t-closeness and Haar by the
 * identical integer pipelines. MATERIALIZED on every loop-carried or
 * reused CTE (the graft-oracle-determinism rule).
 */
object OraclesIdx {

  /** Winnowing selection clause: pos is the key-argmin of some full
    * window covering it — OR over the w backward extents, each two fixed
    * ROWS frames (mirrors CatalogIdx.winnowingPrints). */
  private def winnowSelect(w: Int): String =
    (0 until w).map { j =>
      val back =
        if (j == 0) ""
        else
          s""" AND min(wk) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN $j PRECEDING AND 1 PRECEDING) > wk""".stripMargin
      val fwd =
        if (j == w - 1) ""
        else
          s""" AND min(wk) OVER (PARTITION BY doc_id ORDER BY pos
             |    ROWS BETWEEN 1 FOLLOWING AND ${w - 1 - j} FOLLOWING) > wk""".stripMargin
      s"(pos - $j >= 1 AND pos - $j <= gmax - ${w - 1}$back$fwd)"
    }.mkString("\n    OR ")

  /** The 12 Haar levels, unrolled and MATERIALIZED (each level reads the
    * previous one once; sums cast back to BIGINT — DuckDB sum(BIGINT)
    * widens to HUGEINT). */
  private def haarLevels: String =
    (1 to 12).map { k =>
      s"""l$k AS MATERIALIZED (SELECT x.i // 2 AS i,
         |  CAST(sum(x.sv) AS BIGINT) AS sv,
         |  CAST(sum(CASE WHEN x.i % 2 = 0 THEN x.sv ELSE -x.sv END) AS BIGINT) AS dv
         |  FROM l${k - 1} x GROUP BY x.i // 2)""".stripMargin
    }.mkString(",\n")

  private def haarCand: String =
    (1 to 12).map { k =>
      val den = (1L << k).toDouble
      s"""SELECT 'd' AS kind, CAST($k AS BIGINT) AS level, i AS idx,
         |  dv AS coeff, CAST(dv AS DOUBLE) * dv / $den AS energy FROM l$k""".stripMargin
    }.mkString("\n  UNION ALL ") +
      s"""
         |  UNION ALL SELECT 'a' AS kind, CAST(12 AS BIGINT) AS level, i AS idx,
         |  sv AS coeff, CAST(sv AS DOUBLE) * sv / 4096.0 AS energy FROM l12""".stripMargin

  val all: Map[String, String] = Map(

    "q396_suffix_ranks" ->
      """WITH s0 AS MATERIALIZED (
        |  SELECT doc_id, text,
        |    unnest(generate_series(1, length(text))) AS p
        |  FROM documents WHERE length(text) >= 1),
        |s AS MATERIALIZED (
        |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
        |    substring(text, CAST(p AS INT)) AS suf FROM s0)
        |SELECT doc_id, pos,
        |  CAST(row_number() OVER (ORDER BY suf, doc_id, pos) AS BIGINT)
        |    AS suffix_rank
        |FROM s""".stripMargin,

    "q397_bwt_runs" ->
      """WITH s0 AS MATERIALIZED (
        |  SELECT doc_id, text || chr(9) AS t,
        |    unnest(generate_series(1, length(text) + 1)) AS p
        |  FROM documents),
        |sf AS MATERIALIZED (
        |  SELECT doc_id,
        |    CASE WHEN p = 1 THEN substring(t, length(t), 1)
        |         ELSE substring(t, CAST(p AS INT) - 1, 1) END AS bc,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY substring(t, CAST(p AS INT))) AS rk
        |  FROM s0),
        |lg AS MATERIALIZED (
        |  SELECT doc_id, bc, rk,
        |    lag(bc) OVER (PARTITION BY doc_id ORDER BY rk) AS pb FROM sf)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN pb IS NULL OR pb <> bc THEN 1 ELSE 0 END)
        |    AS BIGINT) AS bwt_runs,
        |  string_agg(CASE WHEN rk <= 24 THEN bc END, '' ORDER BY rk)
        |    AS bwt_head
        |FROM lg GROUP BY doc_id""".stripMargin,

    "q398_skyline" ->
      """WITH o AS MATERIALIZED (SELECT o_orderkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS p,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS BIGINT) AS dd
        |  FROM orders),
        |m AS (SELECT o_orderkey, p, d,
        |    max(p) OVER (ORDER BY dd
        |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ml,
        |    max(p) OVER (PARTITION BY dd) AS me
        |  FROM o)
        |SELECT o_orderkey, p, strftime(d, '%Y-%m-%d') AS d_str
        |FROM m WHERE (ml IS NULL OR ml < p) AND me <= p""".stripMargin,

    "q399_winnowing" ->
      s"""WITH gu AS MATERIALIZED (
         |  SELECT doc_id, text,
         |    unnest(generate_series(1, length(text) - 7)) AS p
         |  FROM documents WHERE length(text) >= 8),
         |g0 AS MATERIALIZED (
         |  SELECT doc_id, CAST(p AS BIGINT) AS pos,
         |    ('0x' || substr(md5(substring(text, CAST(p AS INT), 8)), 1, 10))::BIGINT AS h
         |  FROM gu),
         |g AS MATERIALIZED (
         |  SELECT doc_id, pos, h, h * 1048576 + (1048576 - pos) AS wk,
         |    max(pos) OVER (PARTITION BY doc_id) AS gmax
         |  FROM g0),
         |sel AS MATERIALIZED (
         |  SELECT doc_id, pos, h FROM (
         |    SELECT doc_id, pos, h, gmax, wk,
         |      ${winnowSelect(12)} AS keep
         |    FROM g) WHERE keep),
         |pd AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_prints,
         |  bit_xor(h) AS fp_xor FROM sel GROUP BY doc_id),
         |sd AS MATERIALIZED (SELECT DISTINCT doc_id, h FROM sel),
         |hdf AS (SELECT h, CAST(count(*) AS BIGINT) AS hdf FROM sd GROUP BY h),
         |sh AS (SELECT sd.doc_id, CAST(count(*) AS BIGINT) AS nsp
         |  FROM sd JOIN hdf ON hdf.h = sd.h WHERE hdf.hdf >= 2
         |  GROUP BY sd.doc_id)
         |SELECT pd.doc_id, pd.n_prints, pd.fp_xor,
         |  coalesce(sh.nsp, CAST(0 AS BIGINT)) AS n_shared_prints
         |FROM pd LEFT JOIN sh ON sh.doc_id = pd.doc_id""".stripMargin,

    "q400_tcloseness" ->
      """WITH base AS MATERIALIZED (
        |  SELECT c_custkey AS id, c_mktsegment AS segment, r_name AS region,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS N FROM base),
        |dix AS MATERIALIZED (
        |  SELECT segment, region,
        |    ((row_number() OVER (ORDER BY bal, id) - 1) * 10) // N + 1 AS dc
        |  FROM base CROSS JOIN tot),
        |ca AS (SELECT dc, CAST(count(*) AS BIGINT) AS ca FROM dix GROUP BY 1),
        |cumall AS (SELECT dc, CAST(sum(ca) OVER (ORDER BY dc
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_all FROM ca),
        |grp AS (SELECT segment, region, CAST(count(*) AS BIGINT) AS n_g
        |  FROM dix GROUP BY 1, 2),
        |grid AS (SELECT grp.segment, grp.region, grp.n_g,
        |    CAST(gs.d AS BIGINT) AS dc
        |  FROM grp, generate_series(1, 10) AS gs(d)),
        |gc AS (SELECT segment, region, dc, CAST(count(*) AS BIGINT) AS cg
        |  FROM dix GROUP BY 1, 2, 3),
        |cum AS MATERIALIZED (SELECT grid.segment, grid.region, grid.n_g, grid.dc,
        |    CAST(sum(coalesce(gc.cg, 0)) OVER (
        |      PARTITION BY grid.segment, grid.region ORDER BY grid.dc
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_g
        |  FROM grid LEFT JOIN gc ON gc.segment = grid.segment
        |    AND gc.region = grid.region AND gc.dc = grid.dc)
        |SELECT cum.segment, cum.region, cum.n_g,
        |  CAST(sum(abs(cum.cum_g * tot.N - cumall.cum_all * cum.n_g))
        |    AS BIGINT) AS t_num,
        |  cum.n_g * max(tot.N) * 9 AS t_den,
        |  CAST(sum(abs(cum.cum_g * tot.N - cumall.cum_all * cum.n_g))
        |    AS DOUBLE) / CAST(cum.n_g * max(tot.N) * 9 AS DOUBLE) AS t_close
        |FROM cum JOIN cumall ON cumall.dc = cum.dc CROSS JOIN tot
        |WHERE cum.dc <= 9
        |GROUP BY cum.segment, cum.region, cum.n_g""".stripMargin,

    "q401_haar" ->
      s"""WITH o AS MATERIALIZED (SELECT CAST(o_orderdate AS DATE) AS d,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
         |d0 AS (SELECT min(d) AS d0 FROM o),
         |day AS MATERIALIZED (SELECT
         |    CAST(date_diff('day', d0.d0, o.d) AS BIGINT) AS i,
         |    CAST(sum(v) AS BIGINT) AS v
         |  FROM o CROSS JOIN d0 GROUP BY 1),
         |l0 AS MATERIALIZED (SELECT CAST(g.i AS BIGINT) AS i,
         |    coalesce(day.v, CAST(0 AS BIGINT)) AS sv
         |  FROM generate_series(0, 4095) AS g(i) LEFT JOIN day ON day.i = g.i),
         |$haarLevels,
         |cand AS (
         |  $haarCand)
         |SELECT kind, level, idx, coeff, energy FROM cand
         |ORDER BY energy DESC, level, idx, kind LIMIT 16""".stripMargin)
}
