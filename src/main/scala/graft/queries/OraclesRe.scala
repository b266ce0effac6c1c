package graft.queries

/**
 * DuckDB oracle SQL for the round-11 reconciliation wave ([[CatalogRe]]).
 * q430 replays the same md5 mutations, 60-bit row digests, and XOR
 * bucket digests (bit_xor is order-independent in both engines, so the
 * digests are pure multiset functions); q431's medians are stated
 * implementation-independently by row_number — the engine's histogram
 * refinement must land on the identical k-th smallest.
 */
object OraclesRe {

  val all: Map[String, String] = Map(

    "q430_merkle_diff" ->
      """WITH a AS MATERIALIZED (
        |  SELECT o_orderkey AS okey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |b AS MATERIALIZED (
        |  SELECT okey,
        |    CASE WHEN ('0x' || substr(md5('upd:' || CAST(okey AS VARCHAR)),
        |        1, 8))::BIGINT % 100 = 0
        |      THEN cents + 1000 ELSE cents END AS cents
        |  FROM a
        |  WHERE NOT (('0x' || substr(md5('del:' || CAST(okey AS VARCHAR)),
        |      1, 8))::BIGINT % 100 = 0)
        |  UNION ALL
        |  SELECT okey + 1000000000, cents FROM a
        |  WHERE ('0x' || substr(md5('ins:' || CAST(okey AS VARCHAR)),
        |      1, 8))::BIGINT % 1000 = 0),
        |ha AS MATERIALIZED (SELECT okey, okey // 4096 AS bucket,
        |    ('0x' || substr(md5('o:' || CAST(okey AS VARCHAR) || '|'
        |      || CAST(cents AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM a),
        |hb AS MATERIALIZED (SELECT okey, okey // 4096 AS bucket,
        |    ('0x' || substr(md5('o:' || CAST(okey AS VARCHAR) || '|'
        |      || CAST(cents AS VARCHAR)), 1, 15))::BIGINT AS h
        |  FROM b),
        |da AS (SELECT bucket, bit_xor(h) AS xa,
        |  CAST(count(*) AS BIGINT) AS ca FROM ha GROUP BY bucket),
        |db AS (SELECT bucket, bit_xor(h) AS xb,
        |  CAST(count(*) AS BIGINT) AS cb FROM hb GROUP BY bucket),
        |chg AS MATERIALIZED (
        |  SELECT coalesce(da.bucket, db.bucket) AS bucket
        |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
        |  WHERE da.bucket IS NULL OR db.bucket IS NULL
        |    OR da.xa <> db.xb OR da.ca <> db.cb),
        |ain AS (SELECT ha.* FROM ha JOIN chg ON chg.bucket = ha.bucket),
        |bin AS (SELECT hb.* FROM hb JOIN chg ON chg.bucket = hb.bucket),
        |aonly AS MATERIALIZED (SELECT ain.* FROM ain
        |  LEFT JOIN bin ON bin.okey = ain.okey AND bin.h = ain.h
        |  WHERE bin.okey IS NULL),
        |bonly AS MATERIALIZED (SELECT bin.* FROM bin
        |  LEFT JOIN ain ON ain.okey = bin.okey AND ain.h = bin.h
        |  WHERE ain.okey IS NULL),
        |kinds AS (
        |  SELECT bucket, 'u' AS kind FROM aonly
        |    WHERE okey IN (SELECT okey FROM bonly)
        |  UNION ALL
        |  SELECT bucket, 'd' FROM aonly
        |    WHERE okey NOT IN (SELECT okey FROM bonly)
        |  UNION ALL
        |  SELECT bucket, 'i' FROM bonly
        |    WHERE okey NOT IN (SELECT okey FROM aonly))
        |SELECT bucket,
        |  CAST(sum(CASE WHEN kind = 'd' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_deleted,
        |  CAST(sum(CASE WHEN kind = 'i' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inserted,
        |  CAST(sum(CASE WHEN kind = 'u' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_updated
        |FROM kinds GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q435_coord_sample" ->
      """WITH o AS MATERIALIZED (
        |  SELECT o_orderkey, o_orderpriority FROM orders
        |  WHERE ('0x' || substr(md5('cs:' || CAST(o_orderkey AS VARCHAR)),
        |    1, 8))::BIGINT % 100 < 5),
        |lc AS MATERIALIZED (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS nl FROM lineitem
        |  WHERE ('0x' || substr(md5('cs:' || CAST(l_orderkey AS VARCHAR)),
        |    1, 8))::BIGINT % 100 < 5
        |  GROUP BY l_orderkey)
        |SELECT o.o_orderpriority AS priority,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(coalesce(lc.nl, 0)) AS BIGINT) AS n_lines,
        |  CAST(sum(coalesce(lc.nl, 0)) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS mean_basket
        |FROM o LEFT JOIN lc ON lc.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY priority""".stripMargin,

    "q431_mad_outliers" ->
      """WITH c AS MATERIALIZED (
        |  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
        |med AS (SELECT r.c AS m
        |  FROM (SELECT c, row_number() OVER (ORDER BY c) AS rn FROM c) r, nn
        |  WHERE r.rn = (nn.n + 1) // 2),
        |dv AS MATERIALIZED (SELECT abs(c.c - med.m) AS d FROM c, med),
        |mad AS (SELECT r.d AS md
        |  FROM (SELECT d, row_number() OVER (ORDER BY d) AS rn FROM dv) r, nn
        |  WHERE r.rn = (nn.n + 1) // 2)
        |SELECT med.m AS median_cents, mad.md AS mad_cents,
        |  5 * mad.md AS threshold, nn.n AS n,
        |  CAST(sum(CASE WHEN c.c < med.m - 5 * mad.md THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_low,
        |  CAST(sum(CASE WHEN c.c > med.m + 5 * mad.md THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_high
        |FROM c, med, mad, nn
        |GROUP BY med.m, mad.md, nn.n""".stripMargin)
}
