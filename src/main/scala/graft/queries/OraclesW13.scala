package graft.queries

/**
 * DuckDB oracles for the round-13 waves (q448–q455). Mirror rules as ever:
 * identical md5 draws, integer arithmetic until stated divides, `//`
 * for Spark's `div` (all operands non-negative here), fixed-order
 * folds where doubles accumulate. q449 replays the bitset BFS as a
 * recursive CTE whose working table is the per-round mask frame —
 * bit_or/bit_count/shift semantics agree exactly on BIGINT.
 */
object OraclesW13 {

  private val amsSign =
    """CASE WHEN ('0x' || substr(md5('ams:' || CAST(j.j AS VARCHAR) ||
      |        ':' || CAST(fv.v AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
      |      THEN fv.f ELSE -fv.f END""".stripMargin

  val all: Map[String, String] = Map(

    "q448_ams_join_size" ->
      s"""WITH fa AS MATERIALIZED (
         |  SELECT user_id AS v, CAST(count(*) AS BIGINT) AS f
         |  FROM events GROUP BY 1),
         |fb AS MATERIALIZED (
         |  SELECT o_custkey AS v, CAST(count(*) AS BIGINT) AS f
         |  FROM orders GROUP BY 1),
         |js AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j),
         |sa AS MATERIALIZED (SELECT j, CAST(sum(sf) AS BIGINT) AS s_a FROM (
         |  SELECT j.j AS j, $amsSign AS sf FROM fa fv, js j) GROUP BY 1),
         |sb AS MATERIALIZED (SELECT j, CAST(sum(sf) AS BIGINT) AS s_b FROM (
         |  SELECT j.j AS j, $amsSign AS sf FROM fb fv, js j) GROUP BY 1),
         |ex AS (SELECT CAST(coalesce(sum(fa.f * fb.f), 0) AS BIGINT)
         |    AS join_exact
         |  FROM fa JOIN fb ON fa.v = fb.v)
         |SELECT sa.j, s_a, s_b, s_a * s_b AS est_join, join_exact,
         |  CAST(s_a * s_b AS DOUBLE) / CAST(join_exact AS DOUBLE) AS ratio
         |FROM sa JOIN sb ON sa.j = sb.j, ex ORDER BY sa.j""".stripMargin,

    "q449_multi_source_bfs" ->
      """WITH RECURSIVE und AS MATERIALIZED (
        |  SELECT u, v FROM (
        |    SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |  UNION ALL
        |  SELECT v, u FROM (
        |    SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
        |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey)),
        |m(h, node, mask) AS (
        |  SELECT 0 AS h, node,
        |    CAST(1 AS BIGINT) << CAST(rn - 1 AS INT) AS mask
        |  FROM (
        |    SELECT node, row_number() OVER (
        |        ORDER BY md5('bfs:' || CAST(node AS VARCHAR)), node) AS rn
        |    FROM (SELECT DISTINCT u AS node FROM und))
        |  WHERE rn <= 63
        |  UNION ALL
        |  SELECT h + 1 AS h, node, bit_or(mask) AS mask FROM (
        |    SELECT m.h AS h, und.u AS node, m.mask AS mask
        |    FROM m JOIN und ON m.node = und.v
        |    UNION ALL
        |    SELECT h, node, mask FROM m
        |  ) WHERE h < 8
        |  GROUP BY h, node
        |)
        |SELECT CAST(h AS BIGINT) AS h,
        |  CAST(count(*) AS BIGINT) AS nodes_reached,
        |  CAST(sum(bit_count(mask)) AS BIGINT) AS pairs_reached
        |FROM m GROUP BY h ORDER BY h""".stripMargin,

    "q450_stable_matching" ->
      """WITH RECURSIVE
        |props AS MATERIALIZED (SELECT p FROM (
        |  SELECT c_custkey AS p, row_number() OVER (
        |    ORDER BY md5('gsP:' || CAST(c_custkey AS VARCHAR)), c_custkey)
        |    AS rn FROM customer) WHERE rn <= 16),
        |accs AS MATERIALIZED (SELECT a FROM (
        |  SELECT s_suppkey AS a, row_number() OVER (
        |    ORDER BY md5('gsA:' || CAST(s_suppkey AS VARCHAR)), s_suppkey)
        |    AS rn FROM supplier) WHERE rn <= 8),
        |prefs AS MATERIALIZED (SELECT p AS pp, prank, a AS target FROM (
        |  SELECT p, a, row_number() OVER (PARTITION BY p ORDER BY
        |    ('0x' || substr(md5('gsp:' || CAST(p AS VARCHAR) || ':' ||
        |      CAST(a AS VARCHAR)), 1, 8))::BIGINT DESC, a) AS prank
        |  FROM props, accs)),
        |st(h, p, idx, ma) AS (
        |  SELECT 0, p, CAST(1 AS BIGINT), CAST(NULL AS BIGINT) FROM props
        |  UNION ALL
        |  SELECT h + 1, p,
        |    idx + CASE WHEN proposed AND rn <> 1 THEN 1 ELSE 0 END,
        |    CASE WHEN contend_a IS NOT NULL AND rn = 1 THEN contend_a
        |      ELSE NULL END
        |  FROM (
        |    SELECT h, p, idx, proposed, contend_a,
        |      row_number() OVER (PARTITION BY contend_a ORDER BY
        |        ('0x' || substr(md5('gsa:' || CAST(p AS VARCHAR) || ':' ||
        |          CAST(contend_a AS VARCHAR)), 1, 8))::BIGINT DESC, p) AS rn
        |    FROM (
        |      SELECT st.h AS h, st.p AS p, st.idx AS idx,
        |        (st.ma IS NULL AND st.idx <= 8) AS proposed,
        |        CASE WHEN st.ma IS NULL AND st.idx <= 8 THEN pr.target
        |          ELSE st.ma END AS contend_a
        |      FROM st LEFT JOIN prefs pr
        |        ON pr.pp = st.p AND pr.prank = st.idx))
        |  WHERE h < 258)
        |SELECT f.p AS proposer, f.ma AS acceptor, pr.prank AS p_rank
        |FROM (SELECT p, ma FROM st WHERE h = 258) f
        |LEFT JOIN prefs pr ON pr.pp = f.p AND pr.target = f.ma
        |ORDER BY proposer""".stripMargin,

    "q451_allen_relations" ->
      s"""WITH iv AS MATERIALIZED (
         |  SELECT o.o_custkey AS ck, o.o_orderkey AS okey,
         |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
         |      AS sd,
         |    greatest(CAST(max(CAST(l.l_shipdate AS DATE)) - DATE '1970-01-01'
         |      AS BIGINT), CAST(CAST(o.o_orderdate AS DATE)
         |      - DATE '1970-01-01' AS BIGINT)) AS ed
         |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
         |  GROUP BY 1, 2, 3)
         |SELECT relation, CAST(count(*) AS BIGINT) AS n_pairs FROM (
         |  SELECT ${CatalogW13.AllenCase} AS relation
         |  FROM (SELECT a.ck, a.sd AS s1, a.ed AS e1, b.sd AS s2, b.ed AS e2
         |    FROM iv a JOIN iv b ON a.ck = b.ck AND a.okey < b.okey))
         |GROUP BY relation ORDER BY relation""".stripMargin,

    "q452_dod_compression" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
        |d1t AS (SELECT user_id, event_id, t,
        |    t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
        |      AS d1 FROM ev),
        |dd AS (SELECT user_id, d1,
        |    coalesce(d1 - lag(d1) OVER (
        |      PARTITION BY user_id ORDER BY t, event_id), d1) AS dod
        |  FROM d1t),
        |b AS (SELECT user_id, d1,
        |    CASE WHEN dod >= 0 THEN dod * 2 ELSE dod * -2 - 1 END AS zz
        |  FROM dd)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) * 64 AS BIGINT) AS raw_bits,
        |  CAST(sum(CASE WHEN d1 IS NULL THEN 64
        |    ELSE length(bin(zz)) + 6 END) AS BIGINT) AS enc_bits,
        |  CAST(sum(CASE WHEN d1 IS NULL THEN 64
        |    ELSE length(bin(zz)) + 6 END) AS DOUBLE)
        |    / CAST(count(*) * 64 AS DOUBLE) AS ratio
        |FROM b GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q453_linear_counting" -> {
      def lg(x: String) = OraclesExt.lgSqlOf(x)
      s"""WITH tu AS (SELECT DISTINCT event_type AS t, user_id AS u
         |  FROM events),
         |words AS (SELECT t, pos // 63 AS w,
         |    bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS m
         |  FROM (SELECT t,
         |      ('0x' || substr(md5('lc:' || CAST(u AS VARCHAR)), 1, 8))::BIGINT
         |        % 1071 AS pos
         |    FROM tu) GROUP BY 1, 2),
         |sb AS (SELECT t, CAST(sum(bit_count(m)) AS BIGINT) AS set_bits
         |  FROM words GROUP BY 1),
         |ex AS (SELECT t, CAST(count(*) AS BIGINT) AS n_exact
         |  FROM tu GROUP BY 1)
         |SELECT sb.t AS event_type, CAST(1071 AS BIGINT) AS m, set_bits,
         |  1071 - set_bits AS zero_bits, n_exact,
         |  CASE WHEN 1071 - set_bits > 0 THEN
         |    (CAST(1071 AS DOUBLE) * CAST(0.6931471805599453 AS DOUBLE))
         |      * (${lg("1071")} - ${lg("(1071 - set_bits)")})
         |  ELSE NULL END AS est_lc
         |FROM sb JOIN ex ON sb.t = ex.t ORDER BY event_type""".stripMargin
    },

    "q454_misra_gries" ->
      """WITH RECURSIVE panel AS MATERIALIZED (
        |  SELECT event_type AS series,
        |    'u' || CAST(user_id % 13 AS VARCHAR) AS item,
        |    row_number() OVER (PARTITION BY event_type ORDER BY event_id)
        |      AS i
        |  FROM (SELECT event_id, event_type, user_id,
        |      row_number() OVER (
        |        ORDER BY md5('mg:' || CAST(event_id AS VARCHAR)), event_id)
        |        AS rnk FROM events)
        |  WHERE rnk <= 2000),
        |st(h, series, counters, n) AS (
        |  SELECT 0, series, CAST([] AS STRUCT(item VARCHAR, cnt BIGINT)[]),
        |    CAST(0 AS BIGINT)
        |  FROM (SELECT DISTINCT series FROM panel)
        |  UNION ALL
        |  SELECT h + 1, series,
        |    CASE
        |      WHEN aitem IS NULL THEN counters
        |      WHEN len(list_filter(counters, c -> c.item = aitem)) > 0 THEN
        |        list_transform(counters, c -> CASE WHEN c.item = aitem
        |          THEN {'item': c.item, 'cnt': c.cnt + 1} ELSE c END)
        |      WHEN len(counters) < 8 THEN
        |        list_append(counters, {'item': aitem,
        |          'cnt': CAST(1 AS BIGINT)})
        |      ELSE list_filter(
        |        list_transform(counters,
        |          c -> {'item': c.item, 'cnt': c.cnt - 1}),
        |        c -> c.cnt > 0)
        |    END,
        |    n + CASE WHEN aitem IS NULL THEN 0 ELSE 1 END
        |  FROM (
        |    SELECT st.h AS h, st.series AS series, st.counters AS counters,
        |      st.n AS n, p.item AS aitem
        |    FROM st LEFT JOIN panel p
        |      ON p.series = st.series AND p.i = st.h + 1)
        |  WHERE h < 2000)
        |SELECT series, c.item AS item, c.cnt AS est, n AS n_seen,
        |  n // 9 AS err_bound
        |FROM (SELECT series, unnest(counters) AS c, n FROM st
        |  WHERE h = 2000)
        |ORDER BY series, item""".stripMargin,

    "q455_peak_concurrency" ->
      """WITH iv AS MATERIALIZED (SELECT c.c_mktsegment AS seg,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS sd,
        |    greatest(CAST(max(CAST(l.l_shipdate AS DATE)) - DATE '1970-01-01'
        |      AS BIGINT), CAST(CAST(o.o_orderdate AS DATE)
        |      - DATE '1970-01-01' AS BIGINT)) AS ed
        |  FROM orders o
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, o.o_orderkey, 2),
        |deltas AS (
        |  SELECT seg, sd AS d, CAST(1 AS BIGINT) AS delta FROM iv
        |  UNION ALL
        |  SELECT seg, ed + 1 AS d, CAST(-1 AS BIGINT) AS delta FROM iv),
        |daily AS (SELECT seg, d, sum(delta) AS dd FROM deltas GROUP BY 1, 2),
        |run AS (SELECT seg, d,
        |    sum(dd) OVER (PARTITION BY seg ORDER BY d
        |      ROWS UNBOUNDED PRECEDING) AS conc
        |  FROM daily)
        |SELECT seg, CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  CAST(min(CASE WHEN conc = mx THEN d END) AS BIGINT)
        |    AS first_peak_day,
        |  CAST(count(*) AS BIGINT) AS n_change_days
        |FROM (SELECT seg, d, conc, max(conc) OVER (PARTITION BY seg) AS mx
        |  FROM run)
        |GROUP BY seg ORDER BY seg""".stripMargin,

    "q456_weighted_intervals" ->
      """WITH RECURSIVE ivr AS MATERIALIZED (
        |  SELECT c.c_mktsegment AS seg, o.o_orderkey AS okey,
        |    CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      AS sd,
        |    greatest(CAST(max(CAST(l.l_shipdate AS DATE))
        |      - DATE '1970-01-01' AS BIGINT),
        |      CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01'
        |        AS BIGINT)) AS ed,
        |    CAST(round(o.o_totalprice * 100) AS BIGINT) AS w
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY 1, 2, 3, o.o_totalprice),
        |panel AS MATERIALIZED (
        |  SELECT seg, okey, sd, ed, w FROM (
        |    SELECT *, row_number() OVER (PARTITION BY seg
        |      ORDER BY md5('wis:' || CAST(okey AS VARCHAR)), okey) AS rnk
        |    FROM ivr)
        |  WHERE rnk <= 60),
        |idx AS MATERIALIZED (
        |  SELECT seg, okey, sd, ed, w,
        |    row_number() OVER (PARTITION BY seg ORDER BY ed, sd, okey) AS i
        |  FROM panel),
        |pred AS MATERIALIZED (
        |  SELECT a.seg, a.i, a.w,
        |    coalesce((SELECT max(b.i) FROM idx b
        |      WHERE b.seg = a.seg AND b.ed < a.sd), 0) AS p
        |  FROM idx a),
        |nmax AS (SELECT seg, CAST(max(i) AS BIGINT) AS n FROM idx
        |  GROUP BY 1),
        |tot AS (SELECT seg, CAST(sum(w) AS BIGINT) AS total_weight
        |  FROM idx GROUP BY 1),
        |st(h, seg, dps) AS (
        |  SELECT 0, seg, [CAST(0 AS BIGINT)]
        |  FROM (SELECT DISTINCT seg FROM panel)
        |  UNION ALL
        |  SELECT h + 1, seg,
        |    CASE WHEN aw IS NULL THEN dps
        |      ELSE list_append(dps,
        |        greatest(dps[h + 1], aw + dps[ap + 1])) END
        |  FROM (
        |    SELECT st.h AS h, st.seg AS seg, st.dps AS dps, p.w AS aw,
        |      CAST(p.p AS INT) AS ap
        |    FROM st LEFT JOIN pred p ON p.seg = st.seg AND p.i = st.h + 1)
        |  WHERE h < 60)
        |SELECT s.seg, n.n AS n_intervals, t.total_weight,
        |  s.dps[CAST(n.n AS INT) + 1] AS best_weight
        |FROM (SELECT seg, dps FROM st WHERE h = 60) s
        |JOIN nmax n ON n.seg = s.seg JOIN tot t ON t.seg = s.seg
        |ORDER BY s.seg""".stripMargin)
}
