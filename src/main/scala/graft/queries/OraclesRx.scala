package graft.queries

/**
 * DuckDB oracle SQL for the round-12 second wave ([[CatalogRx]]).
 * q442 composes the shared q119 candidate CTE
 * ([[OraclesExt.fuzzyPairsCte]]) with the shared matching-round replay
 * ([[OraclesGx.matchRound]]); q443 replays the 16 signed sums from the
 * identical md5 parity; q444 mirrors the G² cell terms with the exact
 * piecewise lg ([[OraclesExt.lgSqlOf]]) in the identical fold order.
 */
object OraclesRx {

  private def lg(x: String): String = OraclesExt.lgSqlOf(x)

  /** One G² cell: O·(((lg O + lg N) − lg rowTot) − lg colTot), zero
    * when the observed count is zero. */
  private def g2Term(o: String, rt: String, ct: String): String =
    s"""CASE WHEN $o > 0 THEN CAST($o AS DOUBLE) *
       |  (((${lg(o)} + ${lg("st.n")}) - ${lg(rt)}) - ${lg(ct)})
       |  ELSE 0.0 END""".stripMargin.replace("\n", " ")

  val all: Map[String, String] = Map(

    "q442_linkage_assignment" ->
      s"""WITH ${OraclesExt.fuzzyPairsCte},
         |pe AS MATERIALIZED (
         |  SELECT a_id, b_id, inter, CAST(na AS BIGINT) AS na,
         |    CAST(nb AS BIGINT) AS nb
         |  FROM i WHERE 2 * inter * 4 >= 3 * (na + nb)),
         |st0 AS MATERIALIZED (SELECT 'e' AS kind, a_id AS x, b_id AS y,
         |    (((na + nb - 2 * inter) * 1048576) // (na + nb))
         |      * 1099511627776
         |      + ('0x' || substr(md5('as:' || CAST(a_id AS VARCHAR) ||
         |        ',' || CAST(b_id AS VARCHAR)), 1, 10))::BIGINT AS wt,
         |    CAST(0 AS BIGINT) AS rnd
         |  FROM pe),
         |${(1 to 12).map(OraclesGx.matchRound).mkString(",\n")}
         |SELECT m.x AS a_id, m.y AS b_id,
         |  CAST(2 * pe.inter AS DOUBLE) / CAST(pe.na + pe.nb AS DOUBLE)
         |    AS dice,
         |  m.rnd AS round
         |FROM st12 m JOIN pe ON pe.a_id = m.x AND pe.b_id = m.y
         |WHERE m.kind = 'm' ORDER BY a_id""".stripMargin,

    "q443_ams_f2" ->
      """WITH fv AS MATERIALIZED (
        |  SELECT l_partkey AS v, CAST(count(*) AS BIGINT) AS f
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT j.j,
        |    CASE WHEN ('0x' || substr(md5('ams:' || CAST(j.j AS VARCHAR) ||
        |        ':' || CAST(fv.v AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
        |      THEN fv.f ELSE -fv.f END AS sf
        |  FROM fv, (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS j) j),
        |sj AS MATERIALIZED (SELECT j, CAST(sum(sf) AS BIGINT) AS s_j
        |  FROM g GROUP BY 1),
        |ex AS (SELECT CAST(sum(f * f) AS BIGINT) AS f2_exact FROM fv)
        |SELECT j, s_j, s_j * s_j AS est_f2, f2_exact,
        |  CAST(s_j * s_j AS DOUBLE) / CAST(f2_exact AS DOUBLE) AS ratio
        |FROM sj, ex ORDER BY j""".stripMargin,

    "q444_g2_collocations" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
         |bc AS MATERIALIZED (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM (
         |    SELECT w[i] AS w1, w[i + 1] AS w2
         |    FROM (SELECT w, unnest(range(1, len(w))) AS i FROM t))
         |  GROUP BY 1, 2),
         |fr AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS r1 FROM bc GROUP BY 1),
         |sc AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS k1 FROM bc GROUP BY 1),
         |st AS (SELECT CAST(sum(c12) AS BIGINT) AS n FROM bc)
         |SELECT bc.w1, bc.w2, bc.c12, fr.r1, sc.k1,
         |  (((${g2Term("bc.c12", "fr.r1", "sc.k1")}
         |   + ${g2Term("fr.r1 - bc.c12", "fr.r1", "st.n - sc.k1")})
         |   + ${g2Term("sc.k1 - bc.c12", "st.n - fr.r1", "sc.k1")})
         |   + ${g2Term("(st.n - fr.r1) - (sc.k1 - bc.c12)",
                        "st.n - fr.r1", "st.n - sc.k1")}) * 2.0 AS g2_bits
         |FROM bc JOIN fr ON fr.w1 = bc.w1
         |JOIN sc ON sc.w2 = bc.w2 CROSS JOIN st
         |WHERE bc.c12 >= 5
         |ORDER BY g2_bits DESC, bc.w1 ASC, bc.w2 ASC LIMIT 20""".stripMargin)
}
