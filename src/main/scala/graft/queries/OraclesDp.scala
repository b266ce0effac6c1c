package graft.queries

/**
 * DuckDB oracle SQL for the round-10d discrete-algorithms wave
 * ([[CatalogDp]]). Huffman as a single-row recursive CTE carrying the
 * (weight, sorted-member-list) heap — DuckDB's struct/list comparison IS
 * the engine's canonical tiebreak; LIS as the same 32 relaxation rounds
 * unrolled; the rho map as the same 20 squaring rounds + min-label
 * jumping + binary descend, all MATERIALIZED.
 */
object OraclesDp {

  /** One LIS relaxation round. */
  private def lisRound(k: Int): String =
    s"""l$k AS MATERIALIZED (SELECT c.user_id, c.rn,
       |  greatest(c.l, coalesce(b.cand, 0)) AS l
       |  FROM l${k - 1} c LEFT JOIN (
       |    SELECT pr.user_id, pr.ri AS rn, max(q.l) + 1 AS cand
       |    FROM pr JOIN l${k - 1} q
       |      ON q.user_id = pr.user_id AND q.rn = pr.rj
       |    GROUP BY 1, 2) b
       |  ON b.user_id = c.user_id AND b.rn = c.rn)""".stripMargin

  /** One rho squaring round: m_j(v) = m_{j-1}(m_{j-1}(v)). */
  private def rhoSquare(j: Int): String =
    s"""m$j AS MATERIALIZED (SELECT a.v, b.m
       |  FROM m${j - 1} a JOIN m${j - 1} b ON b.v = a.m)""".stripMargin

  /** One min-label jumping round on the cycle set. */
  private def rhoLabel(k: Int): String =
    s"""s$k AS MATERIALIZED (SELECT a.c, b.p, least(a.mn, b.mn) AS mn
       |  FROM s${k - 1} a JOIN s${k - 1} b ON b.c = a.p)""".stripMargin

  /** One binary-descend step (j descending). */
  private def rhoDescend(j: Int): String =
    s"""dsc$j AS MATERIALIZED (SELECT t.v,
       |  CASE WHEN cy.c IS NULL THEN mp.m ELSE t.cur END AS cur,
       |  CASE WHEN cy.c IS NULL THEN t.d + ${1L << j} ELSE t.d END AS d
       |  FROM dsc${j + 1} t JOIN m$j mp ON mp.v = t.cur
       |  LEFT JOIN cyc cy ON cy.c = mp.m)""".stripMargin

  val all: Map[String, String] = Map(

    "q415_huffman" ->
      """WITH RECURSIVE tok AS MATERIALIZED (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |counts AS MATERIALIZED (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
        |  FROM tok GROUP BY 1),
        |h(step, heap, lens) AS (
        |  SELECT 0,
        |    list_sort(list(ROW(cnt, [tok])::STRUCT(w BIGINT, m VARCHAR[]))),
        |    list_sort(list(ROW(tok, CAST(0 AS BIGINT))
        |      ::STRUCT(tok VARCHAR, len BIGINT)))
        |  FROM counts
        |  UNION ALL
        |  SELECT step + 1,
        |    list_sort(list_append(heap[3:],
        |      ROW(heap[1].w + heap[2].w, list_sort(heap[1].m || heap[2].m))
        |        ::STRUCT(w BIGINT, m VARCHAR[]))),
        |    list_transform(lens, x -> ROW(x.tok,
        |      x.len + CASE WHEN list_contains(heap[1].m, x.tok)
        |          OR list_contains(heap[2].m, x.tok)
        |        THEN 1 ELSE 0 END)::STRUCT(tok VARCHAR, len BIGINT))
        |  FROM h WHERE len(heap) > 1),
        |fin AS (SELECT lens FROM h ORDER BY step DESC LIMIT 1),
        |fl AS (SELECT u.x.tok AS tok, CAST(u.x.len AS BIGINT) AS code_len
        |  FROM fin, unnest(fin.lens) AS u(x)),
        |j AS MATERIALIZED (SELECT c.tok, c.cnt, fl.code_len
        |  FROM counts c JOIN fl USING (tok)),
        |tb AS (SELECT CAST(sum(cnt * code_len) AS BIGINT) AS total_bits FROM j)
        |SELECT j.tok, j.cnt, j.code_len, tb.total_bits
        |FROM j CROSS JOIN tb ORDER BY tok""".stripMargin,

    "q416_user_lis" ->
      s"""WITH ev AS MATERIALIZED (SELECT user_id,
         |    CAST(round(value * 100) AS BIGINT) AS v,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS BIGINT) AS rn
         |  FROM events),
         |pr AS MATERIALIZED (SELECT a.user_id, a.rn AS rj, b.rn AS ri
         |  FROM ev a JOIN ev b ON b.user_id = a.user_id
         |    AND a.rn < b.rn AND a.v < b.v),
         |l0 AS MATERIALIZED (SELECT user_id, rn, CAST(1 AS BIGINT) AS l FROM ev),
         |${(1 to 32).map(lisRound).mkString(",\n")}
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(max(l) AS BIGINT) AS lis_len
         |FROM l32 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q417_rho_cycles" ->
      s"""WITH keys AS MATERIALIZED (SELECT c_custkey AS v FROM customer),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keys),
         |rk AS MATERIALIZED (SELECT v,
         |    CAST(row_number() OVER (ORDER BY v) - 1 AS BIGINT) AS idx
         |  FROM keys),
         |h AS MATERIALIZED (SELECT k.v, r.v AS hv FROM (
         |    SELECT v, ('0x' || substr(md5('rho:' || CAST(v AS VARCHAR)),
         |        1, 10))::BIGINT % (SELECT n FROM nn) AS hidx
         |    FROM keys) k
         |  JOIN rk r ON r.idx = k.hidx),
         |m0 AS MATERIALIZED (SELECT v, hv AS m FROM h),
         |${(1 to 19).map(rhoSquare).mkString(",\n")},
         |z AS MATERIALIZED (SELECT a.v, b.m AS z
         |  FROM m19 a JOIN m19 b ON b.v = a.m),
         |cyc AS MATERIALIZED (SELECT DISTINCT z AS c FROM z),
         |s0 AS MATERIALIZED (SELECT cyc.c, h.hv AS p,
         |    least(cyc.c, h.hv) AS mn
         |  FROM cyc JOIN h ON h.v = cyc.c),
         |${(1 to 20).map(rhoLabel).mkString(",\n")},
         |lab AS MATERIALIZED (SELECT c, mn AS cycle_id FROM s20),
         |dsc20 AS MATERIALIZED (SELECT v, v AS cur, CAST(0 AS BIGINT) AS d
         |  FROM keys),
         |${(0 to 19).reverse.map(rhoDescend).mkString(",\n")},
         |tails AS MATERIALIZED (SELECT t.v,
         |  CASE WHEN cy.c IS NOT NULL THEN CAST(0 AS BIGINT)
         |    ELSE t.d + 1 END AS tail
         |  FROM dsc0 t LEFT JOIN cyc cy ON cy.c = t.v),
         |basin AS (SELECT z.v, lab.cycle_id FROM z JOIN lab ON lab.c = z.z),
         |cl AS (SELECT cycle_id, CAST(count(*) AS BIGINT) AS cycle_len
         |  FROM lab GROUP BY 1)
         |SELECT b.cycle_id, cl.cycle_len,
         |  CAST(count(*) AS BIGINT) AS basin_size,
         |  CAST(max(t.tail) AS BIGINT) AS max_tail
         |FROM basin b JOIN tails t ON t.v = b.v
         |JOIN cl ON cl.cycle_id = b.cycle_id
         |GROUP BY b.cycle_id, cl.cycle_len
         |ORDER BY b.cycle_id""".stripMargin)
}
