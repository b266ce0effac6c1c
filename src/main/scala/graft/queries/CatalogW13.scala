package graft.queries

import graft.Tables
import graft.ops.{Guards, IterativeLoop}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-13 waves (q448–q456) — sketch/graph/matching/temporal verbs extending
 * families the catalog already carries into missing canonical members
 * (the wave was deliberately pruned against the existing 447: rendezvous
 * hashing, bloom-semi-join-with-FP-audit and diff-in-differences were
 * drafted and then DROPPED as near-duplicates of q414/q107/q284):
 *
 *   - q448 AMS sketch JOIN-SIZE estimation: the inner-product reading
 *     of the tug-of-war sketch (Alon–Matias–Szegedy 1996) — q412/q443's
 *     S_j² estimate F2 = |A ⋈ A|; the product S_j^A·S_j^B of two
 *     INDEPENDENTLY sketched relations estimates |A ⋈ B| — the
 *     cross-relation cardinality-estimation primitive a distributed
 *     optimizer feeds on, O(estimators) state per relation, mergeable
 *     by addition.
 *   - q449 multi-source bitset BFS (the HyperBall/HADI idea made EXACT
 *     at 63 sources): where q423's batched centrality BFS carries one
 *     (src, node, dist) ROW per pair — O(sources·nodes) state — this
 *     packs 63 simultaneous frontiers into ONE long per node and a
 *     round is one equi-join + one bit_or aggregate regardless of
 *     source count. Output: the neighborhood function N(h) (reached
 *     nodes / reached (source,node) pairs per hop), the
 *     distance-distribution statistic behind diameter/effective-
 *     diameter estimates on 100 TB graphs.
 */
object CatalogW13 {

  // ---------------------------------------------------------------- q448

  /** AMS join-size estimate |events ⋈ orders| on the user/customer key:
    * per estimator j, est_j = S_j^A · S_j^B with the SAME md5 sign draw
    * on both sides (the correlation is what makes the product unbiased
    * for Σ_v fA(v)·fB(v)), next to the exact audit and one-divide
    * ratio, q443's law-is-the-output style. */
  def q448AmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    val fa = IterativeLoop.cutLazy(Tables.events(s, dir)
      .groupBy(col("user_id").as("v")).agg(count(lit(1)).as("f")))
    val fb = IterativeLoop.cutLazy(Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("v")).agg(count(lit(1)).as("f")))
    val sa = CatalogRx.amsSums(fa, CatalogRx.AmsEstimators)
      .select(col("j"), col("s_j").as("s_a"))
    val sb = CatalogRx.amsSums(fb, CatalogRx.AmsEstimators)
      .select(col("j"), col("s_j").as("s_b"))
    val exact = fa.join(fb.select(col("v"), col("f").as("fb")), "v")
      .agg(coalesce(sum(col("f") * col("fb")), lit(0L)).as("join_exact"))
    sa.join(sb, "j")
      .crossJoin(broadcast(Guards.scalar(exact)))
      .select(col("j"), col("s_a"), col("s_b"),
        (col("s_a") * col("s_b")).as("est_join"), col("join_exact"),
        ((col("s_a") * col("s_b")).cast("double")
          / col("join_exact").cast("double")).as("ratio"))
      .orderBy(col("j"))
  }

  // ---------------------------------------------------------------- q449

  private[graft] val BfsSources = 63
  private[graft] val BfsRounds = 8

  /** 63-source exact bitset BFS over the customer–supplier trade graph
    * (the q113 node encoding: customer 2c, supplier 2s+1). One BIGINT
    * mask per reached node; a round is ONE equi-join + ONE bit_or
    * aggregate regardless of source count — the scale trick of
    * HyperBall (Boldi–Vigna 2013) with exact bitsets in place of HLL
    * registers. Fixed [[BfsRounds]] rounds (the PageRank fixed-replay
    * discipline; the curve saturates once every source's BFS completes
    * — rounds PAST saturation are map-side no-ops on a stationary
    * frame, not wasted shuffles of growing data). Output: hop →
    * (nodes_reached, pairs_reached = Σ bit_count), the neighborhood
    * function N(h). */
  def q449MultiSourceBfs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val und = IterativeLoop.cutLazy(
      e.unionAll(e.select(col("v").as("u"), col("u").as("v"))))
    val nodes = und.select(col("u").as("node")).distinct()
    val src = graft.ops.DistributedRank.withRowNumber(nodes, "rn",
        md5(concat(lit("bfs:"), col("node").cast("string"))), col("node"))
      .filter(col("rn") <= BfsSources)
      .select(col("node"),
        expr("shiftleft(cast(1 as bigint), cast(rn - 1 as int))").as("mask"))
    def curvePoint(h: Int, m: DataFrame): DataFrame =
      m.agg(count(lit(1)).as("nodes_reached"),
          coalesce(sum(expr("bit_count(mask)")), lit(0L)).as("pairs_reached"))
        .select(lit(h.toLong).as("h"), col("nodes_reached"),
          col("pairs_reached"))
    var masks = IterativeLoop.cutLazy(src)
    // Round 16: semi-naive (delta) propagation — only masks that CHANGED
    // last round are joined against the edge list. Exact because masks are
    // monotone under bit_or: a neighbor whose mask did not change last
    // round contributed those same bits in an earlier round already, so
    // re-propagating it is a no-op. The per-round join volume falls from
    // all-reached-sized (every edge matched once the graph saturates —
    // rounds past saturation used to re-shuffle the whole graph) to
    // changed-sized, which is EMPTY after saturation (guide §1.2-1).
    // The curve points are unchanged: the merged `masks` state is the same
    // frame the naive form computes, round for round.
    // The change detection is FUSED into the merge aggregate (the previous
    // round's mask rides along as a marker column and `max` recovers it per
    // node — masks contributes exactly one row per node), so the delta is a
    // filter over the SAME cut frame the curve point materializes: zero
    // extra joins, zero extra jobs per round vs the naive form.
    var delta = masks
    val curve = scala.collection.mutable.ArrayBuffer(curvePoint(0, masks))
    val lid = graft.ops.PlanProbe.loopId()
    for (h <- 1 to BfsRounds) {
      val stepped = und
        .join(delta.select(col("node").as("v"), col("mask")), "v")
        .select(col("u").as("node"), col("mask"),
          lit(null).cast("long").as("__old"))
        .unionAll(masks.select(col("node"), col("mask"),
          col("mask").as("__old")))
        .groupBy(col("node"))
        .agg(expr("bit_or(mask)").as("mask"), max(col("__old")).as("__old"))
      graft.ops.PlanProbe.offer(lid, h, stepped)
      val next = IterativeLoop.cutLazy(stepped)
      masks = next.select(col("node"), col("mask"))
      delta = next
        .filter(col("__old").isNull || col("mask") =!= col("__old"))
        .select(col("node"), col("mask"))
      curve += curvePoint(h, masks)
    }
    curve.reduce(_ unionAll _).orderBy(col("h"))
  }

  // ---------------------------------------------------------------- q450

  private[graft] val GsProposers = 16
  private[graft] val GsAcceptors = 8

  /** Structural round cap for the synchronous deferred-acceptance loop:
    * every non-terminal round either advances some proposer pointer
    * (≤ P·A total advances) or strictly improves some acceptor's
    * partner (≤ P·A total improvements), so rounds ≤ 2·P·A; +2 for the
    * stationarity probe's extra round. */
  private[graft] val GsCap = 2 * GsProposers * GsAcceptors + 2

  private def u32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  private def aScore(p: Column, a: Column): Column =
    u32(concat(lit("gsa:"), p.cast("string"), lit(":"), a.cast("string")))

  /** Distributed stable matching (Gale–Shapley 1962) by SYNCHRONOUS
    * deferred acceptance — the assignment verb the greedy matchings
    * (q438 local-dominance, q442 linkage) cannot provide: the result
    * has NO blocking pair (no proposer–acceptor pair who both prefer
    * each other over their assignment; W13WaveSpec checks all P·A
    * pairs), and it is the canonical proposer-optimal matching, which
    * is UNIQUE — so the parallel round order and the textbook
    * sequential order provably agree, and the oracle replays the same
    * synchronous rounds.
    *
    * Panel: the md5-bottom [[GsProposers]] customers propose to the
    * md5-bottom [[GsAcceptors]] suppliers; both preference orders are
    * md5 draws (distinct w.h.p., ties broken by id — a total order
    * either way). State is ONE row per proposer (pointer, tentative
    * match); a round is one rank-equi-join against the preference
    * table + one per-acceptor window argmax. Rounds are bounded
    * structurally ([[GsCap]]) and the loop exits at the exact fixed
    * point via a SOUND monotone probe: Σpointer never decreases
    * (rejections advance it), matched count never decreases (a bump
    * swaps, never unmatches net), and Σ acceptor-side score of the
    * tentative matches never decreases (deferred acceptance only
    * improves acceptors) — all three stationary ⟺ no rejection, no
    * acceptance, no bump ⟺ fixed point. */
  def q450StableMatching(s: SparkSession, dir: String): DataFrame = {
    val props = IterativeLoop.cutLazy(Tables.customer(s, dir)
      .select(col("c_custkey").as("p"))
      .orderBy(md5(concat(lit("gsP:"), col("p").cast("string"))), col("p"))
      .limit(GsProposers))
    val accs = Tables.supplier(s, dir).select(col("s_suppkey").as("a"))
      .orderBy(md5(concat(lit("gsA:"), col("a").cast("string"))), col("a"))
      .limit(GsAcceptors)
    val prefs = IterativeLoop.cutLazy(props
      .crossJoin(broadcast(Guards.bounded(accs, GsAcceptors)))
      .select(col("p"), col("a"),
        u32(concat(lit("gsp:"), col("p").cast("string"), lit(":"),
          col("a").cast("string"))).as("ps"))
      .withColumn("prank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("p"))
          .orderBy(col("ps").desc, col("a").asc)).cast("long"))
      .select(col("p").as("pp"), col("prank"), col("a").as("target")))
    val init = props.select(col("p"), lit(1L).as("idx"),
      lit(null).cast("long").as("ma"))
    val probe = IterativeLoop.stationaryAgg(df =>
      df.agg(sum(col("idx")), count(col("ma")),
        sum(aScore(col("p"), col("ma")))).collect().toSeq.map(_.toSeq))
    val fin = IterativeLoop.fixedUntil(init, GsCap, requireConverged = true,
        sameAs = probe) { (st, _) =>
      // Round 16 (r15 VERDICT #3): certainly-rejected skip. An acceptor's
      // tentative partner only ever improves under deferred acceptance (the
      // window argmax always includes the current holder), so an acceptor
      // whose CURRENT holding already beats proposer p — higher aScore, or
      // equal score and smaller p (the window's exact tie order) — will
      // reject p at every future round too. Each unmatched proposer
      // therefore jumps its pointer straight to the first rank ≥ idx whose
      // acceptor is NOT certainly rejecting (or past the list if none) —
      // a valid deferred-acceptance schedule in the McVitie–Wilson sense
      // (skipped proposals are exactly rejections), so the fixed point is
      // the SAME unique proposer-optimal matching and the output (which
      // never reads idx) is bit-identical; only the round count drops
      // (~44 → ~A rounds at this panel — guide §1.2-1: fewer passes).
      val held = st.filter(col("ma").isNotNull)
        .select(col("ma").as("h_a"), col("p").as("h_p"),
          aScore(col("p"), col("ma")).as("h_s"))
      val jump = st.filter(col("ma").isNull)
        .select(col("p").as("j_p"), col("idx").as("j_idx"))
        .join(prefs, col("j_p") === col("pp") && col("prank") >= col("j_idx"))
        .join(held, col("target") === col("h_a"), "left")
        .filter(col("h_a").isNull
          || aScore(col("j_p"), col("target")) > col("h_s")
          || (aScore(col("j_p"), col("target")) === col("h_s")
            && col("j_p") < col("h_p")))
        .groupBy(col("j_p")).agg(min(col("prank")).as("jidx"))
      val st2 = st.join(jump, col("p") === col("j_p"), "left")
        .select(col("p"),
          when(col("ma").isNull,
            coalesce(col("jidx"), lit((GsAcceptors + 1).toLong)))
            .otherwise(col("idx")).as("idx"),
          col("ma"))
      st2.join(prefs, col("p") === col("pp") && col("prank") === col("idx"),
          "left")
        .withColumn("proposed",
          col("ma").isNull && col("idx") <= GsAcceptors)
        .withColumn("contend_a",
          when(col("proposed"), col("target")).otherwise(col("ma")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("contend_a"))
            .orderBy(aScore(col("p"), col("contend_a")).desc, col("p").asc)))
        .select(col("p"),
          (col("idx") + when(col("proposed") && col("rn") =!= 1, 1L)
            .otherwise(0L)).as("idx"),
          when(col("contend_a").isNotNull && col("rn") === 1,
            col("contend_a")).otherwise(lit(null).cast("long")).as("ma"))
    }
    fin.df
      .join(prefs, col("p") === col("pp") && col("target") === col("ma"),
        "left")
      .select(col("p").as("proposer"), col("ma").as("acceptor"),
        col("prank").as("p_rank"))
      .orderBy(col("proposer"))
  }

  // ------------------------------------------------- interval family

  /** The ONE definition of the clamped order-fulfillment window shared
    * by the interval family (q451 classifies pairs, q455 counts
    * concurrency, q456 selects an optimum — round 13 carried three
    * copies of this frame, and its clamp semantics were themselves a
    * mid-round bug fix, so drift between copies was a live risk).
    * Window = [orderdate, last lineitem shipdate] in epoch days; the
    * synthetic corpus ships some lines BEFORE the order date, so the
    * end clamps to `greatest(max shipdate, sd)` — without it an
    * "inverted" window is a nonsense negative-length interval (and the
    * q455 sweep would count it as −1 then +1). Output: (k, okey, sd,
    * ed, w) with `k` = market segment when `bySegment` else customer
    * key, and `w` = order total in cents (okey-determined, so carrying
    * it through the groupBy never changes the groups). */
  private[graft] def fulfillmentWindows(s: SparkSession, dir: String,
      bySegment: Boolean): DataFrame = {
    val orders = Tables.orders(s, dir).select(col("o_custkey"),
      col("o_orderkey").as("okey"),
      datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("sd"),
      round(col("o_totalprice") * 100).cast("long").as("w"))
    val keyed =
      if (bySegment)
        orders.join(Tables.customer(s, dir)
            .select(col("c_custkey").as("o_custkey"),
              col("c_mktsegment").as("k")), "o_custkey")
          .select(col("k"), col("okey"), col("sd"), col("w"))
      else orders.select(col("o_custkey").as("k"), col("okey"), col("sd"),
        col("w"))
    keyed
      .join(Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("okey"),
          datediff(col("l_shipdate"), lit("1970-01-01")).cast("long")
            .as("shd")), "okey")
      .groupBy(col("k"), col("okey"), col("sd"), col("w"))
      .agg(greatest(max(col("shd")), col("sd")).as("ed"))
  }

  // ---------------------------------------------------------------- q451

  /** The shared 13-relation classifier (Allen 1983) as one SQL CASE —
    * the SAME text runs in Spark and DuckDB, so the taxonomy cannot
    * drift between engines. Strict textbook definitions; branches are
    * mutually exclusive for s ≤ e intervals (the containment checks
    * are implied by falling through the before/meets branches).
    *
    * Degenerate POINT intervals (s = e — the ed-clamp above does
    * produce them) are classified by the FIRST matching branch:
    * [5,5] vs [5,7] hits `e1 = s2` → 'meets' even though s1 = s2
    * (textbook Allen assumes s < e, so the 13 relations are only
    * exhaustive-and-exclusive for proper intervals). This is a
    * DOCUMENTED taxonomy choice, not an engine divergence: both
    * engines run the identical CASE text, so the histogram stays
    * hash-stable; a consumer needing point-interval semantics filters
    * s < e first. */
  private[graft] val AllenCase: String = """CASE
    WHEN e1 < s2 THEN 'precedes'
    WHEN e1 = s2 THEN 'meets'
    WHEN s1 < s2 AND e1 < e2 THEN 'overlaps'
    WHEN s1 < s2 AND e1 = e2 THEN 'finished_by'
    WHEN s1 < s2 THEN 'contains'
    WHEN s1 = s2 AND e1 < e2 THEN 'starts'
    WHEN s1 = s2 AND e1 = e2 THEN 'equals'
    WHEN s1 = s2 THEN 'started_by'
    WHEN s1 > e2 THEN 'preceded_by'
    WHEN s1 = e2 THEN 'met_by'
    WHEN e1 > e2 THEN 'overlapped_by'
    WHEN e1 = e2 THEN 'finishes'
    ELSE 'during' END"""

  /** Allen's interval-algebra histogram over same-customer order
    * fulfillment windows: each order is the interval [orderdate,
    * last lineitem shipdate] (epoch days); pairs are (orderkey i < j)
    * within one customer — a bounded ≤ C(orders-per-customer, 2)
    * fan-out equi-join on the customer key, never a temporal
    * theta-join — classified into the 13 exhaustive, mutually
    * exclusive relations of Allen 1983. The histogram is the
    * temporal-overlap profile a scheduling/attribution pipeline reads
    * before picking an interval-join strategy (how often do a
    * customer's fulfillment windows actually interleave?). */
  def q451AllenRelations(s: SparkSession, dir: String): DataFrame = {
    val iv = IterativeLoop.cutLazy(fulfillmentWindows(s, dir, bySegment = false)
      .select(col("k").as("ck"), col("okey"), col("sd"), col("ed")))
    iv.select(col("ck"), col("okey").as("ok1"), col("sd").as("s1"),
        col("ed").as("e1"))
      .join(iv.select(col("ck"), col("okey").as("ok2"), col("sd").as("s2"),
        col("ed").as("e2")), "ck")
      .filter(col("ok1") < col("ok2"))
      .select(expr(AllenCase).as("relation"))
      .groupBy(col("relation")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("relation"))
  }

  // ---------------------------------------------------------------- q452

  /** Delta-of-delta timestamp compression audit (the Gorilla/TSDB
    * encoding, Facebook 2015) over each user's event stream: first
    * arrival costs 64 raw bits; every later one costs the bit-length
    * of the zigzagged second difference of its µs timestamp plus a
    * 6-bit width header. Regular streams (near-constant cadence)
    * collapse to a few bits per point, bursty ones do not — the
    * storage-planning statistic for a 100 TB time-series ingest, with
    * EXACT integer bit accounting both engines replay (bit-length via
    * the binary string, the same primitive as the exact lg). */
  def q452DodCompression(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("t"), col("event_id"))
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("t"))
      .withColumn("d1", col("t") - lag(col("t"), 1).over(w))
      .withColumn("dod", coalesce(col("d1") - lag(col("d1"), 1).over(w),
        col("d1")))
      .withColumn("zz", when(col("dod") >= 0, col("dod") * 2)
        .otherwise(col("dod") * -2 - 1))
      .withColumn("bits", when(col("d1").isNull, lit(64L))
        .otherwise(length(bin(col("zz"))).cast("long") + 6L))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (count(lit(1)) * 64L).as("raw_bits"),
        sum(col("bits")).as("enc_bits"))
      .withColumn("ratio",
        col("enc_bits").cast("double") / col("raw_bits").cast("double"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q453

  private[graft] val LcBits = 1071L // 17 words x 63 bits

  /** Linear counting (Whang et al. 1990) — the SMALL-cardinality
    * sketch completing the canon (CMS q77, HLL q135, Bloom q182, KMV
    * q236/q404, AMS q412/q443/q448): per event type, distinct users
    * hash into a [[LcBits]]-bit bitmap (the q447 63-bit word packing;
    * state = 17 longs per type), estimate = m·ln2·(lg m − lg V) with V
    * the zero-bit count — the LC formula under the engine's exact
    * piecewise lg, so both engines produce the identical double. A
    * SATURATED bitmap (V = 0, the beyond-regime case — this is
    * exactly why HLL exists) reports NULL rather than a garbage
    * number. Exact distinct alongside, law-is-the-output style. */
  def q453LinearCounting(s: SparkSession, dir: String): DataFrame = {
    val tu = IterativeLoop.cutLazy(Tables.events(s, dir)
      .select(col("event_type").as("t"), col("user_id").as("u")).distinct())
    val words = tu
      .select(col("t"),
        pmod(u32(concat(lit("lc:"), col("u").cast("string"))),
          lit(LcBits)).as("pos"))
      .select(col("t"), expr("pos div 63").as("w"),
        expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").as("b"))
      .groupBy(col("t"), col("w")).agg(expr("bit_or(b)").as("m"))
    val lg = graft.curation.Curation.lg _
    words.groupBy(col("t"))
      .agg(sum(expr("bit_count(m)")).as("set_bits"))
      .join(tu.groupBy(col("t")).agg(count(lit(1)).as("n_exact")), "t")
      .select(col("t").as("event_type"), lit(LcBits).as("m"),
        col("set_bits"), (lit(LcBits) - col("set_bits")).as("zero_bits"),
        col("n_exact"))
      .withColumn("est_lc",
        when(col("zero_bits") > 0,
          lit(LcBits.toDouble) * lit(0.6931471805599453)
            * (lg(lit(LcBits)) - lg(col("zero_bits"))))
          .otherwise(lit(null).cast("double")))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q454

  private[graft] val MgK = 8
  private[graft] val MgPanel = 2000

  /** Misra–Gries frequent items (Misra & Gries 1982) as an
    * ORACLE-GRADED batch kernel — the batch twin of
    * [[graft.streaming.StreamingHeavyHitters]], closing the last
    * spec-only streaming monitor (CUSUM/EWMA/drift/bottom-k/AMS all
    * have hash-matched batch kernels; MG did not). Runs the literal
    * [[graft.streaming.StreamingHeavyHitters.mgRun]] kernel per series
    * over the md5-bottom-[[MgPanel]] event panel in event_id order
    * (the fixed-panel pattern that keeps the oracle's sequential
    * replay — a 2000-step recursive list-state CTE — tractable at
    * every SF; the streaming spec's split-invariance law ties the SAME
    * kernel to the unbounded per-micro-batch path). Items fold user
    * ids mod 13 so counters genuinely contend at k = [[MgK]]. Output:
    * the surviving counters with the textbook N∕(k+1) error bound. */
  def q454MisraGries(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val panel = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("user_id"))
      .orderBy(md5(concat(lit("mg:"), col("event_id").cast("string"))),
        col("event_id"))
      .limit(MgPanel)
      .select(col("event_type").as("series"),
        concat(lit("u"), (col("user_id") % 13).cast("string")).as("item"),
        col("event_id").as("seq"))
      .as[(String, String, Long)]
    panel.groupByKey(_._1).flatMapGroups { (series, it) =>
      val items = it.toSeq.sortBy(_._3).map(_._2)
      val (c, n) = graft.streaming.StreamingHeavyHitters
        .mgRun(Map.empty, 0L, items, MgK)
      c.toSeq.map { case (item, est) =>
        (series, item, est, n, n / (MgK + 1)) }
    }.toDF("series", "item", "est", "n_seen", "err_bound")
      .orderBy(col("series"), col("item"))
  }

  // ---------------------------------------------------------------- q455

  /** Sweep-line peak concurrency per market segment: the maximum number
    * of simultaneously OPEN order fulfillment windows ([orderdate, last
    * shipdate], the q451 intervals) — the capacity-planning complement
    * of q377's overlap JOIN and q363's backlog recursion. Classic
    * ±1 boundary events collapsed to the per-(segment, day) delta
    * (map-side combinable — interval rows never sort globally), then a
    * running sum over each segment's DISTINCT-DAY series — a
    * calendar-bounded window frame (the q85 discipline: windows run on
    * the domain-sized series, not the data). Output per segment: the
    * peak, its first day, and the size of the day series. */
  def q455PeakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val iv = IterativeLoop.cutLazy(fulfillmentWindows(s, dir, bySegment = true)
      .select(col("k").as("seg"), col("okey"), col("sd"), col("ed")))
    val deltas = iv.select(col("seg"), col("sd").as("d"), lit(1L).as("delta"))
      .unionAll(iv.select(col("seg"), (col("ed") + 1L).as("d"),
        lit(-1L).as("delta")))
    val wRun = org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
      .orderBy(col("d"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wSeg = org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
    deltas.groupBy(col("seg"), col("d")).agg(sum(col("delta")).as("dd"))
      .withColumn("conc", sum(col("dd")).over(wRun))
      .withColumn("mx", max(col("conc")).over(wSeg))
      .groupBy(col("seg"))
      .agg(max(col("conc")).as("peak_concurrency"),
        min(when(col("conc") === col("mx"), col("d"))).as("first_peak_day"),
        count(lit(1)).as("n_change_days"))
      .orderBy(col("seg"))
  }

  // ---------------------------------------------------------------- q456

  private[graft] val WisPanel = 60

  /** Weighted interval scheduling (the classic DP; Kleinberg–Tardos
    * ch. 6) over the q451/q455 order fulfillment windows: the
    * max-total-price set of pairwise non-overlapping windows per
    * market segment — the optimization verb of the interval family
    * (q451 classifies pairs, q455 counts concurrency, this SELECTS).
    * Intervals are inclusive day spans, so compatibility is STRICT
    * (e_j < s_i — a window ending on day X conflicts with one starting
    * day X; also what keeps zero-length same-day windows from being
    * self-compatible). Runs on the md5-bottom-[[WisPanel]] windows per
    * segment (the fixed-panel pattern: the DP is inherently sequential
    * — O(panel) state per segment via [[graft.streaming.StreamingHeavyHitters]]-style
    * kernel-in-mapGroups — and the oracle replays it as a 60-step
    * list-state recursive CTE, the q454 pattern). Output per segment:
    * panel size, total weight, and the optimum. */
  def q456WeightedIntervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val iv = fulfillmentWindows(s, dir, bySegment = true)
      .select(col("k").as("seg"), col("okey"), col("sd"), col("w"), col("ed"))
    val panel = iv
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("seg"))
          .orderBy(md5(concat(lit("wis:"), col("okey").cast("string"))),
            col("okey"))))
      .filter(col("rnk") <= WisPanel)
      .select(col("seg"), col("okey"), col("sd"), col("ed"), col("w"))
      .as[(String, Long, Long, Long, Long)]
    panel.groupByKey(_._1).mapGroups { (seg, it) =>
      // (seg, okey, sd, ed, w) sorted by (ed, sd, okey); p(i) = last
      // index strictly ending before sd_i; dp(i) = max(skip, take)
      val rows = it.toSeq.sortBy(r => (r._4, r._3, r._2))
      val n = rows.length
      val dp = Array.fill(n + 1)(0L)
      for (i <- 1 to n) {
        val sd = rows(i - 1)._3
        val w = rows(i - 1)._5
        var p = 0
        var j = i - 1
        while (j >= 1 && p == 0) { if (rows(j - 1)._4 < sd) p = j; j -= 1 }
        dp(i) = math.max(dp(i - 1), w + dp(p))
      }
      (seg, n.toLong, rows.map(_._5).sum, dp(n))
    }.toDF("seg", "n_intervals", "total_weight", "best_weight")
      .orderBy(col("seg"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q456_weighted_intervals" -> q456WeightedIntervals _,
    "q448_ams_join_size"    -> q448AmsJoinSize _,
    "q449_multi_source_bfs" -> q449MultiSourceBfs _,
    "q450_stable_matching"  -> q450StableMatching _,
    "q451_allen_relations"  -> q451AllenRelations _,
    "q452_dod_compression"  -> q452DodCompression _,
    "q453_linear_counting"  -> q453LinearCounting _,
    "q454_misra_gries"      -> q454MisraGries _,
    "q455_peak_concurrency" -> q455PeakConcurrency _)
}
