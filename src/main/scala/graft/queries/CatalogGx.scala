package graft.queries

import graft.Tables
import graft.ops.IterativeLoop
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-12 graph-extensions wave (q437–q441) — the parallel-graph
 * primitives the round-10e wave (Luby MIS, Borůvka MST) left on the
 * table, each with the same determinism discipline (md5 priorities /
 * weights so the oracle replays identical rounds) and the same loud
 * cap-failure discipline (`fixedUntil(requireConverged = true)` on
 * monotone-count stationarity probes: a saturated round budget raises,
 * never hash-matches a wrong answer, and converged loops skip the
 * no-op tail rounds the oracle unrolls — hash-identical by
 * step(fp) = fp):
 *
 *   - q437 densest subgraph by peeling (Bahmani–Kumar–Vattani 2012):
 *     the ONE iterative graph operator here with a fully structural
 *     round bound — survivors of each peel strictly halve (Markov), so
 *     ⌈log₂ n⌉ rounds always suffice at ANY scale.
 *   - q438 maximal matching by local dominance (Hoepman 2004 /
 *     Manne–Bisseling): mutual-minimum edges under distinct md5
 *     weights; the fixpoint equals GREEDY sequential matching by
 *     ascending weight, which the spec replays driver-side.
 *   - q439 butterfly (bipartite 4-cycle) counting on the
 *     customer–part graph: one wedge aggregate, no pairwise vertex
 *     enumeration — the bipartite clustering signal.
 *   - q440 Jones–Plassmann greedy coloring: local-priority-max nodes
 *     color with the mex of their colored neighborhood; rounds bound
 *     by the longest decreasing priority path (O(log n∕log log n) whp).
 *   - q441 deterministic random walks: 8-step min-md5 walks from a
 *     fixed seed set — the node2vec-style neighborhood sampler, as a
 *     pure join pipeline.
 *
 * Reference scope note: the reference pipeline
 * (bexley_spark_stream_msk_es.py) has no graph surface at all; these
 * extend the training-data-pipeline surface (SURVEY §2.12) next to
 * q419/q420.
 */
object CatalogGx {

  /** The thr≥2 part co-order graph shared with q402/q410/q413/q419/q420. */
  private def edges(s: SparkSession, dir: String): DataFrame =
    CatalogAlg.partEdges(s, dir)

  private def nbrOf(edges0: DataFrame): DataFrame =
    IterativeLoop.cutLazy(
      edges0.select(col("x").as("a"), col("y").as("b"))
        .unionAll(edges0.select(col("y").as("a"), col("x").as("b"))))

  // ---------------------------------------------------------------- q437

  private[graft] val PeelRounds = 18

  /** Densest subgraph, 2(1+ε)-approx with ε=1 (Bahmani et al., VLDB
    * 2012): each round records the live subgraph's (n, m) and peels
    * every node of degree ≤ 4·(m∕n) — kept nodes satisfy
    * deg·n > 4m EXACTLY (integer cross-multiply, no density float).
    * Markov: Σdeg = 2m, so survivors number < n∕2 — the round bound is
    * STRUCTURAL: ⌈log₂ n⌉ peel rounds empty any graph, and the
    * stationarity probe needs ONE more round to observe the empty set
    * repeat — so the cap must be ⌈log₂ n⌉ + 1 ([[PeelRounds]] = 18
    * covers n < 2¹⁷ with headroom over the ≤ 2×10⁴ part domain at
    * every verified scale; at true 100 TB node counts raise it to
    * ⌈log₂ n⌉ + 1 — requireConverged keeps saturation loud). The
    * best-density round (exact cross-multiplied argmax, earliest round
    * on ties) is the 4-approx densest subgraph certificate.
    *
    * Loop: [[IterativeLoop.fixedUntil]] on a live-node-count probe —
    * sound because survivors strictly halve while any node lives
    * (count stationary ⟺ live set empty ⟺ fixed point) — with
    * requireConverged as the loud cap; early exit is hash-identical to
    * the oracle's fixed 18-round unroll by step(fp) = fp. */
  def q437DensestPeel(s: SparkSession, dir: String): DataFrame = {
    val e0 = IterativeLoop.cutLazy(edges(s, dir))
    val nodes = e0.select(col("x").as("n")).unionAll(e0.select(col("y").as("n")))
      .distinct()
    // state: kind 'n' = live node; kind 's' = (rnd, nn, mm) peel stats
    val init = nodes.select(lit("n").as("kind"), col("n"),
      lit(0L).as("rnd"), lit(0L).as("nn"), lit(0L).as("mm"))
    val fin = IterativeLoop.fixedUntil(init, PeelRounds,
      requireConverged = true,
      sameAs = IterativeLoop.stationaryAgg(
        _.filter(col("kind") === "n").agg(count(lit(1))).collect()
          .map(_.getLong(0)).toSeq)) { (st, r) =>
      val live = st.filter(col("kind") === "n").select(col("n"))
      // round 15: cut — `le` feeds both degree-count arms AND the edge
      // count in `tot`; without it the double-semi-join chain re-executes
      // once per consumer (guide §2.4)
      val le = IterativeLoop.cutLazy(e0
        .join(live.select(col("n").as("x")), Seq("x"), "left_semi")
        .join(live.select(col("n").as("y")), Seq("y"), "left_semi"))
      val dg = le.select(col("x").as("a")).unionAll(le.select(col("y").as("a")))
        .groupBy(col("a")).agg(count(lit(1)).as("d"))
      val tot = IterativeLoop.cutLazy(
        live.agg(count(lit(1)).as("nn"))
          .crossJoin(le.agg(count(lit(1)).as("mm"))))
      val srow = tot.filter(col("nn") > 0)
        .select(lit("s").as("kind"), lit(0L).as("n"), lit(r.toLong).as("rnd"),
          col("nn"), col("mm"))
      val surv = dg.crossJoin(tot)
        .filter(col("d") * col("nn") > lit(4L) * col("mm"))
        .select(lit("n").as("kind"), col("a").as("n"),
          lit(0L).as("rnd"), lit(0L).as("nn"), lit(0L).as("mm"))
      st.filter(col("kind") === "s").unionByName(srow).unionByName(surv)
    }
    val stats = IterativeLoop.cutLazy(fin.df.filter(col("kind") === "s")
      .select(col("rnd"), col("nn"), col("mm")))
    val other = stats.select(col("rnd").as("brnd"), col("nn").as("bnn"),
      col("mm").as("bmm"))
    // exact argmax by cross-multiplication over the ≤ PeelRounds-row frame
    val out = stats.join(other,
        col("bmm") * col("nn") > col("mm") * col("bnn") ||
          (col("bmm") * col("nn") === col("mm") * col("bnn") &&
            col("brnd") < col("rnd")), "left")
      .groupBy(col("rnd"), col("nn"), col("mm"))
      .agg(max(when(col("brnd").isNotNull, 1L).otherwise(0L)).as("domd"))
      .select(col("rnd").as("round"), col("nn").as("n_nodes"),
        col("mm").as("n_edges"), (col("domd") === 0L).as("is_best"))
      .orderBy(col("round"))
    out
  }

  // ---------------------------------------------------------------- q438

  private[graft] val MatchRounds = 12

  /** Maximal matching by local dominance: every edge draws a distinct
    * 48-bit md5 weight (the q420 trick — distinct weights make the
    * greedy matching UNIQUE); each round matches every edge that is
    * the minimum-weight live edge of BOTH its endpoints (such an edge
    * always exists — the global minimum is one), then removes both
    * endpoints' edges. The fixpoint is exactly the greedy sequential
    * matching by ascending weight (spec law replays it driver-side);
    * convergence in O(log m) rounds whp under random weights (observed
    * ≤6 across all SFs vs the cap of 12).
    *
    * Loop: [[IterativeLoop.fixedUntil]] on a live-edge-count probe —
    * sound because while any edge lives at least one (the global
    * minimum) is mutual-min and matches, strictly shrinking the count
    * (stationary ⟺ live set empty ⟺ maximal ⟺ fixed point) — with
    * requireConverged as the loud cap; early exit is hash-identical to
    * the oracle's fixed 12-round unroll by step(fp) = fp. */
  def q438MaximalMatching(s: SparkSession, dir: String): DataFrame = {
    val we = IterativeLoop.cutLazy(edges(s, dir).select(col("x"), col("y"),
      conv(substring(md5(concat(lit("mm:"), col("x"), lit(","), col("y"))),
        1, 12), 16, 10).cast("long").as("wt")))
    matchingOf(we, MatchRounds).orderBy(col("x"), col("y"))
  }

  /** Local-dominance matching core on a weighted (x, y, wt) edge frame
    * with DISTINCT weights — returns (x, y, wt, round). Shared by q438
    * (md5-weighted co-order graph) and q442 (fuzzy-linkage one-to-one
    * assignment, where wt encodes similarity rank). */
  private[graft] def matchingOf(we: DataFrame, rounds: Int): DataFrame = {
    // state: kind 'e' = live edge; kind 'm' = matched edge (+ round)
    val init = we.select(lit("e").as("kind"), col("x"), col("y"), col("wt"),
      lit(0L).as("rnd"))
    val fin = IterativeLoop.fixedUntil(init, rounds,
      requireConverged = true,
      sameAs = IterativeLoop.stationaryAgg(
        _.filter(col("kind") === "e").agg(count(lit(1))).collect()
          .map(_.getLong(0)).toSeq)) { (st, r) =>
      val e = st.filter(col("kind") === "e").select(col("x"), col("y"), col("wt"))
      // round 15: cut — `mn` feeds both endpoint joins of the mutual-min
      // test; uncut, the per-node min aggregate re-executes for each
      // (guide §2.4)
      val mn = IterativeLoop.cutLazy(e.select(col("x").as("a"), col("wt"))
        .unionAll(e.select(col("y").as("a"), col("wt")))
        .groupBy(col("a")).agg(min(col("wt")).as("mw")))
      val mt = IterativeLoop.cutLazy(e
        .join(mn.select(col("a").as("x"), col("mw").as("mx")), "x")
        .join(mn.select(col("a").as("y"), col("mw").as("my")), "y")
        .filter(col("wt") === col("mx") && col("wt") === col("my"))
        .select(col("x"), col("y"), col("wt")))
      val mnodes = IterativeLoop.cutLazy(
        mt.select(col("x").as("mn")).unionAll(mt.select(col("y").as("mn")))
          .distinct())
      val live = e
        .join(mnodes.select(col("mn").as("x")), Seq("x"), "left_anti")
        .join(mnodes.select(col("mn").as("y")), Seq("y"), "left_anti")
      st.filter(col("kind") === "m")
        .unionByName(mt.select(lit("m").as("kind"), col("x"), col("y"),
          col("wt"), lit(r.toLong).as("rnd")))
        .unionByName(live.select(lit("e").as("kind"), col("x"), col("y"),
          col("wt"), lit(0L).as("rnd")))
    }
    val out = fin.df.filter(col("kind") === "m")
      .select(col("x"), col("y"), col("wt"), col("rnd").as("round"))
    // the mutual-min rule is a matching ONLY under distinct weights; a
    // weight tie at a shared endpoint would silently emit two edges on
    // one node — make the md5-collision case loud instead (the
    // requireConverged discipline applied to the distinctness draw).
    // Coverage note: this guard fires on exactly the CORRECTNESS-
    // relevant tie class (a double-matched node). A tie between two
    // DISJOINT edges passes silently by design — the fixpoint stays
    // well-defined and cross-engine consistent, but the "equals greedy
    // sequential matching" law then holds for SOME greedy tiebreak
    // order rather than a unique one; a global count-vs-count_distinct
    // draw check would reject benign runs, so it is deliberately not
    // enforced.
    val maxDeg = out.select(col("x").as("n")).unionAll(out.select(col("y").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("maxdeg"))
    out.crossJoin(maxDeg)
      .filter(coalesce(assert_true(col("maxdeg") <= 1L,
        lit("matchingOf: an md5 weight tie at a shared endpoint matched " +
          "one node twice; widen the weight draw")), lit(true)))
      .select(col("x"), col("y"), col("wt"), col("round"))
  }

  // ---------------------------------------------------------------- q439

  /** Butterfly (bipartite 4-cycle) counting on the customer–part
    * incidence graph: a butterfly is two customers sharing two parts —
    * the bipartite clustering/cohesion signal (Sanei-Mehri et al., KDD
    * 2018). Wedges enumerate from the CUSTOMER side deliberately: a
    * customer's distinct-part degree is bounded by their own order
    * history (≈40 here and does NOT densify when the corpus replicates
    * customers), while part degree grows with corpus size — so the
    * pair space is Σ_c C(deg_c, 2), never Σ_p C(deg_p, 2). One
    * part-pair aggregate; butterflies = Σ C(w, 2) in exact integers
    * (w·(w−1) is even, so DIV 2 is exact). */
  def q439Butterflies(s: SparkSession, dir: String): DataFrame = {
    val cp = IterativeLoop.cutLazy(
      Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
          "o_orderkey")
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct())
    val pairs = cp.select(col("c"), col("p").as("p1"))
      .join(cp.select(col("c"), col("p").as("p2")), "c")
      .filter(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("w"))
    pairs.agg(count(lit(1)).as("n_copairs"), sum(col("w")).as("n_wedges"),
      sum(expr("(w * (w - 1)) div 2")).as("n_butterflies"))
  }

  // ---------------------------------------------------------------- q440

  private[graft] val JpRounds = 20
  private[graft] val MutualK = 4

  /** Jones–Plassmann greedy coloring on the MUTUAL top-[[MutualK]]
    * sparsification of the co-order graph. Two operators in one:
    *
    * 1. Sparsification: each node keeps its [[MutualK]] smallest-md5
    *    incident arcs; an edge survives iff BOTH endpoints kept it —
    *    so max degree ≤ [[MutualK]] BY CONSTRUCTION (the mutual-kNN
    *    trick). This is what makes the coloring's round budget
    *    principled: JP's round count is the longest strictly-
    *    decreasing priority path, and a union bound (≤ n·Δ^L paths of
    *    length L, each decreasing with probability 1∕L!) gives
    *    n·4^L∕L! < 1 at L ≈ 20 even for n = 10⁵ — measured on the RAW
    *    co-order graph (Δ unbounded, hub-driven), JP needs ~Δ rounds
    *    (38 at sf0.001), exactly the no-cross-scale-margin shape the
    *    round-11 percolation withdrawal banned.
    * 2. Coloring: each round the uncolored nodes ABOVE all uncolored
    *    neighbors color themselves with the mex (minimum excluded
    *    value) of their colored neighborhood — a bounded
    *    explode(sequence(0, k)) anti-join, k = #used neighbor colors,
    *    so the grid is O(E) and mex ≤ k by pigeonhole. Proper by
    *    construction; ≤ Δ+1 = 5 colors can ever appear. Measured
    *    convergence: 3/9/5 rounds at sf0.001/0.01/0.1 vs the cap of
    *    [[JpRounds]] = 20.
    *
    * Loop: [[IterativeLoop.fixedUntil]] on an uncolored-count probe —
    * sound because while any node is uncolored some local priority
    * maximum exists (priorities are a total order WHILE ids fit the
    * 2²⁰ packing window — guarded loudly in-plan), so the count
    * strictly shrinks (stationary ⟺ all colored ⟺ fixed point) — with
    * requireConverged as the loud cap; early exit is hash-identical to
    * the oracle's fixed 20-round unroll by step(fp) = fp. */
  def q440JpColoring(s: SparkSession, dir: String): DataFrame = {
    val nbrAll = nbrOf(edges(s, dir))
    val wPick = Window.partitionBy(col("a")).orderBy(
      md5(concat(lit("mk:"), col("a").cast("string"), lit(","),
        col("b").cast("string"))).asc, col("b").asc)
    val picks = IterativeLoop.cutLazy(
      nbrAll.withColumn("rn", row_number().over(wPick))
        .filter(col("rn") <= MutualK).select(col("a"), col("b")))
    val muk = picks
      .join(picks.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"),
        "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a").as("x"), col("b").as("y"))
    val nbr = IterativeLoop.cutLazy(
      muk.select(col("x").as("a"), col("y").as("b"))
        .unionAll(muk.select(col("y").as("a"), col("x").as("b"))))
    val init = nbr.select(col("a")).distinct()
      .select(col("a"), (conv(substring(md5(concat(lit("jp:"), col("a"))),
        1, 10), 16, 10).cast("long") * 1048576L + col("a")).as("pr"),
        lit(-1L).as("color"))
    val fin = IterativeLoop.fixedUntil(init, JpRounds,
      requireConverged = true,
      sameAs = IterativeLoop.stationaryAgg(
        _.filter(col("color") === -1L).agg(count(lit(1))).collect()
          .map(_.getLong(0)).toSeq)) { (st, _) =>
      val unc = st.filter(col("color") === -1L).select(col("a"), col("pr"))
      val mx = nbr.join(unc.select(col("a").as("b"), col("pr").as("pb")), "b")
        .groupBy(col("a")).agg(max(col("pb")).as("mp"))
      val cand = IterativeLoop.cutLazy(
        unc.join(mx, Seq("a"), "left")
          .filter(col("mp").isNull || col("pr") > col("mp"))
          .select(col("a")))
      val used = IterativeLoop.cutLazy(
        nbr.join(st.filter(col("color") >= 0L)
            .select(col("a").as("b"), col("color").as("c")), "b")
          .join(cand, Seq("a"), "left_semi")
          .select(col("a"), col("c")).distinct())
      val nu = used.groupBy(col("a")).agg(count(lit(1)).as("k"))
      val mex = nu.select(col("a"), explode(sequence(lit(0L), col("k"))).as("c"))
        .join(used, Seq("a", "c"), "left_anti")
        .groupBy(col("a")).agg(min(col("c")).as("mc"))
      val colr = cand.join(mex, Seq("a"), "left")
        .select(col("a"), coalesce(col("mc"), lit(0L)).as("newc"))
      st.join(colr, Seq("a"), "left")
        .select(col("a"), col("pr"),
          coalesce(col("newc"), col("color")).as("color"))
    }
    // pr = md5₄₀·2²⁰ + a is a total order ONLY while all ids sit inside
    // the 2²⁰ packing window (a collision between uncolored neighbors
    // would deadlock them and the stationary probe would then declare a
    // partial coloring converged) — make the domain overflow loud
    val idCap = nbr.agg(coalesce(max(col("a")), lit(0L)).as("maxid"))
    fin.df.select(col("a").as("node"), col("color"))
      .crossJoin(idCap)
      .filter(coalesce(assert_true(col("maxid") < lit(1048576L),
        lit("JP priority packing overflow: node ids must be < 2^20; " +
          "widen the priority encoding")), lit(true)))
      .select(col("node"), col("color"))
      .orderBy(col("node"))
  }

  // ---------------------------------------------------------------- q441

  private[graft] val WalkSteps = 8

  /** Deterministic "random" walks — the node2vec/DeepWalk neighborhood
    * sampler as a pure join pipeline: from every seed (node id ≡ 0
    * mod 50, a fixed ~2% panel), walk [[WalkSteps]] steps where step r
    * moves to the neighbor minimizing md5("wk:r:cur,nbr") (ties broken
    * by neighbor id — a total order, so the trajectory is unique and
    * the oracle replays it). Each step is one join + one per-seed
    * top-1 window; walk state is O(seeds), never O(graph). */
  def q441DetWalks(s: SparkSession, dir: String): DataFrame = {
    val nbr = nbrOf(edges(s, dir))
    // Round 16: the loop state is the FRONTIER (one row per live walk),
    // not the accumulated trajectory — the old state grew by one layer per
    // step and the per-round cut re-persisted the whole history (O(steps²)
    // row copies); each step's output is cut once and the trajectory is
    // assembled by one union at the end. Same rows: step r's candidates
    // came from st.filter(step = r−1), which IS the frontier.
    val init = IterativeLoop.cutLazy(
      nbr.select(col("a")).distinct().filter(col("a") % 50 === 0)
        .select(col("a").as("seed"), col("a").as("node")))
    var cur = init
    val parts = scala.collection.mutable.ListBuffer[DataFrame](
      init.select(col("seed"), lit(0L).as("step"), col("node")))
    val lid = graft.ops.PlanProbe.loopId()
    for (r <- 1 to WalkSteps) {
      val cand = cur.join(nbr, col("node") === col("a"))
        .select(col("seed"), col("b"),
          md5(concat(lit(s"wk:$r:"), col("node").cast("string"), lit(","),
            col("b").cast("string"))).as("h"))
      val w = Window.partitionBy(col("seed"))
        .orderBy(col("h").asc, col("b").asc)
      val nxt = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("seed"), col("b").as("node"))
      graft.ops.PlanProbe.offer(lid, r, nxt)
      val nxtC = IterativeLoop.cutLazy(nxt)
      parts += nxtC.select(col("seed"), lit(r.toLong).as("step"), col("node"))
      cur = nxtC
    }
    parts.reduce(_ unionByName _).orderBy(col("seed"), col("step"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q437_densest_peel"     -> q437DensestPeel _,
    "q438_maximal_matching" -> q438MaximalMatching _,
    "q439_butterflies"      -> q439Butterflies _,
    "q440_jp_coloring"      -> q440JpColoring _,
    "q441_det_walks"        -> q441DetWalks _)
}
