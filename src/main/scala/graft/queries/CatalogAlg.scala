package graft.queries

import graft.Tables
import graft.ops.IterativeLoop
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-10c wave: named distributed algorithms over the corpus graphs
 * and token streams — Weisfeiler–Leman color refinement (the graph
 * fingerprint behind structural dedup), exact distinct-substring counts
 * per document via the SA+LCP identity (the suffix-index read that
 * quantifies internal repetition), the AMS F2 sketch (second frequency
 * moment from ±1 hash signs — the join-size/self-join-size estimator),
 * graph diameter by the classic double-BFS sweep, and rendezvous (HRW)
 * sharding with the node-removal stability law that motivates it.
 * Determinism contract as everywhere: integer or exact-string state,
 * md5-derived randomness, single-division doubles, total-order
 * tiebreaks.
 */
object CatalogAlg {

  /** The shared sparse graph: parts co-ordered ≥ 2 times (same edges as
    * q402's truss), oriented x < y. */
  private[graft] def partEdges(s: SparkSession, dir: String): DataFrame = {
    val pp = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    pp.select(col("ok"), col("pk").as("ax"))
      .join(pp.select(col("ok"), col("pk").as("by")), "ok")
      .filter(col("ax") < col("by"))
      .groupBy(col("ax").as("x"), col("by").as("y"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("x"), col("y"))
  }

  // ---------------------------------------------------------------- q410

  /** Weisfeiler–Leman (1-WL) color refinement, 3 rounds: color₀ = degree;
    * colorₖ₊₁ = md5(own ∥ sorted neighbor colors) — the canonical
    * structural fingerprint (two nodes keep equal colors iff 1-WL cannot
    * distinguish their neighborhoods). Each round is one groupBy over the
    * adjacency plus a hash projection — no pairwise comparisons; the
    * color histogram is the graph's refinement signature, usable as a
    * near-isomorphism dedup key across snapshot graphs. */
  def q410WlRefinement(s: SparkSession, dir: String): DataFrame =
    wlColors(partEdges(s, dir), rounds = 3)
      .groupBy(col("c").as("color")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("n_nodes").desc, col("color"))

  /** WL colors (a, c) on an oriented (x, y) edge frame. */
  private[graft] def wlColors(edges: DataFrame, rounds: Int): DataFrame = {
    val nbr = IterativeLoop.cutLazy(
      edges.select(col("x").as("a"), col("y").as("b"))
        .unionAll(edges.select(col("y").as("a"), col("x").as("b"))))
    val c0 = nbr.groupBy(col("a")).agg(count(lit(1)).as("deg"))
      .select(col("a"), col("deg").cast("string").as("c"))
    IterativeLoop.fixed(c0, rounds) { (colors, _) =>
      val nc = nbr.join(colors.select(col("a").as("b"), col("c").as("cb")), "b")
        .groupBy(col("a"))
        .agg(array_join(sort_array(collect_list(col("cb"))), ",").as("ns"))
      colors.join(nc, Seq("a"))
        .select(col("a"),
          substring(md5(concat(col("c"), lit("|"), col("ns"))), 1, 16).as("c"))
    }
  }

  // ---------------------------------------------------------------- q411

  private[graft] val LcpBlock = 32
  private[graft] val LcpMax = 1024 // 32 blocks — require()d ≥ max doc len

  /** Append an exact `lcp` column for head columns `ha`/`hb` — two-tier
    * and codegen'd: whole 32-char blocks first (≤ cap/32 block probes),
    * then a 32-char per-char fine scan. Exact up to `cap` (default
    * [[LcpMax]]); never a per-char fold over the full cap. `cap` must be
    * a multiple of [[LcpBlock]]. */
  private[graft] def withLcp(df: DataFrame, ha: String, hb: String,
      cap: Int = LcpMax): DataFrame = {
    val B = LcpBlock
    require(cap % B == 0, s"cap $cap must be a multiple of $B")
    df.withColumn("__blk", expr(
        s"""aggregate(sequence(0, ${cap / B - 1}), 0, (acc, i) ->
           |  CASE WHEN acc = i * $B AND (i + 1) * $B <= least(length($ha), length($hb))
           |    AND substring($ha, i * $B + 1, $B) = substring($hb, i * $B + 1, $B)
           |  THEN (i + 1) * $B ELSE acc END)""".stripMargin))
      .withColumn("lcp", (col("__blk") + expr(
        s"""aggregate(sequence(1, $B), 0, (acc, j) ->
           |  CASE WHEN acc = j - 1 AND __blk + j <= least(length($ha), length($hb))
           |    AND substring($ha, __blk + j, 1) = substring($hb, __blk + j, 1)
           |  THEN j ELSE acc END)""".stripMargin)).cast("long"))
      .drop("__blk")
  }

  /** Exact distinct-substring count per document via the suffix-array +
    * LCP identity: #distinct = Σ(suffix lengths) − Σ LCP(rank-adjacent
    * suffixes) = n(n+1)/2 − ΣLCP. Ranks come from
    * [[graft.text.SuffixIndex.perDocRanks]] (prefix doubling, documents
    * are the unit of parallelism); LCPs from the two-tier exact kernel
    * ([[withLcp]], exact to 1024 — require()d ≥ every doc). The
    * repetition ratio 1 − distinct∕total is the exact counterpart of the
    * deflate-ratio heuristic. */
  def q411DistinctSubstrings(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val maxLen = docs.agg(max(length(col("text"))).as("m")).head().getInt(0)
    require(maxLen < LcpMax,
      s"distinct-substring LCP kernel is exact to $LcpMax chars; corpus max $maxLen")
    val ranked = graft.text.SuffixIndex.perDocRanksCached(s, dir)
    // sentinel suffix ("\t") is ALWAYS rank 1 (TAB sorts below every
    // corpus char), so the original suffixes carry contiguous ranks
    // 2..n+1 — adjacency needs no re-rank, just r-1
    val heads = IterativeLoop.cutLazy(ranked
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(col("pos") <= length(col("text")))
      .select(col("doc_id"), (col("r") - 1).as("rr"),
        expr(s"substring(text, pos, $LcpMax)").as("hd"),
        length(col("text")).cast("long").as("n")))
    val aSide = heads.select(col("doc_id"), col("n"), col("rr"),
      col("hd").as("ha"))
    val bSide = heads.select(col("doc_id"), (col("rr") - 1).as("rr"),
      col("hd").as("hb"))
    val pairs = withLcp(aSide.join(bSide, Seq("doc_id", "rr"), "left")
      .withColumn("hb", coalesce(col("hb"), lit(""))), "ha", "hb")
    pairs.groupBy(col("doc_id"), col("n"))
      .agg(sum(col("lcp")).as("lcp_sum"))
      .select(col("doc_id"), col("n").as("n_chars"),
        expr("n * (n + 1) div 2").as("n_substr_total"),
        (expr("n * (n + 1) div 2") - col("lcp_sum")).as("n_distinct"),
        (lit(1.0) - (expr("n * (n + 1) div 2") - col("lcp_sum")).cast("double") /
          expr("n * (n + 1) div 2").cast("double")).as("repeat_ratio"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q412

  /** AMS (Alon–Matias–Szegedy) F₂ sketch of the token frequency vector:
    * 8 independent ±1 sign hashes (md5 parity), each estimator
    * (Σ sign·count)² — unbiased for F₂ = Σ count²; reported per seed
    * with the exact F₂ and the median estimate alongside. One pass over
    * the token counts, 8× map fan-out, integer until the final
    * median-average divide — the self-join-size estimator every
    * optimizer carries, as a query. */
  def q412AmsF2(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val seeded = counts.select(col("tok"), col("cnt"),
        explode(sequence(lit(0), lit(7))).as("seed"))
      .withColumn("sgn",
        when(conv(substring(md5(concat(col("seed"), lit(":"), col("tok"))),
          1, 2), 16, 10).cast("long") % 2 === 0, lit(1L)).otherwise(lit(-1L)))
    val ests = seeded.groupBy(col("seed").cast("long").as("seed"))
      .agg(sum(col("sgn") * col("cnt")).as("s_sum"))
      .withColumn("est", col("s_sum") * col("s_sum"))
    val f2 = counts.agg(sum(col("cnt") * col("cnt")).as("f2_exact"))
    // median of the 8 estimators without a global window: one collect_list
    // over an 8-row frame, (4th + 5th order stat) / 2
    val med = ests.agg(sort_array(collect_list(col("est"))).as("es"))
      .select(((element_at(col("es"), 4) + element_at(col("es"), 5))
        .cast("double") / 2.0).as("est_median"))
    ests.crossJoin(broadcast(graft.ops.Guards.scalar(f2))).crossJoin(broadcast(graft.ops.Guards.scalar(med)))
      .select(col("seed"), col("s_sum"), col("est"), col("f2_exact"),
        col("est_median"))
      .orderBy(col("seed"))
  }

  // ---------------------------------------------------------------- q413

  /** Graph diameter lower bound by the classic double-BFS sweep on the
    * part co-order graph: BFS from the minimum node id, hop to the
    * farthest node u (ties → min id), BFS again from u — ecc(u) is the
    * 2-sweep diameter estimate (exact on trees, a guaranteed lower
    * bound in general). Both sweeps are [[graft.graph.Graph.bfsHops]]
    * delta-frontier expansions; the seed handoff is a one-row
    * TakeOrdered, not a collect of the distance table. */
  def q413Diameter(s: SparkSession, dir: String): DataFrame =
    diameterOf(partEdges(s, dir))

  /** Double-sweep on an oriented (x, y) edge frame; see [[q413Diameter]]. */
  private[graft] def diameterOf(e0: DataFrame): DataFrame = {
    val und = IterativeLoop.cutLazy(
      e0.select(col("x").as("src"), col("y").as("dst"))
        .unionAll(e0.select(col("y").as("src"), col("x").as("dst"))))
    val s0 = und.agg(min(col("src")).as("id"))
    val d1 = graft.graph.Graph.bfsHops(und, "src", "dst", s0, rounds = 16)
    val u = d1.orderBy(col("hops").desc, col("id").asc).limit(1)
    val d2 = graft.graph.Graph.bfsHops(und, "src", "dst",
      u.select(col("id")), rounds = 16)
    val far = d2.orderBy(col("hops").desc, col("id").asc).limit(1)
    s0.select(col("id").as("seed"))
      .crossJoin(broadcast(graft.ops.Guards.scalar(u.select(col("id").as("sweep1_far"),
        col("hops").as("sweep1_ecc")))))
      .crossJoin(broadcast(graft.ops.Guards.scalar(far.select(col("id").as("sweep2_far"),
        col("hops").as("diameter_lb")))))
      .crossJoin(broadcast(graft.ops.Guards.scalar(d2.agg(count(lit(1)).as("n_reached")))))
  }

  // ---------------------------------------------------------------- q414

  /** Rendezvous (highest-random-weight) sharding of the document corpus
    * over 8 nodes, plus the stability audit that justifies HRW: remove
    * one node and reassign — ONLY the removed node's documents move
    * (per-doc argmax over the remaining nodes is unchanged for every
    * doc it didn't win). Output per node: docs before, after, and
    * gained; the movement law (gained docs = exactly the removed node's
    * share, pro-rated by the argmax) is what consistent hashing buys
    * over mod-N (q233). Weights are 40-bit md5 integers; assignment is
    * a per-doc 8-row window argmax with a total-order tiebreak. */
  def q414HrwShards(s: SparkSession, dir: String): DataFrame = {
    val nodes = (0 until 8).map(i => s"node$i")
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val w = docs.select(col("doc_id"),
        explode(array(nodes.map(lit): _*)).as("node"))
      .withColumn("wt", conv(substring(md5(
        concat(col("node"), lit("#"), col("doc_id"))), 1, 10), 16, 10)
        .cast("long"))
    val wc = IterativeLoop.cutLazy(w)
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("wt").desc, col("node").asc)
    val before = wc.withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1).select(col("doc_id"), col("node"))
    val after = wc.filter(col("node") =!= "node0")
      .withColumn("rn", row_number().over(byDoc))
      .filter(col("rn") === 1).select(col("doc_id"), col("node"))
    val nb = before.groupBy(col("node")).agg(count(lit(1)).as("n_before"))
    val na = after.groupBy(col("node")).agg(count(lit(1)).as("n_after"))
    val moved = before.select(col("doc_id"), col("node").as("b_node"))
      .join(after, Seq("doc_id"))
      .filter(col("b_node") =!= col("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_gained"))
    // report from the literal 8-node spine, not a full_outer of the three
    // aggregates: a node that wins zero documents before AND after must
    // still emit its zero row (the oracle's nodesl spine does; a
    // full_outer would drop it on small corpora)
    val spine = s.range(0, 8).select(concat(lit("node"), col("id")).as("node"))
    spine.join(nb, Seq("node"), "left")
      .join(na, Seq("node"), "left")
      .join(moved, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("n_gained"), lit(0L)).as("n_gained"))
      .orderBy(col("node"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q410_wl_refinement"      -> q410WlRefinement _,
    "q411_distinct_substrings" -> q411DistinctSubstrings _,
    "q412_ams_f2"             -> q412AmsF2 _,
    "q413_diameter"           -> q413Diameter _,
    "q414_hrw_shards"         -> q414HrwShards _)
}
