package graft.queries

import graft.Tables
import graft.ops.{Guards, IterativeLoop}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-13 first wave (q448–q449) — two sketch/graph verbs extending
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
    val curve = scala.collection.mutable.ArrayBuffer(curvePoint(0, masks))
    val lid = graft.ops.PlanProbe.loopId()
    for (h <- 1 to BfsRounds) {
      val stepped = und
        .join(masks.select(col("node").as("v"), col("mask")), "v")
        .select(col("u").as("node"), col("mask"))
        .unionAll(masks)
        .groupBy(col("node")).agg(expr("bit_or(mask)").as("mask"))
      graft.ops.PlanProbe.offer(lid, h, stepped)
      masks = IterativeLoop.cutLazy(stepped)
      curve += curvePoint(h, masks)
    }
    curve.reduce(_ unionAll _).orderBy(col("h"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q448_ams_join_size"    -> q448AmsJoinSize _,
    "q449_multi_source_bfs" -> q449MultiSourceBfs _)
}
