package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Iterative graph analytics over edge DataFrames.
 *
 * PageRank (Brin & Page, WWW 1998) in FIXED-POINT arithmetic: ranks are
 * BIGINT multiples of 1/2⁴⁰, every per-iteration step is integer division
 * and integer summation — both associative/commutative — so the result is
 * a pure function of the edge SET, independent of partitioning and merge
 * order, and an external SQL engine replays the identical iterations (the
 * same mirror-the-training discipline as the k-means/BPE oracles).
 *
 * Scale posture: each iteration is two equi-joins keyed on `src` (ranks
 * and out-degrees co-partition with edges after the first exchange) plus
 * one `dst`-keyed sum whose partials combine map-side. Per-iteration
 * lineage is cut the same way connectedComponents does it (reliable
 * checkpoint when a dir is configured, else eager localCheckpoint), so
 * iteration k never replays k−1 predecessors. Iteration count is a small
 * fixed constant — wall-clock is O(iterations) shuffles regardless of
 * graph size. Dangling nodes (out-degree 0) simply leak their mass, the
 * standard drain formulation; the spec pins total-mass monotonicity.
 */
object Graph {

  /** Fixed-point damped PageRank. Output: (node, rank) with rank a BIGINT
    * in units of scale⁻¹; rank ≈ scale × pagerank. Damping 85/100; the
    * teleport term ((15·scale)/100)/N uses the in-plan one-row node count
    * (no driver collect). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, scale: Long = 1L << 40): DataFrame = {
    require(iterations >= 1, s"need at least one iteration, got $iterations")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nTotal = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(nTotal))
      .select(col("node"), expr(s"CAST($scale AS BIGINT) div n_nodes").as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .groupBy(col("dst"))
        .agg(sum(expr("rank div outdeg")).as("contrib"))
      ranks = graft.dedup.Dedup.lineageCut(
        nodes.crossJoin(broadcast(nTotal))
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (expr(s"((15 * CAST($scale AS BIGINT)) div 100) div n_nodes") +
              expr("(85 * coalesce(contrib, CAST(0 AS BIGINT))) div 100")).as("rank")))
    }
    ranks
  }
}
